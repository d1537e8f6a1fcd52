package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}

/** Skew-resilience patterns as first-class, oracle-checked operators:
  * results are IDENTICAL to the naive form (the oracle is the naive SQL);
  * only the physical shape changes.
  */
object ScalePatterns {

  private val D = DecimalType(12, 2)

  /** Two-stage salted aggregation: stage 1 aggregates on
    * (key, hash(row) % 16) so one hot key spreads over 16 reducers;
    * stage 2 merges the partials. Decimal sums are associative, so the
    * result is bit-identical to the direct aggregation (the oracle).
    * This is the drop-in treatment for skewed groupBy keys at 100 TB
    * (DESIGN.md); here demonstrated on event_type (5 hot keys across
    * 100k rows).
    */
  val saltedAgg: QueryDef = QueryDef(
    "agg_salted_two_stage",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("salt", pmod(hash(col("event_id")), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"), sum(col("value").cast(D)).as("pv"))
        .groupBy("event_type")
        .agg(sum(col("pn")).as("n"), sum(col("pv")).cast("double").as("total_value"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """.stripMargin.trim))

  /** Bloom-pruned shuffle join: the semi-join reduction for a fact⋈dim
    * join whose dim side is too big to broadcast but whose JOIN KEYS fit
    * a ~MB bloom filter. Build the bloom over the filtered dimension's
    * keys (one dim-side aggregate; the fact side is untouched), ship it
    * as a literal into Spark's codegen'd `bloom_might_contain`, and drop
    * non-joining fact rows BEFORE the shuffle. False positives only —
    * the equi-join that follows makes the result exactly the naive
    * join's (the oracle). At 100 TB this turns "shuffle 100% of the
    * fact" into "shuffle the ~matching fraction + fpp": here urgent
    * orders are ~20% of keys, so ~79% of lineitem never enters the
    * exchange. Spark's own runtime row-level filtering plants this same
    * expression, but only under size/selectivity heuristics and never
    * across a pre-computed dimension — this is the hand-placed form.
    */
  val bloomPruneJoin: QueryDef = QueryDef(
    "scale_bloom_prune_join",
    (s, dir) => {
      graft.functions.BloomExpressions.register(s)
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      // size the filter to the dim's true key cardinality (cheap dim-side
      // count — the production analog reads it from table stats); 1% fpp
      val bf = urgent.stat.bloomFilter(
        "o_orderkey", math.max(urgent.count(), 1024L), 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val pruned = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .filter(call_function("bloom_might_contain",
          lit(bos.toByteArray), col("l_orderkey")))
      pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(trunc(col("o_orderdate"), "month").as("order_month"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(D) *
            (lit(1).cast(D) - col("l_discount").cast(D)))
            .cast("double").as("revenue"))
        .orderBy("order_month")
    },
    Some("""
      SELECT date_trunc('month', o_orderdate) AS order_month,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1
      ORDER BY order_month
    """.stripMargin.trim))

  /** Morton/Z-order bit-interleave of two key columns, emitted as the
    * same arithmetic in both dialects from one generator so the
    * definitions cannot drift. `bits` low bits of each key are
    * interleaved (x even positions, y odd). */
  private[operators] def zSpark(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")
  private def zDuck(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  /** Z-order (Morton) clustering audit: lay `orders` out in 16
    * equal-size buckets two ways — sorted by the bit-interleave of
    * (o_custkey, order-day) vs sorted by day alone — and report each
    * bucket's min/max along BOTH dimensions. Those per-bucket min/max
    * are exactly the footer statistics a parquet reader prunes on, so
    * the output IS the file-skipping story: under the linear date sort
    * every bucket spans the full customer range (a customer-scoped scan
    * reads all 16 files), while under z-order each bucket covers ~1/4
    * of each dimension (sqrt(16) divisions per axis), so a point query
    * on EITHER dimension skips ~3/4 of the files (ZorderLayoutSpec
    * measures it).
    *
    * Both dimensions are min-max scaled to a common 10-bit range BEFORE
    * interleaving — this is part of the recipe, not cosmetics:
    * interleaving raw domains of different widths weights the wider /
    * offset-dominated dimension's high bits above the other's (measured
    * here: raw interleave left the per-bucket custkey span at 0.54× the
    * global range; scaled, it drops to ~0.3×). The scale stats are one
    * 4-value scalar aggregate broadcast to the row-level map stage.
    *
    * Scale shape: the z-value is one codegen'd map-side expression, and
    * the bucket assignment IS the write-time layout pass:
    * [[TwoStageOrder.ntileExact]] range-partitions on (z, orderkey)
    * (sampled boundaries, fully distributed), ranks within partitions,
    * and derives the equal-count bucket from the closed-form NTILE
    * formula — deterministic and oracle-checkable (both engines bucket
    * identically) with no single-partition sort anywhere (the r10 form
    * still carried a global `ntile(16)` window here). The audit a
    * reader consumes is the grouped min/max, which is
    * layout-independent of how the boundaries were found.
    */
  val zorderLayout: QueryDef = QueryDef(
    "scale_zorder_layout",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val raw = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          col("o_custkey").cast("bigint").as("ck"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("bigint").as("oday"))
      val stats = raw.agg(
        min(col("ck")).as("ckmin"), max(col("ck")).as("ckmax"),
        min(col("oday")).as("odmin"), max(col("oday")).as("odmax"))
      val base = raw.crossJoin(broadcast(stats))
        .withColumn("cs", floor((col("ck") - col("ckmin")) * lit(1023.0)
          / (col("ckmax") - col("ckmin"))).cast("bigint"))
        .withColumn("os", floor((col("oday") - col("odmin")) * lit(1023.0)
          / (col("odmax") - col("odmin"))).cast("bigint"))
        .withColumn("z", expr(zSpark("cs", "os", 10)))
        // materialized once: feeds both layout arms, and each arm's range
        // sampling pass would otherwise re-run the scan + scalar join
        .localCheckpoint(true)
      // distributed exact NTILE (TwoStageOrder): the bucket assignment
      // is itself the range-partition + local-rank layout pass the
      // scaladoc promises at write time — no single-partition sort.
      // (r18 note: the boundary-tuple form (orderStatisticTuples +
      // map-side bucket comparison) was built and oracle-verified here,
      // then REVERTED on measurement — at sf0.1 its 30-cut selection
      // pass + per-row comparison census ran ~3.0 s vs 2.1 s for this
      // form, and unlike rfm's R/M quartiles the per-row rank here IS
      // the write layout, so the range exchange is not wasted work at
      // scale either. Kept for the consumers where the boundary form
      // measured faster: event_rfm_segments, sketch selection.)
      val zb = TwoStageOrder.ntileExact(
        base.withColumn("layout", lit("zorder")), 16,
        Seq(asc("z"), asc("o_orderkey")), "bucket")
      val db = TwoStageOrder.ntileExact(
        base.withColumn("layout", lit("datesort")), 16,
        Seq(asc("oday"), asc("o_orderkey")), "bucket")
      zb.unionByName(db)
        .groupBy(col("layout"), col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("ck")).as("min_cust"), max(col("ck")).as("max_cust"),
          min(col("oday")).cast("int").as("min_day"),
          max(col("oday")).cast("int").as("max_day"))
        .orderBy("layout", "bucket")
    },
    Some(s"""
      WITH raw AS (
        SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS ck,
               CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS oday
        FROM orders
      ),
      stats AS (
        SELECT MIN(ck) AS ckmin, MAX(ck) AS ckmax,
               MIN(oday) AS odmin, MAX(oday) AS odmax
        FROM raw
      ),
      base AS (
        SELECT o_orderkey, ck, oday,
               CAST(FLOOR((ck - ckmin) * 1023.0 / (ckmax - ckmin)) AS BIGINT) AS cs,
               CAST(FLOOR((oday - odmin) * 1023.0 / (odmax - odmin)) AS BIGINT) AS os
        FROM raw CROSS JOIN stats
      ),
      zv AS (SELECT *, ${zDuck("cs", "os", 10)} AS z FROM base),
      b AS (
        SELECT 'zorder' AS layout,
               CAST(NTILE(16) OVER (ORDER BY z, o_orderkey) AS INT) AS bucket, ck, oday
        FROM zv
        UNION ALL
        SELECT 'datesort' AS layout,
               CAST(NTILE(16) OVER (ORDER BY oday, o_orderkey) AS INT) AS bucket, ck, oday
        FROM zv
      )
      SELECT layout, bucket, COUNT(*) AS n_rows,
             MIN(ck) AS min_cust, MAX(ck) AS max_cust,
             CAST(MIN(oday) AS INT) AS min_day, CAST(MAX(oday) AS INT) AS max_day
      FROM b GROUP BY layout, bucket
      ORDER BY layout, bucket
    """.stripMargin.trim))

  /** Incremental aggregate maintenance, proven through the oracle gate
    * (the plain-aggregate sibling of `dedup_minhash_sketch_merge`): a
    * materialized per-key aggregate state (count, decimal sum, min/max
    * timestamps) is built over the base corpus, a SEPARATE state over a
    * delta arrival, and the two are merged state⊎state — n adds, sums
    * add (decimal: associative, bit-exact), min/max take least/greatest.
    * The oracle aggregates base+delta directly in one pass, so the hash
    * compare passing IS the monoid property that lets a 100 TB pipeline
    * maintain dashboards/marts by folding each arrival batch into
    * persisted state — never re-scanning the corpus. Keys appearing
    * only in the delta surface through the same merge (full outer union
    * semantics). This is also exactly Spark's own partial-aggregation
    * contract, applied across a persistence boundary.
    */
  val incrementalAggMerge: QueryDef = QueryDef(
    "agg_incremental_merge",
    (s, dir) => {
      // ONE scan builds BOTH disjoint states (r14 verdict item 1: base
      // and delta each re-scanned the parquet projection). The suggested
      // localCheckpoint of the shared projection measured SLOWER in a
      // 3-round same-minute A/B (eagerly materializing ~600k rows costs
      // more than the second columnar scan it saves), so the one-scan
      // shape is a grouped aggregate keyed by (event_type, batch):
      // exactly the per-key per-arrival-batch state frame an incremental
      // pipeline persists, merged below by the same monoid fold.
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          col("value").cast(D).as("v"), col("ts"))
      val states = ev
        .withColumn("batch", (col("event_id") % 10 === 0).cast("int"))
        .groupBy("event_type", "batch").agg(
          count(lit(1)).as("n"), sum(col("v")).as("sv"),
          min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      states
        .groupBy("event_type")
        .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
          min(col("mn")).as("first_ts"), max(col("mx")).as("last_ts"))
        .select(col("event_type"), col("n"),
          col("sv").cast("double").as("total_value"),
          col("first_ts"), col("last_ts"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
             MIN(ts) AS first_ts, MAX(ts) AS last_ts
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """.stripMargin.trim))

  /** First 6 hex chars of md5(key) as a BIGINT in [0, 16^6) — the
    * deterministic uniform both engines agree on, emitted for each
    * dialect from one generator (the zSpark/zDuck pattern). */
  private[operators] def hexIntSpark(h: String): String =
    (1 to 6).map(i =>
      s"(position(substring($h, $i, 1) IN '0123456789abcdef') - 1) * ${math.pow(16, 6 - i).toLong}L")
      .mkString(" + ")
  private[operators] def hexIntDuck(h: String): String =
    (1 to 6).map(i =>
      s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1) * ${math.pow(16, 6 - i).toLong}")
      .mkString(" + ")

  /** The ONE definition of the PPS inclusion decision, shared with the
    * data card so the two cannot desynchronize: include iff
    * v·W < K·w·SCALE (all int64; SCALE = 16⁶ matches the hex-uniform
    * domain). */
  private[operators] val PpsK = 100L
  private[operators] val PpsScale = 16777216L
  private[operators] def ppsPicked(v: org.apache.spark.sql.Column,
      wCorpus: org.apache.spark.sql.Column,
      nChars: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    v * wCorpus < lit(PpsK) * nChars * lit(PpsScale)
  private[operators] def ppsPickedDuck(v: String, w: String, nChars: String): String =
    s"$v * $w < $PpsK * $nChars * $PpsScale"

  /** Deterministic PPS (probability-proportional-to-size) Poisson
    * sampling: each document is included with probability
    * k·w/W (w = its char count, W = corpus char mass, k = 100 expected
    * picks), decided by the PURE INTEGER comparison v·W < k·w·16⁶
    * where v is the doc's md5-derived uniform — no floats, no
    * transcendentals, so the sample is bit-identical on every engine
    * and replayable forever (the weighted sibling of
    * `sample_stratified_hash`, and the deterministic form of
    * quality/size-weighted corpus subsampling). Audited per source:
    * doc and char totals, picks, sampled char mass — at 100 TB the
    * decision is one codegen'd map-side predicate; W is a 1-row
    * broadcast scalar.
    */
  val weightedPps: QueryDef = QueryDef(
    "sample_weighted_pps",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("source"), col("n_chars"),
          expr(hexIntSpark("md5(CAST(CAST(doc_id AS STRING) AS BINARY))")).as("v"))
      val tot = docs.agg(sum(col("n_chars")).as("w_corpus"))
      docs.crossJoin(broadcast(tot))
        .withColumn("picked", ppsPicked(col("v"), col("w_corpus"), col("n_chars")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          count(when(col("picked"), 1)).as("n_sampled"),
          coalesce(sum(when(col("picked"), col("n_chars"))), lit(0L)).as("sampled_chars"))
        .orderBy("source")
    },
    Some(s"""
      WITH d AS (
        SELECT source, n_chars,
               ${hexIntDuck("md5(CAST(doc_id AS VARCHAR))")} AS v
        FROM documents
      ),
      tot AS (SELECT SUM(n_chars) AS w_corpus FROM d)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars,
             COUNT(*) FILTER (WHERE ${ppsPickedDuck("v", "w_corpus", "n_chars")}) AS n_sampled,
             CAST(COALESCE(SUM(n_chars) FILTER (WHERE ${ppsPickedDuck("v", "w_corpus", "n_chars")}), 0) AS BIGINT) AS sampled_chars
      FROM d CROSS JOIN tot
      GROUP BY source
      ORDER BY source
    """.stripMargin.trim))

  /** Two-stage distributed cumulative sum — the scale form of an
    * ordered running total that several operators' docs reference
    * (KS drift, sweep-line) as "the standard fix" for an unpartitioned
    * window, shipped here as a real operator: cumulative daily revenue
    * where stage 1 computes per-MONTH running sums under a
    * PARTITIONED window (parallel across months), stage 2 prefixes
    * each month with the total of all earlier months (a window over
    * ~months rows — driver-trivial at any scale), and the result is
    * day_cum = month_prefix + within-month running sum. The oracle is
    * the single unpartitioned window — so the decomposition's
    * exactness is hash-gated, and the integer-cents discipline makes
    * the sums bit-identical. At 100 TB the day grain is replaced by
    * any grain and the month by any range-bucket of the sort key.
    */
  val twoStageCumsum: QueryDef = QueryDef(
    "scale_two_stage_cumsum",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum((col("o_totalprice").cast(D) * 100).cast("long"))
          .as("cents"))
        .withColumn("month", date_trunc("month", col("day")))
      val wIn = Window.partitionBy("month").orderBy(asc("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val monthTotals = daily.groupBy("month").agg(sum(col("cents")).as("mtotal"))
      val prefixed = monthTotals
        .withColumn("mprefix",
          coalesce(sum(col("mtotal")).over(
            Window.orderBy(asc("month"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      daily
        .withColumn("incum", sum(col("cents")).over(wIn))
        .join(prefixed.select("month", "mprefix"), "month")
        .select(col("day"), col("cents"),
          (col("mprefix") + col("incum")).as("cum_cents"))
        .orderBy("day")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1)
      SELECT day, cents,
             CAST(SUM(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      FROM daily
      ORDER BY day
    """.stripMargin.trim))

  /** Zone-map (min/max) data-skipping audit — "why you sort your data",
    * quantified. Orders land in 16 shards under two layouts: `hash16`
    * (content-free md5 nibble — the naive write layout) and
    * `datesort16` (date-clustered — what a sort-on-write or Z-order
    * maintenance job produces). Each shard keeps the min/max order-day
    * zone map a parquet footer would carry; a one-month predicate then
    * scans exactly the shards whose [min,max] overlaps the range.
    * Output per layout: shards scanned, rows behind those shards, rows
    * actually matching, and the scan-waste ppm — hash layout scans all
    * 16 shards (every zone spans the full domain), the date-sorted one
    * touches ~1. This is the audit that justifies the layout job before
    * anyone pays for it at 100 TB: the ONLY full-data pass is the
    * layout assignment itself; the skipping decision runs on the
    * 2×16-row zone-map table.
    */
  val zonemapPrune: QueryDef = QueryDef(
    "scale_zonemap_prune",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val lo = 1154L // days from 1995-01-01 to 1998-02-28 exclusive bound below
      val hi = 1184L // ... to 1998-03-30 (one-month window)
      val raw = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1995-01-01")).cast("bigint").as("oday"))
        // materialized once: feeds the hash arm AND the two-stage ntile's
        // sampling + shuffle passes
        .localCheckpoint(true)
      val hashed = raw.withColumn("layout", lit("hash16"))
        .withColumn("shard",
          substring(md5(col("o_orderkey").cast("string").cast("binary")), 1, 1))
      val sorted = TwoStageOrder.ntileExact(
          raw.withColumn("layout", lit("datesort16")), 16,
          Seq(asc("oday"), asc("o_orderkey")), "shard16")
        .withColumn("shard", col("shard16").cast("string"))
        .drop("shard16")
      val zones = hashed.unionByName(sorted)
        .groupBy("layout", "shard")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("oday").between(lo, hi), 1L).otherwise(0L)).as("n_match"),
          min(col("oday")).as("zmin"), max(col("oday")).as("zmax"))
      zones
        .withColumn("scanned", col("zmin") <= hi && col("zmax") >= lo)
        .groupBy("layout")
        .agg(
          count(lit(1)).as("n_shards"),
          count(when(col("scanned"), 1)).as("shards_scanned"),
          sum(col("n_rows")).as("rows_total"),
          coalesce(sum(when(col("scanned"), col("n_rows"))), lit(0L)).as("rows_scanned"),
          sum(col("n_match")).as("rows_matched"))
        .withColumn("scan_waste_ppm", expr(
          """CAST((CAST(rows_scanned - rows_matched AS DECIMAL(38,0)) * 1000000)
                  DIV rows_scanned AS BIGINT)"""))
        .orderBy("layout")
    },
    Some("""
      WITH raw AS (
        SELECT o_orderkey,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS oday
        FROM orders),
      assigned AS (
        SELECT 'hash16' AS layout,
               substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS shard, oday
        FROM raw
        UNION ALL
        SELECT 'datesort16' AS layout,
               CAST(ntile(16) OVER (ORDER BY oday, o_orderkey) AS VARCHAR) AS shard, oday
        FROM raw),
      zones AS (
        SELECT layout, shard, COUNT(*) AS n_rows,
               SUM(CASE WHEN oday BETWEEN 1154 AND 1184 THEN 1 ELSE 0 END) AS n_match,
               MIN(oday) AS zmin, MAX(oday) AS zmax
        FROM assigned GROUP BY 1, 2)
      SELECT layout,
             COUNT(*) AS n_shards,
             COUNT(*) FILTER (WHERE zmin <= 1184 AND zmax >= 1154) AS shards_scanned,
             CAST(SUM(n_rows) AS BIGINT) AS rows_total,
             CAST(COALESCE(SUM(n_rows) FILTER (WHERE zmin <= 1184 AND zmax >= 1154), 0)
                  AS BIGINT) AS rows_scanned,
             CAST(SUM(n_match) AS BIGINT) AS rows_matched,
             CAST((CAST(COALESCE(SUM(n_rows) FILTER (WHERE zmin <= 1184 AND zmax >= 1154), 0)
                        - SUM(n_match) AS HUGEINT) * 1000000)
                  // COALESCE(SUM(n_rows) FILTER (WHERE zmin <= 1184 AND zmax >= 1154), 0)
                  AS BIGINT) AS scan_waste_ppm
      FROM zones
      GROUP BY layout
      ORDER BY layout
    """.stripMargin.trim))

  /** Join-key skew audit — the diagnosis a pipeline runs BEFORE a big
    * join to decide between plain shuffle, AQE skew splitting, and
    * explicit salting: per candidate key column, the per-key frequency
    * distribution reduced to n_keys / mean / exact p99 / max and the
    * max-to-mean skew ratio in ppm. Exact p99 is the value at rank
    * ceil(0.99·n_keys) under the (count, key) total order — the
    * quartiles-by-rank idiom, windowed over the KEY table (never the
    * fact rows). One keyed count per column; everything after runs on
    * |keys| rows.
    */
  val joinSkewAudit: QueryDef = QueryDef(
    "scale_join_skew_audit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
      def audit(keyCol: String) = {
        val counts = li.groupBy(col(keyCol).as("k"))
          .agg(count(lit(1)).as("c"))
          // materialized once: the two-stage rank's range sampling pass
          // would otherwise re-run the fact-table count
          .localCheckpoint(true)
        // |keys| grows with the fact table, so the rank runs two-stage
        // (TwoStageOrder: range partition + local rank + offsets) — the
        // r10 global row_number/COUNT() OVER () pair was two
        // single-partition passes over the key table
        TwoStageOrder.withGlobalRank(counts, Seq(asc("c"), asc("k")), "rn", "nk")
          .agg(
            sum(col("c")).as("n_rows"),
            max(col("nk")).as("n_keys"),
            expr("SUM(c) DIV MAX(nk)").as("mean_rows_per_key"),
            max(when(col("rn") === expr("CAST(CEIL(0.99 * nk) AS BIGINT)"), col("c")))
              .as("p99_rows_per_key"),
            max(col("c")).as("max_rows_per_key"))
          .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"),
            col("mean_rows_per_key"), col("p99_rows_per_key"),
            col("max_rows_per_key"),
            expr("""CAST((CAST(MAX_ROWS_PER_KEY AS DECIMAL(38,0)) * 1000000)
                    DIV mean_rows_per_key AS BIGINT)""").as("skew_ppm"))
      }
      audit("l_suppkey").unionByName(audit("l_partkey")).orderBy("key_col")
    },
    Some("""
      WITH audits AS (
        SELECT 'l_partkey' AS key_col, c, k FROM (
          SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1) t
        UNION ALL
        SELECT 'l_suppkey', c, k FROM (
          SELECT l_suppkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1) t),
      ranked AS (
        SELECT key_col, c,
               row_number() OVER (PARTITION BY key_col ORDER BY c ASC, k ASC) AS rn,
               COUNT(*) OVER (PARTITION BY key_col) AS nk
        FROM audits)
      SELECT key_col,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(MAX(nk) AS BIGINT) AS n_keys,
             CAST(SUM(c) // MAX(nk) AS BIGINT) AS mean_rows_per_key,
             CAST(MAX(CASE WHEN rn = CAST(CEIL(0.99 * nk) AS BIGINT) THEN c END)
                  AS BIGINT) AS p99_rows_per_key,
             CAST(MAX(c) AS BIGINT) AS max_rows_per_key,
             CAST((CAST(MAX(c) AS HUGEINT) * 1000000)
                  // (SUM(c) // MAX(nk)) AS BIGINT) AS skew_ppm
      FROM ranked
      GROUP BY key_col
      ORDER BY key_col
    """.stripMargin.trim))

  /** Exact tail quantiles (p50/p90/p99/p99.9) of per-order revenue —
    * the latency/size-distribution readout every pipeline SLO dashboard
    * needs EXACT at the tail, where approx-percentile sketches are
    * loosest. Rank-definition: value at rank ⌈q·n⌉ under the
    * (cents, orderkey) total order — the same quartiles-by-rank idiom
    * as the skew audit's p99, generalized to a quantile VECTOR from ONE
    * ranking pass. The ranking is [[TwoStageOrder.withGlobalRank]]
    * (range partition + local rank + offset fold), so no
    * single-partition sort exists at any input size; the final agg
    * probes four ranks from the same ranked frame. Integer cents
    * throughout — bit-identical across engines.
    */
  val exactQuantiles: QueryDef = QueryDef(
    "scale_exact_quantiles",
    (s, dir) => {
      // The rank under (vc, o_orderkey) is only PROBED at five targets,
      // and the value emitted at each is vc alone — the multiset order
      // statistic of vc (the o_orderkey tiebreak decides which tied ROW
      // carries a rank, never which VALUE sits at it). So the quantile
      // vector comes from TwoStageOrder.orderStatistics: two
      // aggregation-only scans, ZERO data exchanges (r18; was: eager
      // checkpoint + range exchange + offset join of the full order
      // table). Cent values tie only within a price point (~1e7-value
      // domain), far below the bracket's ε bound.
      TwoStageOrder.orderStatistics(
          Tables.orders(s, dir)
            .select((col("o_totalprice").cast(D) * 100).cast("long").as("vc")),
          "vc",
          Seq(
            ("p50_cents", 0.5, "CAST(CEIL(0.5 * n) AS BIGINT)"),
            ("p90_cents", 0.9, "CAST(CEIL(0.9 * n) AS BIGINT)"),
            ("p99_cents", 0.99, "CAST(CEIL(0.99 * n) AS BIGINT)"),
            ("p999_cents", 0.999, "CAST(CEIL(0.999 * n) AS BIGINT)"),
            ("max_cents", 1.0, "n")))
        .select(col("n").as("n_orders"), col("p50_cents"), col("p90_cents"),
          col("p99_cents"), col("p999_cents"), col("max_cents"))
    },
    Some("""
      WITH cents AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
        FROM orders),
      ranked AS (
        SELECT vc,
               ROW_NUMBER() OVER (ORDER BY vc ASC, o_orderkey ASC) AS rn,
               COUNT(*) OVER () AS n
        FROM cents)
      SELECT CAST(MAX(n) AS BIGINT) AS n_orders,
             MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN vc END) AS p50_cents,
             MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN vc END) AS p90_cents,
             MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN vc END) AS p99_cents,
             MAX(CASE WHEN rn = CAST(CEIL(0.999 * n) AS BIGINT) THEN vc END) AS p999_cents,
             MAX(CASE WHEN rn = n THEN vc END) AS max_cents
      FROM ranked
    """.stripMargin.trim))

  /** The ACTION the skew audit feeds — a deterministic per-key salting
    * plan for the l_partkey join side: every key whose row count
    * exceeds τ = 4× the mean gets `splits = ⌈rows/τ⌉` salt buckets
    * (the explicit form of what AQE's skew-join split does at runtime,
    * as a PLANNABLE artifact a pipeline can bake into a bucketed write).
    * Output is the one-row plan summary: hot-key census, total splits,
    * and the max single-reducer row count BEFORE vs AFTER — the number
    * that decides whether the shuffle fits executor memory. Everything
    * derives from one keyed count; the plan math runs on |keys| rows
    * and the summary on one. Integer-exact: τ via integer DIV, AFTER =
    * ⌈rows/splits⌉ per key.
    */
  val skewSaltPlan: QueryDef = QueryDef(
    "scale_skew_salt_plan",
    (s, dir) => {
      val counts = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey").as("k"))
        .agg(count(lit(1)).as("c"))
      val tau = counts.agg(
        expr("GREATEST(4 * (SUM(c) DIV COUNT(1)), 1)").as("tau"))
      counts.crossJoin(broadcast(tau))
        .withColumn("splits", expr("(c + tau - 1) DIV tau"))
        .agg(
          max(col("tau")).as("tau_rows"),
          count(lit(1)).as("n_keys"),
          count(when(col("splits") > 1, 1)).as("n_hot_keys"),
          coalesce(sum(when(col("splits") > 1, col("c"))), lit(0L)).as("hot_rows"),
          coalesce(sum(when(col("splits") > 1, col("splits"))), lit(0L)).as("n_splits"),
          max(col("c")).as("max_before"),
          max(expr("(c + splits - 1) DIV splits")).as("max_after"))
    },
    Some("""
      WITH counts AS (
        SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
      tau AS (
        SELECT GREATEST(4 * (SUM(c) // COUNT(*)), 1) AS tau FROM counts),
      plan AS (
        SELECT c, tau, (c + tau - 1) // tau AS splits
        FROM counts CROSS JOIN tau)
      SELECT CAST(MAX(tau) AS BIGINT) AS tau_rows,
             COUNT(*) AS n_keys,
             COUNT(*) FILTER (WHERE splits > 1) AS n_hot_keys,
             CAST(COALESCE(SUM(c) FILTER (WHERE splits > 1), 0) AS BIGINT) AS hot_rows,
             CAST(COALESCE(SUM(splits) FILTER (WHERE splits > 1), 0) AS BIGINT) AS n_splits,
             CAST(MAX(c) AS BIGINT) AS max_before,
             CAST(MAX((c + splits - 1) // splits) AS BIGINT) AS max_after
      FROM plan
    """.stripMargin.trim))

  /** Salted REPLICATED join — the execution twin of
    * [[skewSaltPlan]] and the join-side sibling of
    * [[saltedAgg]]: the fact side adds a row-hash salt ∈ [0, S), the
    * dimension side replicates ×S via explode(sequence), and the join
    * key becomes (key, salt) — one hot key's rows now land on S
    * reducers instead of one. The result is EXACTLY the plain join's
    * (the oracle is the unsalted SQL): salting only re-partitions the
    * work. Decimal revenue keeps the aggregation bit-identical. At
    * 100 TB the S factor comes from the salt plan's per-key `splits`;
    * the uniform S here keeps the demonstration oracle-checkable while
    * exercising the identical physical shape.
    */
  val saltedJoin: QueryDef = QueryDef(
    "scale_salted_replicated_join",
    (s, dir) => {
      val S = 8
      val fact = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .withColumn("salt", pmod(xxhash64(col("l_partkey"), col("l_extendedprice"),
          col("l_discount")), lit(S)).cast("int"))
      val dim = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))
        .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
      fact.join(dim,
          fact("l_partkey") === dim("p_partkey") && fact("salt") === dim("salt"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(D) *
            (lit(1).cast(D) - col("l_discount").cast(D)))
            .cast("double").as("revenue"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand
    """.stripMargin.trim))

  /** AQE skew-join splitting — the RUNTIME leg of the skew family
    * ([[skewSaltPlan]] plans the salt, [[saltedJoin]] executes a manual
    * salt; this lets the engine split the hot partition itself). The
    * fact side funnels ~30% of lineitem rows onto one hot product key
    * (the canonical best-seller skew), broadcast is disabled so the
    * sort-merge join genuinely shuffles by the skewed key, and the AQE
    * thresholds are scoped to local volumes (the defaults assume the
    * 256 MB-partition regime where this fires on its own at 100 TB).
    * `OptimizeSkewedJoin` then rewrites the hot partition into N
    * sub-partitions joined against a replicated dim slice — exactly the
    * salted-replicated plan, but decided from runtime statistics with
    * zero query rewrite. WaveFSpec asserts `isSkew=true` on the
    * executed SMJ and that row-level results equal the plain join.
    *
    * At 100 TB this is the default posture: leave AQE skew handling on
    * and reserve manual salting for skew the optimizer cannot see
    * (e.g. post-filter explosion). Same aggregate oracle as the manual
    * salt twin, so the two plans are provably interchangeable.
    */
  val aqeSkewJoin: QueryDef = QueryDef(
    "scale_aqe_skew_join",
    (s0, dir) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // a skewed reduce partition is split along MAPPER block boundaries,
      // and the local testdata is ONE parquet row group = one map task =
      // one unsplittable block; the round-robin repartition stands in for
      // the multi-mapper scan a real table has (at 100 TB the scan itself
      // produces thousands of map outputs and this line is dropped)
      val fact = Tables.lineitem(s, dir)
        .select(
          when(pmod(col("l_partkey"), lit(10)) < 3, lit(1L))
            .otherwise(col("l_partkey")).as("hot_key"),
          col("l_extendedprice").cast(D).as("price"))
        .repartition(8)
      val dim = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))
      fact.join(dim, col("hot_key") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(col("price")).cast("double").as("total_price"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      FROM (SELECT CASE WHEN l_partkey % 10 < 3 THEN 1 ELSE l_partkey END AS hot_key,
                   l_extendedprice
            FROM lineitem) f
      JOIN part ON hot_key = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand
    """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(saltedAgg, bloomPruneJoin, zorderLayout, incrementalAggMerge, weightedPps,
      twoStageCumsum, zonemapPrune, joinSkewAudit, exactQuantiles, skewSaltPlan,
      saltedJoin, aqeSkewJoin)
}
