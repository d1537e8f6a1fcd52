package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}

/** Second tranche of relational coverage: cube, pivot, lag/lead frames,
  * full outer join, string sanitation (reference T5), timestamp
  * format/parse round-trip (reference T8/T9).
  */
object RelationalExtra {

  private val D = DecimalType(12, 2)

  /** Lower median (the ceil(n/2)-th smallest value) per group via
    * two-pass bucket refinement — the distributed selection shape that
    * never sorts a whole group (see `agg_exact_median_by_rank`'s
    * comment). Exposed as a function so MedianPropertySpec can fuzz the
    * bucket-boundary edge cases (duplicates spanning buckets, k landing
    * exactly on a bucket edge, single-row and all-equal groups) against
    * a direct sort on arbitrary data, not just the corpus.
    */
  private[operators] def lowerMedianByBucket(
      df: org.apache.spark.sql.DataFrame, groupCol: String, valCol: String,
      width: Double): org.apache.spark.sql.DataFrame = {
    val bucketed = df.select(col(groupCol), col(valCol))
      .withColumn("b", floor(col(valCol) / width))
    val hist = bucketed.groupBy(groupCol, "b").agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy(groupCol).orderBy(asc("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // group totals re-aggregate the (tiny) bucket histogram
    val totals = hist.groupBy(groupCol).agg(sum("cnt").as("n"))
    val target = hist.withColumn("cum", sum("cnt").over(wb))
      .join(totals, groupCol)
      .withColumn("k", ((col("n") + 1) / 2).cast("long"))
      // the k-th value lies in the first bucket whose cumulative count
      // crosses k; kin is the residual rank inside it
      .filter(col("cum") >= col("k") && col("cum") - col("cnt") < col("k"))
      .select(col(groupCol), col("b").as("tb"),
        (col("k") - (col("cum") - col("cnt"))).as("kin"))
    val wr = Window.partitionBy(groupCol).orderBy(asc(valCol))
    bucketed.join(broadcast(target), Seq(groupCol))
      .filter(col("b") === col("tb"))
      .withColumn("rn", row_number().over(wr).cast("long"))
      .filter(col("rn") === col("kin"))
      .select(col(groupCol), col(valCol).as("median"))
      .orderBy(groupCol)
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "agg_cube_flag_status",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
      """.stripMargin.trim)),

    QueryDef(
      "pivot_status_by_priority",
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .count()
          .select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("n_f"),
            coalesce(col("O"), lit(0L)).as("n_o"),
            coalesce(col("P"), lit(0L)).as("n_p"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """.stripMargin.trim)),

    QueryDef(
      "window_lag_lead_price_delta",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
        Tables.orders(s, dir)
          .filter(col("o_custkey") <= 100)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta_prev"),
            (lead(col("o_totalprice"), 1).over(w) - col("o_totalprice")).as("delta_next"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
               o_totalprice - LAG(o_totalprice, 1) OVER w AS delta_prev,
               LEAD(o_totalprice, 1) OVER w - o_totalprice AS delta_next
        FROM orders
        WHERE o_custkey <= 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        ORDER BY o_custkey, o_orderkey
      """.stripMargin.trim)),

    QueryDef(
      "join_full_outer_nation_counts",
      (s, dir) => {
        val cust = Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
          .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_customers"))
        val supp = Tables.supplier(s, dir).filter(col("s_acctbal") > 9000)
          .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_suppliers"))
        cust.join(supp, col("nk_c") === col("nk_s"), "full_outer")
          .select(
            coalesce(col("nk_c"), col("nk_s")).cast("long").as("nationkey"),
            coalesce(col("n_customers"), lit(0L)).as("n_customers"),
            coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
          .orderBy("nationkey")
      },
      Some("""
        WITH c AS (SELECT c_nationkey AS nk_c, COUNT(*) AS n_customers
                   FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
             s AS (SELECT s_nationkey AS nk_s, COUNT(*) AS n_suppliers
                   FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
        SELECT CAST(COALESCE(nk_c, nk_s) AS BIGINT) AS nationkey,
               COALESCE(n_customers, 0) AS n_customers,
               COALESCE(n_suppliers, 0) AS n_suppliers
        FROM c FULL OUTER JOIN s ON nk_c = nk_s
        ORDER BY nationkey
      """.stripMargin.trim)),

    // reference T5: strip every char outside [a-zA-Z0-9/]
    QueryDef(
      "t5_special_char_strip",
      (s, dir) => {
        Tables.part(s, dir)
          .select(col("p_partkey"),
            regexp_replace(concat(col("p_brand"), lit(" "), col("p_type")),
              "[^a-zA-Z0-9/]", "").as("sanitized"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               regexp_replace(p_brand || ' ' || p_type, '[^a-zA-Z0-9/]', '', 'g') AS sanitized
        FROM part
        ORDER BY p_partkey
      """.stripMargin.trim)),

    // exact median without interpolation ambiguity: lower-median by rank
    // (position ceil(n/2) in price order) — pure integer selection, no
    // float math, so it is portable where percentile() interpolation
    // isn't. Scale shape (r9): two-pass bucket refinement. The r8 form
    // built a per-DISTINCT-price histogram, but prices are ~99% unique,
    // so the "compressed" histogram was the full table and its
    // cumulative window sorted ~600k rows across #groups=3 partitions —
    // exactly the parallelism collapse the operator claims to avoid.
    // Now pass 1 aggregates coarse fixed-width buckets (fully parallel,
    // a few thousand rows out), the tiny cumulative walk locates each
    // group's median bucket and the residual rank within it, and pass 2
    // ranks ONLY the rows of that one bucket per group (~1/1000 of the
    // table after a broadcast prune). No step sorts a whole group.
    QueryDef(
      "agg_exact_median_by_rank",
      (s, dir) => {
        lowerMedianByBucket(
          Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice", 64.0)
          .withColumnRenamed("median", "median_price")
      },
      Some("""
        WITH ranked AS (
          SELECT l_returnflag, l_extendedprice,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
          FROM lineitem)
        SELECT l_returnflag, l_extendedprice AS median_price
        FROM ranked
        WHERE rn = CAST((cnt + 1) // 2 AS INT)
        ORDER BY l_returnflag
      """.stripMargin.trim)),

    // explicit GROUPING SETS through the spark.sql surface
    QueryDef(
      "agg_grouping_sets_sql",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """.stripMargin.trim)),

    // boolean aggregate battery: count_if / bool_and / bool_or
    QueryDef(
      "agg_boolean_battery",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            count_if(col("l_quantity") > 25).as("n_heavy"),
            bool_and(col("l_quantity") <= 50).as("all_le_50"),
            bool_or(col("l_discount") > 0.09).as("any_high_disc"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_heavy,
               BOOL_AND(l_quantity <= 50) AS all_le_50,
               BOOL_OR(l_discount > 0.09) AS any_high_disc
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """.stripMargin.trim)),

    // scalar conditional battery: least/greatest/nullif/coalesce on ints
    QueryDef(
      "t_scalar_conditionals",
      (s, dir) => {
        Tables.part(s, dir)
          .select(col("p_partkey"),
            least(col("p_size"), lit(25)).as("size_capped"),
            greatest(col("p_size"), lit(25)).as("size_floored"),
            nullif(col("p_size") % 10, lit(0)).as("size_mod_or_null"),
            coalesce(nullif(col("p_size") % 10, lit(0)), lit(-1)).as("size_mod_or_neg1"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               LEAST(p_size, 25) AS size_capped,
               GREATEST(p_size, 25) AS size_floored,
               NULLIF(p_size % 10, 0) AS size_mod_or_null,
               COALESCE(NULLIF(p_size % 10, 0), -1) AS size_mod_or_neg1
        FROM part
        ORDER BY p_partkey
      """.stripMargin.trim)),

    // grouping_id: disambiguates aggregation levels (NULL-as-data vs
    // NULL-as-subtotal) in rollup output
    QueryDef(
      "agg_rollup_grouping_id",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .rollup("l_returnflag", "l_linestatus")
          .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"))
          .orderBy(asc("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
      """.stripMargin.trim)),

    // first/nth_value window frame coverage over each customer's orders
    QueryDef(
      "window_first_nth_order",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, dir)
          .filter(col("o_custkey") <= 200)
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("first_orderkey"),
            nth_value(col("o_orderkey"), 3).over(w).as("third_orderkey"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
               NTH_VALUE(o_orderkey, 3) OVER w AS third_orderkey
        FROM orders
        WHERE o_custkey <= 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey
      """.stripMargin.trim)),

    // approximate sketches (HLL distinct, approximate quantiles), oracled
    // via the exact-side twin: the query computes the exact discrete
    // quantiles (value at row_number floor((n-1)·p)+1 — an actual data
    // element, so bit-identical across engines, no interpolation) and the
    // exact distinct count alongside the sketch estimates, then emits the
    // exact columns plus within-bound booleans. DuckDB recomputes the
    // exact side and expects every bound TRUE: an HLL estimate drifting
    // past 15% (rsd≈5%) or an approx_percentile answer landing outside
    // its contractual rank tolerance (n/1000) breaks the hash.
    QueryDef(
      "approx_sketches_hll_quantiles",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select("l_returnflag", "l_partkey", "l_extendedprice")
        val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        val ranked = li.select(col("l_returnflag"), col("l_extendedprice"))
          .withColumn("rn", row_number().over(w))
        val agg = li.groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          count_distinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("ap95"))
        val quant = ranked.join(agg.select("l_returnflag", "n"), "l_returnflag")
          .groupBy("l_returnflag").agg(
            max(when(col("rn") === floor((col("n") - 1) * 0.5) + 1, col("l_extendedprice"))).as("exact_p50"),
            max(when(col("rn") === floor((col("n") - 1) * 0.95) + 1, col("l_extendedprice"))).as("exact_p95"))
        // approx_percentile's contract is RANK error (<= n/accuracy), not
        // value error — bound the rank interval the returned element
        // occupies ([#rows<v + 1, #rows<=v]) against the target position,
        // with the contractual n/1000 slack (+1 for the discrete grid)
        val rankPos = li.join(agg.select("l_returnflag", "ap50", "ap95"), "l_returnflag")
          .groupBy("l_returnflag").agg(
            sum(when(col("l_extendedprice") < col("ap50"), 1L).otherwise(0L)).as("cb50"),
            sum(when(col("l_extendedprice") <= col("ap50"), 1L).otherwise(0L)).as("ca50"),
            sum(when(col("l_extendedprice") < col("ap95"), 1L).otherwise(0L)).as("cb95"),
            sum(when(col("l_extendedprice") <= col("ap95"), 1L).otherwise(0L)).as("ca95"))
        def rankOk(target: org.apache.spark.sql.Column, cb: String, ca: String) = {
          val slack = ceil(col("n") / 1000.0) + 1
          target >= col(cb) + 1 - slack && target <= col(ca) + slack
        }
        agg.join(quant, "l_returnflag").join(rankPos, "l_returnflag")
          .select(col("l_returnflag"), col("exact_parts"), col("exact_p50"), col("exact_p95"),
            (abs(col("approx_parts") - col("exact_parts")) <=
              col("exact_parts").cast("double") * 0.15).as("parts_ok"),
            rankOk(floor((col("n") - 1) * 0.5) + 1, "cb50", "ca50").as("p50_ok"),
            rankOk(floor((col("n") - 1) * 0.95) + 1, "cb95", "ca95").as("p95_ok"))
          .orderBy("l_returnflag")
      },
      Some("""
        WITH cnt AS (
          SELECT l_returnflag, count(*) AS n,
                 count(DISTINCT l_partkey) AS exact_parts
          FROM lineitem GROUP BY 1),
        ranked AS (
          SELECT l_returnflag, l_extendedprice,
                 row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn
          FROM lineitem),
        q AS (
          SELECT r.l_returnflag,
                 max(CASE WHEN rn = floor((n - 1) * 0.5) + 1 THEN l_extendedprice END) AS exact_p50,
                 max(CASE WHEN rn = floor((n - 1) * 0.95) + 1 THEN l_extendedprice END) AS exact_p95
          FROM ranked r JOIN cnt USING (l_returnflag)
          GROUP BY 1)
        SELECT l_returnflag, exact_parts, exact_p50, exact_p95,
               TRUE AS parts_ok, TRUE AS p50_ok, TRUE AS p95_ok
        FROM q JOIN cnt USING (l_returnflag)
        ORDER BY l_returnflag
      """.stripMargin.trim)),

    // reference T8/T9: ISO-8601 filename generation and parse round-trip
    QueryDef(
      "t8_t9_iso_timestamp_roundtrip",
      (s, dir) => {
        Tables.events(s, dir)
          .filter(col("event_id") < 1000)
          .select(col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso_name"))
          .withColumn("parsed_back",
            expr("CAST(to_timestamp(iso_name, \"yyyy-MM-dd'T'HH:mm:ss'Z'\") AS TIMESTAMP_NTZ)"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id,
               strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_name,
               strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), '%Y-%m-%dT%H:%M:%SZ') AS parsed_back
        FROM events
        WHERE event_id < 1000
        ORDER BY event_id
      """.stripMargin.trim)),

    // ---- correlated LATERAL top-N ----------------------------------------
    /* The third derivation of per-key top-N (after the window form and
     * the native TopKPerKey operator): a correlated LATERAL subquery
     * with ORDER BY + LIMIT per outer row — the form analysts actually
     * write. Spark decorrelates it (DecorrelateInnerQuery) into a
     * partitioned rank plan, so the executed shape is the same keyed
     * window as the twin, never a per-row nested loop — which is the
     * scale property that makes the sugar safe at 100 TB. Identical SQL
     * text runs on both engines.
     */
    QueryDef(
      "join_lateral_top3_per_customer",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_lat_orders")
        s.sql(lateralTop3Sql.replace("%T%", "graft_lat_orders"))
      },
      Some(lateralTop3Sql.replace("%T%", "orders").stripMargin.trim)),

    // ---- ordered string aggregation (listagg) ----------------------------
    /* Spark 4's ANSI `LISTAGG ... WITHIN GROUP (ORDER BY ...)` over the
     * bounded (priority × month) grain: the month roster per priority as
     * one ordered CSV — deterministic BECAUSE the within-group order is
     * total (the unordered form is partition-placement-dependent and
     * would never hash-match). DuckDB spells it string_agg(... ORDER BY),
     * same semantics. Shape: one distinct-aggregation to the bounded
     * grain, then a 5-row rollup.
     */
    QueryDef(
      "agg_listagg_ordered_months",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_la_orders")
        s.sql("""
          SELECT o_orderpriority,
                 COUNT(*) AS n_months,
                 listagg(m, ',') WITHIN GROUP (ORDER BY m) AS months
          FROM (SELECT DISTINCT o_orderpriority,
                       date_format(o_orderdate, 'yyyy-MM') AS m
                FROM graft_la_orders)
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority,
               COUNT(*) AS n_months,
               string_agg(m, ',' ORDER BY m) AS months
        FROM (SELECT DISTINCT o_orderpriority,
                     strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS m
              FROM orders)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """.stripMargin.trim))
  )

  /** Shared text of the LATERAL top-3 (both engines): per customer with
    * at least one order, the 3 highest-value orders, value-desc with
    * orderkey tiebreak to a total order. */
  private def lateralTop3Sql: String = """
    SELECT c.o_custkey, t.o_orderkey, t.o_totalprice
    FROM (SELECT DISTINCT o_custkey FROM %T% WHERE o_custkey <= 200) c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM %T% o
             WHERE o.o_custkey = c.o_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
    ORDER BY c.o_custkey, t.o_totalprice DESC, t.o_orderkey"""
}
