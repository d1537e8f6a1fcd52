package graft.functions

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Scalar / higher-order / window function batteries — wide coverage of
  * the built-in function surface, each column chosen so Spark and DuckDB
  * compute the identical value (ASCII-only inputs so binary collation
  * agrees; integer arithmetic or single-IEEE-op doubles; OOB array access
  * via try_element_at ↔ DuckDB's NULL-on-OOB indexing).
  *
  * Everything here is whole-stage-codegen'd scalar work over a single
  * scan — the per-row function surface a 100 TB ETL job spends most of
  * its cycles in, so breadth here is breadth of the engine's hot path.
  */
object FunctionBatteries {

  val stringBattery: QueryDef = QueryDef(
    "func_string_battery",
    (s, dir) => {
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          reverse(col("p_name")).as("rev"),
          lpad(col("p_name"), 12, "*").as("lp"),
          rpad(col("p_name"), 12, "*").as("rp"),
          repeat(substring(col("p_name"), 1, 2), 3).as("rep"),
          instr(col("p_name"), "o").cast("long").as("pos_o"),
          expr("split_part(p_name, ' ', 1)").as("first_word"),
          expr("left(p_name, 3)").as("l3"),
          expr("right(p_name, 3)").as("r3"),
          ascii(col("p_name")).cast("long").as("first_code"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowel_up"),
          length(col("p_name")).cast("long").as("len"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey,
             reverse(p_name) AS rev,
             lpad(p_name, 12, '*') AS lp,
             rpad(p_name, 12, '*') AS rp,
             repeat(left(p_name, 2), 3) AS rep,
             CAST(strpos(p_name, 'o') AS BIGINT) AS pos_o,
             split_part(p_name, ' ', 1) AS first_word,
             left(p_name, 3) AS l3,
             right(p_name, 3) AS r3,
             CAST(ascii(p_name) AS BIGINT) AS first_code,
             translate(p_name, 'aeiou', 'AEIOU') AS vowel_up,
             CAST(len(p_name) AS BIGINT) AS len
      FROM part
      ORDER BY p_partkey
    """.stripMargin.trim))

  val datetimeBattery: QueryDef = QueryDef(
    "func_datetime_battery",
    (s, dir) => {
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          month(col("o_orderdate")).cast("long").as("mon"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"),
          trunc(col("o_orderdate"), "month").as("month_start"),
          last_day(col("o_orderdate")).as("month_end"),
          add_months(col("o_orderdate"), 1).as("next_month"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since_epoch0"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             CAST(month(o_orderdate) AS BIGINT) AS mon,
             CAST(day(o_orderdate) AS BIGINT) AS dom,
             CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             last_day(o_orderdate) AS month_end,
             CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
             CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch0,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders
      ORDER BY o_orderkey
    """.stripMargin.trim))

  val arrayBattery: QueryDef = QueryDef(
    "func_array_battery",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("ts", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("ts")).cast("long").as("n_tok"),
          size(array_distinct(col("ts"))).cast("long").as("n_uniq"),
          array_join(slice(sort_array(col("ts")), 1, 3), ",").as("sorted_head"),
          array_contains(col("ts"), "the").as("has_the"),
          array_max(col("ts")).as("max_tok"),
          array_min(col("ts")).as("min_tok"),
          expr("try_element_at(ts, 7)").as("tok7"),
          expr("try_element_at(reverse(ts), 1)").as("last_tok"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(len(ts) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(ts)) AS BIGINT) AS n_uniq,
             array_to_string(list_sort(ts)[1:3], ',') AS sorted_head,
             list_contains(ts, 'the') AS has_the,
             list_max(ts) AS max_tok,
             list_min(ts) AS min_tok,
             ts[7] AS tok7,
             list_reverse(ts)[1] AS last_tok
      FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) t
      ORDER BY doc_id
    """.stripMargin.trim))

  val hofBattery: QueryDef = QueryDef(
    "func_hof_battery",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("ts", split(col("text"), " "))
        .select(
          col("doc_id"),
          expr("aggregate(transform(ts, t -> CAST(length(t) AS BIGINT)), 0L, (a, b) -> a + b)")
            .as("total_chars"),
          expr("CAST(size(filter(ts, t -> length(t) > 4)) AS BIGINT)").as("n_long"),
          expr("exists(ts, t -> t = 'the')").as("any_the"),
          expr("forall(ts, t -> length(t) < 20)").as("all_short"),
          expr("CAST(aggregate(zip_with(ts, reverse(ts), (a, b) -> IF(a = b, 1L, 0L)), 0L, (a, b) -> a + b) AS BIGINT)")
            .as("palindromic_positions"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ts, t -> CAST(len(t) AS BIGINT))), (a, b) -> a + b) AS total_chars,
             CAST(len(list_filter(ts, t -> len(t) > 4)) AS BIGINT) AS n_long,
             len(list_filter(ts, t -> t = 'the')) > 0 AS any_the,
             len(list_filter(ts, t -> len(t) >= 20)) = 0 AS all_short,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len(ts)),
                 i -> CASE WHEN ts[CAST(i AS INT)] = list_reverse(ts)[CAST(i AS INT)] THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
               (a, b) -> a + b) AS palindromic_positions
      FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) t
      ORDER BY doc_id
    """.stripMargin.trim))

  val rankBattery: QueryDef = QueryDef(
    "window_rank_battery",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // ordering by year gives heavy ties → rank/dense_rank/percent_rank/
      // cume_dist all diverge from row_number and from each other
      val w = Window.partitionBy("o_orderpriority").orderBy(year(col("o_orderdate")))
      Tables.orders(s, dir)
        .select(
          col("o_orderpriority"),
          year(col("o_orderdate")).cast("long").as("yr"),
          col("o_orderkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderpriority", "yr", "o_orderkey")
    },
    Some("""
      SELECT o_orderpriority,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             o_orderkey,
             CAST(rank() OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             percent_rank() OVER w AS prnk,
             cume_dist() OVER w AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY year(o_orderdate))
      ORDER BY o_orderpriority, yr, o_orderkey
    """.stripMargin.trim))

  val jsonBattery: QueryDef = QueryDef(
    "func_json_battery",
    (s, dir) => {
      Tables.events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_int"),
          get_json_object(col("props"), "$.missing").as("k_missing"),
          expr("from_json(props, 'k BIGINT').k").as("k_parsed"),
          to_json(struct(col("event_id").as("id"), col("event_type").as("t")))
            .as("reserialized"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id,
             json_extract_string(props, '$.k') AS k_str,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
             json_extract_string(props, '$.missing') AS k_missing,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed,
             json_object('id', event_id, 't', event_type) AS reserialized
      FROM events
      ORDER BY event_id
    """.stripMargin.trim))

  val regexpBattery: QueryDef = QueryDef(
    "func_regexp_battery",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("long").as("n_runs"),
          regexp_extract(col("text"), "([a-z]{6,})", 1).as("first_long_word"),
          col("text").rlike("the").as("has_the"),
          regexp_replace(col("text"), "[aeiou]", "_").as("devoweled"),
          size(split(col("text"), "\\s+")).cast("long").as("n_ws_fields"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_runs,
             regexp_extract(text, '([a-z]{6,})', 1) AS first_long_word,
             regexp_matches(text, 'the') AS has_the,
             regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
             CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_ws_fields
      FROM documents
      ORDER BY doc_id
    """.stripMargin.trim))

  val argAggBattery: QueryDef = QueryDef(
    "agg_argminmax_bitops",
    (s, dir) => {
      // the synthetic lineitem is NOT keyed by (orderkey, linenumber) —
      // duplicate pairs exist at every SF — so the ordering value must
      // break ties all the way down to the returned column itself, or
      // min_by/max_by winners are engine-dependent (caught at sf0.001).
      // 128-bit key (DECIMAL(38,0) here, HUGEINT in the twin): the r5
      // BIGINT form overflowed into the neighbouring (orderkey,
      // linenumber) bucket once partkey ≥ its multiplier; partkey's
      // domain is SF-dependent (SF×200k), so no 64-bit multiplier is
      // provably safe at every SF — 10^10 clears partkey at any
      // conceivable SF and the 128-bit product can't wrap
      val ord = (col("l_orderkey") * 10 + col("l_linenumber")).cast("decimal(28,0)") *
        lit(10000000000L) + col("l_partkey")
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          min_by(col("l_partkey"), ord).as("first_part"),
          max_by(col("l_partkey"), ord).as("last_part"),
          count_if(col("l_quantity") > 25).as("n_bulk"),
          expr("bit_and(l_partkey)").as("band"),
          expr("bit_or(l_partkey)").as("bor"),
          expr("bit_xor(l_partkey)").as("bxor"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             arg_min(l_partkey, CAST(l_orderkey * 10 + l_linenumber AS HUGEINT) * 10000000000 + l_partkey) AS first_part,
             arg_max(l_partkey, CAST(l_orderkey * 10 + l_linenumber AS HUGEINT) * 10000000000 + l_partkey) AS last_part,
             CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
             bit_and(l_partkey) AS band,
             bit_or(l_partkey) AS bor,
             bit_xor(l_partkey) AS bxor
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """.stripMargin.trim))

  /** Spark 4 VARIANT round-trip: build a nested JSON document from
    * typed columns, `parse_json` it into a VARIANT, and extract typed
    * leaves back out with `variant_get` (path navigation into objects,
    * arrays, and nested structs) plus `try_variant_get` for a
    * type-mismatch → NULL probe. VARIANT is the semi-structured scale
    * path (binary-encoded, shredder-friendly — no per-query string
    * re-parse), and the oracle closes the loop end-to-end: every
    * extracted leaf must equal the source column it was serialized
    * from, so a DuckDB match proves the whole
    * struct→JSON→VARIANT→typed-leaf chain is lossless. Projection-only
    * — whole-stage codegen, no shuffle beyond the final ORDER BY.
    */
  val variantBattery: QueryDef = QueryDef(
    "func_variant_battery",
    (s, dir) => {
      val v = parse_json(to_json(struct(
        col("l_orderkey").as("k"), col("l_quantity").as("q"),
        array(col("l_returnflag"), col("l_linestatus")).as("flags"),
        struct(col("l_suppkey").as("s")).as("nest"))))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          variant_get(v, "$.k", "bigint").as("vk"),
          variant_get(v, "$.q", "double").as("vq"),
          variant_get(v, "$.flags[1]", "string").as("vflag2"),
          variant_get(v, "$.nest.s", "bigint").as("vnest"),
          variant_get(v, "$.missing", "string").as("vmissing"),
          try_variant_get(v, "$.flags", "bigint").as("vbadtype"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // the full value tuple makes the emitted order total up to
        // identical rows (where order cannot matter)
        .orderBy("l_orderkey", "l_linenumber", "vnest", "vq", "vflag2")
    },
    Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_orderkey AS vk,
             l_quantity AS vq,
             l_linestatus AS vflag2,
             l_suppkey AS vnest,
             CAST(NULL AS VARCHAR) AS vmissing,
             CAST(NULL AS BIGINT) AS vbadtype
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, vnest, vq, vflag2
    """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(stringBattery, datetimeBattery, arrayBattery, hofBattery, rankBattery,
      jsonBattery, regexpBattery, argAggBattery, variantBattery)
}
