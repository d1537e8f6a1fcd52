package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}

/** Relational query surface over the driver's TPC-H-ish tables.
  *
  * The reference (adeepbiswas/NPM-Mirror) implements no relational
  * operators itself — SURVEY.md §2.11 lists them as explicitly absent —
  * so this is the Catalyst-built-in layer our engine provides on top of
  * the mirrored-catalog data model. Every query here has a DuckDB oracle.
  *
  * Determinism conventions (driver hash-compares Spark vs DuckDB):
  *  - money/quantity doubles are cast to DECIMAL(12,2) before aggregation
  *    so sums are exact (no float accumulation-order divergence), then the
  *    final value is cast back to DOUBLE identically on both sides;
  *  - averages are computed as CAST(exact_sum AS DOUBLE) / COUNT so both
  *    engines perform the same single IEEE division;
  *  - every query ends in a total ORDER BY over its key columns;
  *  - integer-ish outputs are cast to BIGINT (Spark LongType) because
  *    DuckDB widens most integer functions to BIGINT.
  */
object Relational {

  private val D = DecimalType(12, 2)
  /** Exact per-row discounted price: extendedprice * (1 - discount) in decimal. */
  private def discPrice: Column =
    col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D))

  val defs: Seq[QueryDef] = Seq(

    // ---- q1: scan + filter + hash aggregate (TPC-H Q1 shape) -------------
    // Pushdown check: filter on l_shipdate reaches the parquet scan;
    // partial aggregation (map-side combine) before the single shuffle.
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast(D)).cast("double").as("sum_base_price"),
            sum(discPrice).cast("double").as("sum_disc_price"),
            (sum(col("l_quantity").cast(D)).cast("double") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim)),

    // ---- q3: 3-way join + agg + top-k (TPC-H Q3 shape) -------------------
    // customer is small relative to lineitem: Catalyst broadcast-joins the
    // filtered customer/orders side; revenue agg shuffles once on orderkey.
    QueryDef(
      "q3_shipping_priority",
      (s, dir) => {
        val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val ord  = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val li   = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum(discPrice).cast("double").as("revenue"))
          .orderBy(desc("revenue"), asc("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
      """.stripMargin.trim)),

    // ---- q5: 6-way star join (TPC-H Q5 shape) ----------------------------
    // region/nation/supplier/customer are dimension-sized → broadcast;
    // only the orders⋈lineitem edge shuffles.
    QueryDef(
      "q5_local_supplier_volume",
      (s, dir) => {
        val reg = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        val nat = Tables.nation(s, dir)
        val cst = Tables.customer(s, dir)
        val sup = Tables.supplier(s, dir)
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li  = Tables.lineitem(s, dir)
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(cst),
            col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(discPrice).cast("double").as("revenue"))
          .orderBy(desc("revenue"), asc("n_name"))
      },
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
      """.stripMargin.trim)),

    // ---- q10: returned-item customer ranking (TPC-H Q10 shape) -----------
    QueryDef(
      "q10_returned_items",
      (s, dir) => {
        val li  = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        val ord = Tables.orders(s, dir)
        val cst = Tables.customer(s, dir)
        val nat = Tables.nation(s, dir)
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cst, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(sum(discPrice).cast("double").as("revenue"))
          .orderBy(desc("revenue"), asc("c_custkey"))
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
      """.stripMargin.trim)),

    // ---- left anti join (reference F9 "already-downloaded skip") ---------
    QueryDef(
      "join_anti_customers_without_orders",
      (s, dir) => {
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
      """.stripMargin.trim)),

    // ---- left semi join ---------------------------------------------------
    QueryDef(
      "join_semi_customers_with_urgent_orders",
      (s, dir) => {
        val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        Tables.customer(s, dir)
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
      """.stripMargin.trim)),

    // ---- window: top-k per group (reference A5/A6 moral equivalent) ------
    QueryDef(
      "window_top3_orders_per_customer",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""
        SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
          FROM orders) t
        WHERE rn <= 3
        ORDER BY o_custkey, rn
      """.stripMargin.trim)),

    // same semantics (and oracle) as window_top3_orders_per_customer, but
    // the heavy lifting runs through the custom sort-free TopKPerKey
    // physical operator (graft.plans): one streaming pass with k-bounded
    // heaps instead of a full partition sort; the window that assigns
    // ranks afterwards sees only k rows per customer.
    QueryDef(
      "window_top3_orders_native_topk",
      (s, dir) => {
        val pruned = graft.plans.TopK.perKey(
          Tables.orders(s, dir).select("o_custkey", "o_orderkey", "o_totalprice"),
          keyCols = Seq("o_custkey"),
          order = Seq(("o_totalprice", false), ("o_orderkey", true)),
          k = 3)
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        pruned
          .withColumn("rn", row_number().over(w).cast("long"))
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""
        SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
          FROM orders) t
        WHERE rn <= 3
        ORDER BY o_custkey, rn
      """.stripMargin.trim)),

    // ---- window: running aggregate ---------------------------------------
    QueryDef(
      "window_running_revenue_per_supplier",
      (s, dir) => {
        val w = Window.partitionBy("l_suppkey")
          .orderBy(asc("l_shipdate"), asc("l_orderkey"), asc("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, dir)
          .filter(col("l_suppkey") <= 10)
          .withColumn("running_qty",
            sum(col("l_quantity").cast(D)).over(w).cast("double"))
          .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "running_qty")
          .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        FROM lineitem
        WHERE l_suppkey <= 10
        ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
      """.stripMargin.trim)),

    // ---- rollup (grouping sets) ------------------------------------------
    QueryDef(
      "agg_rollup_flag_status",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
      """.stripMargin.trim)),

    // ---- exact distinct aggregation --------------------------------------
    QueryDef(
      "agg_distinct_suppliers_per_flag",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_suppkey")).as("n_suppliers"),
            countDistinct(col("l_partkey")).as("n_parts"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(DISTINCT l_partkey) AS n_parts
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """.stripMargin.trim)),

    // ---- set operations ---------------------------------------------------
    QueryDef(
      "setop_intersect_1995_1996_buyers",
      (s, dir) => {
        val ord = Tables.orders(s, dir)
        def buyers(year: Int) = ord
          .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp"))
          .filter(col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
          .select("o_custkey")
        buyers(1995).intersect(buyers(1996)).orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        ORDER BY o_custkey
      """.stripMargin.trim)),

    QueryDef(
      "setop_except_lost_buyers",
      (s, dir) => {
        val ord = Tables.orders(s, dir)
        def buyers(year: Int) = ord
          .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp"))
          .filter(col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
          .select("o_custkey")
        buyers(1995).except(buyers(1996)).orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        ORDER BY o_custkey
      """.stripMargin.trim)),

    // ---- scalar subquery (uncorrelated) ----------------------------------
    // avg computed as exact decimal sum / count → one IEEE division on both
    // sides, so the > comparison is bit-identical.
    QueryDef(
      "subquery_parts_above_avg_price",
      (s, dir) => {
        val part = Tables.part(s, dir)
        val stats = part.agg(
          (sum(col("p_retailprice").cast(D)).cast("double") / count(lit(1))).as("avg_price"))
        part.crossJoin(broadcast(stats))
          .filter(col("p_retailprice") > col("avg_price"))
          .select("p_partkey", "p_name", "p_retailprice")
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey, p_name, p_retailprice FROM part
        WHERE p_retailprice > (
          SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM part)
        ORDER BY p_partkey
      """.stripMargin.trim)),

    // ---- conditional aggregation (CASE WHEN buckets) + HAVING ------------
    QueryDef(
      "agg_price_buckets_having",
      (s, dir) => {
        Tables.orders(s, dir)
          .withColumn("bucket",
            when(col("o_totalprice") < 100000, "small")
              .when(col("o_totalprice") < 300000, "medium")
              .otherwise("large"))
          .groupBy("bucket")
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(D)).cast("double").as("total"))
          .filter(col("n_orders") > 10)
          .orderBy("bucket")
      },
      Some("""
        SELECT bucket, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM (
          SELECT o_totalprice,
                 CASE WHEN o_totalprice < 100000 THEN 'small'
                      WHEN o_totalprice < 300000 THEN 'medium'
                      ELSE 'large' END AS bucket
          FROM orders) t
        GROUP BY bucket
        HAVING COUNT(*) > 10
        ORDER BY bucket
      """.stripMargin.trim))
  )
}
