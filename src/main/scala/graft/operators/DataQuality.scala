package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Deequ-style declarative data-quality audit: one row per constraint
  * with checked/violation counts and the violation rate — the
  * verification layer a 100 TB ingest runs before admitting a snapshot
  * downstream. Each constraint is a scan + keyed anti-join or predicate
  * count (never row-by-row validation): referential integrity is a
  * left-anti equi-join on the key (broadcastable dim at small scale,
  * shuffled hash join at 100 TB), uniqueness is a hash aggregation on
  * the key, range checks are pushdown-friendly predicates. A clean
  * corpus yields all-zero violations — the audit's PASS artifact; the
  * spec injects orphans/dups/negatives and pins that each check counts
  * exactly them.
  */
object DataQuality {

  /** One audit row: name + checked/violations (both driverless 1-row
    * aggregates, crossJoined — the whitelisted broadcast-scalar shape).
    */
  private def check(name: String, checked: DataFrame, violations: Column,
      violFrame: DataFrame): DataFrame =
    checked.agg(count(lit(1)).as("n_checked"))
      .crossJoin(violFrame.agg(coalesce(violations, lit(0L)).as("n_violations")))
      .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))

  val constraints: QueryDef = QueryDef(
    "audit_constraints",
    (s, dir) => {
      val lineitem = Tables.lineitem(s, dir)
      val orders = Tables.orders(s, dir)
      val customer = Tables.customer(s, dir)
      val events = Tables.events(s, dir)
      val rows = Seq(
        check("lineitem_order_fk", lineitem,
          sum(lit(1L)),
          lineitem.join(orders.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")),
        check("orders_customer_fk", orders,
          sum(lit(1L)),
          orders.join(customer.select("c_custkey"),
            col("o_custkey") === col("c_custkey"), "left_anti")),
        check("event_id_unique", events,
          sum(col("c") - 1),
          events.groupBy("event_id").agg(count(lit(1)).as("c"))
            .filter(col("c") > 1)),
        check("lineitem_qty_positive", lineitem,
          sum(lit(1L)),
          lineitem.filter(col("l_quantity") <= 0)),
        check("orders_date_in_range", orders,
          sum(lit(1L)),
          orders.filter(col("o_orderdate") < lit("1990-01-01") ||
            col("o_orderdate") > lit("2005-01-01"))))
      rows.reduce(_.unionByName(_))
        .select(col("check_name"), col("n_checked"), col("n_violations"),
          (col("n_violations").cast("double") / col("n_checked")).as("violation_rate"))
        .orderBy("check_name")
    },
    Some("""
      WITH checks AS (
        SELECT 'lineitem_order_fk' AS check_name,
               (SELECT COUNT(*) FROM lineitem) AS n_checked,
               (SELECT COUNT(*) FROM lineitem l ANTI JOIN orders o
                  ON l.l_orderkey = o.o_orderkey) AS n_violations
        UNION ALL
        SELECT 'orders_customer_fk',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o ANTI JOIN customer c
                  ON o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT 'event_id_unique',
               (SELECT COUNT(*) FROM events),
               (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
                FROM (SELECT COUNT(*) AS c FROM events GROUP BY event_id) g
                WHERE c > 1)
        UNION ALL
        SELECT 'lineitem_qty_positive',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
        UNION ALL
        SELECT 'orders_date_in_range',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders
                WHERE o_orderdate < DATE '1990-01-01'
                   OR o_orderdate > DATE '2005-01-01'))
      SELECT check_name, n_checked, n_violations,
             CAST(n_violations AS DOUBLE) / n_checked AS violation_rate
      FROM checks
      ORDER BY check_name
    """.stripMargin.trim))

  /** Benford first-digit audit over order totals — the fraud /
    * fabricated-data screen: naturally-grown multiplicative amounts
    * follow log10(1+1/d); a synthesized or truncated column does not.
    * Expected shares ride as the nine FIXED ppm constants of the
    * Benford law (precomputed, so no runtime log and no float-library
    * hazard); per digit the audit emits observed count, observed ppm
    * (widened DIV), expected ppm, and the absolute deviation — the
    * summary statistic (max deviation ≈ a discrete KS) rides on every
    * row. One scan, first digit by string head (exact for the DECIMAL
    * cents rendering both engines share), one 9-row rollup.
    */
  val benford: QueryDef = QueryDef(
    "audit_benford_first_digit",
    (s, dir) => {
      import s.implicits._
      // log10(1 + 1/d) in ppm, d = 1..9 — law constants, not computed
      val benfordPpm = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
        66947L, 57992L, 51153L, 45757L)
      val expected = benfordPpm.zipWithIndex
        .map { case (p, i) => (i + 1L, p) }
        .toDF("digit", "expected_ppm")
      val digits = Tables.orders(s, dir)
        .select(substring(col("o_totalprice").cast("decimal(12,2)").cast("string"), 1, 1)
          .cast("long").as("digit"))
        .filter(col("digit") >= 1)
        .groupBy("digit").agg(count(lit(1)).as("observed"))
      digits
        .join(broadcast(expected), Seq("digit"), "right_outer")
        .select(col("digit"),
          coalesce(col("observed"), lit(0L)).as("observed"),
          col("expected_ppm"))
        .withColumn("n", expr("SUM(observed) OVER ()"))
        .withColumn("observed_ppm", expr(
          "CAST((CAST(observed AS DECIMAL(38,0)) * 1000000) DIV n AS BIGINT)"))
        .withColumn("abs_dev_ppm", abs(col("observed_ppm") - col("expected_ppm")))
        .withColumn("max_dev_ppm", expr("MAX(abs_dev_ppm) OVER ()"))
        .select("digit", "observed", "observed_ppm", "expected_ppm",
          "abs_dev_ppm", "max_dev_ppm")
        .orderBy("digit")
    },
    Some("""
      WITH expected AS (
        SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
          (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
          (9, 45757)) t(digit, expected_ppm)),
      digits AS (
        SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               COUNT(*) AS observed
        FROM orders
        WHERE CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1) AS BIGINT) >= 1
        GROUP BY 1),
      joined AS (
        SELECT e.digit, COALESCE(d.observed, 0) AS observed,
               CAST(e.expected_ppm AS BIGINT) AS expected_ppm
        FROM expected e LEFT JOIN digits d ON e.digit = d.digit),
      scored AS (
        SELECT CAST(digit AS BIGINT) AS digit, CAST(observed AS BIGINT) AS observed,
               CAST((CAST(observed AS HUGEINT) * 1000000)
                    // SUM(observed) OVER () AS BIGINT) AS observed_ppm,
               expected_ppm
        FROM joined)
      SELECT digit, observed, observed_ppm, expected_ppm,
             ABS(observed_ppm - expected_ppm) AS abs_dev_ppm,
             CAST(MAX(ABS(observed_ppm - expected_ppm)) OVER () AS BIGINT) AS max_dev_ppm
      FROM scored
      ORDER BY digit
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(constraints, benford)
}
