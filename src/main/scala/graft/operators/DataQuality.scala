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

  val defs: Seq[QueryDef] = Seq(constraints)
}
