package graft

import org.apache.spark.sql.functions._

/** Spark 4 SQL UDFs (`CREATE FUNCTION ... RETURN <expr>`, SPARK-46057) —
  * the CHEAPEST vehicle on the §2.10 UDF ladder: the body is inlined
  * into the plan at resolution time (no function-call node survives, as
  * asserted below), so a SQL UDF costs exactly its expression — full
  * whole-stage codegen, full pushdown through it — where a Scala UDF is
  * an opaque lambda that blocks both. The reference's scalar transforms
  * (T5 strip, F2 size gates, quality clamps) are all expressible at
  * this tier; the native-Expression tier (semver_clean) stays reserved
  * for logic SQL cannot express.
  */
class SqlUdfSpec extends SparkSpec {

  import SparkSpec.spark

  test("SQL UDF inlines to a native expression — no call node, codegen intact") {
    val s = spark.newSession()
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
             RETURNS DOUBLE RETURN p * (1.0 - d)""")
    graft.Tables.lineitem(s, "/root/testdata/sf0.001")
      .createOrReplaceTempView("li_sqludf")
    val df = s.sql(
      "SELECT SUM(disc_price(l_extendedprice, l_discount)) AS s FROM li_sqludf")
    // collect() (not head(): that spawns a separate limited execution)
    // so THIS queryExecution runs and AQE finalizes its plan
    val got = df.collect()(0).getDouble(0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("disc_price"), "UDF call node survived inlining")
    assert(plan.contains("(1.0 - d#") || plan.contains("(1.0 - l_discount"),
      s"inlined expression body missing:\n$plan")
    assert(plan.contains("*("), "whole-stage codegen lost")
    val direct = graft.Tables.lineitem(s, "/root/testdata/sf0.001")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .head.getDouble(0)
    assert(got == direct)
  }

  test("SQL UDF predicates push down to the scan") {
    val s = spark.newSession()
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION is_urgent(p STRING)
             RETURNS BOOLEAN RETURN p = '1-URGENT'""")
    graft.Tables.orders(s, "/root/testdata/sf0.001")
      .createOrReplaceTempView("ord_sqludf")
    val df = s.sql("SELECT COUNT(*) AS n FROM ord_sqludf WHERE is_urgent(o_orderpriority)")
    // inlined to a plain equality => it reaches the parquet scan
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]"),
      s"predicate did not push down:\n$scan")
    assert(df.head.getLong(0) ==
      graft.Tables.orders(s, "/root/testdata/sf0.001")
        .filter(col("o_orderpriority") === "1-URGENT").count())
  }
}
