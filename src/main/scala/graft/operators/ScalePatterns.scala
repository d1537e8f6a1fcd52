package graft.operators

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

  val defs: Seq[QueryDef] = Seq(saltedAgg, bloomPruneJoin)
}
