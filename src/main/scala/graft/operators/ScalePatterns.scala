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

  val defs: Seq[QueryDef] = Seq(saltedAgg)
}
