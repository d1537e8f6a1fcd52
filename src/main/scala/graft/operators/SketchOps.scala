package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Fixed-memory frequency sketches with cross-engine determinism.
  *
  * Count-min here is exercised as its accuracy AUDIT: the query builds
  * the sketch, probes it for the exact top-20 heavy hitters, and emits
  * the per-key overestimate — hash-gated against DuckDB computing the
  * identical integer pipeline, so an estimator regression (wrong hash,
  * wrong min, wrong cell math) flips exact values, not a tolerance.
  *
  * Scale shape: the sketch is d·w = 3·512 integer cells regardless of
  * input size. Cell totals come from a keyed hash aggregation whose
  * partial (map-side) combine IS the sketch's mergeability — addition is
  * associative, so 1000 executors each fold their partition into d·w
  * cells and the reduce merges sketches, never rows. The probe touches
  * exactly d cells per key. Hashes are the house md5-hex uniform
  * ([[ScalePatterns.hexIntSpark]]) — the one function both engines
  * agree on bit-for-bit.
  */
object SketchOps {

  private val D = 3      // hash rows
  private val W = 512    // cells per row

  val countMin: QueryDef = QueryDef(
    "sketch_countmin_heavyhitters",
    (s, dir) => {
      val exact = Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("c"))
      val expl = exact.select(col("user_id"), col("c"),
          explode(array((0 until D).map(lit): _*)).as("j"))
        .withColumn("h", expr(ScalePatterns.hexIntSpark(
          "md5(CAST(CONCAT(CAST(j AS STRING), ':', CAST(user_id AS STRING)) AS BINARY))")) % W)
      val cells = expl.groupBy("j", "h").agg(sum(col("c")).as("cell_total"))
      expl.join(cells, Seq("j", "h"))
        .groupBy("user_id")
        .agg(min(col("cell_total")).as("cm_est"), min(col("c")).as("n_exact"))
        .select(col("user_id"), col("n_exact"), col("cm_est"),
          (col("cm_est") - col("n_exact")).as("overestimate"))
        .orderBy(desc("n_exact"), asc("user_id"))
        .limit(20)
    },
    Some(s"""
      WITH exact AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
      expl AS (
        SELECT user_id, c, j,
               (${ScalePatterns.hexIntDuck(
                 "md5(CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))")}) % $W AS h
        FROM exact, UNNEST([${(0 until D).mkString(", ")}]) AS t(j)),
      cells AS (SELECT j, h, CAST(SUM(c) AS BIGINT) AS cell_total
                FROM expl GROUP BY 1, 2),
      est AS (
        SELECT e.user_id, MIN(cl.cell_total) AS cm_est, MIN(e.c) AS n_exact
        FROM expl e JOIN cells cl USING (j, h) GROUP BY 1)
      SELECT user_id, n_exact, cm_est, cm_est - n_exact AS overestimate
      FROM est
      ORDER BY n_exact DESC, user_id
      LIMIT 20
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(countMin)
}
