package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryDef, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two variants, same scoring expression:
  *  - brute-force cosine top-k: the exactness baseline. Query set ⋈ full
  *    corpus; at cluster scale the corpus side stays partitioned and the
  *    (small) query set broadcasts, so the join is shuffle-free.
  *  - IVF-style cluster-pruned top-k: candidates restricted to the query's
  *    cluster (`label` = the precomputed coarse-quantizer assignment).
  *    Cuts the candidate set by the cluster count — this is the 100 TB
  *    path; the corpus can additionally be stored bucketed by label so
  *    the probe join is co-located.
  *
  * Dot products fold left-to-right in double on both engines (Spark
  * `aggregate` HOF vs DuckDB `list_reduce`), so scores are bit-identical
  * and the (cos DESC, vec_id ASC) ranking is deterministic.
  */
object AnnSearch {

  private def withNorm(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("label"), col("embedding"),
      expr("sqrt(float_dot(embedding, embedding))").as("nrm"))

  private val dotExpr = "float_dot(q.embedding, c.embedding)"

  private def topk(s: SparkSession, dir: String, sameClusterOnly: Boolean): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val e = withNorm(Tables.embeddings(s, dir)).cache()  // query + corpus sides
    val queries = e.filter(col("vec_id") < 10)
    val joinCond =
      if (sameClusterOnly)
        col("q.label") === col("c.label") && col("q.vec_id") =!= col("c.vec_id")
      else
        col("q.vec_id") =!= col("c.vec_id")
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cand_id"))
    broadcast(queries).as("q").join(e.as("c"), joinCond)
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("cand_id"),
        (expr(dotExpr) / (col("q.nrm") * col("c.nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("qid", "rank", "cand_id", "cos")
      .orderBy("qid", "rank")
  }

  private def topkSql(clusterPred: String): String =
    s"""
      WITH e AS (
        SELECT vec_id, label, embedding,
               sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS nrm
        FROM embeddings),
      scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS cand_id,
               list_reduce(list_transform(generate_series(1, len(q.embedding)),
                 i -> CAST(q.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)),
                 (x, y) -> x + y) / (q.nrm * c.nrm) AS cos
        FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id != c.vec_id $clusterPred),
      ranked AS (
        SELECT qid, cand_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cand_id ASC) AS BIGINT) AS rank
        FROM scored)
      SELECT qid, rank, cand_id, cos FROM ranked
      WHERE rank <= 5
      ORDER BY qid, rank
    """.stripMargin.trim

  val bruteForce: QueryDef = QueryDef(
    "ann_cosine_topk_bruteforce",
    (s, dir) => topk(s, dir, sameClusterOnly = false),
    Some(topkSql("")))

  val ivfLabel: QueryDef = QueryDef(
    "ann_cosine_topk_ivf",
    (s, dir) => topk(s, dir, sameClusterOnly = true),
    Some(topkSql("AND q.label = c.label")))

  val defs: Seq[QueryDef] = Seq(bruteForce, ivfLabel)
}
