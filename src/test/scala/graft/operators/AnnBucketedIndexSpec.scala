package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The on-disk form of the ANN index: the signature table persisted
  * `bucketBy(label)`. The pinned in-memory index (AnnSearch.index) serves
  * broadcast probes; bucketing is what a 100 TB deployment adds for
  * BATCH scoring, where the query side is itself corpus-sized and cannot
  * broadcast — a label-keyed self-join over a bucketed table reads
  * matching buckets directly, with no Exchange on either side.
  */
class AnnBucketedIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withNorm = {
    graft.functions.VectorExpressions.register(spark)
    Tables.embeddings(spark, dir).select(
      col("vec_id"), col("label"), col("embedding"),
      expr("sqrt(float_dot(embedding, embedding))").as("nrm"))
  }

  test("bucketed signature table: batch label-join scoring plans no index-side Exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // corpus-sized query side: no broadcast
    try {
      withNorm.write
        .bucketBy(8, "label").sortBy("label")
        .mode("overwrite").saveAsTable("ann_index_bucketed")

      def score(t: org.apache.spark.sql.DataFrame) =
        t.as("q").join(t.as("c"),
            col("q.label") === col("c.label") && col("q.vec_id") < col("c.vec_id"))
          .select(col("q.vec_id").as("ia"), col("c.vec_id").as("ib"),
            (expr("float_dot(q.embedding, c.embedding)") / (col("q.nrm") * col("c.nrm"))).as("cos"))

      val bucketed = score(spark.table("ann_index_bucketed"))
      val unbucketed = score(withNorm)
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length

      assert(bucketed.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
      assert(exchanges(bucketed) == 0,
        s"bucketed batch scoring still shuffles (${exchanges(bucketed)} exchanges)")
      assert(exchanges(unbucketed) >= 2, "control: raw-parquet join should shuffle both sides")

      // identical scores either way (same IEEE ops, only layout differs)
      val a = bucketed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val b = unbucketed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b && a.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS ann_index_bucketed")
    }
  }
}
