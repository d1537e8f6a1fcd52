package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural invariants of the cell-scoped k-NN graph: edge counts are
  * exactly min(3, cellmates) per vector, and no edge crosses an IVF
  * cell boundary (the scope that makes the build O(Σ cell²)).
  */
class KnnGraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every vector has min(3, cellmates) edges, all inside its own cell") {
    val g = AnnSearch.knnGraph.run(spark, dir)
    val lab = graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val cell = lab.groupBy("label").agg(count(lit(1)).as("cellN"))
    val degrees = g.groupBy("qid").agg(count(lit(1)).as("deg"))
    val bad = lab.join(cell, "label")
      .join(degrees, col("vec_id") === col("qid"), "left")
      .withColumn("expect", least(lit(3L), col("cellN") - 1))
      .filter(coalesce(col("deg"), lit(0L)) =!= col("expect"))
      .count()
    assert(bad == 0, s"$bad vectors with wrong edge count")

    val crossCell = g
      .join(lab.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
      .join(lab.select(col("vec_id").as("cand_id"), col("label").as("cl")), "cand_id")
      .filter(col("ql") =!= col("cl")).count()
    assert(crossCell == 0, s"$crossCell edges cross a cell boundary")
  }
}
