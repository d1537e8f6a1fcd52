package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-layout invariants: the shard/order/mixture formulas must be
  * deterministic (pure functions of doc_id/source), lossless (every doc
  * lands in exactly one shard at exactly one position), and integer-exact
  * (shares sum to ~1e6 with only div-truncation loss).
  */
class CorpusOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("shard pack: lossless partition of the corpus, deterministic across runs") {
    val docs = graft.Tables.documents(spark, dir)
    val packed = CorpusOps.shardPack.run(spark, dir).collect()
    assert(packed.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // every shard key is one hex nibble; re-running yields byte-identical rows
    assert(packed.forall(r => "0123456789abcdef".contains(r.getAs[String]("shard"))))
    assert(CorpusOps.shardPack.run(spark, dir).collect().toSeq == packed.toSeq)
  }

  test("training order: each doc appears exactly once, positions are dense per shard") {
    val order = CorpusOps.trainingOrder.run(spark, dir)
    val n = graft.Tables.documents(spark, dir).count()
    assert(order.select("doc_id").distinct().count() == n)
    // per shard, pos is 1..count with no gaps
    val bad = order.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
      .count()
    assert(bad == 0)
  }

  test("split manifest: splits partition the corpus; train dominates") {
    val m = CorpusOps.splitManifest.run(spark, dir).collect()
    val total = m.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.Tables.documents(spark, dir).count())
    val bySplit = m.groupBy(_.getAs[String]("split")).view.mapValues(_.map(_.getAs[Long]("n_docs")).sum)
    assert(bySplit.getOrElse("train", 0L) > total * 9 / 10)
  }

  test("epoch mixture: integer shares sum to 1e6 minus div truncation; factors >= 1") {
    val m = CorpusOps.epochMixture.run(spark, dir).collect()
    val totalShare = m.map(_.getAs[Long]("share_ppm")).sum
    val nSources = m.length
    assert(totalShare <= 1000000L && totalShare > 1000000L - nSources,
      s"share sum $totalShare outside (1e6 - $nSources, 1e6]")
    assert(m.forall(_.getAs[Long]("oversample_factor") >= 1L))
  }
}
