package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Curation-wave references. The synthetic corpus is domain-FLAT (one
  * 31-word near-uniform vocabulary across languages), so the oracle
  * queries' readouts legitimately show "no domain signal"; these tests
  * provide the missing half — that the scorers DISCRIMINATE when signal
  * exists — by injecting skewed corpora through the same factored cores
  * (the PrivacyOps injection discipline).
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("dsir votes separate an injected domain-skewed corpus") {
    // target docs speak {alpha..delta}, raw docs {echo..hotel}, with a
    // 20% shared word — the scorer must put every target doc positive
    // and every raw doc negative by a wide margin
    val tWords = Seq("alpha", "beta", "gamma", "delta")
    val rWords = Seq("echo", "foxtrot", "golf", "hotel")
    val rnd = new scala.util.Random(7L)
    val docs = (1 to 40).flatMap { d =>
      val target = d <= 20
      val pool = if (target) tWords else rWords
      (1 to 30).map { _ =>
        val w = if (rnd.nextInt(5) == 0) "shared" else pool(rnd.nextInt(4))
        (d.toLong, if (target) "t" else "r", w)
      }
    }.toDF("doc_id", "group", "w")
    val scores = CurationOps.dsirScores(docs, "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(scores.length == 40)
    assert(scores.filter(_._2 == "t").forall(_._3 > 0),
      "a target doc scored non-positive on a separable corpus")
    assert(scores.filter(_._2 == "r").forall(_._3 < 0),
      "a raw doc scored non-negative on a separable corpus")
  }

  test("dsir votes are flat on the real (domain-flat) corpus, as the readout claims") {
    val rows = graft.SparkEntry.queries("pipeline_dsir_domain_votes")(spark, dir)
      .collect()
    assert(rows.length == 5)
    val sep = rows.map(r => math.abs(r.getDouble(5)))
    // |en_mean - lang_mean| stays well inside one vote-per-token of the
    // ~25-token docs: no language separates
    assert(sep.forall(_ < 15.0), s"unexpected domain separation: ${sep.mkString(",")}")
  }

  test("embedding drift: per-dim means match a scalar recompute") {
    val emb = graft.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val got = graft.SparkEntry.queries("ann_embedding_dim_drift")(spark, dir).collect()
    assert(got.length == 64)
    for (r <- got.take(8)) {
      val dim = r.getLong(0).toInt
      val a = emb.filter(_._1 % 2 == 0).map(_._2(dim - 1))
      val b = emb.filter(_._1 % 2 == 1).map(_._2(dim - 1))
      assert(r.getLong(1) == a.length && r.getLong(2) == b.length)
      val meanA = a.map(x => math.floor(x * 1e10).toLong).sum.toDouble / (1e10 * a.length)
      assert(r.getDouble(3) == meanA, s"mean_a mismatch at dim $dim")
      val meanB = b.map(x => math.floor(x * 1e10).toLong).sum.toDouble / (1e10 * b.length)
      assert(r.getLong(5) == math.floor(math.abs(meanA - meanB) * 1e6).toLong)
    }
  }

  test("oov audit: injected unknown-word source ranks worst; conservation holds") {
    val rows = graft.SparkEntry.queries("text_vocab_oov_audit")(spark, dir).collect()
    // conservation: per-source token counts sum to the corpus total
    val total = graft.Tables.documents(spark, dir)
      .selectExpr("size(split(text, ' ')) AS n").agg(sum("n")).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
      // K=16 of a 31-word near-uniform vocab: every source must have
      // BOTH covered and uncovered tokens — the path is exercised
      assert(r.getLong(2) > 0 && r.getLong(2) < r.getLong(1))
    }
  }
}
