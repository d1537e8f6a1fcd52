package graft.multimodal

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def media(rows: (Long, String, Array[Byte])*): org.apache.spark.sql.Dataset[MediaRow] =
    rows.map { case (id, mt, bytes) =>
      MediaRow(id, MediaMeta(mt,
        width = if (mt == "image") Some(100) else None,
        height = if (mt == "image") Some(50) else None,
        sample_rate = if (mt == "audio") Some(8000) else None,
        n_frames = if (mt == "video") Some(bytes.length / 16) else None,
        codec = Some("stub")), bytes)
    }.toDS()

  test("feature extraction is deterministic and batch-shape independent") {
    val bytes = Array.tabulate(200)(i => (i % 251).toByte)
    val ds = media((1L, "image", bytes), (2L, "audio", bytes.reverse))
    val f1 = extractFeatures(ds, StubCodec, dim = 16).collect().sortBy(_.media_id)
    val f2 = extractFeatures(ds.repartition(7), StubCodec, dim = 16)
      .collect().sortBy(_.media_id)
    assert(f1.length == 2 && f1.forall(_.features.length == 16))
    // partitioning must not change results (pure per-row kernel)
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("feature vector hand-off matches the embeddings column shape") {
    val ds = media((1L, "image", Array.fill(64)(7.toByte)))
    val df = extractFeatures(ds, StubCodec, dim = 64).toDF()
    val field = df.schema("features").dataType
    assert(field == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = false))
  }

  test("frame sampling explodes only videos, every k-th frame") {
    val vid = Array.tabulate(64)(_.toByte) // 4 frames of 16 bytes
    val ds = media((1L, "video", vid), (2L, "image", vid))
    val frames = sampleFrames(ds, everyK = 2).collect()
    assert(frames.map(_.media_id).distinct.toList == List(1L))
    assert(frames.map(_.frame_idx).sorted.toList == List(0, 2))
    assert(frames.forall(_.frame_bytes.length == 16))
  }

  test("resize rewrites image metadata and shrinks payload; others untouched") {
    val img = Array.tabulate(1000)(_.toByte)
    val ds = media((1L, "image", img), (2L, "audio", img))
    val out = resize(ds, targetW = 10, targetH = 10).collect().sortBy(_.media_id)
    assert(out(0).meta.width.contains(10) && out(0).meta.height.contains(10))
    assert(out(0).content.length <= 100 + 1)
    assert(out(1).content.length == 1000)
  }

  test("synthetic media table is deterministic across invocations") {
    val dir = "/root/testdata/sf0.001"
    val a = syntheticMedia(spark, dir).collect().sortBy(_.media_id).take(3)
    val b = syntheticMedia(spark, dir).collect().sortBy(_.media_id).take(3)
    assert(a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && x.content.sameElements(y.content) && x.meta == y.meta })
  }
}
