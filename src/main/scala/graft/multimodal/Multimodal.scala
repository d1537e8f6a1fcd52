package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata struct,
  * exactly like a 100 TB lakehouse table would store them (content in the
  * row or an object-store pointer, metadata queryable).
  *
  * The actual codecs (JPEG decode, audio resample, video frame extract)
  * are NOT in this container, so the decode kernels are deterministic
  * STUBS behind the `Codec` trait — but everything Spark-side is real and
  * tested: schema, partition-local batching (`mapPartitions`), row
  * explosion for frame sampling, and the feature-vector hand-off into the
  * ANN/dedup operators (`Array[Float]`, same column shape as
  * `embeddings.embedding`).
  *
  * In PySpark these kernels would be Pandas UDFs over `mapInPandas`
  * (batch-shaped, arrow-backed); `mapPartitions` over a typed Dataset is
  * the Scala-native equivalent with the same per-partition amortization.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  case class MediaMeta(
      media_type: String,     // image | audio | video
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      n_frames: Option[Int],
      codec: Option[String])

  case class MediaRow(media_id: Long, meta: MediaMeta, content: Array[Byte])

  case class DecodedFeatures(media_id: Long, media_type: String, features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Injectable decode kernel. Production: real image/audio libs; here a
    * deterministic fake that derives a feature vector from the bytes —
    * the Spark plumbing (schema, batching, shuffle shape) is identical.
    */
  trait Codec extends Serializable {
    def decodeFeatures(meta: MediaMeta, content: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic stand-in: k-th feature = mean of bytes ≡ k (mod dim),
    * scaled to [0,1). Pure function of the payload → stable across runs
    * and partitionings.
    */
  object StubCodec extends Codec {
    def decodeFeatures(meta: MediaMeta, content: Array[Byte], dim: Int): Array[Float] = {
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < content.length) {
        val k = i % dim
        sums(k) += content(i) & 0xff
        counts(k) += 1
        i += 1
      }
      // double accumulate → single float rounding at the end: both Java
      // and DuckDB round double→float correctly, so the oracle matches
      Array.tabulate(dim)(k =>
        if (counts(k) == 0) 0f else (sums(k).toDouble / counts(k) / 256.0).toFloat)
    }
  }

  /** Feature extraction: one decoder instance per partition (the expensive
    * init — model load, codec context — is amortized across the partition,
    * the mapInPandas batching story).
    */
  def extractFeatures(media: Dataset[MediaRow], codec: Codec, dim: Int = 64)(
      implicit spark: SparkSession): Dataset[DecodedFeatures] = {
    implicit val enc: Encoder[DecodedFeatures] = Encoders.product[DecodedFeatures]
    media.mapPartitions { rows =>
      rows.map(r => DecodedFeatures(r.media_id, r.meta.media_type,
        codec.decodeFeatures(r.meta, r.content, dim)))
    }
  }

  /** Video frame sampling: explode each payload into every k-th "frame"
    * (stub: fixed-size byte windows). Row explosion is the real semantics
    * — the downstream per-frame pipeline sees ordinary rows.
    */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int, frameBytes: Int = 16)(
      implicit spark: SparkSession): Dataset[Frame] = {
    implicit val enc: Encoder[Frame] = Encoders.product[Frame]
    media.filter(_.meta.media_type == "video").flatMap { r =>
      val nFrames = r.meta.n_frames.getOrElse(r.content.length / frameBytes)
      (0 until nFrames by everyK).iterator.map { idx =>
        val start = (idx * frameBytes) min r.content.length
        val end = ((idx + 1) * frameBytes) min r.content.length
        Frame(r.media_id, idx, java.util.Arrays.copyOfRange(r.content, start, end))
      }
    }
  }

  /** "Resize": stub kernel that rewrites metadata + deterministically
    * subsamples bytes; shape-preserving Dataset→Dataset stage.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    media.map { r =>
      if (r.meta.media_type != "image") r
      else {
        val stride = math.max(1, r.content.length / math.max(1, targetW * targetH))
        val out = r.content.indices.by(stride).map(r.content).toArray
        r.copy(meta = r.meta.copy(width = Some(targetW), height = Some(targetH)),
          content = out)
      }
    }
  }

  case class FrameDiff(media_id: Long, frame_idx: Int, diff_energy: Long)

  /** Adjacent-frame difference energy over the video payloads: frames
    * are the FULL 16-byte blocks (the [[sampleFrames]] frame grid) and
    * each frame f ≥ 1 reports Σ |b_i − b'_i| against frame f−1 — exact
    * integers, so a scene-cut threshold downstream is a pure
    * comparison. Partition-amortized like the other kernels: a real
    * decoder would initialize once per partition and stream diffs.
    */
  def frameDiffs(media: Dataset[MediaRow], frameBytes: Int)(
      implicit spark: SparkSession): Dataset[FrameDiff] = {
    implicit val enc: Encoder[FrameDiff] = Encoders.product[FrameDiff]
    media.filter(_.meta.media_type == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.content.length / frameBytes // full frames only
        (1 until n).iterator.map { f =>
          var d = 0L
          var i = 0
          while (i < frameBytes) {
            val a = r.content((f - 1) * frameBytes + i) & 0xff
            val b = r.content(f * frameBytes + i) & 0xff
            d += math.abs(a - b)
            i += 1
          }
          FrameDiff(r.media_id, f, d)
        }
      }
    }
  }

  case class AudioWindow(media_id: Long, win_idx: Int, n_samples: Int, sum_sq: Long)

  /** Windowed audio energy: the payload bytes are treated as 8-bit
    * unsigned PCM and folded into non-overlapping windows of `window`
    * samples, each reduced to (n_samples, Σ sample²) — exact integers,
    * so a VAD threshold downstream is a pure comparison. Same
    * partition-amortized kernel shape as [[extractFeatures]]: at scale
    * the decoder (here: nothing to decode) initializes once per
    * partition and streams windows out as ordinary rows.
    */
  def audioWindows(media: Dataset[MediaRow], window: Int)(
      implicit spark: SparkSession): Dataset[AudioWindow] = {
    implicit val enc: Encoder[AudioWindow] = Encoders.product[AudioWindow]
    media.filter(_.meta.media_type == "audio").mapPartitions { rows =>
      rows.flatMap { r =>
        r.content.grouped(window).zipWithIndex.map { case (chunk, i) =>
          var ssq = 0L
          var j = 0
          while (j < chunk.length) { val v = (chunk(j) & 0xff).toLong; ssq += v * v; j += 1 }
          AudioWindow(r.media_id, i, chunk.length, ssq)
        }
      }
    }
  }

  /** Deterministic media table synthesized from the documents corpus
    * (UTF-8 bytes as payload): lets multimodal queries run against the
    * driver's testdata with a DuckDB-checkable byte-level oracle.
    *
    * ASCII GUARD: the multimodal oracles window CHARACTERS
    * (substr/ascii over text) while the kernels window the payload's
    * UTF-8 BYTES — equivalent only while every document is pure ASCII.
    * Rather than leave that convention as a docstring, the payload build
    * fails loudly on the first non-ASCII document, so a future corpus
    * produces an explicit error instead of a subtle oracle hash
    * mismatch.
    */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        require(text.forall(_ < 0x80),
          s"syntheticMedia: doc $id contains non-ASCII text; the byte-level " +
            "multimodal oracles (character-windowed SQL vs UTF-8-byte kernels) " +
            "are only equivalent on ASCII corpora")
        val mt = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val bytes = text.getBytes("UTF-8")
        MediaRow(id, MediaMeta(mt,
          width = if (mt == "image") Some(640) else None,
          height = if (mt == "image") Some(480) else None,
          sample_rate = if (mt == "audio") Some(16000) else None,
          n_frames = if (mt == "video") Some(bytes.length / 16) else None,
          codec = Some("stub")), bytes)
      }
  }
}
