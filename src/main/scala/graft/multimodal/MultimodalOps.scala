package graft.multimodal

import org.apache.spark.sql.functions._

import graft.QueryDef

/** Oracle-checkable query surface for the multimodal layer. The media
  * table is synthesized deterministically from `documents` (UTF-8 payload
  * bytes), so DuckDB can recompute every byte-level result from the same
  * parquet — the codecs are stubs, the Spark dataflow is real.
  */
object MultimodalOps {

  /** Metadata + content fingerprint over binary payloads. */
  val metadata: QueryDef = QueryDef(
    "mm_media_metadata",
    (s, dir) => {
      implicit val spark = s
      Multimodal.syntheticMedia(s, dir).toDF()
        .select(col("media_id"), col("meta.media_type").as("media_type"),
          octet_length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("content_md5"))
        .orderBy("media_id")
    },
    Some("""
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS content_md5
      FROM documents
      ORDER BY media_id
    """.stripMargin.trim))

  /** Frame sampling: every 4th frame of each video payload; asserts the
    * row-explosion shape (count per media) against pure arithmetic.
    */
  val frameSample: QueryDef = QueryDef(
    "mm_video_frame_sample",
    (s, dir) => {
      implicit val spark = s
      Multimodal.sampleFrames(Multimodal.syntheticMedia(s, dir), everyK = 4).toDF()
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_sampled"),
          max(col("frame_idx")).cast("long").as("last_frame_idx"))
        .orderBy("media_id")
    },
    Some("""
      SELECT doc_id AS media_id,
             CAST((octet_length(encode(text)) // 16 + 3) // 4 AS BIGINT) AS n_sampled,
             CAST(((octet_length(encode(text)) // 16 - 1) // 4) * 4 AS BIGINT) AS last_frame_idx
      FROM documents
      WHERE doc_id % 3 = 2 AND octet_length(encode(text)) >= 16
      ORDER BY media_id
    """.stripMargin.trim))

  /** Feature extraction through the partition-amortized codec; first 4
    * feature dims per payload, checked byte-for-byte (ASCII corpus ⇒
    * ascii(char at pos) == byte value, so DuckDB can recompute the stub).
    */
  val features: QueryDef = QueryDef(
    "mm_feature_extract",
    (s, dir) => {
      implicit val spark = s
      val feats = Multimodal.extractFeatures(
        Multimodal.syntheticMedia(s, dir), Multimodal.StubCodec, dim = 64)
      feats.toDF()
        .select(col("media_id"), posexplode(col("features")).as(Seq("k", "f")))
        .filter(col("k") < 4)
        .select(col("media_id"), col("k").cast("long").as("k"), col("f"))
        .orderBy("media_id", "k")
    },
    Some("""
      WITH pos AS (
        SELECT doc_id AS media_id, text,
               CAST(unnest(range(0, len(text))) AS BIGINT) AS p
        FROM documents),
      sums AS (
        SELECT media_id, p % 64 AS k,
               CAST(SUM(ascii(substr(text, CAST(p AS INT) + 1, 1)))::DOUBLE
                    / COUNT(*) / 256.0 AS FLOAT) AS f
        FROM pos
        WHERE p % 64 < 4
        GROUP BY media_id, p % 64),
      dims AS (
        SELECT doc_id AS media_id, CAST(d.range AS BIGINT) AS k
        FROM documents CROSS JOIN range(0, 4) d)
      SELECT dims.media_id AS media_id, dims.k AS k,
             COALESCE(sums.f, CAST(0.0 AS FLOAT)) AS f
      FROM dims LEFT JOIN sums ON dims.media_id = sums.media_id AND dims.k = sums.k
      ORDER BY dims.media_id, dims.k
    """.stripMargin.trim))

  /** Resize through the stub kernel: stride-subsampled payload bytes for
    * image rows, byte-for-byte checkable (ASCII corpus ⇒ DuckDB can
    * rebuild the subsampled string and hash it).
    */
  val resize: QueryDef = QueryDef(
    "mm_resize_images",
    (s, dir) => {
      implicit val spark = s
      Multimodal.resize(Multimodal.syntheticMedia(s, dir), targetW = 8, targetH = 8).toDF()
        .filter(col("meta.media_type") === "image")
        .select(col("media_id"),
          octet_length(col("content")).cast("long").as("n_bytes_after"),
          md5(col("content")).as("content_md5"))
        .orderBy("media_id")
    },
    Some("""
      WITH img AS (
        SELECT doc_id AS media_id, text, len(text) AS n,
               greatest(1, len(text) // 64) AS stride
        FROM documents WHERE doc_id % 3 = 0),
      pos AS (
        SELECT media_id, text, stride,
               CAST(unnest(range(0, n)) AS BIGINT) AS p
        FROM img),
      resized AS (
        SELECT media_id,
               string_agg(substr(text, CAST(p AS INT) + 1, 1), '' ORDER BY p) AS rtext
        FROM pos WHERE p % stride = 0
        GROUP BY media_id)
      SELECT media_id,
             CAST(len(rtext) AS BIGINT) AS n_bytes_after,
             md5(rtext) AS content_md5
      FROM resized
      ORDER BY media_id
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(metadata, frameSample, features, resize)
}
