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

  /** Perceptual-hash near-dup over binary payloads — the multimodal
    * member of the dedup family (aHash shape: block-mean bits; a real
    * deployment swaps the stub byte-blocks for DCT coefficients behind
    * the same dataflow). Each payload gets a 32-bit signature: bit i is
    * "block i's codepoint mean exceeds the payload's global mean"
    * (CHARACTER units end-to-end — `length`/`substring`/`ascii` — so the
    * Spark side and the oracle's len(text) blocks agree on non-ASCII
    * payloads too; an octet_length draft desynchronized block bounds
    * from the char-indexed substring on multi-byte input),
    * decided by the INTEGER cross-multiplication
    * blk_sum·n_total > total_sum·blk_n — no float means, so both
    * engines agree bit-for-bit. Candidates via the same chunk-pigeonhole
    * as `dedup_simhash`: 3 signature chunks (11/11/10 bits); hamming ≤ 2
    * guarantees at least one identical chunk, so the equi-join on
    * (chunk_id, chunk_value) finds every such pair without an all-pairs
    * stage; verification is a generated 32-term positional compare.
    * Signature width is the scale dial: 16 blocks measured 1.14 M
    * candidate pairs at sf0.1 (2⁶-value chunks ⇒ bucket size grows
    * linearly with the corpus), 32 blocks 47 k — at larger corpora the
    * width grows with log(N) to hold bucket sizes flat. Both the
    * hamming sum and the chunk cuts are emitted for the two dialects
    * from the same Scala loops (the zSpark/zDuck pattern).
    *
    * An EMPTY result on this corpus is the correct answer, not a
    * vacuous one: the minimum pairwise signature distance measured
    * here is 3 (positional byte-blocks misalign under word
    * insertions — the known weakness aHash has and DCT-domain pHash
    * fixes; the stub models the dataflow, not the codec). A 4×8-bit
    * chunking at ham ≤ 3 was built and rejected: 295 k candidates at
    * sf0.1 vs 47 k — the wider radius buys recall at a quadratically
    * worsening bucket load. PhashNearDupSpec injects byte-identical
    * and 2-bit-flipped payloads to pin detection end-to-end.
    */
  private val Blocks = 32
  private val ChunkCuts = Seq((1, 11), (12, 11), (23, 10))
  private def hammingDuck(a: String, b: String): String =
    (1 to Blocks).map(i =>
      s"CASE WHEN substr($a,$i,1) <> substr($b,$i,1) THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  val phashNearDup: QueryDef = QueryDef(
    "mm_phash_neardup",
    (s, dir) => {
      implicit val spark = s
      val media = Multimodal.syntheticMedia(s, dir).toDF()
        .select(col("media_id"), expr("CAST(content AS STRING)").as("payload"))
        .filter(length(col("payload")) >= Blocks)
        .repartition(s.sparkContext.defaultParallelism)
      // Signature build is fully MAP-SIDE: per-row HOF block sums (block b
      // covers 0-based positions [ceil(b·n/32), ceil((b+1)·n/32)) — the
      // exact inverse of p·32 DIV n, integer arithmetic throughout), the
      // global sum folded from the 32 partials, bits by the same integer
      // cross-multiplication. The previous explode→groupBy×2→join→pivot
      // form shuffled ~n_bytes rows twice and measured 3.1 s at sf0.1;
      // this one shuffles nothing before the candidate join (measured
      // drop recorded in DESIGN.md). Aliases are consumed only by plain
      // projections (never a Generate), so the non-cheap bsums/ts columns
      // are not lambda-inlined — see the winnow alias-inline note.
      val sig = media
        .withColumn("bsums", expr(
          s"""transform(sequence(0, ${Blocks - 1}), b ->
             |  aggregate(sequence((b * length(payload) + ${Blocks - 1}) DIV $Blocks + 1,
             |                     ((b + 1) * length(payload) + ${Blocks - 1}) DIV $Blocks),
             |    0L, (acc, q) -> acc + ascii(substring(payload, q, 1))))""".stripMargin))
        .withColumn("ts", expr("aggregate(bsums, 0L, (acc, x) -> acc + x)"))
        .withColumn("sig", expr(
          s"""concat_ws('', transform(sequence(0, ${Blocks - 1}), b ->
             |  CASE WHEN element_at(bsums, b + 1) * length(payload) >
             |    ts * (((b + 1) * length(payload) + ${Blocks - 1}) DIV $Blocks
             |          - (b * length(payload) + ${Blocks - 1}) DIV $Blocks)
             |  THEN '1' ELSE '0' END))""".stripMargin))
        .select(col("media_id"), col("sig"))
        .localCheckpoint(true) // chunk-joined below; build the signatures once
      val chunks = sig.select(col("media_id"), col("sig"),
        posexplode(array(ChunkCuts.map { case (a, l) =>
          substring(col("sig"), a, l) }: _*)).as(Seq("ck", "cv")))
      chunks.as("a").join(chunks.as("b"),
          col("a.ck") === col("b.ck") && col("a.cv") === col("b.cv") &&
          col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("ia"), col("b.media_id").as("ib"),
          col("a.sig").as("siga"), col("b.sig").as("sigb"))
        .distinct()
        .select(col("ia"), col("ib"),
          (1 to Blocks).map(i => when(substring(col("siga"), i, 1) =!= substring(col("sigb"), i, 1), 1L)
            .otherwise(0L)).reduce(_ + _).as("hamming"))
        .filter(col("hamming") <= 2)
        .orderBy("ia", "ib")
    },
    Some(s"""
      WITH pos AS (
        SELECT doc_id AS media_id, len(text) AS n,
               CAST(unnest(range(0, len(text))) AS BIGINT) AS p, text
        FROM documents WHERE len(text) >= $Blocks),
      bytes AS (
        SELECT media_id, n, p,
               CAST(ascii(substr(text, CAST(p AS INT) + 1, 1)) AS BIGINT) AS b
        FROM pos),
      blocks AS (
        SELECT media_id, CAST(p * $Blocks // n AS INT) AS blk,
               SUM(b) AS bs, COUNT(*) AS bn
        FROM bytes GROUP BY 1, 2),
      overall AS (
        SELECT media_id, SUM(bs) AS ts, SUM(bn) AS tn FROM blocks GROUP BY 1),
      sig AS (
        SELECT b.media_id,
               string_agg(CASE WHEN bs * tn > ts * bn THEN '1' ELSE '0' END,
                          '' ORDER BY blk) AS sig
        FROM blocks b JOIN overall o ON b.media_id = o.media_id
        GROUP BY b.media_id),
      chunks AS (
        ${ChunkCuts.zipWithIndex.map { case ((a, l), i) =>
          s"SELECT media_id, sig, $i AS ck, substr(sig, $a, $l) AS cv FROM sig"
        }.mkString("\n        UNION ALL\n        ")}),
      cand AS (
        SELECT DISTINCT a.media_id AS ia, b.media_id AS ib,
               a.sig AS siga, b.sig AS sigb
        FROM chunks a JOIN chunks b
          ON a.ck = b.ck AND a.cv = b.cv AND a.media_id < b.media_id)
      SELECT ia, ib, ${hammingDuck("siga", "sigb")} AS hamming
      FROM cand
      WHERE ${hammingDuck("siga", "sigb")} <= 2
      ORDER BY ia, ib
    """.stripMargin.trim))

  /** Voice-activity trim plan over the audio payloads: 32-sample energy
    * windows from the [[Multimodal.audioWindows]] kernel, a window is
    * "voiced" iff its mean square ≥ 9000 (pure integer comparison
    * Σs² ≥ 9000·n — no division), and each clip reports how many
    * leading/trailing silent windows a trim would drop — the
    * silence-trimming pass an audio-training pipeline runs before
    * feature extraction. Kernel emits exact integers; everything after
    * is one keyed aggregation, so the oracle recomputes it from the
    * ASCII payload bytes.
    */
  val audioVad: QueryDef = QueryDef(
    "mm_audio_energy_vad",
    (s, dir) => {
      implicit val spark = s
      val voiced = col("sum_sq") >= lit(9000L) * col("n_samples")
      Multimodal.audioWindows(Multimodal.syntheticMedia(s, dir), window = 32).toDF()
        .groupBy("media_id")
        .agg(
          count(lit(1)).as("n_windows"),
          count(when(voiced, 1)).as("n_voiced"),
          min(when(voiced, col("win_idx").cast("long"))).as("firstv"),
          max(when(voiced, col("win_idx").cast("long"))).as("lastv"))
        .select(col("media_id"), col("n_windows"), col("n_voiced"),
          coalesce(col("firstv"), col("n_windows")).as("lead_trim_windows"),
          when(col("lastv").isNull, lit(0L))
            .otherwise(col("n_windows") - 1 - col("lastv")).as("tail_trim_windows"))
        .orderBy("media_id")
    },
    Some("""
      WITH pos AS (
        SELECT doc_id AS media_id, text,
               CAST(unnest(range(0, len(text))) AS BIGINT) AS p
        FROM documents WHERE doc_id % 3 = 1),
      win AS (
        SELECT media_id, p // 32 AS win, COUNT(*) AS n,
               SUM(ascii(substr(text, CAST(p AS INT) + 1, 1))
                   * ascii(substr(text, CAST(p AS INT) + 1, 1))) AS ssq
        FROM pos GROUP BY 1, 2),
      agg AS (
        SELECT media_id, COUNT(*) AS n_windows,
               COUNT(*) FILTER (WHERE ssq >= 9000 * n) AS n_voiced,
               MIN(win) FILTER (WHERE ssq >= 9000 * n) AS firstv,
               MAX(win) FILTER (WHERE ssq >= 9000 * n) AS lastv
        FROM win GROUP BY 1)
      SELECT media_id, n_windows, n_voiced,
             CAST(COALESCE(firstv, n_windows) AS BIGINT) AS lead_trim_windows,
             CAST(CASE WHEN lastv IS NULL THEN 0
                       ELSE n_windows - 1 - lastv END AS BIGINT) AS tail_trim_windows
      FROM agg
      ORDER BY media_id
    """.stripMargin.trim))

  /** Scene-cut detection over the video payloads: adjacent-frame
    * difference energy from the [[Multimodal.frameDiffs]] kernel
    * (16-byte frame grid, Σ|Δbyte| per boundary), a boundary is a CUT
    * iff its energy ≥ 400 (pure integer comparison), and each clip
    * reports boundary/cut counts, the first cut position, and the
    * hottest boundary — the shot-segmentation pass a video-training
    * pipeline runs before frame sampling so clips are cut at scene
    * boundaries instead of mid-shot. Kernel emits exact integers; the
    * rest is one keyed aggregation, so the oracle recomputes it from
    * the ASCII payload bytes (same [[audioVad]] convention, guarded by
    * the syntheticMedia ASCII check).
    */
  val videoSceneCuts: QueryDef = QueryDef(
    "mm_video_scene_cuts",
    (s, dir) => {
      implicit val spark = s
      val cut = col("diff_energy") >= 400L
      Multimodal.frameDiffs(Multimodal.syntheticMedia(s, dir), frameBytes = 16).toDF()
        .groupBy("media_id")
        .agg(
          count(lit(1)).as("n_boundaries"),
          count(when(cut, 1)).as("n_cuts"),
          min(when(cut, col("frame_idx").cast("long"))).as("first_cut_idx"),
          max(col("diff_energy")).as("max_diff_energy"))
        .select(col("media_id"), col("n_boundaries"), col("n_cuts"),
          coalesce(col("first_cut_idx"), lit(-1L)).as("first_cut_idx"),
          col("max_diff_energy"))
        .orderBy("media_id")
    },
    Some("""
      WITH frames AS (
        SELECT doc_id AS media_id, text,
               octet_length(encode(text)) // 16 AS n_frames
        FROM documents WHERE doc_id % 3 = 2),
      bounds AS (
        SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
               (SELECT SUM(ABS(ascii(substr(text, CAST((f - 1) * 16 + i AS INT), 1))
                            - ascii(substr(text, CAST(f * 16 + i AS INT), 1))))
                FROM range(1, 17) r(i)) AS diff_energy
        FROM (SELECT media_id, text, unnest(range(1, n_frames)) AS f
              FROM frames WHERE n_frames >= 2) t)
      SELECT media_id, COUNT(*) AS n_boundaries,
             COUNT(*) FILTER (WHERE diff_energy >= 400) AS n_cuts,
             CAST(COALESCE(MIN(frame_idx) FILTER (WHERE diff_energy >= 400), -1)
                  AS BIGINT) AS first_cut_idx,
             CAST(MAX(diff_energy) AS BIGINT) AS max_diff_energy
      FROM bounds
      GROUP BY media_id
      ORDER BY media_id
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(metadata, frameSample, features, resize, phashNearDup,
    audioVad, videoSceneCuts)
}
