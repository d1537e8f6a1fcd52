package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Corpus-layout operators: the steps between "curated documents" and
  * "bytes a trainer reads" — shard assignment, epoch mixture weights,
  * and the deterministic global training order. All three are
  * hash/integer-exact (no RNG, no float aggregation), so a re-run — or
  * a different engine — reproduces the same layout bit-for-bit; that
  * determinism is what makes 100 TB training-data builds auditable and
  * resumable (a lost shard is recomputed from the formula, not from a
  * stored shuffle).
  */
object CorpusOps {

  /** Documents with a portable token count. Token count = size of the
    * whitespace split — the same count text_token_stats oracles, kept
    * integer so every downstream stat is exact.
    */
  private def docTokens(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("source"), col("n_chars"),
      size(split(col("text"), " ")).cast("long").as("tokens"))

  /** Shard assignment + balance audit: every document lands in one of 16
    * shards by a pure content-free hash (first hex nibble of
    * md5(doc_id)), and the query reports per-shard doc/token/char totals
    * plus the extremes a packing audit checks before a training run. At
    * 100 TB this is the layout step itself: `write.partitionBy("shard")`
    * with the same expression, no shuffle beyond the final write, and
    * the audit is the cheap agg that catches a skewed shard BEFORE 1000
    * trainer workers hot-spot on it.
    */
  val shardPack: QueryDef = QueryDef(
    "pipeline_shard_pack",
    (s, dir) => {
      docTokens(Tables.documents(s, dir))
        .withColumn("shard",
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1))
        .groupBy("shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("tokens")).as("tokens"),
          sum(col("n_chars")).as("chars"),
          min(col("tokens")).as("min_doc_tokens"),
          max(col("tokens")).as("max_doc_tokens"))
        .orderBy("shard")
    },
    Some("""
      SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
             CAST(SUM(n_chars) AS BIGINT) AS chars,
             CAST(MIN(len(string_split(text, ' '))) AS BIGINT) AS min_doc_tokens,
             CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_doc_tokens
      FROM documents
      GROUP BY 1
      ORDER BY shard
    """.stripMargin.trim))

  /** Epoch mixture table: per-source token share (ppm) and the integer
    * oversampling factor that upweights low-resource sources toward the
    * dominant one — the whole computation in exact integer arithmetic
    * (shares as `tokens*1e6 div total`), so the mixture a trainer
    * consumes is reproducible across engines with no float-summation
    * order hazard. The window aggregates run over the per-source rollup
    * (20 rows here; mixtures are per-source/domain, never per-doc), so
    * the unpartitioned window is a driver-trivial final step at any
    * corpus scale.
    */
  val epochMixture: QueryDef = QueryDef(
    "pipeline_epoch_mixture",
    (s, dir) => {
      val perSource = docTokens(Tables.documents(s, dir))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tokens"))
      perSource
        .withColumn("share_ppm",
          expr("tokens * 1000000 div sum(tokens) over ()"))
        .withColumn("oversample_factor",
          greatest(lit(1L), expr("max(tokens) over () div tokens")))
        .select("source", "n_docs", "tokens", "share_ppm", "oversample_factor")
        .orderBy("source")
    },
    Some("""
      WITH per_source AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source)
      SELECT source, n_docs, tokens,
             CAST((tokens * 1000000) // SUM(tokens) OVER () AS BIGINT) AS share_ppm,
             CAST(GREATEST(1, MAX(tokens) OVER () // tokens) AS BIGINT) AS oversample_factor
      FROM per_source
      ORDER BY source
    """.stripMargin.trim))

  /** Deterministic global training order: position of every document in
    * its shard, ordered by a salted content-free hash — the "global
    * shuffle" a training run needs, as a FORMULA instead of a stored
    * permutation. Shard = one hash (salt "s:"), within-shard order = an
    * independent hash (salt "o:"), so shard assignment and intra-shard
    * order are uncorrelated; the row_number window runs per shard —
    * 1/16th of the corpus per partition, never a global sort — which is
    * the property that keeps the shuffle scalable (and why the
    * SCALE-path form is `sortWithinPartitions` after
    * `repartition($"shard")`, the exact plan this query produces).
    */
  /** THE salted training-order formula (shard salt "s:", intra-shard
    * order salt "o:"), shared by [[trainingOrder]] and [[packSequences]]
    * so the packing audit structurally audits the SAME order a trainer
    * consumes.
    */
  private[operators] def shardCol(docId: org.apache.spark.sql.Column) =
    substring(md5(concat(lit("s:"), docId.cast("string")).cast("binary")), 1, 1)
  private[operators] def ordKeyCol(docId: org.apache.spark.sql.Column) =
    md5(concat(lit("o:"), docId.cast("string")).cast("binary"))
  private[operators] def shardDuck(docId: String): String =
    s"substr(md5('s:' || CAST($docId AS VARCHAR)), 1, 1)"
  private[operators] def ordKeyDuck(docId: String): String =
    s"md5('o:' || CAST($docId AS VARCHAR))"

  val trainingOrder: QueryDef = QueryDef(
    "pipeline_training_order",
    (s, dir) => {
      val w = Window.partitionBy("shard").orderBy(col("ord_key"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          shardCol(col("doc_id")).as("shard"),
          ordKeyCol(col("doc_id")).as("ord_key"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select("shard", "pos", "doc_id")
        .orderBy("shard", "pos")
    },
    Some(s"""
      WITH keyed AS (
        SELECT doc_id,
               ${shardDuck("doc_id")} AS shard,
               ${ordKeyDuck("doc_id")} AS ord_key
        FROM documents)
      SELECT shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord_key, doc_id) AS BIGINT) AS pos,
             doc_id
      FROM keyed
      ORDER BY shard, pos
    """.stripMargin.trim))

  /** Deterministic train/val/test split manifest: the split is a pure
    * hash threshold on doc_id (first two md5 nibbles: 00-f9 → train,
    * fa-fc → val, fd-ff → test ≈ 97.7/1.2/1.2), so membership is
    * recomputable forever — no stored assignment, no RNG seed to lose —
    * and adding documents never reshuffles existing ones between splits
    * (the property that keeps eval sets stable as the corpus grows).
    * The manifest audits size and token mass per (split, source): the
    * table a release ships next to the data.
    */
  /** THE train/val/test membership formula (first two md5 nibbles of
    * the salted doc_id: 00-f9 / fa-fc / fd-ff), shared by the manifest
    * and the split-leakage audit so the assignment cannot drift.
    */
  private[operators] def splitOf(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h2 = substring(md5(concat(lit("split:"), docId.cast("string")).cast("binary")), 1, 2)
    when(h2 < "fa", "train").when(h2 < "fd", "val").otherwise("test")
  }

  /** DuckDB twin of [[splitOf]]; `docId` is a SQL expression. */
  private[operators] def splitOfDuck(docId: String): String =
    s"""CASE WHEN substr(md5('split:' || CAST($docId AS VARCHAR)), 1, 2) < 'fa' THEN 'train'
       |     WHEN substr(md5('split:' || CAST($docId AS VARCHAR)), 1, 2) < 'fd' THEN 'val'
       |     ELSE 'test' END""".stripMargin

  val splitManifest: QueryDef = QueryDef(
    "pipeline_split_manifest",
    (s, dir) => {
      docTokens(Tables.documents(s, dir))
        .withColumn("split", splitOf(col("doc_id")))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tokens"))
        .orderBy("split", "source")
    },
    Some(s"""
      WITH keyed AS (
        SELECT source, len(string_split(text, ' ')) AS tokens,
               ${splitOfDuck("doc_id")} AS split
        FROM documents)
      SELECT split, source, COUNT(*) AS n_docs,
             CAST(SUM(tokens) AS BIGINT) AS tokens
      FROM keyed
      GROUP BY 1, 2
      ORDER BY split, source
    """.stripMargin.trim))

  /** Temperature-scaled mixture weights (T = 2 ⇒ weights ∝ √tokens —
    * the standard low-resource upweighting exponent), entirely in exact
    * integers: √ is INTEGER sqrt, computed as one IEEE double sqrt
    * (correctly rounded by spec) followed by a ±1 integer correction, so
    * the result is floor(√n) exactly on both engines even where the
    * double rounding would land on the wrong side of a perfect square.
    * Weights and the per-source token allocation of a half-epoch budget
    * are then integer div — reproducible forever, same discipline as
    * [[epochMixture]] (whose natural shares sit alongside for the
    * upweighting comparison). Per-source rollup first; every window
    * runs over ~sources rows, never per-doc.
    */
  val temperatureMixture: QueryDef = QueryDef(
    "pipeline_temperature_mixture",
    (s, dir) => {
      docTokens(Tables.documents(s, dir))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tokens"))
        .withColumn("s0", expr("CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT)"))
        .withColumn("isqrt", expr(
          """CASE WHEN (s0 + 1) * (s0 + 1) <= tokens THEN s0 + 1
            |     WHEN s0 * s0 > tokens THEN s0 - 1
            |     ELSE s0 END""".stripMargin))
        // Products widen to DECIMAL(38,0) (HUGEINT in the oracle) before the
        // multiply: tokens*1e6 and half_budget*isqrt wrap int64 past ~9.2e12
        // corpus tokens — same discipline as dedupFunnel's retained_ppm.
        .withColumn("natural_ppm", expr(
          "CAST((CAST(tokens AS DECIMAL(38,0)) * 1000000) DIV SUM(tokens) OVER () AS BIGINT)"))
        .withColumn("temp_weight_ppm", expr(
          "CAST((CAST(isqrt AS DECIMAL(38,0)) * 1000000) DIV SUM(isqrt) OVER () AS BIGINT)"))
        .withColumn("alloc_tokens",
          expr("""CAST((CAST(SUM(tokens) OVER () DIV 2 AS DECIMAL(38,0)) * isqrt)
                  DIV SUM(isqrt) OVER () AS BIGINT)"""))
        .select("source", "n_docs", "tokens", "natural_ppm", "temp_weight_ppm",
          "alloc_tokens")
        .orderBy("source")
    },
    Some("""
      WITH per_source AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source),
      rooted AS (
        SELECT *, CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT) AS s0
        FROM per_source),
      corrected AS (
        SELECT source, n_docs, tokens,
               CASE WHEN (s0 + 1) * (s0 + 1) <= tokens THEN s0 + 1
                    WHEN s0 * s0 > tokens THEN s0 - 1
                    ELSE s0 END AS isqrt
        FROM rooted)
      SELECT source, n_docs, tokens,
             CAST(CAST(tokens AS HUGEINT) * 1000000 // SUM(tokens) OVER () AS BIGINT) AS natural_ppm,
             CAST(CAST(isqrt AS HUGEINT) * 1000000 // SUM(isqrt) OVER () AS BIGINT) AS temp_weight_ppm,
             CAST(CAST(SUM(tokens) OVER () // 2 AS HUGEINT) * isqrt // SUM(isqrt) OVER () AS BIGINT) AS alloc_tokens
      FROM corrected
      ORDER BY source
    """.stripMargin.trim))

  /** Snapshot diff between two corpus versions, computed WITHOUT moving
    * text: each side reduces to (doc_id, source, md5(text)) map-side,
    * and a full-outer join on doc_id classifies every document as
    * added / removed / changed / unchanged — the churn audit a corpus
    * release publishes, and the input an incremental re-embedding or
    * re-dedup run consumes (only `added ∪ changed` reprocess). The two
    * versions are derived deterministically from the one documents
    * table: v1 lacks the `% 10 = 7` docs (added since) and carries a
    * half-truncated text for the `% 10 = 3` docs (edited since); v2
    * lacks the `% 10 = 9` docs (deleted since). At 100 TB the join
    * moves 32-char digests, never payloads.
    */
  val snapshotDiff: QueryDef = QueryDef(
    "corpus_snapshot_diff",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val v1 = docs.filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id"), col("source"),
          md5(expr(
            """CAST(CASE WHEN doc_id % 10 = 3
              |     THEN substring(text, 1, CAST(n_chars DIV 2 AS INT))
              |     ELSE text END AS BINARY)""".stripMargin)).as("h1"))
      val v2 = docs.filter(col("doc_id") % 10 =!= 9)
        .select(col("doc_id").as("doc_id2"), col("source").as("source2"),
          md5(col("text").cast("binary")).as("h2"))
      v1.join(v2, col("doc_id") === col("doc_id2"), "full_outer")
        .select(
          coalesce(col("source"), col("source2")).as("src"),
          when(col("h1").isNull, lit("added"))
            .when(col("h2").isNull, lit("removed"))
            .when(col("h1") =!= col("h2"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"))
        .groupBy("src")
        .agg(
          count(when(col("status") === "added", 1)).as("n_added"),
          count(when(col("status") === "removed", 1)).as("n_removed"),
          count(when(col("status") === "changed", 1)).as("n_changed"),
          count(when(col("status") === "unchanged", 1)).as("n_unchanged"))
        .withColumnRenamed("src", "source")
        .orderBy("source")
    },
    Some("""
      WITH v1 AS (
        SELECT doc_id, source,
               md5(CASE WHEN doc_id % 10 = 3
                   THEN substr(text, 1, CAST(n_chars // 2 AS INT))
                   ELSE text END) AS h1
        FROM documents WHERE doc_id % 10 <> 7),
      v2 AS (
        SELECT doc_id AS doc_id2, source AS source2, md5(text) AS h2
        FROM documents WHERE doc_id % 10 <> 9),
      classified AS (
        SELECT COALESCE(source, source2) AS source,
               CASE WHEN h1 IS NULL THEN 'added'
                    WHEN h2 IS NULL THEN 'removed'
                    WHEN h1 <> h2 THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM v1 FULL OUTER JOIN v2 ON doc_id = doc_id2)
      SELECT source,
             COUNT(*) FILTER (WHERE status = 'added') AS n_added,
             COUNT(*) FILTER (WHERE status = 'removed') AS n_removed,
             COUNT(*) FILTER (WHERE status = 'changed') AS n_changed,
             COUNT(*) FILTER (WHERE status = 'unchanged') AS n_unchanged
      FROM classified
      GROUP BY source
      ORDER BY source
    """.stripMargin.trim))

  /** Sequence packing audit — the concat-and-split step a GPT-style
    * pretraining pipeline runs after [[trainingOrder]]: documents
    * concatenate in the deterministic salted order and split at fixed
    * 4096-token context boundaries. Everything derives from ONE
    * running-token window per shard (the same per-shard, never-global
    * sort as the order itself): a doc is "split" iff its [start, end)
    * token span crosses a boundary (`(cum−tokens) DIV 4096 ≠
    * (cum−1) DIV 4096`), bins per shard are `ceil(total/4096)`, and the
    * only waste is the final partial bin — the audit that prices a
    * context-length choice against the corpus before a training run.
    */
  val packSequences: QueryDef = QueryDef(
    "pipeline_pack_sequences",
    (s, dir) => {
      val C = 4096L
      val w = Window.partitionBy("shard").orderBy(col("ord_key"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docTokens(Tables.documents(s, dir))
        .select(col("doc_id"), col("tokens"),
          shardCol(col("doc_id")).as("shard"),
          ordKeyCol(col("doc_id")).as("ord_key"))
        .withColumn("cum", sum(col("tokens")).over(w))
        .withColumn("split", expr(s"(cum - tokens) DIV $C <> (cum - 1) DIV $C"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          max(col("cum")).as("total_tokens"),
          count(when(col("split"), 1)).as("n_docs_split"))
        .select(col("shard"), col("n_docs"), col("total_tokens"),
          expr(s"(total_tokens + ${C - 1}) DIV $C").as("n_bins"),
          col("n_docs_split"),
          expr(s"((total_tokens + ${C - 1}) DIV $C) * $C - total_tokens").as("tail_waste_tokens"))
        .orderBy("shard")
    },
    Some(s"""
      WITH keyed AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
               ${shardDuck("doc_id")} AS shard,
               ${ordKeyDuck("doc_id")} AS ord_key
        FROM documents),
      cums AS (
        SELECT shard, tokens,
               SUM(tokens) OVER (PARTITION BY shard ORDER BY ord_key, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM keyed),
      agg AS (
        SELECT shard, COUNT(*) AS n_docs,
               CAST(MAX(cum) AS BIGINT) AS total_tokens,
               COUNT(*) FILTER (WHERE (cum - tokens) // 4096 <> (cum - 1) // 4096)
                 AS n_docs_split
        FROM cums GROUP BY 1)
      SELECT shard, n_docs, total_tokens,
             CAST((total_tokens + 4095) // 4096 AS BIGINT) AS n_bins,
             n_docs_split,
             CAST(((total_tokens + 4095) // 4096) * 4096 - total_tokens AS BIGINT)
               AS tail_waste_tokens
      FROM agg
      ORDER BY shard
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(shardPack, epochMixture, trainingOrder, splitManifest,
    temperatureMixture, snapshotDiff, packSequences)
}
