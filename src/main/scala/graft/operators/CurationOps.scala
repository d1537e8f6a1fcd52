package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Data-curation operators between "raw corpus" and "training mixture":
  * hashed-feature domain importance (the DSIR shape), embedding
  * distribution drift, and tokenizer-vocabulary coverage. All three are
  * integer-exact or shared-double-text (no log/exp/pow — libm and the
  * JVM disagree in the last ulp), so the DuckDB oracle hashes match
  * bit-for-bit, and all three are one-or-two keyed passes with
  * broadcast-sized model frames — the shapes that stay map-side at
  * 100 TB.
  */
object CurationOps {

  /** Per-document DSIR vote scores for `docs(doc_id, group, w)` token
    * rows against the target slice `group === target`: one row per
    * (doc_id, group) with the integer vote sum. Factored out so
    * CurationOpsSpec can run the identical scoring over an INJECTED
    * domain-skewed corpus and pin that the scorer separates it — the
    * discrimination evidence the flat synthetic corpus cannot provide.
    */
  private[operators] def dsirScores(docs: org.apache.spark.sql.DataFrame,
                                    target: String): org.apache.spark.sql.DataFrame = {
    val D38 = "decimal(38,0)"
    val V = 4096
    val toks = docs
      .withColumn("f", substring(md5(col("w").cast("binary")), 1, 3))
      .localCheckpoint(true) // feature-count pass + scoring pass
    val fs = toks.groupBy("f").agg(
      sum(when(col("group") === target, 1L).otherwise(0L)).as("ct"),
      sum(when(col("group") =!= target, 1L).otherwise(0L)).as("cr"))
    val tots = fs.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    toks
      .join(broadcast(fs), "f")
      .crossJoin(broadcast(tots))
      .withColumn("lhs",
        (col("ct") + 1).cast(D38) * (col("tr") + V).cast(D38))
      .withColumn("rhs",
        (col("cr") + 1).cast(D38) * (col("tt") + V).cast(D38))
      .withColumn("vote",
        when(col("lhs") > col("rhs"), 1L)
          .when(col("lhs") < col("rhs"), -1L).otherwise(0L))
      .groupBy("doc_id", "group")
      .agg(sum(col("vote")).as("score"))
  }

  /** Hashed n-gram domain-importance votes — the DSIR selection shape
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023): score every document by how much its
    * token distribution resembles a TARGET domain (here lang='en')
    * versus the RAW rest, using add-1-smoothed per-feature frequency
    * ratios over a 4096-bucket hashed unigram space (feature = first 3
    * hex chars of md5(word)).
    *
    * Cross-engine exactness: DSIR's per-token log-likelihood-ratio sum
    * is replaced by its SIGN — vote(f) = sign(p̂_T(f) − p̂_R(f)) via the
    * integer cross-multiplication (cntT(f)+1)·(totR+V) vs
    * (cntR(f)+1)·(totT+V) in DECIMAL(38,0) (wide — cnt·tot reaches n²,
    * the stats_ks_drift overflow discipline), so the score is a pure
    * integer vote sum: rank-preserving per token, zero float surface.
    *
    * HONEST readout on THIS corpus: the synthetic documents share one
    * 31-word vocabulary with near-uniform frequencies across languages
    * (measured), so the per-lang mean votes come out FLAT (all ≈ −20;
    * `domain_separation` = mean_vote(en) − best other ≈ 0) — the
    * correct "no domain signal, importance sampling would reweight
    * noise" pre-training finding, reported as a first-class column
    * rather than hidden. CurationOpsSpec injects a genuinely
    * domain-skewed corpus through the same scorer and pins that target
    * docs separate positively there — the discrimination evidence.
    *
    * Scale shape: one explode pass builds the ≤4096-row feature table
    * (keyed agg, map-side combinable); scoring joins tokens to the
    * BROADCAST feature frame plus a 1-row totals frame and re-keys by
    * document — no shuffle wider than the doc-id agg, nothing global.
    */
  val dsirDomainVotes: QueryDef = QueryDef(
    "pipeline_dsir_domain_votes",
    (s, dir) => {
      val scored = dsirScores(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang").as("group"),
            explode(split(col("text"), " ")).as("w")),
        "en")
      val enMean = scored.filter(col("group") === "en")
        .agg((sum(col("score")).cast("double") / count(lit(1))).as("en_mean"))
      scored.groupBy(col("group").as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_target_leaning"),
          sum(col("score")).as("sum_votes"))
        .withColumn("mean_vote",
          col("sum_votes").cast("double") / col("n_docs"))
        .crossJoin(broadcast(enMean))
        .withColumn("domain_separation", col("en_mean") - col("mean_vote"))
        .drop("en_mean")
        .orderBy("lang")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang, substr(md5(w), 1, 3) AS f
        FROM (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS w
              FROM documents) t),
      fs AS (
        SELECT f,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
               CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cr
        FROM toks GROUP BY 1),
      tots AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr FROM fs),
      scored AS (
        SELECT doc_id, lang,
               CAST(SUM(CASE
                 WHEN CAST(ct + 1 AS HUGEINT) * (tr + 4096)
                    > CAST(cr + 1 AS HUGEINT) * (tt + 4096) THEN 1
                 WHEN CAST(ct + 1 AS HUGEINT) * (tr + 4096)
                    < CAST(cr + 1 AS HUGEINT) * (tt + 4096) THEN -1
                 ELSE 0 END) AS BIGINT) AS score
        FROM toks JOIN fs USING (f) CROSS JOIN tots
        GROUP BY doc_id, lang),
      enmean AS (
        SELECT CAST(SUM(score) AS DOUBLE) / COUNT(*) AS en_mean
        FROM scored WHERE lang = 'en')
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_target_leaning,
             CAST(SUM(score) AS BIGINT) AS sum_votes,
             CAST(SUM(score) AS DOUBLE) / COUNT(*) AS mean_vote,
             MIN(en_mean) - CAST(SUM(score) AS DOUBLE) / COUNT(*) AS domain_separation
      FROM scored CROSS JOIN enmean
      GROUP BY lang
      ORDER BY lang
    """.stripMargin.trim))

  /** Per-dimension embedding distribution drift between two cohorts
    * (vec_id parity — the deterministic stand-in for "last week's
    * embeddings vs this week's"): per-dim cohort means via
    * Σ FLOOR(x·10¹⁰) integer moments (the kmeansTrain inertia
    * discipline: FLOOR of a bit-identical double is exact on both
    * engines, where an elementwise double→DECIMAL(20,10) cast hit a
    * HALF_UP-vs-HALF_EVEN tie at dim 33 of this very table) and one
    * final shared-text IEEE division, plus the integer-quantized
    * absolute gap FLOOR(|Δ|·10⁶) — the drift monitor a feature-store
    * pipeline runs before trusting a new embedding batch. One
    * posexplode pass, one keyed agg over dim — nothing global, nothing
    * data-proportional past the first agg.
    */
  val embeddingDimDrift: QueryDef = QueryDef(
    "ann_embedding_dim_drift",
    (s, dir) => {
      val byDim = Tables.embeddings(s, dir)
        .select(pmod(col("vec_id"), lit(2)).as("cohort"),
          posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
            .as(Seq("pos", "x")))
        .withColumn("xq", expr("CAST(FLOOR(x * 10000000000.0D) AS BIGINT)"))
        .groupBy("pos")
        // moment sums widen to DECIMAL(38,0): a LongType sum of ~1e10-scale
        // quantized coordinates wraps silently past ~1e9 rows/cohort,
        // while the DuckDB oracle's SUM(BIGINT) widens to HUGEINT — the
        // decimal sum gives the Spark side the same ~1e28-row headroom so
        // both engines stay exact at the 100 TB cohort sizes the scaladoc
        // claims (r12 advisory). Values are identical at any scale that
        // fits, so the oracle hash is unchanged.
        .agg(
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("cohort") === 0, col("xq")).otherwise(0L)
            .cast("decimal(38,0)")).as("sa"),
          sum(when(col("cohort") === 1, col("xq")).otherwise(0L)
            .cast("decimal(38,0)")).as("sb"))
        .withColumn("mean_a",
          col("sa").cast("double") / (lit(1.0e10) * col("n_a")))
        .withColumn("mean_b",
          col("sb").cast("double") / (lit(1.0e10) * col("n_b")))
      byDim
        .withColumn("dim", (col("pos") + 1).cast("long"))
        .withColumn("gap_e6",
          expr("CAST(FLOOR(ABS(mean_a - mean_b) * 1000000.0D) AS BIGINT)"))
        .select("dim", "n_a", "n_b", "mean_a", "mean_b", "gap_e6")
        .orderBy("dim")
    },
    Some("""
      WITH xs AS (
        SELECT vec_id % 2 AS cohort, CAST(i.range AS INT) + 1 AS dim,
               CAST(FLOOR(CAST(embedding[CAST(i.range AS INT) + 1] AS DOUBLE)
                          * 10000000000.0) AS BIGINT) AS xq
        FROM embeddings CROSS JOIN range(0, 64) i),
      agg AS (
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN cohort = 0 THEN xq ELSE 0 END) AS DOUBLE)
                 / (10000000000.0 * SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)) AS mean_a,
               CAST(SUM(CASE WHEN cohort = 1 THEN xq ELSE 0 END) AS DOUBLE)
                 / (10000000000.0 * SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)) AS mean_b
        FROM xs
        GROUP BY dim)
      SELECT dim, n_a, n_b, mean_a, mean_b,
             CAST(FLOOR(ABS(mean_a - mean_b) * 1000000.0) AS BIGINT) AS gap_e6
      FROM agg
      ORDER BY dim
    """.stripMargin.trim))

  /** Tokenizer-vocabulary coverage audit: build the top-K target
    * vocabulary from the 'en' slice (count desc, word asc — a
    * deterministic total order) and report per-source token coverage:
    * total tokens, out-of-vocabulary tokens, and OOV ppm by integer
    * division — the pre-training check that a tokenizer's vocab won't
    * shred a source into bytes. K = 16 here, sized BELOW the synthetic
    * corpus's 31-word vocabulary so the OOV path is actually exercised
    * (~half of every source's tokens fall outside; at production scale
    * K is the tokenizer's 50k and the interesting sources are the ones
    * with nonzero ppm). Scale shape: the vocab cut is a TakeOrdered
    * (per-partition top-K + driver merge of K rows, never a global
    * sort) and scoring is a broadcast left join of the K-row vocab
    * into one token pass re-keyed by source.
    */
  val vocabOovAudit: QueryDef = QueryDef(
    "text_vocab_oov_audit",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("source"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .localCheckpoint(true) // vocab pass + coverage pass
      val vocab = toks.filter(col("lang") === "en")
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("w")).limit(16)
        .select(col("w").as("vw"))
      toks
        .join(broadcast(vocab), col("w") === col("vw"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("vw").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_ppm",
          expr("CAST((n_oov * 1000000) DIV n_tokens AS BIGINT)"))
        .orderBy("source")
    },
    Some("""
      WITH toks AS (
        SELECT source, lang, UNNEST(string_split(text, ' ')) AS w
        FROM documents),
      vocab AS (
        SELECT w AS vw FROM (
          SELECT w, COUNT(*) AS cnt FROM toks WHERE lang = 'en' GROUP BY 1
          ORDER BY cnt DESC, w ASC LIMIT 16) t)
      SELECT source, COUNT(*) AS n_tokens,
             CAST(SUM(CASE WHEN vw IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             CAST(SUM(CASE WHEN vw IS NULL THEN 1 ELSE 0 END) * 1000000
                  // COUNT(*) AS BIGINT) AS oov_ppm
      FROM toks LEFT JOIN vocab ON w = vw
      GROUP BY source
      ORDER BY source
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(dsirDomainVotes, embeddingDimDrift, vocabOovAudit)
}
