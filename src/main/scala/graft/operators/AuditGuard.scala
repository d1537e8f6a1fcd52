package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-level scale guard for the AUDIT-CLASS queries — the whitelisted
  * all-pairs exactness/recall baselines (`dedup_embedding_cosine`,
  * `ann_knn_graph_ivf`, `ann_recall_knn_capped_vs_exact`'s exact arm,
  * `pipeline_modality_agreement`) whose reference arm is deliberately
  * super-linear. The r15 decade sweep measured them at exponents
  * 1.7–2.2; "audit-SF-only by construction" was a DESIGN table note,
  * not code — nothing stopped one of these from running at a large SF
  * and silently dominating a suite (r15 verdict, What's wrong #3).
  *
  * The guard makes the bound part of the declared semantics: below
  * [[AuditFullRows]] corpus rows the query is exhaustive (all
  * verification SFs — sf0.001/0.01/0.1 — are unchanged bit for bit);
  * above it, the QUERY side is decimated to a deterministic
  * ~[[AuditKeepRows]]-row 1-in-M sample with `M = FLOOR(n / keep)`
  * (floor, so just above the threshold M=2 can keep up to ~2·keep rows
  * — the guard bounds growth, it does not hit an exact size), so the
  * audited-side cardinality is ~constant in corpus size and the whole
  * query degrades from O(n²) to O(keep · n) — linear, the most an
  * exact-reference audit can cost. The modulus derives from a census
  * the query already owns (one count over the corpus), so both engines
  * compute the identical sample with no RNG and no collected state; the
  * DuckDB twin carries the same predicate via [[sqlPred]] in lockstep.
  *
  * The sample key is a multiplicative hash of the id, not the raw id
  * (r16 advice): `h(id) = (id mod P) · Q mod P` with P prime and Q the
  * Knuth multiplicative constant — a fixed bijection on [0, P), exact
  * 64-bit integer arithmetic on both engines (the product is bounded by
  * (P−1)·Q < 2⁶³, so it can never overflow), and it decouples the
  * sample from id-space structure: a corpus whose ids are sparse or
  * stride-aligned (e.g. all even) would yield a near-empty audit under
  * a raw `id mod M` sample, but hashes land ~uniformly in [0, P)
  * regardless of stride. Ids are non-negative by table contract.
  *
  * The sampled readout is an unbiased estimate of the full audit (a
  * deterministic hash-systematic 1-in-M sample of query rows; candidate
  * sides stay complete, so each audited row's own result is exact).
  */
object AuditGuard {

  /** Corpus sizes ≤ this run the audit exhaustively (covers every
    * driver verification/bench SF; the ×10 growth corpus is above). */
  val AuditFullRows = 4000L

  /** Target audited-row count once the guard engages. */
  val AuditKeepRows = 2000L

  /** Hash field prime (< 2^31.5 so (P−1)·HashQ < 2⁶³ — no overflow). */
  val HashP = 3037000493L

  /** Knuth's multiplicative constant (coprime to [[HashP]]). */
  val HashQ = 2654435761L

  private def modulus(n: Column): Column =
    greatest(lit(1L), floor(n / lit(AuditKeepRows)).cast("long"))

  private def hashed(id: Column): Column =
    pmod(pmod(id, lit(HashP)) * lit(HashQ), lit(HashP))

  /** `df` filtered to the audited sample of `idCol`, with the corpus
    * size taken from `census` (usually `df` itself; passed explicitly so
    * composed queries can align different frames on ONE census). */
  def sample(df: DataFrame, idCol: String, census: DataFrame): DataFrame =
    df.crossJoin(broadcast(census.agg(count(lit(1)).as("audit_n"))))
      .filter(col("audit_n") <= AuditFullRows ||
        pmod(hashed(col(idCol)), modulus(col("audit_n"))) === 0)
      .drop("audit_n")

  def sample(df: DataFrame, idCol: String): DataFrame = sample(df, idCol, df)

  /** The identical predicate for a DuckDB twin (`table` is the census
    * table the Spark side counted). Ids are non-negative, so DuckDB's
    * sign-of-dividend `%` and Spark's `pmod` agree. */
  def sqlPred(idExpr: String, table: String): String =
    s"((SELECT COUNT(*) FROM $table) <= $AuditFullRows OR " +
      s"((($idExpr % $HashP) * $HashQ) % $HashP) % " +
      s"GREATEST(1, (SELECT COUNT(*) FROM $table) // $AuditKeepRows) = 0)"
}
