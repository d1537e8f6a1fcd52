package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the `Rule[LogicalPlan]` tier of the extension stack):
  * users keep writing the idiomatic window top-k —
  * `row_number().over(partitionBy(keys).orderBy(o)) <= k` — and the rule
  * inserts [[TopKPerKeyNode]] UNDER the Window, so the partition sort the
  * window needs sees at most k rows per key instead of the whole
  * partition. Semantics are exactly preserved: the rows pruned are
  * precisely those the filter would drop, and the survivors' row numbers
  * are unchanged; the filter itself stays (it still removes nothing) so
  * no other consumer of the plan changes.
  *
  * Fires only on the provably-safe shape: a single row_number window
  * expression (rank/dense_rank tie semantics would need the ties kept),
  * non-empty partition keys, and a literal bound ≤ MaxK (the operator's
  * memory is keys × k per partition). Spark's own InferWindowGroupLimit
  * covers part of this (rank-limited consumption) but still sorts the
  * full partition; this removes the bulk before the sort.
  *
  * Default-ON wherever the rule is present in the optimizer
  * (GraftExtensions-built sessions, or [[TopK.enableRewrite]] /
  * [[WindowTopKRewriteSession.enable]] on a built session). Driver-contract
  * sessions never inject the rule, so the bench's plain window queries
  * (`window_top3_orders_per_customer`) keep their sort-based plans — the
  * honest baseline — while `_native_topk` routes through the operator.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxK = 1024L

  private def isRn(e: Expression, rn: Attribute): Boolean = e match {
    case a: Attribute => a.semanticEquals(rn)
    case Cast(a: Attribute, _, _, _) => a.semanticEquals(rn)
    case _ => false
  }

  private def toLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case _ => None
  }

  /** Tightest k implied by the filter's rn-bounding conjuncts, if any. */
  private def rnLimit(cond: Expression, rn: Attribute): Option[Long] = {
    val bounds: Seq[Long] = splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(e, Literal(v, _)) if isRn(e, rn) => toLong(v)
      case LessThan(e, Literal(v, _)) if isRn(e, rn) => toLong(v).map(_ - 1L)
      case GreaterThanOrEqual(Literal(v, _), e) if isRn(e, rn) => toLong(v)
      case GreaterThan(Literal(v, _), e) if isRn(e, rn) => toLong(v).map(_ - 1L)
      case EqualTo(e, Literal(v, _)) if isRn(e, rn) => toLong(v)
      case _ => None
    }
    bounds.reduceOption(_ min _)
  }

  /** Per-session off-switch for sessions that loaded the extension but
    * want the plain window plans back (A/B runs, debugging a suspected
    * rewrite interaction). Default TRUE (r7): the rewrite is
    * semantics-preserving — the Window above still sorts and ranks the
    * ≤k survivors, so output rows, ranks and order are identical — and
    * the operator's memory has been bounded by the grace-hash spill
    * fallback since r6 (`spark.graft.topk.maxKeptRowsPerPartition`),
    * which removed the r5 reason for default-off ("no spill path").
    * WindowTopKDefaultOnSpec pins both halves of the new contract: the
    * rewrite fires on the untouched-conf default for the gate's own
    * window query shape, and the spill fallback engages row-identically
    * at adversarial key cardinality THROUGH the rewrite path.
    */
  val EnabledKey = "spark.graft.windowTopKRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else plan.transform {
      case f @ Filter(cond, w @ Window(
          Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          parts, order, child, _))
          if parts.nonEmpty && order.nonEmpty && !child.isInstanceOf[TopKPerKeyNode] =>
        rnLimit(cond, alias.toAttribute) match {
          case Some(k) if k >= 1 && k <= MaxK =>
            f.copy(child = w.copy(child = TopKPerKeyNode(parts, order, k.toInt, child)))
          case _ => f
        }
    }
  }
}

object WindowTopKRewriteSession {
  /** Enable the rewrite on an already-built session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    TopK.ensureRegistered(spark)
    val ex = spark.experimental
    if (!ex.extraOptimizations.contains(WindowTopKRewrite))
      ex.extraOptimizations = ex.extraOptimizations :+ WindowTopKRewrite
    spark.conf.set(WindowTopKRewrite.EnabledKey, "true")
  }

  /** Disable the rewrite (the strategy stays; it only matches our node). */
  def disable(spark: SparkSession): Unit = {
    spark.conf.set(WindowTopKRewrite.EnabledKey, "false")
    val ex = spark.experimental
    ex.extraOptimizations = ex.extraOptimizations.filterNot(_ == WindowTopKRewrite)
  }
}
