package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, CaseWhen, Coalesce, ElementAt, Expression, GetMapValue, If, LambdaFunction, NamedExpression, NamedLambdaVariable, Or}
import org.apache.spark.sql.types.MapType
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** SURVEY §4.2's deferred `Rule[LogicalPlan]` candidate: collapse
  * repeated map accesses — the reference's data model is map-heavy
  * (`doc.versions[doc['dist-tags'].latest]`, `doc.time[latest]`,
  * `changes_consumer.py:283-324`), and a query that writes the
  * `element_at(versions, dist_tags['latest'])` chain inline for several
  * derived columns evaluates the same map lookup once per column.
  *
  * The rule is a targeted logical-level common-subexpression
  * elimination: within one `Project`, any deterministic map access
  * ([[GetMapValue]] or map-typed [[ElementAt]]) whose inputs come
  * straight from the child and which occurs (
  * semantically) more than once is pulled into a child `Project`,
  * computed once, and referenced by attribute above. Nested duplicated
  * accesses (the `dist_tags['latest']` key inside two different fused
  * outer lookups) fuse on the next fixed-point iteration of the
  * optimizer batch the rule runs in, so chains collapse fully.
  *
  * Two layers of Spark machinery make this rule a safety net rather
  * than the only defense — stated honestly: `Project`-over-`Project`
  * chains built with `withColumn` aliases already materialize each
  * access once (CollapseProject refuses to duplicate non-cheap
  * expressions — PlanShapeSpec pins that for the P1 catalog
  * projection), and whole-stage codegen's runtime subexpression
  * elimination dedups within one generated function. The rule closes
  * the remaining gap — inline-duplicated chains in interpreted /
  * non-codegen contexts — and materializes the shared access as an
  * explicit, plan-visible attribute.
  *
  * Fires only on duplication, preserves output schema/exprIds exactly
  * (top-level aliases are kept; only their children are rewritten), and
  * reaches a fixpoint (after fusing, each access occurs once below and
  * plain attribute references above). Gated on
  * `spark.graft.mapAccessFusion.enabled` (default true — it is
  * semantics-preserving and a no-op without duplication).
  */
object MapAccessFusion extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.mapAccessFusion.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else plan.transform {
      case p @ Project(list, child) =>
        val dups = duplicatedMapAccesses(list, child)
        if (dups.isEmpty) p
        else {
          val aliases = dups.map(e => Alias(e, "_fused_map_access")())
          val byCanonical = dups.zip(aliases).map { case (e, a) =>
            e.canonicalized -> a.toAttribute
          }.toMap
          val rewritten = list.map { ne =>
            ne.transformDown {
              case e if byCanonical.contains(e.canonicalized) &&
                  // keep the top-level tree a NamedExpression: an Alias
                  // child may be replaced, the Alias itself stays
                  !e.isInstanceOf[NamedExpression] =>
                byCanonical(e.canonicalized)
              case e => e
            }.asInstanceOf[NamedExpression]
          }
          Project(rewritten, Project(child.output ++ aliases, child))
        }
    }

  /** Deterministic map accesses evaluable directly against `child` that
    * occur semantically ≥2 times across the projection list AND at
    * least once in an ALWAYS-EVALUATED position, outermost-first
    * (LinkedHashMap keeps discovery order) so replacement rewrites
    * whole chains before their parts; residual duplication inside the
    * introduced child Project fuses as the rewrite recurses / the
    * optimizer batch iterates to fixpoint.
    *
    * Two hoisting guards (both correctness, found in the r6 review):
    *
    *  - an access whose key references a [[NamedLambdaVariable]] is
    *    never a candidate — lambda variables contribute nothing to
    *    `references`, so the outputSet check alone would let the rule
    *    rip a per-element lookup out of its higher-order-function scope
    *    (unbound variable, one constant value for every element);
    *  - an access occurring ONLY inside lazily-evaluated branches
    *    (If/CaseWhen arms, Coalesce tails, And/Or right sides, lambda
    *    bodies) is never hoisted: the unconditional child Project would
    *    evaluate it on rows where the original plan short-circuited
    *    past it — under ANSI mode (the Spark 4 default) that turns a
    *    guarded `element_at` into MAP_KEY_DOES_NOT_EXIST. With at
    *    least one always-evaluated occurrence the hoist only MOVES an
    *    evaluation that happened on every row anyway, so replacing the
    *    conditional occurrences too is safe.
    */
  private def duplicatedMapAccesses(
      list: Seq[NamedExpression],
      child: LogicalPlan): Seq[Expression] = {
    val counts = mutable.LinkedHashMap.empty[Expression, (Expression, Int)]
    val unconditional = mutable.Set.empty[Expression]
    def candidate(e: Expression): Boolean =
      isMapAccess(e) && e.deterministic && e.references.subsetOf(child.outputSet) &&
        !e.exists(_.isInstanceOf[NamedLambdaVariable])
    def collect(e: Expression): Unit = {
      if (candidate(e)) {
        val k = e.canonicalized
        counts(k) = counts.get(k).map { case (e0, n) => (e0, n + 1) }.getOrElse((e, 1))
      }
      // descend even into counted accesses: a shared KEY lookup nested in
      // two DIFFERENT outer accesses (versions[dt[latest]] and
      // time[dt[latest]]) is itself a duplicate worth fusing
      e.children.foreach(collect)
    }
    // walk only positions evaluated on EVERY row: stop at the lazy
    // branches of conditionals and short-circuiting booleans, and at
    // lambda bodies (evaluated zero times for an empty collection)
    def walkAlways(e: Expression): Unit = {
      if (candidate(e)) unconditional += e.canonicalized
      e match {
        case If(pred, _, _) => walkAlways(pred)
        case cw: CaseWhen => cw.branches.headOption.foreach(b => walkAlways(b._1))
        case c: Coalesce => c.children.headOption.foreach(walkAlways)
        case a: And => walkAlways(a.left)
        case o: Or => walkAlways(o.left)
        case _: LambdaFunction => ()
        case other => other.children.foreach(walkAlways)
      }
    }
    list.foreach {
      case Alias(c, _) => collect(c); walkAlways(c)
      case _: Attribute => () // bare pass-through
      case other => collect(other); walkAlways(other)
    }
    counts.valuesIterator.collect {
      case (g, n) if n >= 2 && unconditional.contains(g.canonicalized) => g
    }.toSeq
  }

  /** Both surface forms of a map lookup: `m[k]` (GetMapValue) and
    * `element_at(m, k)` (ElementAt over a MapType input).
    */
  private def isMapAccess(e: Expression): Boolean = e match {
    case _: GetMapValue => true
    case ea: ElementAt => ea.left.dataType.isInstanceOf[MapType]
    case _ => false
  }

  /** Idempotent post-hoc registration for sessions not built with
    * `.withExtensions` (the driver contract hands us a built session).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val ex = spark.experimental
    if (!ex.extraOptimizations.contains(MapAccessFusion))
      ex.extraOptimizations = ex.extraOptimizations :+ MapAccessFusion
  }
}
