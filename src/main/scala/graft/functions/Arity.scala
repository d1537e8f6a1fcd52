package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Arity-checked function builders: a wrong-arg-count SQL call surfaces as
  * a proper WRONG_NUM_ARGS analysis error naming the function and the
  * expected count, not an IndexOutOfBoundsException from `exprs(i)`.
  */
object Arity {
  def checked(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs =>
      if (exprs.length == n) build(exprs)
      else throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
}

/** Register-once guard for the native function batteries. Every query
  * builder calls its family's `register(spark)` defensively; without the
  * guard each call re-registers and SimpleFunctionRegistry WARNs
  * "<name> replaced a previously registered function" once per query —
  * ~260 lines of noise in the bench/verify tails (r12 advisory). The
  * registration is per-session state, so "already present in THIS
  * session's registry" is the exact idempotence condition.
  */
object RegisterOnce {
  def apply(spark: org.apache.spark.sql.SparkSession, name: String)(
      doRegister: => Unit): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      doRegister
}
