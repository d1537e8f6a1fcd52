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
