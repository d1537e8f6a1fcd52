package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a custom `TypedImperativeAggregate` — the
  * sketch-style aggregate surface (SURVEY §2.10): a mutable k-slot buffer
  * of lexicographic md5 minima, merged associatively, emitted as
  * `array<string>`.
  *
  * Semantics are IDENTICAL to the k-column
  * `min(md5(concat(seed, ':', shingle)))` formulation used by
  * dedup_minhash_lsh (md5 of "i:shingle" per seed i), so the two are
  * interchangeable; this form carries the whole signature through one
  * aggregation buffer, which is the shape a sketch library (HLL,
  * KLL, theta) plugs into.
  */
case class MinHashSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[String] = Array.fill[String](k)(null)

  // hot path: one reusable digest per operator instance (update is
  // single-threaded per partition) and a nibble-table hex encoder — the
  // naive per-hash getInstance + per-byte "%02x".format dominated the
  // aggregate's CPU at corpus scale
  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    digest.reset()
    val bytes = digest.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = hexChars((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val shingle = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < k) {
        val h = md5Hex(s"$i:$shingle")
        if (buf(i) == null || h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(h => if (h == null) null else UTF8String.fromString(h)))

  override def serialize(buf: Array[String]): Array[Byte] =
    buf.map(h => if (h == null) "" else h).mkString(",").getBytes(StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): Array[String] =
    new String(bytes, StandardCharsets.UTF_8).split(",", -1).map(h => if (h.isEmpty) null else h)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Idempotently register `minhash_sketch(col, k)` for SQL use; k must
    * be an integer literal (arity and literal-ness produce analysis
    * errors, not runtime casts).
    */
  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "minhash_sketch") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sketch",
      Arity.checked("minhash_sketch", 2) { exprs =>
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "SECOND_FUNCTION_ARGUMENT_NOT_INTEGER",
            messageParameters = Map("functionName" -> "minhash_sketch"))
        }
        MinHashSketchAgg(exprs(0), k).toAggregateExpression()
      },
      "built-in")
    }
}
