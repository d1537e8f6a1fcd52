package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY §2.10's deepest tier — the
  * custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` path): per-key
  * top-k without a sort.
  *
  * The window form (`row_number().over(partitionBy(key).orderBy(...)) <=
  * k`) buffers and SORTS every partition — O(n log n) per key group and
  * a full external sort pass — to keep k rows. This operator keeps a
  * k-bounded heap per key in one streaming pass: O(n log k) compares,
  * O(distinct-keys × k) memory, no sort, no spill surface. The planner
  * inserts the hash Exchange for us via `requiredChildDistribution`, so
  * at cluster scale the shuffle is identical to the window's — only the
  * per-partition work changes.
  *
  * Output rows are the top-k set per key in UNSPECIFIED order (heap
  * order); callers that need ranks apply a window over the pruned output
  * — k rows per key — which is where the reference's "latest/top
  * version" selections (A5/A6 family) want to be at 100 TB.
  *
  * Trade-off vs the window (kept honest in the scaladoc rather than
  * hidden): per-partition memory is distinct-keys × k rows with no spill
  * path, so the sort-based window remains the fallback when key
  * cardinality per partition is unbounded.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(orderExprs, childOutput)
      // heap head = worst row currently kept (reverse ordering), so a
      // better-than-head row evicts in O(log k)
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ordering.compare(b, a)
      }
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row) // reused buffer; copy only on first sight
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            // small initial capacity that grows on demand: preallocating
            // k+1 slots per key would cost O(keys × k) empty array up
            // front for large k, dwarfing the actual kept rows
            val h = new java.util.PriorityQueue[InternalRow](math.min(kLocal, 16) + 1, cmp)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      heaps.valuesIterator.flatMap { h =>
        Iterator.continually(h.poll()).takeWhile(_ != null)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public DataFrame API + per-session strategy registration. */
object TopK {

  /** Ensure the planner strategy is present on an already-built session
    * (the driver contract hands us one); GraftExtensions covers sessions
    * built with `.withExtensions`.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val ex = spark.experimental
    if (!ex.extraStrategies.contains(TopKPerKeyStrategy))
      ex.extraStrategies = ex.extraStrategies :+ TopKPerKeyStrategy
  }

  /** Enable the [[WindowTopKRewrite]] optimizer rule too: plain
    * `row_number <= k` window queries then plan through this operator.
    */
  def enableRewrite(spark: SparkSession): Unit = WindowTopKRewriteSession.enable(spark)

  /** Top-k rows per key. `order` is (columnName, ascending) pairs; rows
    * come back unranked (apply a window over the pruned result for rank).
    */
  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    // resolve with the session's resolver (case-insensitive under the
    // default spark.sql.caseSensitive=false, like every other Spark API)
    val resolver = spark.sessionState.analyzer.resolver
    def attr(name: String): Attribute =
      analyzed.output.filter(a => resolver(a.name, name)) match {
        case Seq(a) => a
        case Seq() => sys.error(
          s"topKPerKey: no column '$name' in ${analyzed.output.map(_.name).mkString(", ")}")
        case dups => sys.error(
          s"topKPerKey: column '$name' is ambiguous (${dups.size} attributes) — " +
            "disambiguate with select/alias before calling")
      }
    val keyExprs: Seq[Expression] = keyCols.map(attr)
    val sortOrders = order.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graftaccess.DatasetAccess.ofRows(
      spark, TopKPerKeyNode(keyExprs, sortOrders, k, analyzed))
  }
}
