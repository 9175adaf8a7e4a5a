package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator (SURVEY.md §7.3's "custom
  * LogicalPlan + Strategy + SparkPlan" slot).
  *
  * The built-in spelling — `row_number().over(Window.partitionBy(keys)
  * .orderBy(ord)) <= k` — must SORT every partition's full data
  * (O(n log n) per key group, full materialization) to discard all but k
  * rows. This operator keeps a bounded k-heap per key instead: O(n log k),
  * no sort buffer, state bounded by (#keys in partition) × k rows. Same
  * distribution requirement (cluster by key), so the shuffle is identical;
  * only the per-partition algorithm changes. At 100 TB with hot keys the
  * difference is sorting a hot key's millions of rows vs a k-row heap.
  *
  * Output rows are the surviving child rows (no rank column), in no
  * defined order — compose with orderBy downstream as needed.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Co-locate each key's rows; AQE still coalesces/splits as usual. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // interpreted/codegen row ordering over the child schema
      val rowOrd = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // heap keeps the WORST retained row on top for O(log k) eviction
      val heapOrd = rowOrd.reverse
      val heaps =
        new java.util.HashMap[UnsafeRow,
          java.util.PriorityQueue[UnsafeRow]]()
      rows.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1,
            heapOrd.asInstanceOf[java.util.Comparator[UnsafeRow]])
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          // row ranks strictly better than the current worst
          heap.poll()
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Public API: keep each key group's top-k rows, ordered by the given
    * (column, ascending?) keys. Attributes are resolved here against the
    * analyzed child plan (a Column's ColumnNodeExpression wrapper would
    * not resolve inside a custom node), so the logical node is born
    * resolved. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      ordering: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val plan = org.apache.spark.sql.graft.Bridge.planOf(df)
    def attr(name: String): Attribute =
      plan.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    val sortOrders = ordering.map { case (name, asc) =>
      SortOrder(attr(name),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      TopKPerKey(keyCols.map(attr), sortOrders, k, plan))
  }

  /** Idempotent strategy registration on a live session. */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
}
