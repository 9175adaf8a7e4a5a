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
    child: LogicalPlan,
    partial: Boolean = false) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Co-locate each key's rows; AQE still coalesces/splits as usual.
    * A PARTIAL pass accepts the child's distribution as-is: it runs the
    * same bounded heap over whatever rows each map partition holds,
    * shrinking every key to ≤ k rows per partition BEFORE the shuffle the
    * downstream final pass requires — the map-side-combine half of the
    * operator, and the reason a LOW-cardinality key (few reducers) still
    * scales: the hot key's billions of rows arrive at its single reducer
    * already reduced to #map-partitions × k. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial)
      org.apache.spark.sql.catalyst.plans.physical
        .UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

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
    case TopKPerKey(keys, order, k, child, partial) =>
      TopKPerKeyExec(keys, order, k, planLater(child), partial) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Public API: keep each key group's top-k rows, ordered by the given
    * (column, ascending?) keys. Attributes are resolved here against the
    * analyzed child plan (a Column's ColumnNodeExpression wrapper would
    * not resolve inside a custom node), so the logical node is born
    * resolved.
    *
    * `mapSideCombine = true` stacks a PARTIAL pass under the final one:
    * each map partition's heap shrinks every key to ≤ k rows before the
    * cluster-by-key shuffle. Top-k is algebraic — per-key top-k of the
    * union of per-partition top-ks equals the global per-key top-k — so
    * the result is value-identical GIVEN a total order (include a unique
    * tiebreak column; with ties the retained representatives may differ,
    * exactly as they may between runs of the single-pass form). Use it
    * when the key is low-cardinality or hot: the reducer for a key
    * receives #map-partitions × k rows instead of the key's full data. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      ordering: Seq[(String, Boolean)], k: Int,
      mapSideCombine: Boolean = false): DataFrame = {
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
    val keys = keyCols.map(attr)
    val child =
      if (mapSideCombine) TopKPerKey(keys, sortOrders, k, plan,
        partial = true)
      else plan
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      TopKPerKey(keys, sortOrders, k, child))
  }

  /** Idempotent strategy registration on a live session. */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
}
