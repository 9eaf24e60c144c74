package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** SURVEY.md block G — a whole custom operator through the full
  * Catalyst stack: logical node → planner strategy → physical exec.
  *
  * Per-key top-k with bounded heaps. The alternatives Spark offers are
  * a window `row_number` (sorts every partition fully — O(n log n) and
  * state O(partition)) or collect_list+slice aggregation (buffers every
  * row of a key). This operator keeps exactly k rows per key at every
  * point:
  *
  *  - a PARTIAL exec runs before the shuffle on whatever partitioning
  *    the child has (map-side pruning to k rows per key per partition,
  *    exactly like partial aggregation), then
  *  - a FINAL exec requires ClusteredDistribution(keys) — Catalyst
  *    inserts the single hash exchange — and merges to the global
  *    per-key top-k, emitting rows ordered within each key.
  *
  * Memory is O(distinct keys in partition × k); the shuffle carries at
  * most k·partitions rows per key. This is the 100 TB-safe shape for
  * "top N per dimension" over a corpus-scale fact table.
  */
final case class TopKPerKeyNode(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKeyNode = copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(
        childOutput.map(_.asInstanceOf[Expression]), childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap on the ordering: peek() is the WORST row currently kept
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[UnsafeRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1,
            ord.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(rowProj(row).copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(rowProj(row).copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]()
      val hIt = heaps.values().iterator()
      while (hIt.hasNext) {
        val heap = hIt.next()
        val rows = new Array[UnsafeRow](heap.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // worst-first out
        out ++= rows // per key: best → worst
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}
