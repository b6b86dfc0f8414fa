package graft.plans

import java.util.{Comparator, PriorityQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Top-k-per-key as a whole-operator Catalyst plan (SURVEY.md §7.4,
  * preference path (c): custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered via `GraftExtensions`).
  *
  * Why the built-ins genuinely can't express this efficiently: the
  * DataFrame form — `row_number() OVER (PARTITION BY key ORDER BY ord)`
  * then `WHERE rn <= k` — shuffles EVERY input row on the key and then
  * fully sorts every partition, because the window operator can't know
  * that only k rows per key survive the downstream filter. At 100 TB the
  * shuffle IS the cost: for "top 3 comments per repo over a trillion
  * rows", the window plan moves the trillion rows; this plan moves at
  * most `k × distinct-keys-per-map-partition` rows — the same partial/
  * final contract as a hash aggregate, applied to order statistics.
  *
  * Physical shape: a *partial* pass keeps a bounded k-heap per key within
  * each map partition (no distribution requirement, no sort), then a
  * *final* pass with `ClusteredDistribution(keys)` — Catalyst's
  * EnsureRequirements inserts the one hash exchange — merges the
  * surviving rows exactly. Output rows are the input rows untouched
  * (passthrough schema); no rank column is materialized. Per-key output
  * order within the operator is unspecified (heap order): callers wanting
  * a presentation order sort the ≤ k×keys survivors afterwards, which is
  * negligible by construction.
  *
  * Memory: each task holds ≤ k rows per distinct key seen in its
  * partition — the same worst case as partial hash aggregation. A
  * near-unique key degrades the partial pass to a passthrough (still
  * correct, bounded by the input itself); the final pass then does the
  * exact work the window form would have done, so the operator never
  * loses — it just stops winning.
  *
  * Determinism: ties are the caller's contract, exactly as with
  * `row_number`. Pass a total order (e.g. score DESC, id ASC) and the
  * result set is unique; leave ties underspecified and engines (and
  * reruns) may legitimately differ — same as the reference's tie-unstable
  * `sort` (`/root/reference/preprocess.py:225`).
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty, "top-k-per-key needs ≥1 key (global top-k is Spark's TakeOrderedAndProject)")
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial → (exchange inserted by
  * EnsureRequirements) → final, mirroring partial/final hash aggregation.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key heap pass. `partial = true` runs on the child's
  * existing partitioning (map-side, approximate in the sense that a key's
  * rows are spread over partitions); `partial = false` declares
  * `ClusteredDistribution(keys)` so all survivors of one key meet in one
  * task and the merge is exact.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "GraftTopKPerKeyPartial" else "GraftTopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // Heap head = the WORST retained row under `ord` (max in sort
      // order), so admission is one compare against the head.
      val worstFirst = new Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new PriorityQueue[InternalRow](limit, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Library-call surface for the operator. */
object TopK {

  /** Top `k` rows per distinct value of `keyCols`, "top" meaning first in
    * the total order given by `orderBy` (use `col(...).desc` /
    * `col(...).asc`; include a tiebreak column for a deterministic
    * result). Schema is unchanged; row order of the output is
    * unspecified.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    ColumnBridge.ensureStrategy(spark, TopKPerKeyStrategy)
    val plan = ColumnBridge.analyzed(df)
    val resolver = spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def attr(name: String): Attribute = plan.output
      .find(a => if (resolver) a.name == name else a.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"top-k-per-key: column '$name' not in ${plan.output.map(_.name).mkString(", ")}"))
    def resolve(e: Expression): Expression = e.transformUp {
      case u: UnresolvedAttribute => attr(u.name)
    }
    val keys = keyCols.map(attr(_): Expression)
    val order = orderBy.map(c => ColumnBridge.expressionEager(c) match {
      case s: SortOrder => s.copy(child = resolve(s.child))
      case e => SortOrder(resolve(e), Ascending)
    })
    ColumnBridge.ofRows(spark, TopKPerKey(keys, order, k, plan))
  }
}
