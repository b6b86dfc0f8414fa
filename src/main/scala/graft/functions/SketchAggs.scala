package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Mergeable sketch aggregates over DataSketches KLL (quantiles) and Theta
  * (set algebra), as `TypedImperativeAggregate`s — the buffer is the live
  * sketch OBJECT; serialization happens only at partial/final shuffle
  * boundaries, never per row (an `Aggregator` over serialized bytes would
  * deserialize+reserialize on every `reduce` call).
  *
  * Why these two complete the sketch shelf (HLL `hll_sketch_agg` and the
  * Count-Min heavy-hitters agg already exist):
  *  - KLL gives MERGEABLE quantiles with a proven rank-error bound
  *    (~1.65% at k=200): per-partition/per-day sketches compose
  *    associatively, so a 100 TB percentile dashboard is a union of
  *    per-partition KLL states, not a re-sort of the data — the thing
  *    `percentile_approx` (GK, also mergeable but unexposed state) and
  *    exact `percentile` (full sort) can't do incrementally.
  *  - Theta supports set EXPRESSIONS across stored states — union,
  *    intersection, A-NOT-B with estimates — where HLL only unions.
  *    "users who did X and Y but not Z this quarter" becomes algebra over
  *    per-day 4 KiB sketches instead of a distinct-join over raw events.
  *
  * The scalar readers ([[KllQuantiles]], [[ThetaEstimate]],
  * [[ThetaSetEstimate]]) are `CodegenFallback` by design: they evaluate
  * once per GROUP (post-aggregation rows), not per input row, so codegen
  * would buy nothing and the fallback keeps them out of the generated
  * hot path entirely.
  */
object SketchAggs {

  /** KLL sketch of a double column → serialized sketch bytes (mergeable). */
  def kllAgg(c: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllDoublesAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Union of stored KLL sketch bytes → merged sketch bytes. `k` must be
    * ≥ the k the stored sketches were built with — KLL merge preserves the
    * rank-error bound only when the target buffer is at least as accurate
    * as the sources (a k=200 buffer would silently downgrade k=1000
    * per-day sketches to k=200 accuracy).
    */
  def kllMergeAgg(c: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Quantiles at `probs` read from KLL sketch bytes (INCLUSIVE rule). */
  def kllQuantiles(bytes: Column, probs: Seq[Double]): Column =
    ColumnBridge.column(
      KllQuantiles(ColumnBridge.expression(bytes), probs))

  /** Theta sketch of a long column → compact sketch bytes (mergeable). */
  def thetaAgg(c: Column): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c)).toAggregateExpression())

  /** Union of stored Theta sketch bytes → merged compact sketch bytes. */
  def thetaUnionAgg(c: Column): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(c)).toAggregateExpression())

  /** Distinct-count estimate of Theta sketch bytes. */
  def thetaEstimate(bytes: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(bytes)))

  /** Estimate of `a ∪ b` / `a ∩ b` / `a \ b` over two sketch-byte columns. */
  def thetaSetEstimate(a: Column, b: Column, op: String): Column =
    ColumnBridge.column(
      ThetaSetEstimate(ColumnBridge.expression(a),
        ColumnBridge.expression(b), op))

  private[functions] def newUnion(): Union =
    SetOperation.builder().buildUnion()

  private[functions] def heapifyCompact(bytes: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes))
}

/** Common plumbing for the graft sketch aggregates: binary output, null
  * inputs skipped (SQL aggregate convention), single child.
  */
abstract class SketchAgg[T] extends TypedImperativeAggregate[T] {
  def child: Expression
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
}

/** KLL quantile sketch aggregate: `update` feeds doubles into a heap
  * sketch; `merge` is DataSketches' own sketch merge (rank-error bound
  * survives merging — the KLL paper's guarantee, which is exactly why the
  * partial/final split of a Spark aggregation is safe here).
  */
case class KllDoublesAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[KllDoublesSketch] {
  require(k >= 8 && k <= 65535, s"KLL k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kll_agg requires double input, got $t")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllDoublesAgg = copy(child = c.head)
  override def prettyName: String = "graft_kll_agg"
}

/** Merge of STORED KLL sketch bytes — the incremental-view form: per-day
  * sketches written once, a dashboard quantile is a union over the days it
  * covers (the same compose-stored-state contract as `hll_union_agg`).
  */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[KllDoublesSketch] {
  require(k >= 8 && k <= 65535, s"KLL k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge requires sketch bytes, got $t")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) {
      val src = KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]]))
      // enforce the documented contract (object SketchAggs.kllMergeAgg):
      // merging a finer-k stored sketch into a coarser buffer silently
      // downgrades its rank-error bound — fail instead of degrading
      require(src.getK <= k,
        s"graft_kll_merge(k=$k) would downgrade a stored k=${src.getK} " +
          "sketch; call kllMergeAgg with k >= the stored sketches' k")
      buf.merge(src)
    }
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllMergeAgg = copy(child = c.head)
  override def prettyName: String = "graft_kll_merge"
}

/** Theta distinct-set sketch over a long key column. The buffer is a theta
  * `Union` (accepts both raw updates and sketch merges); `serialize`
  * compacts it — a compact theta sketch IS the union state (retained
  * hashes below θ), so the roundtrip is lossless for aggregation purposes.
  */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[Union] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_agg requires bigint input (hash strings first), got $t")
  }

  override def createAggregationBuffer(): Union = SketchAggs.newUnion()

  override def update(buf: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult()); a
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult().toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SketchAggs.newUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ThetaSketchAgg = copy(child = c.head)
  override def prettyName: String = "graft_theta_agg"
}

/** Union of STORED theta sketch bytes (compose per-day/per-partition set
  * states without touching raw keys).
  */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[Union] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_union requires sketch bytes, got $t")
  }

  override def createAggregationBuffer(): Union = SketchAggs.newUnion()

  override def update(buf: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult()); a
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray
  override def serialize(buf: Union): Array[Byte] =
    buf.getResult().toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SketchAggs.newUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ThetaUnionAgg = copy(child = c.head)
  override def prettyName: String = "graft_theta_union"
}

/** Quantiles at fixed probabilities read from KLL sketch bytes. Evaluates
  * once per grouped row — `CodegenFallback` is deliberate (see module doc).
  * Empty sketch → null (no data, no quantile).
  */
case class KllQuantiles(child: Expression, probs: Seq[Double])
    extends UnaryExpression with CodegenFallback {
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probabilities must be in [0,1]: $probs")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // an EMPTY sketch has no quantiles → null, even over a non-null child
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantiles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires sketch bytes, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new GenericArrayData(probs.map(p =>
      sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)).toArray)
  }

  override protected def withNewChildInternal(c: Expression): KllQuantiles =
    copy(child = c)
}

/** Distinct-count estimate from compact theta sketch bytes. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires sketch bytes, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SketchAggs.heapifyCompact(input.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Set-expression estimate over two compact theta sketch byte columns:
  * `op` ∈ union | intersect | anotb. This is the piece HLL fundamentally
  * lacks — intersections and differences compose from STORED states.
  */
case class ThetaSetEstimate(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  require(Set("union", "intersect", "anotb").contains(op),
    s"unknown theta set op: $op")

  override def dataType: DataType = DoubleType
  override def prettyName: String = s"graft_theta_$op"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two sketch-byte columns, got $t")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = SketchAggs.heapifyCompact(a.asInstanceOf[Array[Byte]])
    val sb = SketchAggs.heapifyCompact(b.asInstanceOf[Array[Byte]])
    op match {
      case "union" =>
        val u = SketchAggs.newUnion()
        u.union(sa); u.union(sb)
        u.getResult().getEstimate
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(sa); i.intersect(sb)
        i.getResult().getEstimate
      case "anotb" =>
        val d = SetOperation.builder().buildANotB()
        d.setA(sa); d.notB(sb)
        d.getResult(true).getEstimate
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaSetEstimate =
    copy(left = l, right = r)
}
