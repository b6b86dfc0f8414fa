package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Drop the elements of a string array whose 0-based positions appear in a
  * sorted-ascending int array — one linear two-pointer merge over the two
  * inputs.
  *
  * Why a custom expression: the substring-dedup rebuild
  * ([[graft.llm.SubstringDedup]]) keeps the tokens of a document whose
  * positions are NOT in its cut set. The HOF form
  * `filter(ws, (_, i) => !array_contains(cutpos, i))` re-scans the cut
  * array per token — O(len × cuts) for a long, mostly-duplicated document
  * (a pathological but real corpus shape: a boilerplate page duplicated
  * thousands of times). Because the cut set arrives sorted
  * (`sort_array(collect_set(...))`), a single merge pass is O(len + cuts),
  * and as a leaf expression it stays inside whole-stage codegen instead of
  * walking interpreted lambda closures per element.
  *
  * Contract: `idx` must be sorted ascending (duplicates tolerated;
  * out-of-range entries ignored). A non-monotonic index array THROWS
  * rather than silently dropping the wrong elements — the merge skips
  * past out-of-order entries, and this expression is also the public SQL
  * function `graft_drop_indices`, so an unsorted argument from the SQL
  * surface must fail loudly (wrap in `sort_array` when order is unknown).
  * Null array on either side → null (nullIntolerant); null ELEMENTS of
  * the value array are preserved when kept.
  */
case class DropIndices(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = left.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_drop_indices"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DropIndices.drop(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DropIndices.drop($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DropIndices {
  /** Called from generated code — must stay public + static-shaped. */
  def drop(arr: ArrayData, idx: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = idx.numElements()
    if (m == 0) return arr
    // enforce the sortedness contract: the merge below silently skips
    // out-of-order entries, which would drop the WRONG elements
    var t = 1
    while (t < m) {
      if (idx.getInt(t) < idx.getInt(t - 1))
        throw new IllegalArgumentException(
          "graft_drop_indices: index array must be sorted ascending, got " +
            s"${idx.getInt(t - 1)} before ${idx.getInt(t)} (wrap the " +
            "argument in sort_array when its order is unknown)")
      t += 1
    }
    val out = new Array[AnyRef](n)
    var i = 0
    var j = 0
    var k = 0
    while (i < n) {
      while (j < m && idx.getInt(j) < i) j += 1
      if (j < m && idx.getInt(j) == i) {
        j += 1 // position is cut
      } else {
        out(k) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        k += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Column surface: `dropIndices(ws, sortedCutPositions)`. */
  def dropIndices(arr: Column, idx: Column): Column =
    ColumnBridge.column(
      DropIndices(ColumnBridge.expression(arr), ColumnBridge.expression(idx)))
}
