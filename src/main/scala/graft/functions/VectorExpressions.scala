package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over `array<double>` columns.
  *
  * Why a custom Catalyst `Expression` (SURVEY.md §7.4 revisited): the
  * built-in higher-order form `aggregate(zip_with(a, b, *), 0.0, +)` is
  * semantically equivalent but `HigherOrderFunction`s don't participate in
  * whole-stage codegen — every evaluation walks interpreted lambda closures
  * and allocates an intermediate zipped array. In the LSH verify stages the
  * per-candidate-pair cost is exactly this lambda overhead, so this is the
  * one place the engine's built-ins genuinely can't express the semantics
  * efficiently. The generated code is a tight primitive loop with no
  * allocation.
  *
  * Null semantics: null array → null (nullIntolerant); null *elements* are
  * read as 0.0 (embedding fixtures carry none — documented contract). A
  * length mismatch folds over the shorter prefix (`zip_with` would instead
  * null-pad and poison the sum); inputs are fixed-dim embeddings either way.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column + SQL surface for the native vector expressions. */
object GraftFunctions {

  /** Codegen'd dot product (see [[DotProduct]]). */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd MinHash signature (see [[MinHashSig]]). */
  def minhashSigNative(hs: Column, nPerm: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hs), nPerm))

  /** Codegen'd 64-bit SimHash over token hashes (see [[SimHash64]]). */
  def simhash64Native(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))

  /** Native rolling n-gram hashes off the text bytes (see [[NgramHashes]]). */
  def ngramHashesNative(text: Column, n: Int): Column =
    ColumnBridge.column(NgramHashes(ColumnBridge.expression(text), n))

  /** Native distinct shingle hashes off the text bytes (see [[ShingleHashes]]). */
  def shingleHashesNative(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))

  /** Codegen'd sign-LSH band keys (see [[SignBandKeys]]). */
  def signBandKeys(v: Column, nBands: Int, bitsPerBand: Int,
      dim: Int): Column =
    ColumnBridge.column(
      SignBandKeys(ColumnBridge.expression(v), nBands, bitsPerBand, dim))

  /** Codegen'd argbest centroid id over a flat k x dim matrix (see
    * [[NearestCentroid]]).
    */
  def nearestCentroid(v: Column, cents: Seq[Double], dim: Int,
      euclidean: Boolean): Column =
    ColumnBridge.column(
      NearestCentroid(ColumnBridge.expression(v), cents, dim, euclidean))

  /** Codegen'd argbest centroid WITH score (see [[BestCentroid]]). */
  def bestCentroid(v: Column, cents: Seq[Double], dim: Int): Column =
    ColumnBridge.column(
      BestCentroid(ColumnBridge.expression(v), cents, dim))

  /** Codegen'd nOut-best centroid ids (see [[TopCentroids]]). */
  def topCentroids(v: Column, cents: Seq[Double], dim: Int, nOut: Int,
      euclidean: Boolean): Column =
    ColumnBridge.column(
      TopCentroids(ColumnBridge.expression(v), cents, dim, nOut, euclidean))

  /** Register `graft_dot` for SQL use on an existing session (works on any
    * session, no extensions needed at build time).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
}

/** `SparkSessionExtensions` installer — the deployment path for clusters
  * where the session is built by infra, not application code:
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
