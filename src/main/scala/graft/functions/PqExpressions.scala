package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (SURVEY.md §2.11 L3pq) — the compressed-scan
  * half of IVF-PQ, the ANN regime that actually survives 100 TB: embeddings
  * are stored as `m` small centroid codes (m ints ~ m bytes on disk after
  * parquet dictionary encoding, vs 4·dim float bytes raw), and a query batch
  * scores the ENTIRE code table with per-query lookup tables — no vector
  * arithmetic per row, no join, one map stage inside whole-stage codegen.
  *
  * Same design rules as the centroid kernels ([[NearestCentroid]] scaladoc):
  * the codebooks ride the expression node as flat literals (m·ksub·dsub
  * doubles — 8·256·8 = 16 KB at the classic 64-dim/8-subspace/256-centroid
  * shape), generated code loops over runtime matrices so code SIZE is
  * constant in m/ksub, and ties resolve to the LOWEST centroid index
  * (strict `>`), pinned by the drift-guard spec against a composed
  * slice/argmin reference form.
  *
  * Why these are expressions and not HOF compositions: Spark's higher-order
  * functions are CodegenFallback (interpreted per row, allocating), and a
  * composed per-subspace argmin would build m·ksub literal-dot subtrees —
  * the SignBandKeys codegen-size disease, measured minutes-vs-seconds at
  * k=80 on the centroid family.
  */
object PqKernels {
  /** flat (m·ksub·dsub) → [m][ksub][dsub], plus per-centroid half-norms
    * [m][ksub] for the argmin-L2-as-argmax-dot identity
    * `argmin ||x-c||^2 == argmax (x·c - ||c||^2/2)`.
    */
  private[functions] def toBooks(flat: Seq[Double], m: Int, ksub: Int,
      dsub: Int): (Array[Array[Array[Double]]], Array[Array[Double]]) = {
    val books = Array.tabulate(m, ksub, dsub) { (j, c, i) =>
      flat(j * ksub * dsub + c * dsub + i)
    }
    val half = books.map(_.map(c => c.map(x => x * x).sum / 2))
    (books, half)
  }
}

/** PQ encode: `array<double>` vector (dim >= m·dsub; extra trailing
  * components ignored, short vectors zero-pad) → `array<int>` of m codes,
  * code j = argmin-L2 centroid of subspace j's codebook.
  */
case class PqEncode(child: Expression, books: Seq[Double], m: Int,
    dsub: Int, ksub: Int) extends UnaryExpression {
  require(m > 0 && dsub > 0 && ksub > 0,
    s"m/dsub/ksub must be positive, got $m/$dsub/$ksub")
  require(books.length == m * ksub * dsub,
    s"flat codebook length ${books.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val (bk, half) =
    PqKernels.toBooks(books, m, ksub, dsub)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var best = 0
      var bestS = Double.NegativeInfinity
      var c = 0
      while (c < ksub) {
        val row = bk(j)(c)
        val n = math.max(math.min(v.numElements() - base, dsub), 0)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(base + i) * row(i); i += 1 }
        s -= half(j)(c)
        if (s > bestS) { bestS = s; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bkRef = ctx.addReferenceObj("books", bk, "double[][][]")
    val halfRef = ctx.addReferenceObj("half", half, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $base = $j * $dsub;
         |  int $best = 0;
         |  double $bestS = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double[] $row = $bkRef[$j][$c];
         |    int $n = java.lang.Math.max(
         |      java.lang.Math.min($v.numElements() - $base, $dsub), 0);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $v.getDouble($base + $i) * $row[$i];
         |    }
         |    $s -= $halfRef[$j][$c];
         |    if ($s > $bestS) { $bestS = $s; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SDC pair scoring (symmetric distance computation, the PQ paper's
  * code-vs-code regime): two PQ code arrays → the approximate dot product
  * of the two QUANTIZED unit vectors, read off the precomputed
  * per-subspace centroid×centroid dot table `tables` (flat m·ksub·ksub,
  * entry (j,a,b) = dot(centroid (j,a), centroid (j,b)) — 32 K doubles at
  * the knn-graph m=8/ksub=64 shape, one driver-side computation per
  * trained model).
  *
  * This is the candidate PRE-RANK of the k-NN graph: where the exact
  * verify must re-attach two 8·dim-byte vectors per candidate pair and
  * walk dim multiplies, SDC re-attaches two m-int code rows (~60× less
  * join payload at dim=64) and does m table lookups — so the expensive
  * exact stage runs on k·refine survivors per query instead of
  * nProbe·cellSize candidates. Out-of-range codes contribute 0 (same
  * contract as [[AdcScores]]); a pair of SHORT code arrays sums over the
  * common prefix.
  */
case class SdcScore(left: Expression, right: Expression,
    tables: Seq[Double], ksub: Int) extends BinaryExpression {
  require(ksub > 0, s"ksub must be positive, got $ksub")
  require(tables.nonEmpty && tables.length % (ksub * ksub) == 0,
    s"flat table length ${tables.length} not a multiple of " +
      s"ksub*ksub = ${ksub * ksub}")

  private val m = tables.length / (ksub * ksub)

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sdc_score"

  @transient private lazy val tab: Array[Double] = tables.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<int>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ca = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val nm = math.min(math.min(ca.numElements(), cb.numElements()), m)
    var s = 0.0
    var j = 0
    while (j < nm) {
      val x = ca.getInt(j)
      val y = cb.getInt(j)
      if (x >= 0 && x < ksub && y >= 0 && y < ksub)
        s += tab(j * ksub * ksub + x * ksub + y)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tabRef = ctx.addReferenceObj("tab", tab, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nm = ctx.freshName("nm")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $nm = java.lang.Math.min(
         |  java.lang.Math.min($a.numElements(), $b.numElements()), $m);
         |double $s = 0.0;
         |for (int $j = 0; $j < $nm; $j++) {
         |  int $x = $a.getInt($j);
         |  int $y = $b.getInt($j);
         |  if ($x >= 0 && $x < $ksub && $y >= 0 && $y < $ksub)
         |    $s += $tabRef[$j * $ksub * $ksub + $x * $ksub + $y];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ADC batch scoring: `array<int>` PQ codes → `array<double>` of one
  * asymmetric-distance score per query. `tables` is the flat
  * (nQueries · m · ksub) lookup matrix the DRIVER precomputes per query
  * batch — entry (q, j, c) = dot(query_q subvector j, codebook j centroid c)
  * — so scoring a row is m array lookups and adds per query: the whole
  * corpus-side cost of a PQ search is this one allocation-free map pass
  * over the code table. Out-of-range codes (foreign or corrupt code
  * tables) contribute 0 rather than reading out of bounds.
  */
case class AdcScores(child: Expression, tables: Seq[Double], ksub: Int,
    nQueries: Int) extends UnaryExpression {
  require(ksub > 0 && nQueries > 0,
    s"ksub/nQueries must be positive, got $ksub/$nQueries")
  require(tables.nonEmpty && tables.length % (ksub * nQueries) == 0,
    s"flat table length ${tables.length} not a multiple of " +
      s"ksub*nQueries = ${ksub * nQueries}")

  private val m = tables.length / (ksub * nQueries)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_adc_scores"

  // [nQueries][m*ksub] — row-per-query keeps the inner loop a single
  // flat-array walk indexed by (j*ksub + code_j)
  @transient private lazy val tab: Array[Array[Double]] =
    tables.grouped(m * ksub).map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val nm = math.min(codes.numElements(), m)
    val out = new Array[Double](nQueries)
    var q = 0
    while (q < nQueries) {
      val t = tab(q)
      var s = 0.0
      var j = 0
      while (j < nm) {
        val c = codes.getInt(j)
        if (c >= 0 && c < ksub) s += t(j * ksub + c)
        j += 1
      }
      out(q) = s
      q += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tabRef = ctx.addReferenceObj("tab", tab, "double[][]")
    nullSafeCodeGen(ctx, ev, codes => {
      val out = ctx.freshName("out")
      val nm = ctx.freshName("nm")
      val q = ctx.freshName("q")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |int $nm = java.lang.Math.min($codes.numElements(), $m);
         |double[] $out = new double[$nQueries];
         |for (int $q = 0; $q < $nQueries; $q++) {
         |  double[] $t = $tabRef[$q];
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $nm; $j++) {
         |    int $c = $codes.getInt($j);
         |    if ($c >= 0 && $c < $ksub) $s += $t[$j * $ksub + $c];
         |  }
         |  $out[$q] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
