package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: `nPerm` derived-permutation minima of a 64-bit
  * shingle-hash array, in ONE codegen'd pass.
  *
  * Value-compatible by construction with the HOF definition it replaces
  * (`transform(sequence(0, nPerm-1), i => array_min(transform(hs, h =>
  * xxhash64(h, i))))` — the drift guard test in SignatureExpressionsSpec
  * pins equality): Spark's `xxhash64(h, i)` chains `XXH64.hashLong(h, 42)`
  * then `XXH64.hashInt(i, ·)` (the sequence index is an int), and
  * `array_min` compares signed longs. Signature VALUES are stored dedup
  * state (`minhashSignatures` tables), so the native form must reproduce
  * them exactly — and does, by calling the same public `XXH64` kernels.
  *
  * Why native instead of the HOF chain: higher-order functions don't
  * participate in whole-stage codegen — per row the HOF walks 3 nested
  * interpreted lambdas and allocates nPerm intermediate arrays, and the
  * expression TREE (64 array_min subtrees after CollapseProject) is what
  * made Janino compilation a measured multi-second cost per invocation.
  * This form is one tree node, one tiny generated loop, zero allocation
  * beyond the output, and hoists `hashLong(h, 42)` out of the permutation
  * loop (the HOF recomputes it per (h, i)).
  *
  * Null semantics, matching the HOF: null array → null; a null ELEMENT
  * contributes `hashInt(i, 42)` (Spark hash functions leave the seed
  * unchanged on null children); an EMPTY array yields all-null components
  * (`array_min` of nothing is null).
  */
case class MinHashSig(child: Expression, nPerm: Int) extends UnaryExpression {
  require(nPerm > 0, s"nPerm must be positive, got $nPerm")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](nPerm))
    val mins = Array.fill(nPerm)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val base =
        if (hs.isNullAt(i)) 42L else XXH64.hashLong(hs.getLong(i), 42L)
      var p = 0
      while (p < nPerm) {
        val h = XXH64.hashInt(p, base)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val m = ctx.freshName("m")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |int $m = $hs.numElements();
         |if ($m == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$nPerm]);
         |} else {
         |  long[] $mins = new long[$nPerm];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $base = $hs.isNullAt($i)
         |      ? 42L : $xxh.hashLong($hs.getLong($i), 42L);
         |    for (int $p = 0; $p < $nPerm; $p++) {
         |      long $h = $xxh.hashInt($p, $base);
         |      if ($h < $mins[$p]) $mins[$p] = $h;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native signed-random-projection band keys for cosine LSH: project an
  * `array<double>` vector onto `nBands * bitsPerBand` deterministic
  * hyperplanes, take sign bits, and pack each band's bits into one long —
  * the per-band bucket key, ready for `posexplode` (position = band index).
  *
  * Replaces a 64-subtree plan (one `when(dot(v, plane_j) >= 0, ...)` per
  * bit, then slice+hash per band) whose Janino + JIT warm-up dominated the
  * query's wall time at bench scale. Bucket MEMBERSHIP is unchanged: bit j
  * is the same `dot(v, plane_j) >= 0` over the same SplitMix64-derived
  * planes with the same sequential summation order, and two vectors share a
  * band bucket iff their band bits are identical — packed bits are an
  * injective band key where the old form used a hash of the bit array.
  *
  * Planes are derived from (band, bit, component) indices alone — nothing
  * to broadcast, each executor re-derives them once per task-set from three
  * ints ([[SignBandKeys.planeComponent]]).
  *
  * At 100 TB: the corpus ships (id, nBands longs) into the bucket shuffle;
  * this expression is the only thing that touches every vector, and it is
  * a single codegen'd loop per row.
  */
case class SignBandKeys(child: Expression, nBands: Int, bitsPerBand: Int,
    dim: Int) extends UnaryExpression {
  require(nBands > 0 && bitsPerBand > 0 && bitsPerBand <= 63,
    s"need nBands > 0 and 0 < bitsPerBand <= 63, got ($nBands, $bitsPerBand)")
  require(dim > 0, s"dim must be positive, got $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sign_band_keys"

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nBands * bitsPerBand, dim)(SignBandKeys.planeComponent)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val keys = new Array[Long](nBands)
    val nBits = nBands * bitsPerBand
    var j = 0
    while (j < nBits) {
      val p = planes(j)
      val n = math.min(v.numElements(), p.length)
      var s = 0.0
      var k = 0
      while (k < n) { s += v.getDouble(k) * p(k); k += 1 }
      if (s >= 0) keys(j / bitsPerBand) |= 1L << (j % bitsPerBand)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val keys = ctx.freshName("keys")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      s"""
         |long[] $keys = new long[$nBands];
         |for (int $j = 0; $j < ${nBands * bitsPerBand}; $j++) {
         |  double[] $p = $planesRef[$j];
         |  int $n = java.lang.Math.min($v.numElements(), $p.length);
         |  double $s = 0.0;
         |  for (int $k = 0; $k < $n; $k++) {
         |    $s += $v.getDouble($k) * $p[$k];
         |  }
         |  if ($s >= 0) $keys[$j / $bitsPerBand] |= 1L << ($j % $bitsPerBand);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 64-bit SimHash over an array of token hashes: per-bit majority
  * vote in one codegen'd loop — bit i of the result is set iff strictly
  * more tokens have bit i set than clear.
  *
  * Value-compatible with the nested-HOF SQL form it replaces
  * (`aggregate(hashes, array_repeat(0L, 64), (acc, h) -> zip_with(acc,
  * sequence(0, 63), (a, i) -> a + if((shiftright(h, i) & 1) = 1, 1L,
  * -1L)))` then sign-bit reassembly — the drift guard in
  * SignatureExpressionsSpec pins equality): same per-bit ±1 counters,
  * same strict `> 0` tie rule (a tied bit stays 0), empty array → 0L,
  * null array → null, and a null ELEMENT votes −1 on every bit (the SQL
  * `if` takes its else branch on a null condition).
  *
  * Why native: the HOF chain allocates a 64-long counter array per TOKEN
  * (zip_with) and walks three interpreted lambdas per element — 64×T
  * interpreted ops per row. This is one generated loop, one counter array
  * per ROW, fully inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h = if (hs.isNullAt(i)) 0L else hs.getLong(i)
      val nullElem = hs.isNullAt(i)
      var b = 0
      while (b < 64) {
        if (!nullElem && ((h >> b) & 1L) == 1L) counters(b) += 1
        else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counters(b) > 0) out |= 1L << b; b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val m = ctx.freshName("m")
      val counters = ctx.freshName("counters")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val nul = ctx.freshName("nul")
      val out = ctx.freshName("out")
      s"""
         |int $m = $hs.numElements();
         |int[] $counters = new int[64];
         |for (int $i = 0; $i < $m; $i++) {
         |  boolean $nul = $hs.isNullAt($i);
         |  long $h = $nul ? 0L : $hs.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if (!$nul && (($h >> $b) & 1L) == 1L) $counters[$b]++;
         |    else $counters[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counters[$b] > 0) $out |= 1L << $b;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native rolling 64-bit n-gram hashes over a space-tokenized string: one
  * `long` per n-word window, straight off the text bytes in a single pass.
  *
  * Value-compatible by construction with the HOF form it replaces (the
  * n−1-deep `zip_with` fold over `transform(split(text, " "), xxhash64)` —
  * the drift guard in SignatureExpressionsSpec pins equality): word k's
  * hash is `XXH64.hashUnsafeBytes` over its bytes with seed 42 (exactly
  * Spark's `xxhash64(word)`), and the window fold is Spark's two-arg
  * `xxhash64(acc, next)` = `hashLong(next, hashLong(acc, 42))`. Splitting
  * scans for the 0x20 byte directly — UTF-8 multibyte sequences never
  * contain it, and Spark's `split(text, " ")` (limit −1) keeps leading /
  * trailing / repeated-separator empty words, as does this scan. Gram
  * VALUES feed stored decontamination state, so bit-for-bit parity is a
  * contract, not an optimization detail.
  *
  * Why native: nested-HOF arguments defeat subexpression elimination — the
  * plan re-derives `transform(split(text))` for every one of the n−1 zips
  * (~2(n−1) splits + hash passes per row, all interpreted, each allocating
  * its array). This is one split scan, one word-hash array, one rolling
  * loop, inside whole-stage codegen.
  *
  * Null semantics, matching the HOF: null text → null; fewer than n words
  * → empty array (nothing to hash).
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ngram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    var w = 1
    var i = 0
    while (i < nb) {
      if (Platform.getByte(base, off + i) == ' '.toByte) w += 1
      i += 1
    }
    if (w < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val wh = new Array[Long](w)
    var k = 0
    var start = 0
    i = 0
    while (i <= nb) {
      if (i == nb || Platform.getByte(base, off + i) == ' '.toByte) {
        wh(k) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        k += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](w - n + 1)
    var p = 0
    while (p < out.length) {
      var g = wh(p)
      var j = 1
      while (j < n) {
        g = XXH64.hashLong(wh(p + j), XXH64.hashLong(g, 42L))
        j += 1
      }
      out(p) = g
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into the single-pass kernel above — the win
    // is escaping interpreted HOF dispatch, not inlining the byte scan
    val ref = ctx.addReferenceObj("ngramHashes", this, classOf[NgramHashes].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native distinct shingle hashes over a space-tokenized string: the
  * 64-bit hash of every n-word window, first-occurrence-deduped, in one
  * pass off the text bytes.
  *
  * Value-compatible by construction with the HOF chain it replaces
  * (`array_distinct(transform(sequence(1, size(wh)-(n-1)), i =>
  * xxhash64(slice(wh, i, n))))` over `wh = transform(split(text, " "),
  * xxhash64)` — the SignatureExpressionsSpec drift guard pins equality,
  * ELEMENT ORDER INCLUDED): Spark's `xxhash64(array<bigint>)` folds
  * `XXH64.hashLong` over the elements from seed 42 without re-seeding, and
  * `array_distinct` keeps first occurrences in encounter order. These
  * values are upstream of every stored MinHash signature
  * (`VectorOps.sigColumn` consumes them), so bit drift would make
  * persisted dedup state unreadable — the same contract [[MinHashSig]]
  * carries.
  *
  * NOTE the window hash is NOT [[NgramHashes]]'s: that kernel re-seeds per
  * fold step (Spark's two-arg `xxhash64(acc, next)`), this one chains the
  * running hash straight through (Spark's one-arg `xxhash64(array)`). The
  * two coexist because each replaced a different HOF with stored state
  * behind it.
  *
  * Why native: beyond interpreted-HOF cost, the old form needed a PERSIST
  * BARRIER per call site — `slice(wh, i, n)` captures the word-hash array
  * inside a lambda, and CollapseProject would inline the producing
  * transform to re-run once per window — so every caller carried a
  * persist/count/unpersist job train just to keep the word-hash pass
  * single-execution. One expression node has nothing to re-inline: the
  * barrier machinery disappears with it.
  *
  * Null semantics, matching the HOF: null text → null; fewer than n words
  * → empty array.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    var w = 1
    var i = 0
    while (i < nb) {
      if (Platform.getByte(base, off + i) == ' '.toByte) w += 1
      i += 1
    }
    if (w < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val wh = new Array[Long](w)
    var k = 0
    var start = 0
    i = 0
    while (i <= nb) {
      if (i == nb || Platform.getByte(base, off + i) == ' '.toByte) {
        wh(k) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        k += 1
        start = i + 1
      }
      i += 1
    }
    val m = w - n + 1
    // first-occurrence dedup via open addressing (no boxing, no sort —
    // encounter order is part of the parity contract)
    var cap = 8
    while (cap < m * 2) cap <<= 1
    val slots = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](m)
    var cnt = 0
    var p = 0
    while (p < m) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(wh(p + j), h); j += 1 }
      var idx = (h ^ (h >>> 32)).toInt & (cap - 1)
      while (used(idx) && slots(idx) != h) idx = (idx + 1) & (cap - 1)
      if (!used(idx)) {
        used(idx) = true
        slots(idx) = h
        out(cnt) = h
        cnt += 1
      }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBandKeys {
  /** Deterministic hyperplane component (j, k) in [-1, 1]: the public
    * SplitMix64 finalizer over the packed indices — no RNG state, identical
    * on every executor and every JVM.
    */
  def planeComponent(j: Int, k: Int): Double = {
    var z = ((j.toLong << 32) | (k.toLong & 0xffffffffL)) +
      0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue
  }
}
