package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document unigram+bigram occurrence counts as ONE row-local map —
  * the DSIR featurizer without a token-level explode (r12, VERDICT r11
  * item 3).
  *
  * A document's (feature -> count) table needs no cross-row information:
  * each doc is one row, so the `explode(words) UNION explode(bigrams)`
  * + `groupBy(doc_id, f).count()` pipeline was paying a full token-grain
  * fan-out and a (doc_id, f) hash SHUFFLE (the suite's largest at
  * 15.8 MB) to compute something a single expression can emit per row.
  * This kernel tokenizes once, counts unigrams and adjacent-pair bigrams
  * into one map, and the consumer explodes the ALREADY-AGGREGATED map
  * (distinct features per doc — strictly fewer rows than token
  * occurrences), with zero shuffle.
  *
  * Tokenization parity (oracle contract): tokens are `split(text, " ")`
  * with trailing empties kept (Java `split(" ", -1)` — same result as
  * Spark's `StringSplit` for the single-space pattern), bigrams are
  * adjacent tokens joined by one space — exactly
  * [[graft.llm.TextOps.words]] / `ngramsAll(text, 2)`; parity with the
  * HOF reference path is law-tested in DsirSpec for both key modes.
  *
  * `hashBuckets > 0` emits `pmod(xxhash64(gram), hashBuckets)` keys
  * (map&lt;long,long&gt;) via the same `XxHash64Function` the builtin
  * `xxhash64` evaluates — the paper's fixed-bucket production form,
  * counts of colliding grams combined in-map exactly as the grouped form
  * combined them. `hashBuckets <= 0` keeps exact string features
  * (map&lt;string,long&gt;), the DuckDB-restatable fixture form.
  *
  * Null text → null (nullIntolerant) — the exploded consumer sees no
  * rows, matching `explode(split(null))`.
  */
case class UnibiCounts(child: Expression, hashBuckets: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    if (hashBuckets > 0) MapType(LongType, LongType, valueContainsNull = false)
    else MapType(StringType, LongType, valueContainsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_unibi_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    UnibiCounts.count(input.asInstanceOf[UTF8String], hashBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnibiCounts.count($c, $hashBuckets)")

  override protected def withNewChildInternal(c: Expression): UnibiCounts =
    copy(child = c)
}

object UnibiCounts {

  /** Called from generated code — must stay public + static-shaped.
    * LinkedHashMap keeps first-occurrence order so the emitted map (and
    * any downstream explode order) is deterministic per document.
    */
  def count(text: UTF8String, hashBuckets: Int): MapData = {
    val toks = text.toString.split(" ", -1)
    if (hashBuckets > 0) {
      val m = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
      def add(gram: String): Unit = {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(UTF8String.fromString(gram), StringType, 42L)
        val b = hashBuckets.toLong
        val k = java.lang.Long.valueOf(((h % b) + b) % b)
        val c = m.get(k)
        if (c == null) m.put(k, Array(1L)) else c(0) += 1L
      }
      var i = 0
      while (i < toks.length) {
        add(toks(i))
        if (i + 1 < toks.length) add(toks(i) + " " + toks(i + 1))
        i += 1
      }
      val keys = new Array[Any](m.size)
      val vals = new Array[Any](m.size)
      var j = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        keys(j) = e.getKey.longValue()
        vals(j) = e.getValue()(0)
        j += 1
      }
      new ArrayBasedMapData(new GenericArrayData(keys),
        new GenericArrayData(vals))
    } else {
      val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
      def add(gram: String): Unit = {
        val k = UTF8String.fromString(gram)
        val c = m.get(k)
        if (c == null) m.put(k, Array(1L)) else c(0) += 1L
      }
      var i = 0
      while (i < toks.length) {
        add(toks(i))
        if (i + 1 < toks.length) add(toks(i) + " " + toks(i + 1))
        i += 1
      }
      val keys = new Array[Any](m.size)
      val vals = new Array[Any](m.size)
      var j = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        keys(j) = e.getKey
        vals(j) = e.getValue()(0)
        j += 1
      }
      new ArrayBasedMapData(new GenericArrayData(keys),
        new GenericArrayData(vals))
    }
  }

  /** Column surface (see [[UnibiCounts]]). */
  def unibiCounts(c: Column, hashBuckets: Int): Column =
    ColumnBridge.column(UnibiCounts(ColumnBridge.expression(c), hashBuckets))
}
