package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Laws for the selection layer ([[Selection]]): the token-budget greedy
  * selection's two-phase prefix sum against a driver-side reference and
  * across partitionings, and the Aho–Corasick blocklist kernel against the
  * contains-per-phrase reference semantics.
  */
class SelectionSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // score = stopword ratio with STOPWORDS = {the, a}: "the the x" -> 2/3
  private def doc(id: Long, nStop: Int, nOther: Int): (Long, String, String) =
    (id, (Seq.fill(nStop)("the") ++ Seq.fill(nOther)("x")).mkString(" "),
      s"src${id % 3}")

  test("budgetSelect: strict greedy prefix — no back-fill past the first " +
    "overflowing doc, ties break by doc_id") {
    // scores: d0=1.0 (4 toks), d1=1.0 (4 toks) [tie -> d0 first],
    // d2=0.5 (8 toks), d3=0.25 (4 toks)
    val docs = Seq(
      doc(0, 4, 0), doc(1, 4, 0),
      (2L, (Seq.fill(4)("the") ++ Seq.fill(4)("x")).mkString(" "), "src2"),
      doc(3, 1, 3)).toDF("doc_id", "text", "source")
    // budget 12: d0 (cum 4) + d1 (cum 8) + d2 (cum 16 > 12 -> DROPPED) and
    // d3 must NOT back-fill (cum accounting includes the dropped doc? no —
    // strict prefix: cum(d3) = 4+4+8+4 = 20 > 12, also out)
    val sel = Selection.budgetSelect(docs, budget = 12L, parts = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(sel == Seq(0L, 1L))
    // budget 16 admits the prefix through d2
    val sel16 = Selection.budgetSelect(docs, budget = 16L, parts = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(sel16 == Seq(0L, 1L, 2L))
  }

  test("degenerate docs (null text) score 0 and never outrank real docs — " +
    "no NaN enters the range partitioner or the selected set") {
    val docs = Seq(
      (0L, "the the the signal doc", "src0"),   // score 3/5
      (1L, null.asInstanceOf[String], "src0"),  // degenerate: toks 0
      (2L, "", "src0"),                          // one empty token: score 0
      (3L, "the a the a", "src0")                // score 1.0, 4 toks
    ).toDF("doc_id", "text", "source")
    // neither crashes nor sorts nondeterministically; budget 9 takes the
    // two scored docs (4 + 5 toks); the null doc (toks 0, score 0) ranks
    // LAST among score-0 rows by id and must not displace anything
    val sel = Selection.budgetSelect(docs, budget = 9L, parts = 2)
      .select("doc_id", "toks", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(sel.map(_._1).toSeq === Seq(0L, 3L))
    assert(sel.forall(r => !r._3.isNaN), s"NaN score leaked: ${sel.toSeq}")
    // with a budget past every real doc, the zero-token docs are admitted
    // at score 0 / toks 0 — present, harmless, deterministic
    val all = Selection.budgetSelect(docs, budget = 100L, parts = 2)
      .select("doc_id", "toks", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(all.length === 4)
    val nullDoc = all.find(_._1 === 1L).get
    assert(nullDoc._2 === 0L && nullDoc._3 === 0.0)
  }

  test("budgetSelect: two-phase scan == driver-side global prefix sum, " +
    "invariant under the partition count") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select("doc_id", "text", "source")
    // driver reference: global sort + running sum
    val scored = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("toks"),
      (size(filter(split(col("text"), " "),
        x => x.isin(TextOps.STOPWORDS: _*))).cast("double")
        / size(split(col("text"), " "))).as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, _, s) => (-s, id) }
    var cum = 0L
    val want = scored.takeWhile { case (_, t, _) =>
      cum += t; cum <= 10000L
    }.map(_._1).toSeq.sorted
    for (parts <- Seq(1, 4, 32)) {
      val got = Selection.budgetSelect(docs, budget = 10000L, parts = parts)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == want, s"parts=$parts diverged from the global prefix")
    }
  }

  test("budgetSelectPerSource == independent budgetSelect per source; " +
    "unbudgeted sources contribute nothing") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select("doc_id", "text", "source")
    val budgets = Map("src0" -> 800L, "src3" -> 450L, "src7" -> 1200L)
    val grouped = Selection.budgetSelectPerSource(docs, budgets)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val independent = budgets.keys.toSeq.sorted.flatMap { src =>
      Selection.budgetSelect(docs.filter(col("source") === src),
        budgets(src)).select("doc_id").as[Long].collect()
    }.sorted
    assert(grouped == independent)
    val srcs = Selection.budgetSelectPerSource(docs, budgets)
      .select("source").distinct().as[String].collect().toSet
    assert(srcs.subsetOf(budgets.keySet))
  }

  test("budget selection: no window partitioned on bare source (the " +
    "skewed-giant-source trap), and the range layout is released on return") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select("doc_id", "text", "source")
    // plan shape: build un-materialized (release=false) so the window is
    // visible, run it, then inspect the executed plan
    import org.apache.spark.sql.execution.window.WindowExec
    for (df <- Seq(
        Selection.budgetSelectPerSource(docs,
          Map("src0" -> 800L, "src3" -> 450L), release = false),
        Selection.budgetSelect(docs, 10000L, release = false))) {
      df.collect()
      val wins = graft.PlanAsserts.deepCollect(
        df.queryExecution.executedPlan) { case w: WindowExec => w }
      assert(wins.nonEmpty)
      wins.foreach { w =>
        val keys = w.partitionSpec.map(_.toString)
        assert(w.partitionSpec.size >= 2,
          s"window must partition on (pid, stratum), got $keys")
        assert(keys.exists(_.contains("pid")),
          s"window partitioned on bare source (no pid key): $keys")
      }
    }
    spark.sharedState.cacheManager.clearCache() // release=false layouts
    // lifecycle law: with release=true (the default) nothing stays in the
    // cache manager after the call returns — the long-lived-session leak
    // class (Serve daemon precedent) is closed
    assert(spark.sharedState.cacheManager.isEmpty)
    val sel = Selection.budgetSelect(docs, 10000L)
    assert(spark.sharedState.cacheManager.isEmpty,
      "budgetSelect leaked a cached layout")
    assert(sel.count() > 0)
    Selection.budgetSelectPerSource(docs, Map("src0" -> 800L)).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "budgetSelectPerSource leaked a cached layout")
  }

  test("budgetSelectPerSource: one 90%-skewed source still splits across " +
    "range partitions (no one-task sort)") {
    // 9 copies of the corpus under ONE source + the original spread over
    // its sources: the giant source must occupy many range partitions
    val base = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select("doc_id", "text", "source")
    val giant = (0 until 9).map { c =>
      base.withColumn("doc_id", col("doc_id") + lit((c + 1) * 1000000L))
        .withColumn("source", lit("web"))
    }.reduce(_ union _).union(base)
    val budgets = Map("web" -> 2000L, "src0" -> 800L)
    val got = Selection.budgetSelectPerSource(giant, budgets)
      .groupBy("source").agg(max("cum").as("mx"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // correctness under skew: each source filled to its budget
    assert(got("web")._1 <= 2000L && got("web")._2 > 0)
    assert(got("src0")._1 <= 800L && got("src0")._2 > 0)
    // layout law: the giant source spans >1 range partition (the window
    // never sees the whole source in one task)
    val ranged = giant.select(col("doc_id"), col("source"),
      lit(1L).as("toks"), rand(7).as("score"))
      .repartitionByRange(32, col("source").asc, col("score").desc,
        col("doc_id").asc)
      .withColumn("pid", spark_partition_id())
      .filter(col("source") === "web")
      .select("pid").distinct().count()
    assert(ranged > 8, s"giant source occupies only $ranged partitions")
  }

  test("AhoCorasick: overlapping phrases, repeats deduped, sorted emit, " +
    "empty on clean text") {
    val ac = new graft.functions.AhoCorasick(Seq("ab", "abc", "bc", "zz"))
    def m(s: String): Seq[String] =
      ac.matchSorted(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(String.valueOf).toSeq
    assert(m("xabcd") == Seq("ab", "abc", "bc"))
    assert(m("ab ab ab") == Seq("ab")) // repeats once
    assert(m("zzz") == Seq("zz"))
    assert(m("nothing here") == Seq())
    assert(m("") == Seq())
    // phrase at the very start and very end
    assert(m("abx") == Seq("ab"))
    assert(m("xxbc") == Seq("bc"))
  }

  test("MatchPhrases == contains-per-phrase reference on the fixture corpus") {
    val phrases = Seq("slow join", "table scan", "batch batch batch",
      "merge slow", "fast key order", "never matches anything")
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select("doc_id", "text")
    val got = docs.select(col("doc_id"),
      graft.functions.MatchPhrases.matchPhrases(col("text"), phrases)
        .as("m"))
      .as[(Long, Seq[String])].collect().toMap
    val ref = docs.as[(Long, String)].collect().map { case (id, t) =>
      id -> phrases.filter(t.contains).sorted
    }.toMap
    assert(got.size == ref.size)
    ref.foreach { case (id, want) =>
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    // the fixture actually exercises matches (non-degenerate test)
    assert(ref.values.exists(_.nonEmpty))
  }

  test("MatchPhrases participates in whole-stage codegen (no fallback)") {
    val df = spark.range(1)
      .select(concat(lit("a slow join here "), col("id")).as("text"))
      .select(graft.functions.MatchPhrases.matchPhrases(col("text"),
        Seq("slow join")).as("m"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_match_phrases"),
      s"expected codegen in:\n$plan")
    assert(df.as[Seq[String]].head() == Seq("slow join"))
  }
}
