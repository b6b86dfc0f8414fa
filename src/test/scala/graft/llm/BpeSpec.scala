package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class BpeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** In-test reference BPE (Sennrich learn_bpe on word counts) — an
    * independent formulation (list-of-symbols fold, no string replace) so
    * representation bugs in the engine's `|`-separator encoding can't
    * self-confirm.
    */
  private def refTrain(words: Map[String, Long], rounds: Int)
      : Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((sy, c) <- vocab; i <- 0 until sy.length - 1)
        counts((sy(i), sy(i + 1))) = counts.getOrElse((sy(i), sy(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq
          .sortBy { case ((x, y), m) => (-m, x, y) }.head
        out += ((a, b, n))
        // left-to-right non-overlapping apply
        vocab = vocab.map { case (sy, c) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) {
              nb += (a + b); i += 2
            } else { nb += sy(i); i += 1 }
          }
          nb.result() -> c
        }.groupMapReduce(_._1)(_._2)(_ + _)
        r += 1
      }
    }
    out.result()
  }

  private def refTokens(words: Seq[String], merges: Seq[(String, String, Long)])
      : Long =
    words.map { w =>
      var sy = w.map(_.toString).toVector
      for ((a, b, _) <- merges) {
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < sy.length) {
          if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) {
            nb += (a + b); i += 2
          } else { nb += sy(i); i += 1 }
        }
        sy = nb.result()
      }
      sy.length.toLong
    }.sum

  test("train == independent reference on a classic corpus") {
    val docs = Seq("low low low low low", "lower lower newest newest",
      "newest newest newest newest", "widest widest widest")
      .toDF("text")
    val got = Bpe.train(docs, "text", 6).map(m => (m.lhs, m.rhs, m.cnt))
    val want = refTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 6)
    assert(got === want)
  }

  test("merge apply is left-to-right non-overlapping (the eee case)") {
    val docs = Seq("eee eee").toDF("text")
    val got = Bpe.train(docs, "text", 2).map(m => (m.lhs, m.rhs, m.cnt))
    // round 1: (e,e) appears twice per word (pairs of "|e|e|e") -> cnt 4;
    // apply merges only the FIRST pair ("|ee|e"); round 2: (ee, e) cnt 2
    assert(got === Seq(("e", "e", 4L), ("ee", "e", 2L)))
  }

  test("merged symbols never false-match inside longer symbols") {
    // after (a,b)->ab, word "xab" must merge at (x? no) — the seq "|x|a|b"
    // contains "|a|b" at a symbol start; "xa" + "b" ("|xa|b") must NOT
    val docs = Seq("ab ab xab").toDF("text")
    val m1 = Bpe.train(docs, "text", 1)
    assert((m1.head.lhs, m1.head.rhs, m1.head.cnt) === (("a", "b", 3L)))
    val n = docs.sparkSession.range(1).select(
      Bpe.tokensPerWord(lit("xab"), m1).as("n")).head().getLong(0)
    assert(n === 2L) // ["x", "ab"]
  }

  test("batched train: disjoint top pairs == sequential, counts exact") {
    // three independent repeated-letter words: every round's top pairs are
    // pairwise non-interacting, so one batch of 3 must reproduce the
    // sequential trainer exactly — rounds, order, and counts
    val docs = Seq("aa aa aa aa aa", "bb bb bb bb", "cc cc cc")
      .toDF("text")
    val seqM = Bpe.train(docs, "text", 3)
    val batM = Bpe.train(docs, "text", 3, batch = 3)
    assert(batM === seqM)
    assert(batM.map(m => (m.round, m.lhs, m.rhs, m.cnt)) ===
      Seq((1, "a", "a", 5L), (2, "b", "b", 4L), (3, "c", "c", 3L)))
  }

  test("batched train: interacting runner-up is skipped within the batch") {
    // ranking: (a,b) 5 > (b,c) 4 > (d,e) 3. (b,c) shares b with the
    // accepted (a,b) -> one batch of 2 admits (a,b) and (d,e); sequential
    // BPE would have taken (b,c) second — the documented batch trade
    val docs = Seq(("ab " * 5).trim, ("bc " * 4).trim, ("de " * 3).trim)
      .toDF("text")
    val bat = Bpe.train(docs, "text", 2, batch = 2)
      .map(m => (m.round, m.lhs, m.rhs, m.cnt))
    assert(bat === Seq((1, "a", "b", 5L), (2, "d", "e", 3L)))
    val sq = Bpe.train(docs, "text", 2)
      .map(m => (m.round, m.lhs, m.rhs, m.cnt))
    assert(sq === Seq((1, "a", "b", 5L), (2, "b", "c", 4L)))
  }

  test("batched train: created-symbol pairs are fenced out of the batch") {
    // (t,h) wins; candidate (th,e) involves the just-created symbol and
    // must wait for the next round even though it is disjoint by members
    val docs = Seq(("the " * 4).trim, ("th " * 2).trim).toDF("text")
    val bat = Bpe.train(docs, "text", 4, batch = 4)
    // round 1 batch: (t,h) cnt 6 accepted; (h,e) shares h -> skipped;
    // nothing else disjoint exists, so the round closes with 1 merge and
    // (th,e) is learned by the NEXT batch from fresh counts
    assert(bat.head.round === 1 &&
      (bat.head.lhs, bat.head.rhs, bat.head.cnt) === (("t", "h", 6L)))
    assert(bat.exists(m => m.lhs == "th" && m.rhs == "e" && m.cnt == 4L))
  }

  test("encode == independent reference; single-char and empty words") {
    val docs = Seq((1L, "low lower a"), (2L, "newest x widest low"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 5)
    val ref = merges.map(m => (m.lhs, m.rhs, m.cnt))
    val got = Bpe.encode(docs, "text", merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(0) === ((1L, refTokens(Seq("low", "lower", "a"), ref), 3L)))
    assert(got(1) === ((2L,
      refTokens(Seq("newest", "x", "widest", "low"), ref), 4L)))
  }

  test("vocabulary exhaustion stops early instead of looping") {
    val docs = Seq("ab ab").toDF("text") // 1 pair, then single symbols
    val m = Bpe.train(docs, "text", 10)
    assert(m.map(x => (x.lhs, x.rhs)) === Seq(("a", "b")))
  }

  test("separator collision fails loudly") {
    val docs = Seq("bad|word ok").toDF("text")
    val e = intercept[IllegalArgumentException](Bpe.train(docs, "text", 2))
    assert(e.getMessage.contains("separator"))
  }

  test("fixture round-trip: 8 rounds on sf0.001 documents produce 8 merges") {
    val docs = graft.query.Tables(spark, sf("sf0.001"), "documents")
    val m = Bpe.train(docs, "text", 8)
    assert(m.length === 8)
    assert(m.map(_.round) === (1 to 8))
    // counts are non-increasing is NOT a BPE invariant (merged symbols
    // create new pairs), but every count is positive and every merge is
    // over symbols drawn from a-z
    assert(m.forall(_.cnt > 0))
    assert(m.forall(x => (x.lhs + x.rhs).forall(c => c >= 'a' && c <= 'z')))
  }
}
