package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class DecontaminateBloomSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("bloom two-pass == broadcast anti-join on the fixture (parity law)") {
    val docs = graft.query.Tables(spark, sf("sf0.001"), "documents")
    val eval = docs.filter($"doc_id" % 10 === 0)
    val got = TextOps.decontaminateBloom(docs, eval, "text")
      .select("doc_id").as[Long].collect().sorted
    val want = TextOps.decontaminate(docs, eval, "text")
      .select("doc_id").as[Long].collect().sorted
    assert(got === want)
  }

  test("bloom-negative shortcut keeps clean rows without the exact join") {
    // a tight bloom (tiny fpp) over a disjoint eval set: every corpus row
    // must be bloom-negative and survive via the shortcut branch alone
    val corpus = (1L to 50L).map(i => (i, s"corpus doc $i")).toDF("doc_id", "text")
    val eval = Seq("something else entirely").toDF("text")
    val out = TextOps.decontaminateBloom(corpus, eval, "text",
      expectedEvalRows = 100L, fpp = 0.001)
    assert(out.count() === 50L)
  }

  test("duplicated contaminated text drops every copy; clean dups all survive") {
    val corpus = Seq((1L, "leak me"), (2L, "leak me"), (3L, "keep me"),
      (4L, "keep me")).toDF("doc_id", "text")
    val eval = Seq("leak me").toDF("text")
    val kept = TextOps.decontaminateBloom(corpus, eval, "text",
      expectedEvalRows = 10L)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(3L, 4L))
  }

  test("null text survives (no grams to match, bloom probe is null-safe)") {
    val corpus = Seq((1L, Some("leak me")), (2L, None))
      .toDF("doc_id", "text")
    val eval = Seq("leak me").toDF("text")
    val kept = TextOps.decontaminateBloom(corpus, eval, "text",
      expectedEvalRows = 10L)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L))
  }
}
