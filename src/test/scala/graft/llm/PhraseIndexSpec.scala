package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** S12/L25: stored inverted phrase index. */
class PhraseIndexSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def crafted() = Seq(
    (1L, "alpha beta gamma delta"),        // match: contains the phrase
    (2L, "x alpha beta gamma"),            // match at end
    (3L, "alpha beta delta gamma"),        // all words, wrong order: no
    (4L, "stalpha beta gamma y"),          // mid-word trap: 'stalpha' != 'alpha'
    (5L, "alpha beta"),                    // too short to hold the phrase
    (6L, "unrelated words entirely here")
  ).toDF("doc_id", "text")

  private def scan(df: org.apache.spark.sql.DataFrame, phrase: String) =
    df.filter(concat(lit(" "), col("text"), lit(" ")).contains(s" $phrase "))
      .select("doc_id").as[Long].collect().toSet

  test("phraseSearch == full-scan word-aligned contains, incl. the " +
    "mid-word and wrong-order traps") {
    val df = crafted()
    val dir = java.nio.file.Files.createTempDirectory("phraseidx").toString
    PhraseIndex.buildPhraseIndex(df, dir)
    for (phrase <- Seq("alpha beta gamma", "beta gamma delta",
        "unrelated words entirely", "absent words completely")) {
      val got = PhraseIndex.phraseSearch(spark, dir, df, phrase)
        .as[Long].collect().toSet
      assert(got === scan(df, phrase), s"phrase '$phrase'")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("multi-gram phrases intersect postings (4+ words -> 2+ grams)") {
    val df = crafted()
    val dir = java.nio.file.Files.createTempDirectory("phraseidx2").toString
    PhraseIndex.buildPhraseIndex(df, dir)
    val got = PhraseIndex.phraseSearch(spark, dir, df, "alpha beta gamma delta")
      .as[Long].collect().toSet
    assert(got === Set(1L))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("short phrase (< n words) falls back to the direct verify scan") {
    val df = crafted()
    val dir = java.nio.file.Files.createTempDirectory("phraseidx3").toString
    PhraseIndex.buildPhraseIndex(df, dir)
    val got = PhraseIndex.phraseSearch(spark, dir, df, "alpha beta")
      .as[Long].collect().toSet
    assert(got === scan(df, "alpha beta"))
    assert(got.contains(5L))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("the postings probe reaches the scan as a bucket PARTITION filter") {
    val df = crafted()
    val dir = java.nio.file.Files.createTempDirectory("phraseidx4").toString
    PhraseIndex.buildPhraseIndex(df, dir)
    val grams = PhraseIndex.phraseGramHashes(spark, "alpha beta gamma", 3)
    val buckets = grams.map(g => ((g % 64) + 64) % 64).distinct
    val probe = spark.read.parquet(s"$dir/grams")
      .filter(col("bucket").isin(buckets: _*))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
