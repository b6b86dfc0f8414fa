package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Laws for the trained quality classifier ([[QualityModel]]): the DuckDB
  * oracle pins the cross-engine ARITHMETIC (unrolled GD, 8-dp weight
  * rounding); these pin the LEARNING mechanism on planted separable data —
  * the fixture corpus's lang label is nearly feature-independent by
  * construction, so separation there would be vacuous to assert.
  */
class QualityModelSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // planted linearly separable frame: positives live at x1 ~ 0.8,
  // negatives at x1 ~ 0.2 (deterministic jitter), other features inert
  private def planted = (0 until 400).map { i =>
    val y = i % 2
    val x1 = (if (y == 1) 0.8 else 0.2) + (i % 7) * 0.01
    (x1, 0.45, 0.5, y.toDouble)
  }.toDF("x1", "x2", "x3", "y")

  private def meanP(df: org.apache.spark.sql.DataFrame,
      w: Seq[Double]): Map[Double, Double] =
    df.select(col("y"),
        QualityModel.scoreHard(w, Seq("x1", "x2", "x3")).as("p"))
      .groupBy("y").agg(avg("p").as("mp"))
      .as[(Double, Double)].collect().toMap

  test("GD on planted separable data separates; more iterations separate " +
    "at least as much") {
    val df = planted
    val seps = Seq(1, 8, 30).map { iters =>
      val w = QualityModel.logisticFitHard(df, Seq("x1", "x2", "x3"), "y",
        iters, lr = 2.0)
      val m = meanP(df, w)
      m(1.0) - m(0.0)
    }
    assert(seps.head > 0.0, s"one step must already point the right way: $seps")
    assert(seps(2) > 0.3, s"30 iterations must separate strongly: $seps")
    assert(seps == seps.sorted, s"separation must not regress: $seps")
  }

  test("zero iterations score exactly 0.5 everywhere (zero init, exact link)") {
    val w = QualityModel.logisticFitHard(planted, Seq("x1", "x2", "x3"), "y",
      iters = 0, lr = 0.5)
    assert(w == Seq(0.0, 0.0, 0.0, 0.0))
    val ps = planted.select(
        QualityModel.scoreHard(w, Seq("x1", "x2", "x3")).as("p"))
      .distinct().as[Double].collect().toSeq
    assert(ps == Seq(0.5))
  }

  test("training is deterministic: reruns produce identical weights") {
    val a = QualityModel.logisticFitHard(planted, Seq("x1", "x2", "x3"), "y",
      iters = 4, lr = 0.5)
    val b = QualityModel.logisticFitHard(planted, Seq("x1", "x2", "x3"), "y",
      iters = 4, lr = 0.5)
    assert(a == b)
  }

  test("compression ratio composes as a trained-filter feature: planted " +
    "repetitive spam separates from high-entropy text (the engine-only " +
    "member of the production stack — DuckDB cannot deflate)") {
    val docs = (0 until 200).map { i =>
      if (i % 2 == 0)
        (i.toLong, Seq.fill(150)("spam").mkString(" "), 0.0)
      else {
        val words = (0 until 150).map(j =>
          ((i * 131L + j * 31L) * 2654435761L % 99999983L).toString)
        (i.toLong, words.mkString(" "), 1.0)
      }
    }.toDF("doc_id", "text", "y")
    val feats = Compress.compressionRatio(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("y")), Seq("doc_id"))
      .select(col("ratio").as("x1"), col("y"))
    val w = QualityModel.logisticFitHard(feats, Seq("x1"), "y",
      iters = 30, lr = 2.0)
    val m = feats.select(col("y"),
        QualityModel.scoreHard(w, Seq("x1")).as("p"))
      .groupBy("y").agg(avg("p").as("mp"))
      .as[(Double, Double)].collect().toMap
    assert(m(1.0) - m(0.0) > 0.2,
      s"compression feature failed to separate planted classes: $m")
  }

  test("hard sigmoid clamps exactly at the rails") {
    val got = Seq(-10.0, -2.0, 0.0, 2.0, 10.0).toDF("z")
      .select(QualityModel.hardSigmoid(col("z")))
      .as[Double].collect().toSeq
    assert(got == Seq(0.0, 0.0, 0.5, 1.0, 1.0))
  }
}
