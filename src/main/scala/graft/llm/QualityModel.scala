package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Q
import graft.query.Tables
import graft.query.Tables.cnt

/** L41: an in-engine TRAINED quality classifier — the missing supervised
  * member of the quality stack (rules = Gopher heuristics, LM score,
  * compression ratio are all unsupervised; production pipelines also run a
  * learned quality filter à la the fastText classifier over labeled
  * positives). Linear model with a HARD-SIGMOID link, fit by full-batch
  * gradient descent:
  *
  *  - Execution model = kmeansFit's: weights (d+1 doubles) live on the
  *    driver; each iteration is ONE corpus scan computing the gradient as
  *    a map-side-partial aggregate (d+1 sums) — no shuffle beyond the
  *    aggregate, cost independent of d for small d, linear in the corpus.
  *    At 100 TB: iters × one scan, the exact regime SGD frameworks call
  *    full-batch GD.
  *  - The link is the hard sigmoid `clamp(0.5 + z/4, 0, 1)` — the
  *    piecewise-RATIONAL logistic approximation (the "hard sigmoid" of
  *    quantized-NN practice). Chosen deliberately over `exp`: every
  *    arithmetic step is then an exact IEEE operation identical across
  *    engines (libm `exp` differs by ulps between implementations, which
  *    compounds across GD iterations and breaks cross-engine hash
  *    equality). Weights round to 8 dp after each update (HALF_UP — both
  *    engines' ROUND), resetting the only remaining drift source
  *    (summation order) so it cannot compound across iterations.
  *  - Deterministic end to end: zero init (iteration 1's predictions are
  *    exactly 0.5), fixed lr, fixed iterations, no RNG.
  *
  * Gradient: the delta rule `∂/∂w_j = Σ (p − y)·x_j` (the logistic-loss
  * gradient form with p through the hard link), `w ← w − lr·g/n`.
  */
object QualityModel {

  /** clamp(0.5 + z/4, 0, 1) — exact rational logistic stand-in. */
  def hardSigmoid(z: Column): Column =
    least(greatest(lit(0.5) + z / lit(4.0), lit(0.0)), lit(1.0))

  private def round8(v: Double): Double =
    BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fit (bias +: weights) over `xCols` against the 0/1 `yCol`. One
    * aggregate job per iteration plus one count.
    */
  def logisticFitHard(feats: DataFrame, xCols: Seq[String], yCol: String,
      iters: Int, lr: Double): Seq[Double] = {
    require(iters >= 0 && xCols.nonEmpty)
    val n = feats.count().toDouble
    require(n > 0, "logisticFitHard: empty training frame")
    var w = Vector.fill(xCols.length + 1)(0.0)
    for (_ <- 1 to iters) {
      val z = xCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
        case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
      }
      val err = hardSigmoid(z) - col(yCol)
      val aggs = sum(err).as("gb") +:
        xCols.zipWithIndex.map { case (c, j) =>
          sum(err * col(c)).as(s"g$j") }
      val g = feats.agg(aggs.head, aggs.tail: _*).head()
      w = Vector.tabulate(w.length)(i =>
        round8(w(i) - lr * g.getDouble(i) / n))
    }
    w
  }

  /** Score column for a fitted (bias +: weights) vector. */
  def scoreHard(weights: Seq[Double], xCols: Seq[String]): Column =
    hardSigmoid(xCols.zipWithIndex.foldLeft(lit(weights.head): Column) {
      case (acc, (c, j)) => acc + lit(weights(j + 1)) * col(c)
    })

  /** The fixture feature frame: exact rational features off integer
    * counts (divisions of equal integers are bit-identical cross-engine),
    * label = (lang == 'en').
    */
  def featureFrame(docs: DataFrame): DataFrame = {
    val ws = TextOps.words(col("text"))
    val nw = size(ws)
    docs.select(
      col("lang"),
      (size(filter(ws, x => x.isin(TextOps.STOPWORDS: _*))).cast("double")
        / nw).as("x1"),
      ((length(col("text")) - (nw - 1)).cast("double") / nw / lit(10.0))
        .as("x2"),
      (nw.cast("double") / lit(100.0)).as("x3"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
  }

  val all: Seq[Q] = Seq(

    // ---- L41: trained quality classifier, full DuckDB twin -----------------
    // The oracle UNROLLS the three GD iterations as CTEs: iteration 1's
    // predictions are exactly 0.5 (zero init), later iterations carry the
    // 8-dp-rounded weights as 1-row cross joins. Per-lang mean predicted
    // quality hash-compares at round(6).
    Q("q_quality_model", Some(
      s"""WITH f AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         w -> w IN (${TextOps.StopwordsSql}))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS x1,
        |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |      / len(string_split(text, ' ')) / 10.0 AS x2,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0 AS x3,
        |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        |  FROM documents),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
        |gr1 AS (
        |  SELECT sum(0.5 - y) AS gb, sum((0.5 - y) * x1) AS g1,
        |    sum((0.5 - y) * x2) AS g2, sum((0.5 - y) * x3) AS g3 FROM f),
        |w1 AS (
        |  SELECT round(0 - 0.5 * gb / n, 8) AS cb,
        |    round(0 - 0.5 * g1 / n, 8) AS c1,
        |    round(0 - 0.5 * g2 / n, 8) AS c2,
        |    round(0 - 0.5 * g3 / n, 8) AS c3 FROM gr1, s),
        |p2 AS (
        |  SELECT f.*, least(greatest(
        |    0.5 + (cb + c1*x1 + c2*x2 + c3*x3) / 4.0, 0.0), 1.0) AS p
        |  FROM f, w1),
        |gr2 AS (
        |  SELECT sum(p - y) AS gb, sum((p - y) * x1) AS g1,
        |    sum((p - y) * x2) AS g2, sum((p - y) * x3) AS g3 FROM p2),
        |w2 AS (
        |  SELECT round(cb - 0.5 * gb / n, 8) AS cb,
        |    round(c1 - 0.5 * g1 / n, 8) AS c1,
        |    round(c2 - 0.5 * g2 / n, 8) AS c2,
        |    round(c3 - 0.5 * g3 / n, 8) AS c3 FROM w1, gr2, s),
        |p3 AS (
        |  SELECT f.*, least(greatest(
        |    0.5 + (cb + c1*x1 + c2*x2 + c3*x3) / 4.0, 0.0), 1.0) AS p
        |  FROM f, w2),
        |gr3 AS (
        |  SELECT sum(p - y) AS gb, sum((p - y) * x1) AS g1,
        |    sum((p - y) * x2) AS g2, sum((p - y) * x3) AS g3 FROM p3),
        |w3 AS (
        |  SELECT round(cb - 0.5 * gb / n, 8) AS cb,
        |    round(c1 - 0.5 * g1 / n, 8) AS c1,
        |    round(c2 - 0.5 * g2 / n, 8) AS c2,
        |    round(c3 - 0.5 * g3 / n, 8) AS c3 FROM w2, gr3, s),
        |scored AS (
        |  SELECT f.lang, least(greatest(
        |    0.5 + (cb + c1*x1 + c2*x2 + c3*x3) / 4.0, 0.0), 1.0) AS p
        |  FROM f, w3)
        |SELECT lang, count(*) AS n_docs, round(avg(p), 6) AS mean_p
        |FROM scored GROUP BY lang ORDER BY lang""".stripMargin),
      (s, d) => {
        val feats = featureFrame(Tables(s, d, "documents"))
        val w = logisticFitHard(feats, Seq("x1", "x2", "x3"), "y",
          iters = 3, lr = 0.5)
        feats.select(col("lang"),
            scoreHard(w, Seq("x1", "x2", "x3")).as("p"))
          .groupBy("lang")
          .agg(cnt.as("n_docs"), round(avg("p"), 6).as("mean_p"))
          .orderBy("lang")
      })
  )
}
