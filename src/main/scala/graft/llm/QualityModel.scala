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
  *    equality). Weights round to 8 dp after each update via the
  *    integer-scaled floor form both engines state literally (see
  *    [[round8]]), resetting the only remaining drift source
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

  /** 8-dp weight rounding via an integer-scaled form BOTH engines compute
    * with the same IEEE ops: floor(v·1e8 + 0.5)/1e8 — the DuckDB twin
    * states it literally. The earlier BigDecimal HALF_UP form rounded the
    * double's shortest DECIMAL representation while DuckDB's round()
    * works in binary, so a weight landing within an ulp of an 8th-decimal
    * .5 boundary could round differently and the divergence would
    * compound across GD iterations into a hard oracle mismatch. (For
    * negatives this is half-toward-+inf rather than half-away-from-zero —
    * immaterial, since both engines now state the identical expression.)
    */
  private def round8(v: Double): Double =
    math.floor(v * 1e8 + 0.5) / 1e8

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

  /** The PRODUCTION composition (L41 wired to the real quality stack):
    * features are the signals the engine already computes — Gopher rule
    * fractions ([[TextOps.qualityRules]]: dup-word fraction, mean word
    * length, symbol fraction, each 6-dp-rounded in BOTH engines) and the
    * corpus-trained bigram LM score ([[TextOps.lmScore]], 6-dp-rounded) —
    * so "train the filter on labeled docs, score the crawl" runs over the
    * same columns a production gate reads. The LM-score inner join drops
    * docs with < 2 words in both engines identically. The compression
    * ratio is deliberately NOT a twin feature: DuckDB cannot deflate
    * (q_compress_ratio is law-oracled for the same reason); composing it
    * is engine-side only, law-tested in QualityModelSpec.
    *
    * Scale shape: rules are map-only, the LM score is the L26 hash-keyed
    * pipeline, and the join keys are doc_id — one corpus-keyed shuffle to
    * assemble the frame, then GD's iters × one-scan loop.
    */
  def productionFeatures(docs: DataFrame): DataFrame = {
    val rules = TextOps.qualityRules(docs)
      .select(col("doc_id"), col("dup_word_frac").as("x1"),
        (col("mean_word_len") / lit(10.0)).as("x2"),
        col("symbol_frac").as("x3"))
    val lm = TextOps.lmScore(docs)
      .select(col("doc_id"), (col("lm_score") / lit(10.0)).as("x4"))
    docs.select(col("doc_id"), col("lang"))
      .join(rules, Seq("doc_id"))
      .join(lm, Seq("doc_id"))
      .withColumn("y", when(col("lang") === "en", 1.0).otherwise(0.0))
  }

  val all: Seq[Q] = Seq(

    // ---- L41+: the classifier over the PRODUCTION signals ------------------
    // Composes q_quality_rules' fractions + q_lm_score's bigram LM score
    // into one trained-filter flow; the oracle restates the features from
    // their own twins' SQL and unrolls the same 3 GD iterations (floor-
    // form 8-dp weight rounding, identical expression both engines).
    Q("q_quality_model_full", Some(
      s"""WITH w AS (
        |  SELECT doc_id, lang, text, string_split(text, ' ') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang,
        |    round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6)
        |      AS x1,
        |    round(CAST(length(text) - (len(ws) - 1) AS DOUBLE) / len(ws), 6)
        |      / 10.0 AS x2,
        |    round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
        |      AS DOUBLE) / length(text), 6) AS x3,
        |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        |  FROM w),
        |uni AS (SELECT unnest(ws) AS u FROM w),
        |uc AS (SELECT u, count(*) AS cu FROM uni GROUP BY u),
        |v AS (SELECT count(*) AS vs FROM uc),
        |occ AS (
        |  SELECT doc_id, p.u AS u, p.b AS b FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(ws) - 1),
        |      i -> struct_pack(u := ws[i],
        |                       b := array_to_string(ws[i:i+1], ' ')))) AS p
        |    FROM w)),
        |bc AS (SELECT b, count(*) AS cb FROM occ GROUP BY b),
        |lm AS (
        |  SELECT o.doc_id,
        |    floor(avg(ln((bc.cb + 1.0) / (uc.cu + v.vs))) * 1e6 + 0.5)
        |      / 1e6 / 10.0 AS x4
        |  FROM occ o JOIN uc ON o.u = uc.u JOIN bc ON o.b = bc.b
        |  CROSS JOIN v GROUP BY o.doc_id),
        |f AS (SELECT g.lang, g.x1, g.x2, g.x3, lm.x4, g.y
        |      FROM g JOIN lm ON g.doc_id = lm.doc_id),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
        |gr1 AS (
        |  SELECT sum(0.5 - y) AS gb, sum((0.5 - y) * x1) AS g1,
        |    sum((0.5 - y) * x2) AS g2, sum((0.5 - y) * x3) AS g3,
        |    sum((0.5 - y) * x4) AS g4 FROM f),
        |w1 AS (
        |  SELECT floor((0 - 0.5 * gb / n) * 1e8 + 0.5) / 1e8 AS cb,
        |    floor((0 - 0.5 * g1 / n) * 1e8 + 0.5) / 1e8 AS c1,
        |    floor((0 - 0.5 * g2 / n) * 1e8 + 0.5) / 1e8 AS c2,
        |    floor((0 - 0.5 * g3 / n) * 1e8 + 0.5) / 1e8 AS c3,
        |    floor((0 - 0.5 * g4 / n) * 1e8 + 0.5) / 1e8 AS c4 FROM gr1, s),
        |p2 AS (
        |  SELECT f.*, least(greatest(
        |    0.5 + (cb + c1*x1 + c2*x2 + c3*x3 + c4*x4) / 4.0, 0.0), 1.0) AS p
        |  FROM f, w1),
        |gr2 AS (
        |  SELECT sum(p - y) AS gb, sum((p - y) * x1) AS g1,
        |    sum((p - y) * x2) AS g2, sum((p - y) * x3) AS g3,
        |    sum((p - y) * x4) AS g4 FROM p2),
        |w2 AS (
        |  SELECT floor((cb - 0.5 * gb / n) * 1e8 + 0.5) / 1e8 AS cb,
        |    floor((c1 - 0.5 * g1 / n) * 1e8 + 0.5) / 1e8 AS c1,
        |    floor((c2 - 0.5 * g2 / n) * 1e8 + 0.5) / 1e8 AS c2,
        |    floor((c3 - 0.5 * g3 / n) * 1e8 + 0.5) / 1e8 AS c3,
        |    floor((c4 - 0.5 * g4 / n) * 1e8 + 0.5) / 1e8 AS c4
        |  FROM w1, gr2, s),
        |p3 AS (
        |  SELECT f.*, least(greatest(
        |    0.5 + (cb + c1*x1 + c2*x2 + c3*x3 + c4*x4) / 4.0, 0.0), 1.0) AS p
        |  FROM f, w2),
        |gr3 AS (
        |  SELECT sum(p - y) AS gb, sum((p - y) * x1) AS g1,
        |    sum((p - y) * x2) AS g2, sum((p - y) * x3) AS g3,
        |    sum((p - y) * x4) AS g4 FROM p3),
        |w3 AS (
        |  SELECT floor((cb - 0.5 * gb / n) * 1e8 + 0.5) / 1e8 AS cb,
        |    floor((c1 - 0.5 * g1 / n) * 1e8 + 0.5) / 1e8 AS c1,
        |    floor((c2 - 0.5 * g2 / n) * 1e8 + 0.5) / 1e8 AS c2,
        |    floor((c3 - 0.5 * g3 / n) * 1e8 + 0.5) / 1e8 AS c3,
        |    floor((c4 - 0.5 * g4 / n) * 1e8 + 0.5) / 1e8 AS c4
        |  FROM w2, gr3, s),
        |scored AS (
        |  SELECT f.lang, least(greatest(
        |    0.5 + (cb + c1*x1 + c2*x2 + c3*x3 + c4*x4) / 4.0, 0.0), 1.0) AS p
        |  FROM f, w3)
        |SELECT lang, count(*) AS n_docs, round(avg(p), 6) AS mean_p
        |FROM scored GROUP BY lang ORDER BY lang""".stripMargin),
      (s, d) => {
        // one assembly pass (rules + LM pipeline + join) feeds the count,
        // the 3 GD scans, and the scoring pass — without the checkpoint
        // each consumer would re-run the whole LM pipeline (measured 4.2
        // → ~2 s at sf0.1). The frame is 5 doubles + lang per doc; blocks
        // are ContextCleaner-reclaimed (the bench GCs between queries)
        val feats = productionFeatures(Tables(s, d, "documents"))
          .localCheckpoint()
        val w = logisticFitHard(feats, Seq("x1", "x2", "x3", "x4"), "y",
          iters = 3, lr = 0.5)
        feats.select(col("lang"),
            scoreHard(w, Seq("x1", "x2", "x3", "x4")).as("p"))
          .groupBy("lang")
          .agg(cnt.as("n_docs"), round(avg("p"), 6).as("mean_p"))
          .orderBy("lang")
      }),

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
        |  SELECT floor((0 - 0.5 * gb / n) * 1e8 + 0.5) / 1e8 AS cb,
        |    floor((0 - 0.5 * g1 / n) * 1e8 + 0.5) / 1e8 AS c1,
        |    floor((0 - 0.5 * g2 / n) * 1e8 + 0.5) / 1e8 AS c2,
        |    floor((0 - 0.5 * g3 / n) * 1e8 + 0.5) / 1e8 AS c3 FROM gr1, s),
        |p2 AS (
        |  SELECT f.*, least(greatest(
        |    0.5 + (cb + c1*x1 + c2*x2 + c3*x3) / 4.0, 0.0), 1.0) AS p
        |  FROM f, w1),
        |gr2 AS (
        |  SELECT sum(p - y) AS gb, sum((p - y) * x1) AS g1,
        |    sum((p - y) * x2) AS g2, sum((p - y) * x3) AS g3 FROM p2),
        |w2 AS (
        |  SELECT floor((cb - 0.5 * gb / n) * 1e8 + 0.5) / 1e8 AS cb,
        |    floor((c1 - 0.5 * g1 / n) * 1e8 + 0.5) / 1e8 AS c1,
        |    floor((c2 - 0.5 * g2 / n) * 1e8 + 0.5) / 1e8 AS c2,
        |    floor((c3 - 0.5 * g3 / n) * 1e8 + 0.5) / 1e8 AS c3 FROM w1, gr2, s),
        |p3 AS (
        |  SELECT f.*, least(greatest(
        |    0.5 + (cb + c1*x1 + c2*x2 + c3*x3) / 4.0, 0.0), 1.0) AS p
        |  FROM f, w2),
        |gr3 AS (
        |  SELECT sum(p - y) AS gb, sum((p - y) * x1) AS g1,
        |    sum((p - y) * x2) AS g2, sum((p - y) * x3) AS g3 FROM p3),
        |w3 AS (
        |  SELECT floor((cb - 0.5 * gb / n) * 1e8 + 0.5) / 1e8 AS cb,
        |    floor((c1 - 0.5 * g1 / n) * 1e8 + 0.5) / 1e8 AS c1,
        |    floor((c2 - 0.5 * g2 / n) * 1e8 + 0.5) / 1e8 AS c2,
        |    floor((c3 - 0.5 * g3 / n) * 1e8 + 0.5) / 1e8 AS c3 FROM w2, gr3, s),
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
