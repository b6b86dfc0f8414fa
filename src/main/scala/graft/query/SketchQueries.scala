package graft.query

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.SketchAggs._

/** Mergeable-sketch query surface (SURVEY.md §2.4 A7 extension): KLL
  * quantile sketches and Theta distinct-set sketches
  * (`graft.functions.SketchAggs`) — the two states a 100 TB metrics layer
  * stores per partition and composes at read time, next to the HLL
  * (`q_distinct_sketch`) and Count-Min (`q_heavy_hitters`) already on the
  * shelf.
  *
  * Both queries are LAW-oracled in the established boolean pattern
  * (`q_approx_quantile` / `q_distinct_sketch`): exact columns bind the
  * frame to real data; booleans assert the sketch contract (rank-error
  * band for KLL, 5%-or-exact for Theta below its nominal-entries
  * threshold) and fail the hash on drift.
  */
object SketchQueries {

  val all: Seq[Q] = Seq(

    // ---- A7f: frequent-items sketch (mergeable heavy hitters) ------------------
    // The items sketch RETAINS candidate items (CMS answers point queries
    // only), and its serialized state merges — so this query runs the full
    // stored-state round: per-(lang, source) partial sketches (the shard
    // form a 100 TB corpus would store) merged per lang with
    // graft_freq_merge, then point-checked. The hash-gated booleans are
    // the sketch's ORDER-INDEPENDENT guarantee lb ≤ true ≤ ub — raw
    // estimates may vary with Spark's merge order and never touch the
    // oracle frame (FreqItemBounds scaladoc).
    Q("q_freq_sketch", Some(
      """WITH w AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT lang, w, count(*) AS cnt FROM w GROUP BY lang, w),
        |r AS (SELECT lang, w, cnt, row_number() OVER (
        |        PARTITION BY lang ORDER BY cnt DESC, w) AS rn FROM c)
        |SELECT lang, w AS word, cnt, true AS bounds_ok
        |FROM r WHERE rn <= 3 ORDER BY lang, cnt DESC, word""".stripMargin),
      (s, d) => {
        // One tokenize pass into ONE map-side-combined hash aggregate; the
        // VOCAB-sized (lang, source, w, cnt) frame feeds both the sketch
        // partials (weighted updates — bit-identical to per-occurrence
        // feeding, ItemsSketch.update(item, count) IS the space-saving
        // weighted form) and the exact per-lang top-3. The exploded
        // occurrence stream never materializes (the r7 localCheckpoint
        // here wrote every word occurrence to executor disk).
        val counts = Tables(s, d, "documents")
          .select(col("lang"), col("source"),
            explode(graft.llm.TextOps.words(col("text"))).as("w"))
          .groupBy("lang", "source", "w").agg(Tables.cnt.as("cnt"))
          .persist()
        try {
          val partials = counts.groupBy("lang", "source")
            .agg(freqAggWeighted(col("w"), col("cnt")).as("sk"))
          val merged = partials.groupBy("lang")
            .agg(freqMergeAgg(col("sk")).as("sk"))
          val win = org.apache.spark.sql.expressions.Window
            .partitionBy("lang").orderBy(desc("cnt"), asc("w"))
          val top = counts.groupBy("lang", "w")
            .agg(sum("cnt").as("cnt"))
            .withColumn("rn", row_number().over(win))
            .filter(col("rn") <= 3)
          top.join(merged, Seq("lang"))
            .withColumn("b", freqBounds(col("sk"), col("w")))
            .select(col("lang"), col("w").as("word"), col("cnt"),
              (col("b.lb") <= col("cnt") && col("cnt") <= col("b.ub"))
                .as("bounds_ok"))
            .orderBy(col("lang"), desc("cnt"), col("word"))
            .localCheckpoint()
        } finally counts.unpersist()
      }),

    // ---- A7k: KLL quantile sketch + merge law --------------------------------
    // Two independent KLL paths must agree with the exact quantiles: a
    // direct per-type sketch AND a merge of per-day sketches (the
    // incremental-view shape — per-partition states composed at read
    // time). k=200 guarantees ~1.65% rank error; the asserted band is
    // ±5% rank (values at p∓0.05), slack vs the contract, tight vs a
    // broken update/merge path. KLL compaction is RANDOMIZED (DataSketches
    // seeds per-run), so the ok_* booleans are probabilistic: the band is
    // ~3x the 99%-confidence error — flake risk tiny but nonzero, and a
    // miss would surface as this key's hash mismatch. SketchAggsSpec
    // asserts the same band with the measured estimate in the message.
    Q("q_kll_quantile", Some(
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS exact_p50,
        |  round(quantile_cont(value, 0.9), 4) AS exact_p90,
        |  true AS ok_p50, true AS ok_p90,
        |  true AS ok_merged_p50, true AS ok_merged_p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("event_type"), col("value"),
            to_date(col("ts")).as("day"))
        // path 1: one sketch per type, straight off the rows
        val direct = e.groupBy("event_type").agg(
          kllAgg(col("value")).as("sk"),
          percentile(col("value"), lit(0.45)).as("p45"),
          percentile(col("value"), lit(0.55)).as("p55"),
          percentile(col("value"), lit(0.85)).as("p85"),
          percentile(col("value"), lit(0.95)).as("p95"),
          round(percentile(col("value"), lit(0.5)), 4).as("exact_p50"),
          round(percentile(col("value"), lit(0.9)), 4).as("exact_p90"))
        // path 2: per-day sketches, merged per type from STORED bytes
        val merged = e.groupBy("event_type", "day")
          .agg(kllAgg(col("value")).as("sk_day"))
          .groupBy("event_type")
          .agg(kllMergeAgg(col("sk_day")).as("sk_m"))
        val qs = Seq(0.5, 0.9)
        def band(est: org.apache.spark.sql.Column, i: Int) =
          element_at(est, i).between(
            col(if (i == 1) "p45" else "p85"),
            col(if (i == 1) "p55" else "p95"))
        direct.join(merged, "event_type")
          .withColumn("qd", kllQuantiles(col("sk"), qs))
          .withColumn("qm", kllQuantiles(col("sk_m"), qs))
          .select(col("event_type"), col("exact_p50"), col("exact_p90"),
            band(col("qd"), 1).as("ok_p50"),
            band(col("qd"), 2).as("ok_p90"),
            band(col("qm"), 1).as("ok_merged_p50"),
            band(col("qm"), 2).as("ok_merged_p90"))
          .orderBy("event_type")
      }),

    // ---- A7t: Theta sketch set algebra ---------------------------------------
    // The question HLL cannot answer from stored state: of the users who
    // purchased, how many also hit an error (∩), how many never did (\),
    // how many did either (∪)? One pass builds both sketches
    // (null-gated inputs → conditional aggregation); the set expressions
    // evaluate on the two compact states. Exact twins computed from the
    // same per-user pass pin the law: below 4096 retained entries a theta
    // sketch is EXACT, so the 5% band is pure drift insurance.
    Q("q_theta_sketch", Some(
      """WITH u AS (
        |  SELECT user_id,
        |    bool_or(event_type = 'purchase') AS p,
        |    bool_or(event_type = 'error') AS e
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(count(*) FILTER (WHERE p) AS BIGINT) AS n_purchase,
        |  CAST(count(*) FILTER (WHERE e) AS BIGINT) AS n_error,
        |  CAST(count(*) FILTER (WHERE p AND e) AS BIGINT) AS n_both,
        |  CAST(count(*) FILTER (WHERE p AND NOT e) AS BIGINT) AS n_only_purchase,
        |  CAST(count(*) FILTER (WHERE p OR e) AS BIGINT) AS n_either,
        |  true AS ok_purchase, true AS ok_both, true AS ok_only, true AS ok_union
        |FROM u""".stripMargin),
      (s, d) => {
        val perUser = Tables(s, d, "events")
          .groupBy("user_id")
          .agg(max(col("event_type") === "purchase").as("p"),
            max(col("event_type") === "error").as("e"))
        def okBand(est: org.apache.spark.sql.Column,
            exact: org.apache.spark.sql.Column) =
          abs(est - exact) <= greatest(exact * 0.05, lit(2.0))
        perUser.agg(
            sum(when(col("p"), 1L).otherwise(0L)).as("n_purchase"),
            sum(when(col("e"), 1L).otherwise(0L)).as("n_error"),
            sum(when(col("p") && col("e"), 1L).otherwise(0L)).as("n_both"),
            sum(when(col("p") && !col("e"), 1L).otherwise(0L))
              .as("n_only_purchase"),
            sum(when(col("p") || col("e"), 1L).otherwise(0L)).as("n_either"),
            thetaAgg(when(col("p"), col("user_id"))).as("sk_p"),
            thetaAgg(when(col("e"), col("user_id"))).as("sk_e"))
          .select(col("n_purchase"), col("n_error"), col("n_both"),
            col("n_only_purchase"), col("n_either"),
            okBand(thetaEstimate(col("sk_p")), col("n_purchase"))
              .as("ok_purchase"),
            okBand(thetaSetEstimate(col("sk_p"), col("sk_e"), "intersect"),
              col("n_both")).as("ok_both"),
            okBand(thetaSetEstimate(col("sk_p"), col("sk_e"), "anotb"),
              col("n_only_purchase")).as("ok_only"),
            okBand(thetaSetEstimate(col("sk_p"), col("sk_e"), "union"),
              col("n_either")).as("ok_union"))
      })
  )
}
