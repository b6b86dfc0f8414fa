package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import Tables.cnt

/** Time-series analytics over the event stream (SURVEY.md §2.5 extension):
  * exponentially-decayed counts and rolling z-score anomaly flags — the
  * drift/spike monitors a training-data ingest pipeline runs per source
  * per day.
  *
  * Scale shape (both queries): the ONLY corpus-scale operation is the
  * daily rollup (one hash aggregate; map-side partials collapse each
  * partition to ≤ |types|×|days| rows before the wire). Everything after —
  * the 14-day decayed-sum self-join, the 7-day window — runs on the rollup,
  * whose cardinality is types × days (thousands), independent of raw event
  * count. At 100 TB that post-rollup stage is driver-trivial and the join
  * fanout is bounded at 14 rows per output row by the band predicate.
  */
object TimeSeries {

  private def daily(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(cnt.as("cnt"))

  private val dailySql =
    """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
      |FROM events GROUP BY 1, 2""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- W∅d: cumulative DISTINCT users over time, without distinct-in-window --
    // "How many distinct users has each event type ever seen, day by
    // day" — the growth-curve query. Neither engine allows DISTINCT
    // inside a window frame, and the naive collect_set-over-window holds
    // per-row set state that grows with history (the thing that dies at
    // 100 TB). The scale-honest idiom both sides state: each (type,
    // user) contributes on its FIRST day only (one hash agg — map-side
    // partials bound the wire at distinct pairs), new-user counts roll
    // up per day (second tiny agg), and the running sum is a window over
    // types × days rows — thousands, corpus-independent. Distinct state
    // never lives in any window buffer.
    Q("q_running_distinct", Some(
      """WITH f AS (
        |  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY 1, 2),
        |n AS (SELECT event_type, first_day AS day, count(*) AS n_new
        |      FROM f GROUP BY 1, 2)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_new,
        |  CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY day)
        |       AS BIGINT) AS n_distinct_cum
        |FROM n ORDER BY event_type, day""".stripMargin),
      (s, d) => {
        val firstSeen = Tables(s, d, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(min(to_date(col("ts"))).as("first_day"))
        val daily = firstSeen
          .groupBy(col("event_type"), col("first_day").as("day"))
          .agg(cnt.as("n_new"))
        val w = Window.partitionBy("event_type").orderBy("day")
        daily.select(col("event_type"), Tables.day(col("day")).as("day"),
            col("n_new"), sum("n_new").over(w).as("n_distinct_cum"))
          .orderBy("event_type", "day")
      }),

    // ---- A∅r: robust outliers — median/MAD, the distributional complement ------
    // q_anomaly flags TEMPORAL spikes (rolling z-score over days); this
    // flags DISTRIBUTIONAL outliers per group with estimators a
    // contaminated column can't drag: median and MAD have 50% breakdown
    // points where mean/stddev have 0% — the difference between "the
    // outliers move the fence" and "the fence holds" on real dirty data.
    // Exact medians both engines (percentile / quantile_cont on sorted
    // runs per group — groups are |types|, each a bounded sort); the
    // 1.4826 constant rescales MAD to sigma-equivalent under normality.
    Q("q_mad_outliers", Some(
      """WITH m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad,
        |    any_value(m.med) AS med
        |  FROM events e JOIN m USING (event_type) GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_outliers,
        |  round(any_value(d.med), 4) AS med, round(any_value(d.mad), 4) AS mad
        |FROM events e JOIN d USING (event_type)
        |WHERE d.mad > 0 AND abs(e.value - d.med) / (1.4826 * d.mad) > 3.0
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val e = Tables(s, d, "events").select("event_type", "value")
        val med = e.groupBy("event_type")
          .agg(percentile(col("value"), lit(0.5)).as("med"))
        val mad = e.join(med, Seq("event_type"))
          .groupBy("event_type")
          .agg(percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"),
            first("med").as("med"))
        e.join(mad, Seq("event_type"))
          .filter(col("mad") > 0 &&
            abs(col("value") - col("med")) / (lit(1.4826) * col("mad")) > 3.0)
          .groupBy("event_type")
          .agg(cnt.as("n_outliers"), round(first("med"), 4).as("med"),
            round(first("mad"), 4).as("mad"))
          .orderBy("event_type")
      }),

    // ---- W∅p: distribution drift between snapshots (PSI) -----------------------
    // The ingest-drift monitor a training-data pipeline runs between crawl
    // snapshots: Population Stability Index over a fixed equi-width
    // histogram, Σ (p_i − q_i)·ln(p_i/q_i) with +0.5 Laplace smoothing
    // (identical closed form in both engines; the two-digit-rule of thumb:
    // < 0.1 stable, > 0.25 investigate). Snapshots here = even- vs
    // odd-day events, non-degenerate at every SF. Scale shape: ONE hash
    // aggregate over the corpus (10 bucket rows out), then arithmetic on
    // the 10-row frame with a 1-row broadcast total — no window, no sort,
    // nothing corpus-sized past the first aggregate.
    Q("q_drift_psi", Some(
      """WITH e AS (SELECT
        |    (day(CAST(ts AS DATE)) % 2 = 0) AS late,
        |    CAST(least(floor(value / 50.0), 9.0) AS INT) AS bucket
        |  FROM events),
        |h AS (SELECT bucket,
        |    sum(CASE WHEN NOT late THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN late THEN 1 ELSE 0 END) AS nb
        |  FROM e GROUP BY 1),
        |t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM h),
        |c AS (SELECT bucket, na, nb,
        |    ((na + 0.5) / (ta + 5.0) - (nb + 0.5) / (tb + 5.0))
        |      * ln(((na + 0.5) / (ta + 5.0)) / ((nb + 0.5) / (tb + 5.0)))
        |      AS contrib
        |  FROM h, t)
        |SELECT bucket, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  round(contrib, 6) AS psi_contrib,
        |  round((SELECT sum(contrib) FROM c), 6) AS psi_total
        |FROM c ORDER BY bucket""".stripMargin),
      (s, d) => {
        val e = Tables(s, d, "events").select(
          (dayofmonth(to_date(col("ts"))) % 2 === 0).as("late"),
          least(floor(col("value") / 50.0), lit(9.0)).cast("int").as("bucket"))
        // SNAP the 10-row histogram (r11): lazily `h` sits under BOTH `t`
        // and `c`, and `c` under both `tot` and the final select — the
        // corpus-wide hash aggregate ran 3x (before-plan: 22 Exchanges /
        // 8 scans). One localCheckpoint makes the scaladoc's "ONE hash
        // aggregate over the corpus" literally true; 10-row blocks are
        // ContextCleaner-reclaimed with the result.
        val h = graft.plans.Snap.snap(e.groupBy("bucket").agg(
          sum(when(!col("late"), 1L).otherwise(0L)).as("na"),
          sum(when(col("late"), 1L).otherwise(0L)).as("nb")))
        val t = h.agg(sum("na").as("ta"), sum("nb").as("tb"))
        val p = (col("na") + 0.5) / (col("ta") + 5.0)
        val q = (col("nb") + 0.5) / (col("tb") + 5.0)
        val c = graft.plans.Snap.snap(h.crossJoin(broadcast(t))
          .withColumn("contrib", (p - q) * log(p / q))
        ) // read by `tot` and the final projection
        // total via a 1-row broadcast, not an unpartitioned window
        val tot = c.agg(sum("contrib").as("psi"))
        c.crossJoin(broadcast(tot))
          .select(col("bucket"), col("na"), col("nb"),
            round(col("contrib"), 6).as("psi_contrib"),
            round(col("psi"), 6).as("psi_total"))
          .orderBy("bucket")
      }),

    // ---- W+: exponentially-decayed daily counts (half-life 7 d, 14 d band) --
    // EWMA-family trend smoothing as a BANDED self-join on the rollup:
    // decayed(t) = Σ_{0≤t-t'≤13} cnt(t') · 0.5^((t-t')/7). The window
    // truncation makes the definition identical in both engines (a
    // recursive EWMA is not expressible as a window aggregate; the
    // 14-day tail it drops weighs ≤ 0.5^2 of a term). The band predicate
    // bounds fanout at 14; weights are a deterministic closed form.
    Q("q_ewma", Some(
      s"""WITH daily AS ($dailySql)
        |SELECT a.event_type,
        |  strftime(a.day, '%Y-%m-%d') AS day,
        |  a.cnt AS cnt,
        |  round(sum(b.cnt * pow(0.5,
        |    date_diff('day', b.day, a.day) / 7.0)), 6) AS decayed
        |FROM daily a JOIN daily b
        |  ON a.event_type = b.event_type
        | AND date_diff('day', b.day, a.day) BETWEEN 0 AND 13
        |GROUP BY a.event_type, a.day, a.cnt
        |ORDER BY a.event_type, day""".stripMargin),
      (s, d) => {
        val base = daily(s, d)
        val a = base.select(col("event_type"), col("day"),
          col("cnt"))
        val b = base.select(col("event_type").as("event_type_b"),
          col("day").as("day_b"), col("cnt").as("cnt_b"))
        a.join(b, col("event_type") === col("event_type_b") &&
            datediff(col("day"), col("day_b")).between(0, 13))
          .groupBy(col("event_type"), col("day"), col("cnt"))
          .agg(round(sum(col("cnt_b") *
            pow(lit(0.5), datediff(col("day"), col("day_b")) / 7.0)), 6)
            .as("decayed"))
          .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd")
            .as("day"), col("cnt"), col("decayed"))
          .orderBy("event_type", "day")
      }),

    // ---- W+: rolling z-score anomaly flags ----------------------------------
    // Per (type, day): z = (cnt − mean7) / stddev7 over the trailing
    // 7 rows; |z| > 2 flags a spike/collapse. Rows without a full window
    // (rn < 7) or a degenerate flat window (sd = 0) are excluded — both
    // make z undefined, and the exclusion keeps the two engines' NULL/inf
    // conventions out of the hash. round(z, 4) absorbs the Welford-vs-
    // two-pass variance low-order bits.
    Q("q_anomaly", Some(
      s"""WITH daily AS ($dailySql),
        |w AS (
        |  SELECT event_type, day, cnt,
        |    avg(cnt) OVER w7 AS mu,
        |    stddev_samp(cnt) OVER w7 AS sd,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM daily
        |  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
        |  round((cnt - mu) / sd, 4) AS z,
        |  (abs((cnt - mu) / sd) > 2) AS is_anomaly
        |FROM w WHERE rn >= 7 AND sd > 0
        |ORDER BY event_type, day""".stripMargin),
      (s, d) => {
        val w7 = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-6, Window.currentRow)
        val wn = Window.partitionBy("event_type").orderBy("day")
        daily(s, d)
          .withColumn("mu", avg(col("cnt")).over(w7))
          .withColumn("sd", stddev_samp(col("cnt")).over(w7))
          .withColumn("rn", row_number().over(wn))
          .filter(col("rn") >= 7 && col("sd") > 0)
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"), col("cnt"),
            round((col("cnt") - col("mu")) / col("sd"), 4).as("z"),
            (abs((col("cnt") - col("mu")) / col("sd")) > 2).as("is_anomaly"))
          .orderBy("event_type", "day")
      })
  )
}
