package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.time.Increments
import Tables.{cnt, day, tsSec}

/** Time semantics (SURVEY.md §2.5, §2.8 F4-F9, §2.9) over the `events`
  * table: parsing, bucketing, watermarks, and the window-function surface
  * the reference's product goals demand ("recent trends over a few time
  * scales", `gha.ipynb:392`).
  */
object Temporal {

  private def ev(s: SparkSession, d: String) = Tables(s, d, "events")

  /** Daily counts per type — the shared base for window queries. */
  private def daily(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(col("event_type"), day(col("ts")).as("day"))
      .agg(cnt.as("cnt"))

  private val dailySql =
    """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt
      |FROM events GROUP BY 1, 2""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- F4/P3: ISO-8601 string -> timestamp (preprocess.py:47) ----------
    // Round-trips ts through a string parse to exercise to_timestamp.
    Q("q_ts_parse", Some(
      """SELECT event_id,
        |  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_str
        |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => ev(s, d)
        .select(col("event_id"),
          tsSec(to_timestamp(tsSec(col("ts")))).as("ts_str"))
        .orderBy("event_id")),

    // ---- F5: timestamp -> date partition column (preprocess.py:161) -------
    Q("q_to_date", Some(
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => ev(s, d)
        .groupBy(day(col("ts")).as("day")).agg(cnt.as("cnt"))
        .orderBy("day")),

    // ---- F6: ceil-to-hour, exact hours must not advance (preprocess.py:186) --
    Q("q_ceil_hour", Some(
      """SELECT event_id, strftime(
        |  CASE WHEN date_trunc('hour', ts) = ts THEN ts
        |       ELSE date_trunc('hour', ts) + INTERVAL 1 HOUR END,
        |  '%Y-%m-%d %H:%M:%S') AS ceil_hour
        |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => ev(s, d)
        .select(col("event_id"),
          tsSec(Increments.ceilHour(col("ts"))).as("ceil_hour"))
        .orderBy("event_id")),

    // ---- F7: floor-to-hour minus safety lag (preprocess.py:189) -------------
    Q("q_floor_hour", Some(
      """SELECT event_id,
        |  strftime(date_trunc('hour', ts) - INTERVAL 1 HOUR,
        |           '%Y-%m-%d %H:%M:%S') AS stop_bound
        |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => ev(s, d)
        .select(col("event_id"),
          tsSec(Increments.floorHour(col("ts")) - expr("INTERVAL 1 HOUR"))
            .as("stop_bound"))
        .orderBy("event_id")),

    // ---- S10/F8/F9: hourly file-list generation (preprocess.py:193-196) ------
    Q("q_filelist", Some(
      """SELECT 'https://data.gharchive.org/' || strftime(h, '%Y-%m-%d-')
        |       || CAST(hour(h) AS VARCHAR) || '.json.gz' AS url
        |FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |                     TIMESTAMP '2024-01-02 23:00:00',
        |                     INTERVAL 1 HOUR) AS t(h)
        |ORDER BY url""".stripMargin),
      (s, _) => Increments
        .hourlyUrls(s, "2024-01-01 00:00:00", "2024-01-02 23:00:00")
        .orderBy("url")),

    // ---- S5/A6/T1: ingestion watermark (preprocess.py:181-186) ---------------
    Q("q_watermark_max", Some(
      """SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts FROM events"""),
      (s, d) => ev(s, d).agg(tsSec(max(col("ts"))).as("max_ts"))),

    // ---- W: rank within partition — top-3 days per type ----------------------
    Q("q_window_rank", Some(
      s"""WITH daily AS ($dailySql)
        |SELECT event_type, day, cnt, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY event_type ORDER BY cnt DESC, day) AS rn
        |  FROM daily)
        |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(desc("cnt"), asc("day"))
        daily(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .orderBy("event_type", "rn")
      }),

    // ---- W: lag — day-over-day delta ------------------------------------------
    Q("q_window_lag", Some(
      s"""WITH daily AS ($dailySql)
        |SELECT event_type, day, cnt,
        |  cnt - lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY day) AS delta
        |FROM daily ORDER BY event_type, day""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("day")
        daily(s, d)
          .withColumn("delta", col("cnt") - lag(col("cnt"), 1).over(w))
          .orderBy("event_type", "day")
      }),

    // ---- W: rolling frame — 7-day trailing sum ----------------------------------
    Q("q_window_rolling", Some(
      s"""WITH daily AS ($dailySql)
        |SELECT event_type, day, cnt,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |       AS BIGINT) AS trailing7
        |FROM daily ORDER BY event_type, day""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-6, Window.currentRow)
        daily(s, d)
          .withColumn("trailing7", sum(col("cnt")).over(w))
          .orderBy("event_type", "day")
      }),

    // ---- W: RANGE frame (value-based, not row-based) ---------------------------
    // The trailing-7-CALENDAR-DAY sum over a daily series WITH GAPS (odd
    // days only — the gaps are the point): a ROWS frame would reach back 7
    // observations ≈ 13 calendar days, while RANGE bounds the frame by the
    // ORDER VALUE, skipping absent days' weight entirely. This is the
    // frame a time-decayed metric needs when the series is sparse.
    Q("q_window_range", Some(
      s"""WITH daily AS ($dailySql),
        |n AS (
        |  SELECT event_type, day, cnt,
        |    date_diff('day', DATE '2024-01-01', CAST(day AS DATE)) AS dnum
        |  FROM daily WHERE day(CAST(day AS DATE)) % 2 = 1)
        |SELECT event_type, day,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY dnum
        |        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS w7
        |FROM n ORDER BY event_type, day""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("dnum")
          .rangeBetween(-6, Window.currentRow)
        daily(s, d)
          .withColumn("dnum",
            datediff(to_date(col("day")), lit("2024-01-01").cast("date")))
          .filter(dayofmonth(to_date(col("day"))) % 2 === 1)
          .withColumn("w7", sum(col("cnt")).over(w))
          .select("event_type", "day", "w7")
          .orderBy("event_type", "day")
      }),

    // ---- W: rank-family battery — dense_rank / ntile / percent_rank / cume_dist --
    Q("q_window_ranks", Some(
      s"""WITH daily AS ($dailySql)
        |SELECT event_type, day, cnt,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY cnt DESC, day)
        |ORDER BY event_type, drnk, day""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(desc("cnt"), asc("day"))
        daily(s, d)
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("prnk", round(percent_rank().over(w), 6))
          .withColumn("cdist", round(cume_dist().over(w), 6))
          .orderBy("event_type", "drnk", "day")
      }),

    // ---- W: navigation frame — first/last/nth value over an explicit frame ----
    // Ranking functions use the default frame; value navigation needs the
    // full-partition frame spelled out (the default RANGE..CURRENT ROW frame
    // would make last_value degenerate to the current row in BOTH engines).
    Q("q_window_nav", Some(
      s"""WITH daily AS ($dailySql)
        |SELECT event_type, day, cnt,
        |  first_value(cnt) OVER w AS best,
        |  last_value(cnt) OVER w AS worst,
        |  nth_value(cnt, 2) OVER w AS runner_up
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY cnt DESC, day
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_type, cnt DESC, day""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("event_type")
          .orderBy(desc("cnt"), asc("day"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        daily(s, d)
          .withColumn("best", first(col("cnt")).over(w))
          .withColumn("worst", last(col("cnt")).over(w))
          .withColumn("runner_up", nth_value(col("cnt"), 2).over(w))
          .orderBy(col("event_type"), desc("cnt"), asc("day"))
      }),

    // ---- T3: tumbling hourly window (the reference's micro-batch grain) ---------
    Q("q_window_tumbling", Some(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
        |       event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => ev(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(cnt.as("cnt"))
        .select(tsSec(col("window.start")).as("wstart"),
          col("event_type"), col("cnt"))
        .orderBy("wstart", "event_type")),

    // ---- T: sliding window (1h window, 30m slide) ---------------------------------
    // Oracle: each event belongs to exactly 2 windows — its 30-min bucket
    // start and that start minus 30 min.
    Q("q_window_sliding", Some(
      """SELECT strftime(s, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
        |       count(*) AS cnt
        |FROM (
        |  SELECT event_type, unnest([b, b - INTERVAL 30 MINUTE]) AS s
        |  FROM (
        |    SELECT event_type,
        |      date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
        |        THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS b
        |    FROM events))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => ev(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(cnt.as("cnt"))
        .select(tsSec(col("window.start")).as("wstart"),
          col("event_type"), col("cnt"))
        .orderBy("wstart", "event_type")),

    // ---- T: session windows (5-minute gap) per user ---------------------------------
    // Oracle: classic lag/cumsum sessionization — a new session starts when
    // the gap to the previous event is >= 5 minutes.
    Q("q_session_window", Some(
      """WITH x AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts,
        |    CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM x),
        |z AS (
        |  SELECT user_id, ts, sum(brk) OVER (
        |    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM y)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS cnt
        |FROM z GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin),
      (s, d) => ev(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
        .agg(cnt.as("cnt"))
        .select(col("user_id"),
          tsSec(col("session_window.start")).as("session_start"), col("cnt"))
        .orderBy("user_id", "session_start"))
  ) ++ Behavior.all
}

/** Ordered-behavior analytics over the event stream (SURVEY.md §2.5 W+):
  * funnels and cohort retention — the two queries every product-analytics
  * engine ships and the reference's "recent trends" goal grows into. Both
  * reduce to aggregates and joins KEYED ON user_id: one hash partitioning
  * carries every stage (exchange reuse), nothing driver-side, no window
  * over the raw stream.
  */
object Behavior {

  private def ev(s: SparkSession, d: String) =
    Tables(s, d, "events").select("user_id", "event_type", "ts")

  val all: Seq[Q] = Seq(

    // ---- W+f: 3-step ordered funnel (signup -> click -> purchase) --------------
    // Each stage is "earliest qualifying event STRICTLY AFTER the previous
    // stage's time", per user; the output row counts survivors per stage.
    // Stage joins stay user_id-keyed: the per-stage frame is users-sized
    // (shrinking), joined back to the co-partitioned events — at 100 TB
    // the events side partitions once and every stage reuses it.
    // ---- W∅m: event-transition matrix (first-order Markov) ----------------------
    // The sequence-structure complement to funnel/retention: per-user
    // event streams yield (from → to) transition counts and row-normalized
    // probabilities — the behavioral fingerprint drift monitors and
    // session simulators consume. One lead() window per user (partitioned
    // — user-bounded state), one hash aggregate on (from, to) pairs, and
    // the normalizing window runs on |types|² rows. Deterministic: the
    // per-user order carries an event_id tiebreak, and probabilities
    // divide exact int64 counts.
    Q("q_markov", Some(
      """WITH s AS (SELECT user_id, event_type AS f,
        |    lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS t
        |  FROM events),
        |c AS (SELECT f, t, count(*) AS n FROM s
        |      WHERE t IS NOT NULL GROUP BY 1, 2)
        |SELECT f AS from_type, t AS to_type, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY f), 6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = Tables(s, d, "events")
          .select(col("event_type").as("f"),
            lead(col("event_type"), 1).over(w).as("t"))
          .filter(col("t").isNotNull)
          .groupBy("f", "t").agg(cnt.as("n"))
        val norm = Window.partitionBy("f")
        pairs.select(col("f").as("from_type"), col("t").as("to_type"),
            col("n"),
            round(col("n").cast("double") / sum("n").over(norm), 6).as("p"))
          .orderBy("from_type", "to_type")
      }),

    Q("q_funnel", Some(
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
        |SELECT count(*) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_click_after,
        |       (SELECT count(*) FROM s3) AS n_purchase_after
        |FROM s1""".stripMargin),
      (s, d) => {
        val e = ev(s, d)
        // SNAP each funnel stage (r11): lazily s1 is rebuilt under s2,
        // under s3-via-s2, and in the closing join (the corpus scanned
        // ~6x; before-plan 22 Exchanges / 12 scans). Each stage frame is
        // user-bounded (<= distinct users); snapping s1/s2 leaves exactly
        // one corpus scan per stage — the funnel's inherent cost.
        val s1 = graft.plans.Snap.snap(
          e.filter(col("event_type") === "signup")
            .groupBy("user_id").agg(min("ts").as("t1")))
        val s2 = graft.plans.Snap.snap(e.join(s1, "user_id")
          .filter(col("event_type") === "click" && col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2")))
        val s3 = e.join(s2, "user_id")
          .filter(col("event_type") === "purchase" && col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
          .agg(count("t1").as("n_signup"), count("t2").as("n_click_after"),
            count("t3").as("n_purchase_after"))
      }),

    // ---- W+r: weekly cohort retention ------------------------------------------
    // Cohort = Monday-truncated week of a user's FIRST event; cell (c, k)
    // counts cohort-c users active in week c+k. Two user-keyed aggregates
    // + one user-keyed join; both engines truncate weeks to Monday, and
    // offsets divide exactly (both sides are week-aligned).
    Q("q_retention", Some(
      """WITH first_seen AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
        |       count(*) AS n_active
        |FROM activity JOIN first_seen USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => {
        val e = ev(s, d)
        val firstSeen = e.groupBy("user_id")
          .agg(date_trunc("week", min("ts")).as("cohort"))
        val activity = e
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        activity.join(firstSeen, "user_id")
          .groupBy(
            date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
            (datediff(col("wk"), col("cohort")) / 7).cast("long")
              .as("week_offset"))
          .agg(cnt.as("n_active"))
          .orderBy("cohort_week", "week_offset")
      }),

    // ---- W+g: time-series resample + forward fill (gap filling) ----------------
    // Regularize the sparse event stream onto an hourly spine per user and
    // carry the last observation forward — the resample step before any
    // per-entity time-series modeling. Spine = users x sequence(hours), a
    // row-local explode (no shuffle); observations aggregate once on
    // (user, hour); the fill is one window pass over the SAME user
    // partitioning. Hours before a user's first observation stay NULL
    // (nothing to carry), pinned by the filled flag. max() not avg() per
    // hour: exact, order-independent, so the carried values hash-compare.
    Q("q_gap_fill", Some(
      """WITH spine AS (
        |  SELECT user_id, unnest(generate_series(
        |    TIMESTAMP '2024-01-05 00:00:00',
        |    TIMESTAMP '2024-01-06 23:00:00', INTERVAL 1 HOUR)) AS hr
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |obs AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr, max(value) AS v
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-07 00:00:00'
        |  GROUP BY 1, 2)
        |SELECT user_id, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
        |  last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        |  (v IS NULL) AS filled
        |FROM spine LEFT JOIN obs USING (user_id, hr)
        |ORDER BY user_id, hour""".stripMargin),
      (s, d) => {
        val e = Tables(s, d, "events")
        val lo = lit("2024-01-05 00:00:00").cast("timestamp")
        val hi = lit("2024-01-06 23:00:00").cast("timestamp")
        val spine = e.select("user_id").distinct()
          .select(col("user_id"), explode(sequence(lo, hi,
            expr("interval 1 hour"))).as("hr"))
        val obs = e
          .filter(col("ts") >= lo &&
            col("ts") < lit("2024-01-07 00:00:00").cast("timestamp"))
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
          .agg(max("value").as("v"))
        val w = Window.partitionBy("user_id").orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(obs, Seq("user_id", "hr"), "left")
          .select(col("user_id"), tsSec(col("hr")).as("hour"),
            last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
            col("v").isNull.as("filled"))
          .orderBy("user_id", "hour")
      })
  )
}
