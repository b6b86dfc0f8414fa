package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import Tables.{cnt, day, tsSec}

/** Extended relational surface beyond the reference's own operators
  * (SURVEY.md §2.3 J2-J∅, §2.4 A7, §2.8 F∅): as-of join, range join,
  * cube / grouping sets, map functions, pivot.
  *
  * The reference never needs these (its only join is J1), but an engine a
  * reference user switches to must expose the full relational surface —
  * and each of these has a distinct 100 TB shape worth pinning:
  * the as-of join here is ONE shuffle (union + ordered window), not the
  * join-explode-reduce naive form; the range join broadcasts the bounded
  * band table so the fact side never moves.
  */
object Extended {

  /** As-of join, composed from union + ordered window (SURVEY preference
    * (a): compose existing ops). For each left row, attach the most recent
    * right row with `right.ts <= left.ts` for the same key. Both inputs
    * shuffle ONCE on the key — no per-pair candidate explosion, no
    * re-aggregation — and the window scan is a single ordered pass per key
    * partition, which is exactly the merge-scan an as-of join does in
    * native engines.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightVal: String): DataFrame = {
    // the carried value rides inside a STRUCT: `last(ignoreNulls)` must
    // skip left rows (no right row) but NOT a matched right row whose
    // VALUE happens to be null — a bare nullable column can't tell those
    // apart, and the window would reach past the true most-recent match
    // to an older non-null one (row-level divergence from ASOF JOIN)
    val rvType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "v", right.schema(rightVal).dataType)))
    val l = left.withColumn("_side", lit(0))
      .withColumn("_rv", lit(null).cast(rvType))
    val r = right.withColumn("_rv", struct(col(rightVal).as("v")))
      .select(left.columns.map {
        case c if c == key || c == ts => col(c)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      }.toIndexedSeq :+ col("_rv"): _*).withColumn("_side", lit(1))
    // right rows sort BEFORE left rows at equal ts: ties are inclusive
    // (left.ts >= right.ts), matching ASOF JOIN semantics.
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))
      .withColumn("_match", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0 && col("_match").isNotNull)
      .withColumn("_asof", col("_match").getField("v"))
      .drop("_side", "_rv", "_match")
  }

  private val bandEdges = Seq(
    ("band0_50", 0.0, 50.0), ("band50_100", 50.0, 100.0),
    ("band100_150", 100.0, 150.0), ("band150_200", 150.0, 200.0),
    ("band200_up", 200.0, 1e18))

  private val bandSqlValues = bandEdges
    .map { case (b, lo, hi) => s"('$b', $lo, $hi)" }.mkString(", ")

  val all: Seq[Q] = Seq(

    // ---- J: as-of join — each purchase gets the user's latest prior signup ----
    Q("q_join_asof", Some(
      """SELECT p.event_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT user_id, ts FROM events
        |           WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin),
      (s, d) => {
        val e = Tables(s, d, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val signups = e.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
        asofJoin(purchases, signups, "user_id", "ts", "signup_ts")
          .select(col("event_id"), tsSec(col("ts")).as("ts"),
            tsSec(col("_asof")).as("signup_ts"))
          .orderBy("event_id")
      }),

    // ---- J: range join — value histogram against a banded dimension -----------
    // The band table is bounded → broadcast; the fact scan never shuffles.
    Q("q_join_range", Some(
      s"""SELECT band, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN (VALUES $bandSqlValues) AS bands(band, lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY band ORDER BY band""".stripMargin),
      (s, d) => {
        import s.implicits._
        val bands = bandEdges.toDF("band", "lo", "hi")
        Tables(s, d, "events")
          .join(broadcast(bands),
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy("band")
          .agg(cnt.as("cnt"), Tables.sumMoney(col("value")).as("sum_value"))
          .orderBy("band")
      }),

    // ---- A7: cube over (event_type, day) — all four grouping combinations ------
    Q("q_cube", Some(
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(day, 'ALL') AS day, count(*) AS cnt
        |FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day FROM events)
        |GROUP BY CUBE(event_type, day)
        |ORDER BY event_type, day""".stripMargin),
      (s, d) => Tables(s, d, "events")
        .withColumn("day", day(col("ts")))
        .cube("event_type", "day").agg(cnt.as("cnt"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("day"), lit("ALL")).as("day"), col("cnt"))
        .orderBy("event_type", "day")),

    // ---- A7: grouping sets — two independent marginals in one pass -------------
    Q("q_grouping_sets", Some(
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(day, 'ALL') AS day, count(*) AS cnt
        |FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day FROM events)
        |GROUP BY GROUPING SETS ((event_type), (day))
        |ORDER BY event_type, day""".stripMargin),
      (s, d) => Tables(s, d, "events")
        .withColumn("day", day(col("ts")))
        .groupingSets(Seq(Seq(col("event_type")), Seq(col("day"))),
          col("event_type"), col("day"))
        .agg(cnt.as("cnt"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("day"), lit("ALL")).as("day"), col("cnt"))
        .orderBy("event_type", "day")),

    // ---- F∅: map functions — construct, keys, cardinality, element access ------
    Q("q_map_funcs", Some(
      """SELECT event_id,
        |  CAST(cardinality(m) AS BIGINT) AS n_keys,
        |  array_to_string(map_keys(m), ',') AS keys_str,
        |  m['v2'][1] AS v2
        |FROM (SELECT event_id,
        |        map(['v', 'v2'], [value, value * 2]) AS m
        |      FROM events)
        |ORDER BY event_id""".stripMargin),
      (s, d) => Tables(s, d, "events")
        .select(col("event_id"),
          map(lit("v"), col("value"), lit("v2"), col("value") * 2).as("m"))
        .select(col("event_id"),
          size(col("m")).cast("long").as("n_keys"),
          concat_ws(",", map_keys(col("m"))).as("keys_str"),
          element_at(col("m"), "v2").as("v2"))
        .orderBy("event_id")),

    // ---- pivot: daily counts with one column per event type ---------------------
    // Explicit value list → no extra distinct pass over the data, stable
    // column set for the oracle. Missing combinations coalesce to 0 (pivot
    // yields null; the conditional-aggregation oracle yields 0).
    Q("q_pivot", Some(
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) FILTER (WHERE event_type = 'click')    AS click,
        |  count(*) FILTER (WHERE event_type = 'error')    AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  count(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        Tables(s, d, "events")
          .withColumn("day", day(col("ts")))
          .groupBy("day").pivot("event_type", types).agg(cnt)
          .select(col("day") +:
            types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("day")
      }),

    // ---- A7f⁻¹: unpivot (wide metrics back to long form) ----------------------
    // The inverse of q_pivot: melt two numeric columns into (k, v) rows —
    // the normalization step before generic per-metric aggregation. Both
    // columns cast to DOUBLE first (unpivot requires one value type).
    Q("q_unpivot", Some(
      """SELECT event_id, k, v FROM (
        |  SELECT event_id, CAST(user_id AS DOUBLE) AS user_id_d, value
        |  FROM events)
        |UNPIVOT (v FOR k IN (user_id_d, value))
        |ORDER BY event_id, k""".stripMargin),
      (s, d) => Tables(s, d, "events")
        .unpivot(
          Array(col("event_id")),
          Array(col("user_id").cast("double").as("user_id_d"), col("value")),
          "k", "v")
        .orderBy("event_id", "k")
  ))
}
