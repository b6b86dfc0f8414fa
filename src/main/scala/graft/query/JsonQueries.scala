package graft.query

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.Q
import Tables.cnt

/** Semi-structured surface (S1/S3, P2, P4, F11, U3): JSON parse with
  * corrupt-record tolerance, nested projection, null guards — the engine
  * analog of the reference's dict-plucking handlers
  * (`/root/reference/preprocess.py:40-140`), exercised on the `events.props`
  * JSON strings.
  */
object JsonQueries {

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  val all: Seq[Q] = Seq(

    // ---- S1/S3: JSON scan — parse every line, count + aggregate -------------
    Q("q_scan_json", Some(
      """SELECT count(*) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |       AS BIGINT) AS sum_k
        |FROM events""".stripMargin),
      (s, d) => Tables(s, d, "events")
        .select(from_json(col("props"), propsSchema).as("p"))
        .agg(cnt.as("n"), min(col("p.k")).as("min_k"),
          max(col("p.k")).as("max_k"), sum(col("p.k")).as("sum_k"))),

    // ---- F11: JSON field extraction + group -----------------------------------
    Q("q_json_parse", Some(
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |       AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => Tables(s, d, "events")
        .select(col("event_type"),
          from_json(col("props"), propsSchema).getField("k").as("k"))
        .groupBy("event_type").agg(sum(col("k")).as("sum_k"))
        .orderBy("event_type")),

    // ---- P2: nested-field projection (struct build + pluck round-trip) ---------
    // The engine form of `d["payload"]["pull_request"]["user"]["login"]`
    // (preprocess.py:69): nested structs are first-class columns.
    Q("q_project_nested", Some(
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id""".stripMargin),
      (s, d) => Tables(s, d, "events")
        .select(col("event_id"),
          struct(col("user_id"),
            struct(col("event_type"), col("value")).as("inner")).as("payload"))
        .select(col("event_id"),
          col("payload.user_id").as("user_id"),
          col("payload.inner.event_type").as("event_type"))
        .orderBy("event_id")),

    // ---- P4/U3: null-guarded extraction — corrupt/missing JSON drops the row ----
    // from_json yields null for absent fields / broken records instead of
    // raising, mirroring the skip-and-log loop (preprocess.py:131-136).
    // The parse is wrapped Opaque: pushing the null filter below the
    // projection substitutes the alias and the plan carries TWO
    // JsonToStructs nodes over the same `props` — every row pays the parse
    // twice (r11 before-plan). Opaque pins one evaluation; values unchanged.
    // The explicit props.isNotNull BEFORE the projection restores the scan
    // pushdown Opaque's non-determinism otherwise blocks (r12; the r11
    // after-plan had lost PushedFilters entirely): from_json(null) is null
    // and the k-filter drops it anyway, so results are identical while the
    // scan skips null-props rows — at scale, a real row-width win on a
    // sparse column (guide §6).
    Q("q_null_guard", Some(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |ORDER BY event_id""".stripMargin),
      (s, d) => Tables(s, d, "events")
        .filter(col("props").isNotNull)
        .select(col("event_id"),
          graft.functions.Opaque.once(
            from_json(col("props"), propsSchema).getField("k")).as("k"))
        .filter(col("k").isNotNull)
        .orderBy("event_id"))
  )
}
