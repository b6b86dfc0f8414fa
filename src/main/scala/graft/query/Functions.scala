package graft.query

import org.apache.spark.sql.functions._
import graft.Q
import Tables.cnt

/** Scalar-function battery (SURVEY.md §2.8 beyond F1-F12): string, date,
  * array, and null-handling functions plus approximate quantiles — each
  * DuckDB-twinned so cross-engine semantics (not just types) are pinned.
  * All are single-scan, codegen'd, shuffle-free except the final ORDER BY.
  */
object Functions {

  val all: Seq[Q] = Seq(

    // ---- strings: substring/upper/trim/replace/concat/lpad/length ------------
    Q("q_string_funcs", Some(
      """SELECT doc_id,
        |  upper(substring(source, 1, 3)) AS src3,
        |  replace(lang, 'en', 'EN') AS lang_r,
        |  concat(lang, ':', source) AS tag,
        |  lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded,
        |  length(trim(source)) AS src_len
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => Tables(s, d, "documents").select(
        col("doc_id"),
        upper(substring(col("source"), 1, 3)).as("src3"),
        regexp_replace(col("lang"), "en", "EN").as("lang_r"),
        concat(col("lang"), lit(":"), col("source")).as("tag"),
        lpad(col("doc_id").cast("string"), 6, "0").as("padded"),
        length(trim(col("source"))).cast("long").as("src_len"))
        .orderBy("doc_id")),

    // ---- regex: extract/count/match/replace -----------------------------------
    // patterns restricted to the Java-regex ∩ RE2 dialect (no lookaround,
    // no backrefs) so Spark and DuckDB execute literally the same automaton
    // — the same portability rule as q_redact's PII patterns
    Q("q_regexp_funcs", Some(
      """SELECT doc_id,
        |  regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
        |  CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels,
        |  regexp_matches(text, 'data|spark') AS mentions,
        |  regexp_replace(text, '[0-9]+', '#', 'g') AS masked
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => Tables(s, d, "documents").select(
        col("doc_id"),
        regexp_extract(col("text"), "([A-Za-z]+)", 1).as("first_word"),
        regexp_count(col("text"), lit("[aeiou]")).cast("long").as("n_vowels"),
        col("text").rlike("data|spark").as("mentions"),
        regexp_replace(col("text"), "[0-9]+", "#").as("masked"))
        .orderBy("doc_id")),

    // ---- dates: add/diff/extract/truncate -------------------------------------
    Q("q_date_funcs", Some(
      """SELECT event_id,
        |  strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d') AS plus7,
        |  CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS days_since,
        |  CAST(year(ts) AS BIGINT) AS y,
        |  CAST(month(ts) AS BIGINT) AS m,
        |  CAST(dayofweek(ts) AS BIGINT) AS dow,
        |  CAST(hour(ts) AS BIGINT) AS h
        |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => Tables(s, d, "events").select(
        col("event_id"),
        date_format(col("ts") + expr("INTERVAL 7 DAY"), "yyyy-MM-dd").as("plus7"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("days_since"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        // DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("h"))
        .orderBy("event_id")),

    // ---- arrays: sort/contains/position/slice/distinct-count ------------------
    Q("q_array_funcs", Some(
      """SELECT doc_id,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  list_sort(list_distinct(string_split(text, ' ')))[1] AS first_word,
        |  list_contains(string_split(text, ' '), 'the') AS has_the,
        |  string_split(text, ' ')[2] AS second_token
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val w = split(col("text"), " ")
        Tables(s, d, "documents").filter(col("doc_id") < 200).select(
          col("doc_id"),
          size(array_distinct(w)).cast("long").as("n_distinct"),
          array_sort(array_distinct(w)).getItem(0).as("first_word"),
          array_contains(w, "the").as("has_the"),
          w.getItem(1).as("second_token"))
          .orderBy("doc_id")
      }),

    // ---- null handling: coalesce / nullif / null-aware count ------------------
    Q("q_null_funcs", Some(
      """SELECT
        |  count(*) AS n,
        |  count(nullif(event_type, 'error')) AS n_non_error,
        |  count(*) FILTER (WHERE nullif(event_type, 'error') IS NULL) AS n_error,
        |  min(coalesce(nullif(event_type, 'error'), 'zzz')) AS min_type
        |FROM events""".stripMargin),
      (s, d) => {
        val nn = nullif(col("event_type"), lit("error"))
        Tables(s, d, "events").agg(
          cnt.as("n"),
          count(nn).as("n_non_error"),
          count(when(nn.isNull, 1)).as("n_error"),
          min(coalesce(nn, lit("zzz"))).as("min_type"))
      }),

    // ---- edit distance (fuzzy matching primitive for dedup pipelines) ----------
    Q("q_levenshtein", Some(
      """SELECT doc_id,
        |  CAST(levenshtein(substring(text, 1, 20), 'the quick brown fox') AS BIGINT) AS dist
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin),
      (s, d) => Tables(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          levenshtein(substring(col("text"), 1, 20),
            lit("the quick brown fox")).cast("long").as("dist"))
        .orderBy("doc_id")),

    // ---- A∅: approximate quantiles (sketch-based; rows-only — DuckDB's
    // approx_quantile uses a different sketch, exact values are
    // engine-defined; bounds are asserted in the unit spec) ---------------------
    // ---- histogram: fixed-width binning, exact counts --------------------------
    // (this DuckDB build has no width_bucket; the oracle states the same
    // binning arithmetically: bucket i covers [(i-1)*5, i*5), upper bound
    // inclusive lands in bucket 11 — width_bucket's exact contract)
    Q("q_histogram", Some(
      """SELECT CAST(floor(l_quantity / 5) + 1 AS BIGINT) AS bucket,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Tables(s, d, "lineitem")
        .select(width_bucket(col("l_quantity"), lit(0), lit(50), lit(10))
          .cast("long").as("bucket"))
        .groupBy("bucket").agg(cnt.as("cnt"))
        .orderBy("bucket")),

    // ---- string aggregation: sorted-distinct concat per group ------------------
    // collect_list is order-nondeterministic under parallelism, so the
    // deterministic form is sort-then-join — the only safe way to compare
    // string aggregation across ANY two engines (or two runs)
    Q("q_string_agg", Some(
      """SELECT n_name,
        |  array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segs
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin),
      (s, d) => Tables(s, d, "customer")
        .join(Tables(s, d, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(array_join(array_sort(array_distinct(
          collect_list(col("c_mktsegment")))), ",").as("segs"))
        .orderBy("n_name")),

    // ---- second-moment statistics: stddev / correlation / covariance -----------
    // rounded to absorb summation-order ulps (both engines stream partial
    // aggregates in engine-defined order; the values agree to ~1e-12
    // relative, far inside the rounding)
    Q("q_stats_moments", Some(
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qe,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qe
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qe"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qe"))
        .orderBy("l_returnflag")),

    // ---- approx quantile, oracled via its rank-error LAW -----------------------
    // percentile_approx(accuracy=1000) guarantees rank error <= n/1000, so
    // the approximate p50/p99 must land inside the exact [p45,p55] /
    // [p97,p99.9] value bands — enormously slack vs the contract, tight vs
    // a broken sketch. exact_p50/p99 bind the frame to real data (both
    // engines interpolate quantiles identically: idx = p*(n-1), linear).
    Q("q_approx_quantile", Some(
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS exact_p50,
        |  round(quantile_cont(value, 0.99), 4) AS exact_p99,
        |  true AS p50_in_band, true AS p99_in_band
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => Tables(s, d, "events")
        .groupBy("event_type")
        .agg(
          round(percentile(col("value"), lit(0.5)), 4).as("exact_p50"),
          round(percentile(col("value"), lit(0.99)), 4).as("exact_p99"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50a"),
          percentile_approx(col("value"), lit(0.99), lit(1000)).as("p99a"),
          percentile(col("value"), lit(0.45)).as("p45"),
          percentile(col("value"), lit(0.55)).as("p55"),
          percentile(col("value"), lit(0.97)).as("p97"),
          percentile(col("value"), lit(0.999)).as("p999"))
        .withColumn("p50_in_band", col("p50a").between(col("p45"), col("p55")))
        .withColumn("p99_in_band", col("p99a").between(col("p97"), col("p999")))
        .select("event_type", "exact_p50", "exact_p99",
          "p50_in_band", "p99_in_band")
        .orderBy("event_type"))
  ) ++ Profile.all
}

/** One-pass table profiling (the `ANALYZE TABLE` / data-quality sweep every
  * curation pipeline runs before training): per-column null count, exact
  * distinct count, and min/max for N columns over ONE scan — never the
  * naive per-column loop, which at 100 TB is N full table reads.
  *
  * Plan shape (the part that survives scale): each row MELTS into one
  * (col_name, val_num, val_str) tuple per profiled column — a row-local
  * explode, no shuffle — then TWO hash aggregates: first by (col_name,
  * value), whose map-side partials collapse duplicate values before
  * anything moves, then by col_name for the final counts and min/max.
  * The obvious alternative — one wide aggregate with N `countDistinct`s —
  * plans through Catalyst's Expand: N shuffled replicas of every raw row
  * with NO early collapse (measured 9.7 s vs 1.1 s here at sf0.1, and the
  * gap widens with duplication). The melt costs Nx in the map stage only;
  * the wire carries distinct values. `approx_count_distinct` (HLL,
  * verified under `q_approx_distinct`) remains the single-aggregate
  * fallback when even distinct values outgrow the wire.
  */
object Profile {

  private val numCols = Seq("l_quantity", "l_extendedprice", "l_discount")
  private val strCols = Seq("l_returnflag", "l_linestatus")

  val all: Seq[Q] = Seq(
    Q("q_profile", Some {
      val parts = numCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      } ++ strCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |  min($c) AS min_str, max($c) AS max_str
           |FROM lineitem""".stripMargin
      }
      parts.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val melted = li.select(explode(array(
          numCols.map(c => struct(lit(c).as("col_name"),
            col(c).cast("double").as("val_num"),
            lit(null).cast("string").as("val_str"))) ++
          strCols.map(c => struct(lit(c).as("col_name"),
            lit(null).cast("double").as("val_num"),
            col(c).as("val_str"))): _*)).as("p"))
          .select("p.*")
        // stage 1: collapse to distinct (col, value) with the null group's
        // row count riding along; stage 2: finalize per column
        melted.groupBy("col_name", "val_num", "val_str")
          .agg(cnt.as("vcnt"))
          .groupBy("col_name")
          .agg(
            coalesce(sum(when(col("val_num").isNull && col("val_str").isNull,
              col("vcnt"))), lit(0L)).as("n_nulls"),
            count(when(col("val_num").isNotNull || col("val_str").isNotNull,
              lit(1))).as("n_distinct"),
            min("val_num").as("min_num"), max("val_num").as("max_num"),
            min("val_str").as("min_str"), max("val_str").as("max_str"))
          .orderBy("col_name")
      })
  )
}
