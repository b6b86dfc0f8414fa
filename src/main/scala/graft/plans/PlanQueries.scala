package graft.plans

import org.apache.spark.sql.functions._
import graft.Q
import graft.query.Tables

/** Driver-verifiable queries for the custom whole-operator plans. */
object PlanQueries {

  val all: Seq[Q] = Seq(
    // Top-3 orders per priority class by price. The oracle is the window
    // form (row_number ≤ k) — hash-equality proves the heap operator
    // computes exactly the window semantics while moving only k rows per
    // key per map partition through the shuffle. Tiebreak on o_orderkey
    // makes the result set unique, so the comparison can't flake.
    Q("q_topk_per_key", Some(
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin),
      (s, d) => {
        val o = Tables(s, d, "orders")
          .select("o_orderpriority", "o_orderkey", "o_totalprice")
        TopK.perKey(o, Seq("o_orderpriority"),
            Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
          .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
      }),

    // Corpus-wide top-5 trigrams per language — the text-pipeline shape of
    // the same operator ("most common boilerplate phrases per language" is
    // a standard corpus-quality report). The expensive stage is the
    // explode + hash aggregate (map-side partial); the top-k stage then
    // moves at most k×langs×partitions count rows instead of every
    // distinct n-gram, which is where the window form loses at 100 TB
    // (n-gram vocabularies grow superlinearly with corpus size). Order
    // (cnt DESC, ngram ASC) is total within a language, so the result set
    // is unique and hash-comparable.
    //
    // Measured alternative: count (lang, ngramHash) first and rebuild
    // strings only for the winners (second scan, long-only shuffles) runs
    // ~1.3x faster here and wins harder at scale — but its rank-boundary
    // ties break by HASH order instead of string order, which is not
    // reproducible against a SQL twin. Determinism wins for the
    // oracle-checked form; take the hash-first variant when the tie policy
    // is yours to choose.
    Q("q_ngram_topk", Some(
      """WITH g AS (
        |  SELECT lang, unnest(list_transform(
        |    generate_series(1, greatest(len(ws) - 2, 0)),
        |    i -> array_to_string(ws[i:i+2], ' '))) AS ngram
        |  FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents)),
        |c AS (SELECT lang, ngram, count(*) AS cnt FROM g GROUP BY 1, 2),
        |r AS (SELECT lang, ngram, cnt,
        |  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, ngram) AS rn
        |  FROM c)
        |SELECT lang, ngram, cnt FROM r WHERE rn <= 5
        |ORDER BY lang, cnt DESC, ngram""".stripMargin),
      (s, d) => {
        val counts = Tables(s, d, "documents")
          .select(col("lang"),
            explode(graft.llm.TextOps.ngramsAll(col("text"), 3)).as("ngram"))
          .groupBy("lang", "ngram").agg(Tables.cnt.as("cnt"))
        TopK.perKey(counts, Seq("lang"),
            Seq(col("cnt").desc, col("ngram").asc), k = 5)
          .orderBy(col("lang"), col("cnt").desc, col("ngram"))
      }),

    // Statistical MODE per key, deterministically: SQL's mode() breaks
    // ties engine-dependently, so it can never hash-compare — this form
    // (count per (key, value) → k=1 heap with an explicit value
    // tiebreak) IS the deterministic definition, and the count aggregate
    // collapses the corpus before the heap sees it: the exchange carries
    // (key, value, count) distinct rows, then one candidate per key per
    // partition. "Most frequent event type per user cohort" shape.
    Q("q_mode_per_key", Some(
      """SELECT event_type, user_id AS mode_user, cnt AS n_occ FROM (
        |  SELECT event_type, user_id, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY count(*) DESC, user_id) AS rn
        |  FROM events GROUP BY event_type, user_id) t
        |WHERE rn = 1 ORDER BY event_type""".stripMargin),
      (s, d) => {
        val counts = Tables(s, d, "events")
          .groupBy("event_type", "user_id").agg(Tables.cnt.as("cnt"))
        TopK.perKey(counts, Seq("event_type"),
            Seq(col("cnt").desc, col("user_id").asc), k = 1)
          .select(col("event_type"), col("user_id").as("mode_user"),
            col("cnt").as("n_occ"))
          .orderBy("event_type")
      }),

    // Latest row per key — the argmax/SCD-current-version idiom ("newest
    // document version per URL", "latest event per user") as the k=1
    // degenerate case of the heap plan. This is the single most common
    // window query in curation pipelines, and the window form is at its
    // WORST here: every historical version shuffles and sorts to keep one
    // row per key, while the heap plan's map-side pass forwards exactly
    // one candidate per key per partition. Tiebreak on event_id keeps the
    // result unique (two events can share a timestamp).
    Q("q_latest_version", Some(
      """SELECT user_id, event_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type
        |FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id) AS rn
        |  FROM events) t WHERE rn = 1
        |ORDER BY user_id""".stripMargin),
      (s, d) => {
        val ev = Tables(s, d, "events")
          .select("user_id", "event_id", "ts", "event_type")
        TopK.perKey(ev, Seq("user_id"),
            Seq(col("ts").desc, col("event_id").asc), k = 1)
          .select(col("user_id"), col("event_id"),
            Tables.tsSec(col("ts")).as("ts_s"), col("event_type"))
          .orderBy("user_id")
      })
  )
}
