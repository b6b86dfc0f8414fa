package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.query.Tables
import Tables.cnt

/** L31: distributed BPE tokenizer training + encoding — the step that turns
  * a cleaned corpus into the tokenizer the training run will use (the
  * Sennrich 2016 byte-pair-encoding algorithm, as `subword-nmt learn_bpe` /
  * SentencePiece's BPE trainer implement it).
  *
  * Scale shape (why this distributes): BPE never iterates over the corpus —
  * it iterates over the WORD-FREQUENCY TABLE. The corpus crosses the wire
  * exactly once (the word-count hash aggregate, map-side partials, 8-byte
  * word keys would be possible but counts join back to merge state so words
  * stay); every merge round after that runs on the vocabulary frame, whose
  * size is corpus-size-INDEPENDENT by Heaps' law (~millions of rows at
  * 100 TB — a few hundred MB, comfortably a handful of partitions). Each
  * round = one pair-count hash aggregate over the vocab frame + one 1-row
  * argmax to the driver + one row-local `replace` — so training cost is
  * O(rounds × vocab), not O(rounds × corpus). This is exactly the
  * learn-on-counts trick every production BPE trainer uses; here the vocab
  * frame is distributed, so a web-scale vocabulary (hundreds of millions of
  * distinct "words" from noisy crawl text) still fits.
  *
  * Symbol-sequence representation: each word is kept as ONE string with a
  * `|` separator BEFORE every symbol (`"low"` → `"|l|o|w"`). A merge of
  * pair (a,b) is then the literal left-to-right non-overlapping
  * `replace(seq, "|a|b", "|ab")` — the leading separator makes the pattern
  * anchor only at symbol STARTS (symbol "xa" followed by "b" is `"|xa|b"`,
  * which never contains `"|a|b"`), and left-to-right non-overlap is the
  * classic BPE apply order (`"|e|e|e"` merging (e,e) → `"|ee|e"`). Both
  * Spark's and DuckDB's `replace` share these semantics, which is what
  * makes the trainer exactly oracle-able. The separator must not occur in
  * the corpus alphabet; [[train]] fails loudly if it does rather than
  * silently corrupting symbol boundaries.
  *
  * Honest caveat vs tuple-based BPE: the anchor is LEADING-side only, so
  * when a learned symbol is a strict prefix of another learned symbol, a
  * later merge can fire across the boundary (merge (a,b) on `"|a|bx"` —
  * symbol `bx` starts with `b` — yields `"|abx"`). Trainer, encoder, and
  * the DuckDB oracle all share these semantics bit-for-bit, so the
  * tokenizer is self-consistent end to end; but on corpora where that
  * prefix collision occurs, the learned merges may diverge from a
  * tuple-of-symbols trainer (a trailing anchor cannot fix it: RE2 — the
  * oracle's regex engine — has no lookahead, and consuming a trailing
  * separator breaks left-to-right repeats like `"|e|e|e"`).
  *
  * Determinism: pair counts are exact integer sums; the argmax orders by
  * (count DESC, lhs, rhs) — a total order, so the learned merge list is
  * engine- and partitioning-independent.
  */
object Bpe {

  /** One learned merge: at `round`, symbols `lhs`+`rhs` fused (count =
    * occurrences under the vocabulary state of that round).
    */
  final case class Merge(round: Int, lhs: String, rhs: String, cnt: Long)

  private val SEP = "|"

  /** Word-frequency table of `textCol` (whitespace tokens): (w, c).
    * The ONE corpus-wide shuffle of the whole trainer.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(cnt.as("c"))

  /** Learn `rounds` BPE merges from the corpus. Returns the merge list in
    * learned order (its length may be < `rounds` if the vocabulary runs
    * out of adjacent pairs first). The returned list is the tokenizer —
    * feed it to [[tokensPerWord]] / [[encode]].
    *
    * `batch` (default 1 = exact sequential BPE) accepts up to `batch`
    * merges per pair-count JOB: after the argmax, further pairs are
    * admitted in (count DESC, lhs, rhs) order iff they are pairwise
    * NON-INTERACTING with every merge already accepted this round — the
    * candidate's symbols must not touch any accepted pair's {lhs, rhs,
    * lhs+rhs}. Disjointness makes the admitted pairs' counts exact (a
    * disjoint merge can neither create nor destroy the other pair's
    * adjacencies — creation would need the merged symbol as a member,
    * destruction a shared member) and their application order immaterial,
    * so each admitted merge records the count it would have had at its
    * own sequential round.
    *
    * The documented divergence from exact BPE: a merge accepted late in a
    * batch cannot see pairs CREATED by merges accepted earlier in the
    * same batch, and sequential BPE might have ranked such a created pair
    * first (e.g. after (t,h)→th, exact BPE may pick (th,e) next; the
    * batch, built from pre-round counts, never considers it). The merge
    * SET may therefore differ from sequential order — the standard
    * batched-trainer trade (every production "fast BPE" makes it) that
    * turns a 32k vocabulary from 32k sequential jobs into
    * ~vocab/batch rounds. BpeSpec pins batch=1 ≡ sequential and the
    * non-interaction invariant on a crafted corpus.
    *
    * Scale note: each round applies ≤ `batch` stacked literal `replace`s
    * and then RE-CHECKPOINTS the vocab frame, so expression depth is
    * bounded by `batch`, never by total rounds.
    */
  def train(df: DataFrame, textCol: String, rounds: Int,
      batch: Int = 1): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    val wc = wordCounts(df, textCol)
    // separator-collision guard: a '|' inside a word would read as a
    // symbol boundary and silently corrupt merges — fail instead
    require(wc.filter(col("w").contains(SEP)).isEmpty,
      s"corpus words must not contain the '$SEP' symbol separator")
    // vocab frame: (w, c, seq) — eager checkpoint; every round replans
    // from these blocks, not from the corpus scan
    val vocab0 = wc
      .withColumn("seq", regexp_replace(col("w"), "(.)", SEP + "$1"))
      .localCheckpoint()
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    var owned: DataFrame = null // the batch-mode checkpoint WE made last
    try {
      var vocab = vocab0
      val merges = Seq.newBuilder[Merge]
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val want = math.min(batch, rounds - r + 1)
        // pair counts over the vocab frame (weighted by word count);
        // expr-SQL because HOF-lambda struct field NAMES are only
        // reliable in the SQL form. Collect 4x the batch (bounded): the
        // greedy non-interaction filter may reject early candidates.
        val top = vocab
          .select(col("c"),
            split(col("seq").substr(lit(2), length(col("seq"))), "\\|").as("sy"))
          .select(col("c"), expr(
            "explode(zip_with(" +
              "slice(sy, 1, greatest(size(sy) - 1, 0))," +
              "slice(sy, 2, greatest(size(sy) - 1, 0))," +
              "(a, b) -> struct(a AS lhs, b AS rhs)))").as("p"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum("c").as("cnt"))
          .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
          .limit(if (want == 1) 1 else 4 * want).collect()
        if (top.isEmpty) exhausted = true
        else {
          // greedy admission: top-1 always; then pairs whose symbols are
          // disjoint from every accepted merge's {lhs, rhs, lhs+rhs}
          val touched = scala.collection.mutable.Set.empty[String]
          val accepted = Seq.newBuilder[(String, String, Long)]
          var nAcc = 0
          top.iterator.takeWhile(_ => nAcc < want).foreach { row =>
            val (l, rh, n) = (row.getString(0), row.getString(1), row.getLong(2))
            if (nAcc == 0 ||
                (!touched(l) && !touched(rh) && !touched(l + rh))) {
              accepted += ((l, rh, n))
              touched ++= Seq(l, rh, l + rh)
              nAcc += 1
            }
          }
          val adm = accepted.result()
          adm.foreach { case (l, rh, n) => merges += Merge(r, l, rh, n); r += 1 }
          val next = adm.foldLeft(vocab) { case (v, (l, rh, _)) =>
            v.withColumn("seq",
              replace(col("seq"), lit(SEP + l + SEP + rh), lit(SEP + l + rh)))
          }
          // bound expression depth across rounds: in batch mode the
          // replace chain re-checkpoints each round (and the previous
          // round's snapshot releases); exact mode keeps the historical
          // stack-over-vocab0 shape (rounds are few by construction)
          if (batch > 1) {
            vocab = next.localCheckpoint()
            if (owned != null) bridge.releaseLocalCheckpoint(owned)
            owned = vocab
          } else vocab = next
        }
      }
      merges.result()
    } finally {
      bridge.releaseLocalCheckpoint(vocab0)
      // the merge list is already materialized on the driver, so the last
      // round's snapshot releases deterministically too (not left to GC)
      if (owned != null) bridge.releaseLocalCheckpoint(owned)
    }
  }

  /** The learned merge list as a frame: (round, lhs, rhs, merged, cnt). */
  def trainDF(spark: SparkSession, df: DataFrame, textCol: String,
      rounds: Int): DataFrame =
    spark.createDataFrame(train(df, textCol, rounds))
      .select(col("round"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("cnt"))

  /** Column expression: symbol count of one word under `merges` — the
    * initial per-char sequence with each merge applied in learned order,
    * then separators counted. Row-local, codegen'd: `merges.length`
    * stacked literal `replace`s per word, no lookup table needed.
    */
  def tokensPerWord(word: Column, merges: Seq[Merge]): Column = {
    val seq0 = regexp_replace(word, "(.)", SEP + "$1")
    val seqN = merges.foldLeft(seq0)((s, m) =>
      replace(s, lit(SEP + m.lhs + SEP + m.rhs), lit(SEP + m.lhs + m.rhs)))
    (length(seqN) - length(replace(seqN, lit(SEP), lit("")))).cast("long")
  }

  /** Per-doc token accounting under a trained tokenizer: (id cols...,
    * n_tokens, n_words). The whole encode is ONE map-only pass — tokens
    * per word is a row-local expression chain inside the explode, and the
    * doc-grain aggregate is the only shuffle (map-side partials).
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge],
      idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(idCol)
      .agg(sum(tokensPerWord(col("w"), merges)).as("n_tokens"),
        cnt.as("n_words"))

  // ---------------------------------------------------------------------------
  // DuckDB oracle twins (unrolled rounds — recursive CTEs cannot carry the
  // argmax subquery)

  private def trainCtes(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""p$i AS (
         |  SELECT sy[j] AS lhs, sy[j+1] AS rhs, CAST(sum(c) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(seq[2:], '|') AS sy, c FROM s${i - 1}),
         |       unnest(range(1, len(sy))) AS t(j)
         |  GROUP BY 1, 2),
         |m$i AS (SELECT lhs, rhs, cnt FROM p$i ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |s$i AS (SELECT w, c, replace(seq, '|'||m.lhs||'|'||m.rhs, '|'||m.lhs||m.rhs) AS seq
         |        FROM s${i - 1}, m$i m)""".stripMargin
    }.mkString(",\n")
    s"""wc AS (
       |  SELECT w, count(*) AS c FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |s0 AS (SELECT w, c, regexp_replace(w, '(.)', '|\\1', 'g') AS seq FROM wc),
       |$steps""".stripMargin
  }

  private def trainSql(rounds: Int): String = {
    val union = (1 to rounds)
      .map(i => s"SELECT $i AS round, lhs, rhs, lhs||rhs AS merged, cnt FROM m$i")
      .mkString("\nUNION ALL\n")
    s"WITH ${trainCtes(rounds)}\nSELECT * FROM (\n$union) ORDER BY round"
  }

  private def encodeSql(rounds: Int): String =
    s"""WITH ${trainCtes(rounds)},
       |tok AS (SELECT w, len(seq) - len(replace(seq, '|', '')) AS n_sym
       |        FROM s$rounds)
       |SELECT d.doc_id, CAST(sum(t.n_sym) AS BIGINT) AS n_tokens,
       |  count(*) AS n_words
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |      FROM documents WHERE doc_id < 100) d
       |JOIN tok t ON d.w = t.w
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  private val Rounds = 8

  val all: Seq[Q] = Seq(

    // ---- L31: BPE tokenizer training — the learned merge list ---------------
    // Hash equality across 8 rounds of count→argmax→merge proves both
    // engines derive the identical tokenizer (any count drift, tiebreak
    // drift, or replace-semantics drift flips a later round).
    Q("q_bpe_train", Some(trainSql(Rounds)),
      (s, d) => trainDF(s, Tables(s, d, "documents"), "text", Rounds)
        .orderBy("round")),

    // ---- L31: BPE encoding — per-doc token accounting under the tokenizer ----
    // The consumer-side contract: token budgeting (packing, cost
    // estimation, context-length stats) must agree with the trainer.
    Q("q_bpe_encode", Some(encodeSql(Rounds)),
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val merges = train(docs, "text", Rounds)
        encode(docs.filter(col("doc_id") < 100), "text", merges)
          .orderBy("doc_id")
      })
  )
}
