package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.query.Tables

/** S12/L25: stored inverted phrase index — the scale path for the
  * reference's flagship analytic, substring search over a corpus
  * (`/root/reference/preprocess.py:221-237` greps every commit message and
  * comment for " dask" on every run). A full-scan `contains` reads 100 TB
  * per query; the index reads a few kilobytes.
  *
  * Build: one map-only pass hashes each doc's distinct word n-grams
  * (native rolling kernel, no n-gram strings materialized) into
  * (gram-hash, doc_id) postings, stored PARTITIONED BY `pmod(hash,
  * nBuckets)` — one corpus-sized shuffle-free write, amortized over every
  * later search.
  *
  * Search: the phrase's n-gram hashes (a handful of longs, derived
  * driver-side with the SAME kernel) become partition filters + an IN
  * probe on the postings scan — only the phrase's buckets are ever read
  * (plan-asserted). A doc is a candidate iff it holds ALL phrase grams
  * (consecutive-words n-grams => candidates are exactly the word-aligned
  * matches); the final word-boundary `contains` verify on the candidates
  * (a near-empty semi-joined scan) makes the result EXACT — the index
  * bounds recall work, precision is the verify's.
  *
  * Word-boundary semantics, both paths: phrase P occurs iff
  * `' '||text||' '` contains `' '||P||' '` — token-aligned, not raw
  * substring (a raw-substring index over word grams would silently miss
  * mid-word matches like "stable part" ⊃ "table part").
  */
object PhraseIndex {

  /** One postings row per (distinct word n-gram, doc): map-only hashing +
    * a bucket-partitioned write. `nBuckets` bounds per-search read fan-out;
    * at 100 TB make it large (e.g. 4096) so one bucket is a small fraction
    * of the postings.
    *
    * On a FRESH dir this is the flat layout. On a dir that already carries
    * generations or live append batches, a rebuild is a GENERATION SWAP
    * (the [[VectorOps.writeIvfIndex]] contract): readers resolve the
    * newest committed generation, so a flat re-write would be silently
    * ignored forever — instead the new postings land under `g<N+1>/grams`
    * and commit with a fold watermark covering every append batch present,
    * because the rebuild indexed the CURRENT corpus and pre-rebuild
    * appends must not union back in.
    *
    * Rebuilds need appender QUIESCENCE (a stronger contract than
    * compaction's): an append racing the rebuild can land AFTER the
    * watermark listing with the OLD (n, nBuckets) — it stays live, but
    * its postings are bucketed mod a modulus the new searchers no longer
    * probe (a silent recall hole, the exact mismatch `_meta` guards
    * against between sessions). Pause the index's maintainer across a
    * rebuild; plain compaction stays append-safe.
    */
  def buildPhraseIndex(docs: DataFrame, dir: String, n: Int = 3,
      nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    val G = graft.store.IndexGenerations
    val prev = G.current(spark, dir)
    val appendIds = G.batches(spark, dir, "appends").map(_._1)
    val fresh = prev.gen < 0 && appendIds.isEmpty
    val tgt = if (fresh) dir else s"$dir/g${prev.gen + 1}"
    postingsOf(docs, n, nBuckets)
      .write.mode("overwrite").partitionBy("bucket")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs",
        fresh.toString) // generation visibility is G.commit's _SUCCESS
      .parquet(s"$tgt/grams")
    if (!fresh)
      G.commit(spark, dir, prev.gen + 1, (prev.maxFolded +: appendIds).max)
    // meta AFTER the commit: a rebuild may CHANGE (n, nBuckets), and the
    // root sidecar must never advertise parameters the live generation
    // does not serve (validators racing the swap would spuriously reject)
    writeMeta(spark, dir, n, nBuckets)
    if (!fresh)
      G.gc(spark, dir, prev.gen + 1, prev, Seq("appends"), Seq("grams"))
  }

  /** The index's (n, nBuckets) sidecar. Appenders, searchers and the
    * stream maintainer each take their own n/nBuckets arguments, and a
    * silent mismatch with the built index is a recall hole, not an error
    * (postings land in mod-nBuckets′ buckets the searcher's mod-nBuckets
    * partition filter prunes away) — so the build records its parameters
    * and every later entry point validates against them. Absent sidecar
    * (pre-existing index) skips the check.
    */
  private def writeMeta(spark: SparkSession, dir: String, n: Int,
      nBuckets: Int): Unit = {
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(new org.apache.hadoop.fs.Path(dir, "_meta"), true)
    try out.write(s"$n $nBuckets".getBytes("UTF-8")) finally out.close()
  }

  private def checkMeta(spark: SparkSession, dir: String, n: Int,
      nBuckets: Int): Unit = {
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir, "_meta")
    if (!f.exists(p)) return
    val in = f.open(p)
    val txt = try {
      val b = new Array[Byte](64)
      val k = in.read(b)
      new String(b, 0, math.max(k, 0), "UTF-8").trim
    } finally in.close()
    txt.split(" ") match {
      case Array(nS, bS) if nS.toInt != n || bS.toInt != nBuckets =>
        throw new IllegalArgumentException(
          s"phrase index at $dir was built with (n=$nS, nBuckets=$bS); " +
            s"caller passed (n=$n, nBuckets=$nBuckets) — a mismatch " +
            "silently drops matches (postings bucketed mod one modulus, " +
            "pruned mod another)")
      case _ => ()
    }
  }

  /** One batch's postings rows: (doc_id, gh, bucket) — the shared
    * projection of [[buildPhraseIndex]] and [[phraseIndexAppend]].
    */
  private def postingsOf(docs: DataFrame, n: Int, nBuckets: Int): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(TextOps.ngramHashes(col("text"), n)))
          .as("gh"))
      .withColumn("bucket", pmod(col("gh"), lit(nBuckets)))

  /** IDEMPOTENT batch-keyed append of a new doc batch to a stored phrase
    * index — the [[Retrieval.bm25IndexAppend]] discipline: batch
    * `batchId`'s postings land under `appends/batch=<id>/bucket=...` with
    * OVERWRITE of that batch directory, so an at-least-once replay
    * rewrites the same files instead of duplicating them.
    * [[phraseSearch]] unions base + live appends (bucket stays a
    * partition-filter level on both layouts), and because a candidate is
    * "holds ALL phrase grams" via countDistinct over the union, a search
    * after an append equals a from-scratch build of the union exactly.
    * The phrase index has NO stats sidecar to maintain — gram postings
    * are self-contained. The motivating cadence is the reference's
    * hourly serve loop (preprocess.py:277–280): its flagship substring
    * analytic (preprocess.py:221–237) stays queryable as hours land,
    * without ever rebuilding the index.
    *
    * Precondition (the whole stored-index family's): [[buildPhraseIndex]]
    * ran first — the readers and the compactor resolve the flat base, so
    * an appends-only dir is not a valid index. n/nBuckets must match the
    * build's; the `_meta` sidecar enforces this (a mismatch is a silent
    * recall hole otherwise).
    */
  def phraseIndexAppend(spark: SparkSession, dir: String, batchId: Long,
      docs: DataFrame, n: Int = 3, nBuckets: Int = 64): Unit = {
    checkMeta(spark, dir, n, nBuckets)
    if (docs.isEmpty) return // a file-less batch dir poisons later reads
    postingsOf(docs, n, nBuckets)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/appends/batch=$batchId")
  }

  /** Fold the live append batches into a new committed generation
    * ([[graft.store.IndexGenerations]] — the same generation-swap +
    * one-cycle-GC-grace layout as BM25/IVF/IVF-PQ), keeping the search's
    * read a 2-leg union forever instead of base + one dir per streamed
    * batch. Search results are identical before and after because
    * postings rows are disjoint across base and batches (a doc arrives
    * whole in one batch) and the candidate test is a countDistinct over
    * the union. Single-compactor contract; concurrent appends stay above
    * the new watermark and remain live.
    */
  def compactPhraseIndex(spark: SparkSession, dir: String,
      maxFoldRows: Long = 64L * 1024 * 1024): Unit = {
    val G = graft.store.IndexGenerations
    val prev = G.current(spark, dir)
    val toFold = G.batches(spark, dir, "appends").filter(_._1 > prev.maxFolded)
    if (toFold.isEmpty && prev.gen >= 0) return // nothing new to fold
    val newMax = (prev.maxFolded +: toFold.map(_._1)).max
    val cols = Seq("doc_id", "gh", "bucket")
    val grams = {
      val b = spark.read.parquet(prev.sub(dir, "grams")).selectExpr(cols: _*)
      if (toFold.isEmpty) b
      else b.unionByName(spark.read.option("basePath", s"$dir/appends")
        .parquet(toFold.map(_._2): _*).selectExpr(cols: _*))
    }
    // one shuffle keyed by bucket: every bucket lands whole in one task,
    // so each bucket dir collapses to a single file — UNLESS the bucket
    // exceeds maxFoldRows, where it splits into sub-files instead of
    // putting 1/nBuckets of a 100 TB posting set in one task
    // ([[graft.store.IndexGenerations.boundedFold]]; sub-key varies
    // within a bucket — gh itself is constant mod nBuckets)
    G.boundedFold(grams, "bucket", xxhash64(col("doc_id"), col("gh")),
        maxFoldRows)
      .write.mode("overwrite").partitionBy("bucket")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(s"$dir/g${prev.gen + 1}/grams")
    G.commit(spark, dir, prev.gen + 1, newMax)
    G.gc(spark, dir, prev.gen + 1, prev, Seq("appends"), Seq("grams"))
  }

  /** The postings layer a search reads: the current generation's base ∪
    * the live append batches (batches at or below the fold watermark are
    * already IN the base and are excluded — the replay/GC-grace
    * semantics of [[graft.store.IndexGenerations]]).
    */
  private def readGrams(spark: SparkSession, dir: String): DataFrame = {
    val G = graft.store.IndexGenerations
    val base = G.current(spark, dir)
    val b = spark.read.parquet(base.sub(dir, "grams"))
      .selectExpr("doc_id", "gh", "bucket")
    val live = G.liveBatches(spark, dir, "appends", base)
    if (live.isEmpty) b
    else b.unionByName(spark.read.option("basePath", s"$dir/appends")
      .parquet(live: _*).selectExpr("doc_id", "gh", "bucket"))
  }

  /** The phrase's rolling n-gram hashes, derived with the SAME native
    * kernel the build used (driver-side, one tiny local projection — hash
    * parity between build and probe is the index's correctness backbone).
    */
  private[llm] def phraseGramHashes(spark: SparkSession, phrase: String,
      n: Int): Seq[Long] = {
    import spark.implicits._
    Seq(phrase).toDF("text")
      .select(TextOps.ngramHashes(col("text"), n).as("g"))
      .head().getSeq[Long](0).distinct
  }

  /** Exact word-aligned phrase search through the stored index. Phrases
    * shorter than `n` words cannot probe an n-gram index and fall back to
    * the direct verify scan (documented contract — pick n at or below the
    * shortest phrase you serve).
    */
  def phraseSearch(spark: SparkSession, dir: String, docs: DataFrame,
      phrase: String, n: Int = 3, nBuckets: Int = 64): DataFrame = {
    checkMeta(spark, dir, n, nBuckets)
    val verify = concat(lit(" "), col("text"), lit(" "))
      .contains(s" $phrase ")
    val grams = phraseGramHashes(spark, phrase, n)
    if (grams.isEmpty) return docs.filter(verify).select("doc_id")
    val buckets = grams.map(g => ((g % nBuckets) + nBuckets) % nBuckets)
      .distinct
    val candidates = readGrams(spark, dir)
      .filter(col("bucket").isin(buckets: _*)) // partition pruning, both legs
      .filter(col("gh").isin(grams: _*))
      .groupBy("doc_id").agg(countDistinct("gh").as("__nh"))
      .filter(col("__nh") === grams.size)
      .select("doc_id")
    docs.join(candidates, Seq("doc_id"), "left_semi")
      .filter(verify)
      .select("doc_id")
  }

  /** Exact phrase search with a PRUNED candidate fetch — the 100 TB read
    * path. [[phraseSearch]]'s verify leg is correct but probes the FULL
    * documents table (a broadcast semi-join whose probe side is the whole
    * corpus text column): per query it re-reads the very bytes the index
    * exists to avoid. This form collects the candidate id set — bounded by
    * construction: a doc qualifies only by holding ALL the phrase's grams,
    * so candidates are the word-aligned matches plus hash collisions — and
    * fetches text through [[graft.store.BloomSkip.readPrunedEq]] on a doc
    * store carrying a `doc_id` Bloom sidecar: the verify reads ONLY files
    * that can hold a candidate (files-read-bounded, asserted in
    * PhraseIndexSpec), plus the kilobyte sidecar.
    *
    * `docsDir` is the document store (flat parquet dir or generation
    * store; build its sidecar once with `BloomSkip.write(spark, docsDir,
    * Seq("doc_id"))` — files appended after the sidecar are kept
    * conservatively, never wrongly skipped). Degenerate regimes fall back
    * LOUDLY-DOCUMENTED rather than breaking the bound silently: a phrase
    * shorter than `n` words cannot probe the index (direct verify scan,
    * the [[phraseSearch]] contract), and a stop-phrase matching more than
    * `maxFetch` docs verifies via the semi-join scan — at that selectivity
    * the fetch is corpus-scale whichever way it is expressed, and a
    * >maxFetch literal probe would blow up both the Bloom verdict
    * expression and the row filter's IN-set. `onFetch` receives
    * (filesKept, filesTotal) when the pruned fetch ran — the monitoring
    * hook a production pipeline alerts on.
    */
  def phraseSearchPruned(spark: SparkSession, indexDir: String,
      docsDir: String, phrase: String, n: Int = 3, nBuckets: Int = 64,
      maxFetch: Int = 2048,
      onFetch: (Int, Int) => Unit = (_, _) => ()): DataFrame = {
    checkMeta(spark, indexDir, n, nBuckets)
    val verify = concat(lit(" "), col("text"), lit(" "))
      .contains(s" $phrase ")
    def fullDocs = spark.read.parquet(
      graft.store.TableStore.resolveDataDir(spark, docsDir))
    val grams = phraseGramHashes(spark, phrase, n)
    if (grams.isEmpty)
      return fullDocs.filter(verify).select("doc_id")
    val buckets = grams.map(g => ((g % nBuckets) + nBuckets) % nBuckets)
      .distinct
    val candidates = readGrams(spark, indexDir)
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("gh").isin(grams: _*))
      .groupBy("doc_id").agg(countDistinct("gh").as("__nh"))
      .filter(col("__nh") === grams.size)
      .select("doc_id")
    // bounded collect: the index guarantees candidates ≈ true matches;
    // maxFetch is the guard for stop-phrases (limit+1 detects overflow
    // without counting the full set)
    val ids = candidates.limit(maxFetch + 1).collect().map(_.getLong(0))
    if (ids.length > maxFetch)
      return fullDocs.join(candidates, Seq("doc_id"), "left_semi")
        .filter(verify).select("doc_id")
    if (ids.isEmpty)
      return fullDocs.select("doc_id").limit(0)
    val pr = graft.store.BloomSkip.readPrunedEq(spark, docsDir, "doc_id",
      ids.toSeq)
    onFetch(pr.filesKept, pr.filesTotal)
    pr.df.filter(col("doc_id").isin(ids.toSeq: _*))
      .filter(verify)
      .select("doc_id")
  }

  /** Session-scoped index demos, keyed by sfDir (the Pipelines pattern):
    * an index is built once and searched many times, so the timed path is
    * the SEARCH.
    */
  private val demos =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val all: Seq[Q] = Seq(

    // ---- S12/L25: indexed word-aligned phrase search ---------------------------
    // The oracle is the full-scan definition; hash equality proves the
    // bucket-pruned postings probe + PRUNED candidate verify loses
    // nothing. The timed path is the production read shape end-to-end:
    // postings buckets (partition filters) → bounded candidate ids →
    // Bloom-pruned text fetch — the corpus text column is never scanned.
    Q("q_phrase_search", Some(
      """SELECT doc_id FROM documents
        |WHERE contains(' ' || text || ' ', ' key agg row ')
        |ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val dir = demos.computeIfAbsent(d, _ => {
          val t = graft.query.Pipelines.demoRoot("graft_phrase").toString
          buildPhraseIndex(docs, s"$t/index")
          // the doc store the pruned verify fetches from: multi-file so
          // file skipping has grain, + the doc_id Bloom sidecar
          docs.repartitionByRange(16, col("doc_id"))
            .write.parquet(s"$t/docs")
          graft.store.BloomSkip.write(s, s"$t/docs", Seq("doc_id"))
          t
        })
        phraseSearchPruned(s, s"$dir/index", s"$dir/docs", "key agg row")
          .orderBy("doc_id")
      })
  )
}
