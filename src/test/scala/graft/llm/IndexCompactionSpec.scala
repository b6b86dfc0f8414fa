package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.store.IndexGenerations

/** Laws for the stored-index generation fold ([[graft.store
  * .IndexGenerations]] + compactBm25Index / compactIvfIndex /
  * compactIvfPqIndex): N appends + compact ≡ a fresh build of the union
  * bit-for-bit; file widths collapse; appends AFTER a compact stay live;
  * a replay-resurrected FOLDED batch is invisible (the watermark, not
  * deletion, carries correctness); GC retains one full cycle of grace.
  */
class IndexCompactionSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def docsDf = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown cat sleeps on the warm mat"),
    (2L, "a slow green turtle walks under the old bridge"),
    (3L, "quick quick quick repetition inflates term frequency here"),
    (4L, "entirely disjoint vocabulary zone alpha beta gamma delta"),
    (5L, "the lazy dog naps beside the quick brown fox"),
    (6L, "gamma rays cross the warm bridge at dawn"),
    (7L, "the turtle and the fox share the old mat")
  ).toDF("doc_id", "text")

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/idx"

  private def rm(dirs: String*): Unit = dirs.foreach(d =>
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(d).getParentFile))

  private def parquetFiles(path: String): Seq[String] = {
    val root = new java.io.File(path)
    if (!root.exists()) Nil
    else {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).map(_.getPath).filter(_.endsWith(".parquet"))
    }
  }

  test("bm25: appends + compact == fresh build bit-for-bit; post-compact " +
    "appends stay live; resurrected folded batch is invisible; second " +
    "compact GCs the folded dirs and the flat base") {
    val docs = docsDf
    val queries = docs.select($"doc_id".as("query_id"),
      array_distinct(split($"text", " ")).as("terms"))
    val dirInc = tmp("bm25cmp")
    val dirFull = tmp("bm25cmpfull")
    def run(dir: String) =
      Retrieval.bm25Stored(spark, dir, queries, k = 5, nBuckets = 8)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Double, Long)].collect().toSeq

    Retrieval.buildBm25Index(docs.filter($"doc_id" < 3), dirInc, nBuckets = 8)
    Retrieval.bm25IndexAppend(spark, dirInc, 1L,
      docs.filter($"doc_id" >= 3 && $"doc_id" < 5), nBuckets = 8)
    Retrieval.bm25IndexAppend(spark, dirInc, 2L,
      docs.filter($"doc_id" >= 5 && $"doc_id" < 7), nBuckets = 8)
    Retrieval.buildBm25Index(docs.filter($"doc_id" < 7), dirFull, nBuckets = 8)
    val before = run(dirInc)
    assert(before === run(dirFull), "append path must equal fresh build")

    Retrieval.compactBm25Index(spark, dirInc)
    val b0 = IndexGenerations.current(spark, dirInc)
    assert(b0.gen === 0 && b0.maxFolded === 2L)
    assert(run(dirInc) === before, "fold must not change query results")
    // first compact retains EVERYTHING older (one-cycle grace): flat base
    // and both folded batch dirs still on disk, excluded only by watermark
    assert(new java.io.File(s"$dirInc/postings").exists())
    assert(new java.io.File(s"$dirInc/appends/batch=1").exists())

    // a crash-replay resurrects folded batch 2 AFTER the fold: the
    // watermark (not deletion) keeps it invisible — results unchanged
    Retrieval.bm25IndexAppend(spark, dirInc, 2L,
      docs.filter($"doc_id" >= 5 && $"doc_id" < 7), nBuckets = 8)
    assert(run(dirInc) === before, "resurrected folded batch double-counted")

    // a batch ABOVE the watermark is live immediately
    Retrieval.bm25IndexAppend(spark, dirInc, 3L,
      docs.filter($"doc_id" === 7), nBuckets = 8)
    val withLate = run(dirInc)
    assert(withLate.exists(_._2 === 7L), "post-compact append not readable")

    // second compact folds batch 3 and GCs what g0 had already folded
    // (batches <= 2) plus the flat base — g0 itself is the retained
    // previous generation
    Retrieval.compactBm25Index(spark, dirInc)
    val b1 = IndexGenerations.current(spark, dirInc)
    assert(b1.gen === 1 && b1.maxFolded === 3L)
    assert(run(dirInc) === withLate)
    assert(!new java.io.File(s"$dirInc/postings").exists(),
      "flat base must be GC'd once two generations stand past it")
    assert(!new java.io.File(s"$dirInc/appends/batch=1").exists())
    assert(!new java.io.File(s"$dirInc/appends/batch=2").exists())
    assert(new java.io.File(s"$dirInc/g0").exists(),
      "previous generation is the in-flight readers' grace copy")
    // equality with a fresh build over all 8 docs closes the loop
    val dirAll = tmp("bm25cmpall")
    Retrieval.buildBm25Index(docs, dirAll, nBuckets = 8)
    assert(run(dirInc) === run(dirAll))
    // the fold collapses per-bucket file counts: one file per bucket in
    // the new base vs base+2 appends worth before
    val genFiles = parquetFiles(s"$dirInc/g1/postings")
    val buckets = genFiles.flatMap(p =>
      "bucket=(\\d+)".r.findFirstMatchIn(p).map(_.group(1))).distinct
    assert(genFiles.size === buckets.size, "expected one file per bucket")
    rm(dirInc, dirFull, dirAll)
  }

  test("bm25: a HALF-LANDED batch (postings committed, stats missing — " +
    "the two-write appender's crash window) is never folded; the replay " +
    "completes it and the next compact folds it exactly once") {
    val docs = docsDf
    val queries = docs.select($"doc_id".as("query_id"),
      array_distinct(split($"text", " ")).as("terms"))
    def run(dir: String) =
      Retrieval.bm25Stored(spark, dir, queries, k = 5, nBuckets = 8)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Double, Long)].collect().toSeq
    val dir = tmp("bm25half")
    Retrieval.buildBm25Index(docs.filter($"doc_id" < 3), dir, nBuckets = 8)
    Retrieval.bm25IndexAppend(spark, dir, 1L,
      docs.filter($"doc_id" >= 3 && $"doc_id" < 5), nBuckets = 8)
    Retrieval.bm25IndexAppend(spark, dir, 2L,
      docs.filter($"doc_id" >= 5 && $"doc_id" < 7), nBuckets = 8)
    // crash between the two writes: batch 2's stats never committed
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$dir/stats_appends/batch=2"))
    Retrieval.compactBm25Index(spark, dir)
    val b0 = IndexGenerations.current(spark, dir)
    assert(b0.gen === 0 && b0.maxFolded === 1L,
      "watermark crossed a half-landed batch — its replayed stats would " +
        "be stranded below it forever")
    // at-least-once replay completes batch 2; the NEXT compact folds it
    Retrieval.bm25IndexAppend(spark, dir, 2L,
      docs.filter($"doc_id" >= 5 && $"doc_id" < 7), nBuckets = 8)
    Retrieval.compactBm25Index(spark, dir)
    assert(IndexGenerations.current(spark, dir).maxFolded === 2L)
    val dirFull = tmp("bm25halffull")
    Retrieval.buildBm25Index(docs.filter($"doc_id" < 7), dirFull, nBuckets = 8)
    assert(run(dir) === run(dirFull),
      "replayed half-landed batch lost or double-counted")
    rm(dir, dirFull)
  }

  test("bm25: the mirror half-landing (stats committed, postings missing) " +
    "is not folded and not double-counted through replay + compact") {
    val docs = docsDf
    val queries = docs.select($"doc_id".as("query_id"),
      array_distinct(split($"text", " ")).as("terms"))
    def run(dir: String) =
      Retrieval.bm25Stored(spark, dir, queries, k = 5, nBuckets = 8)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Double, Long)].collect().toSeq
    val dir = tmp("bm25half2")
    Retrieval.buildBm25Index(docs.filter($"doc_id" < 5), dir, nBuckets = 8)
    Retrieval.bm25IndexAppend(spark, dir, 1L,
      docs.filter($"doc_id" >= 5 && $"doc_id" < 7), nBuckets = 8)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$dir/appends/batch=1"))
    Retrieval.compactBm25Index(spark, dir) // folds the flat base only
    assert(IndexGenerations.current(spark, dir).maxFolded === -1L)
    Retrieval.bm25IndexAppend(spark, dir, 1L,
      docs.filter($"doc_id" >= 5 && $"doc_id" < 7), nBuckets = 8)
    Retrieval.compactBm25Index(spark, dir)
    assert(IndexGenerations.current(spark, dir).maxFolded === 1L)
    val dirFull = tmp("bm25half2full")
    Retrieval.buildBm25Index(docs.filter($"doc_id" < 7), dirFull, nBuckets = 8)
    assert(run(dir) === run(dirFull),
      "orphan stats row folded twice or dropped")
    rm(dir, dirFull)
  }

  test("phrase: a FAT bucket splits into bounded sub-files at fold time " +
    "instead of one bucket-sized task; results unchanged") {
    val docs = docsDf
    val dir = tmp("phrasefat")
    // 2 buckets over ~50 postings rows: both buckets exceed a 5-row task
    // bound, so the fold must emit multiple files per bucket dir
    PhraseIndex.buildPhraseIndex(docs, dir, n = 3, nBuckets = 2)
    val before = PhraseIndex.phraseSearch(spark, dir, docs,
      "the quick brown", n = 3, nBuckets = 2).as[Long].collect().toSet
    assert(before.nonEmpty)
    PhraseIndex.compactPhraseIndex(spark, dir, maxFoldRows = 5L)
    assert(IndexGenerations.current(spark, dir).gen === 0)
    val after = PhraseIndex.phraseSearch(spark, dir, docs,
      "the quick brown", n = 3, nBuckets = 2).as[Long].collect().toSet
    assert(after === before, "fold changed search results")
    val files = parquetFiles(s"$dir/g0/grams")
    val perBucket = files.groupBy(p =>
      "bucket=(\\d+)".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("?"))
    assert(perBucket.values.exists(_.size >= 2),
      s"fat bucket not split: ${perBucket.view.mapValues(_.size).toMap}")
    rm(dir)
  }

  test("bm25: a reader PLANNED before a later compact+GC still " +
    "materializes against the grace generation") {
    val docs = docsDf
    val queries = docs.select($"doc_id".as("query_id"),
      array_distinct(split($"text", " ")).as("terms"))
    val dir = tmp("bm25grace")
    Retrieval.buildBm25Index(docs.filter($"doc_id" < 5), dir, nBuckets = 8)
    Retrieval.bm25IndexAppend(spark, dir, 1L,
      docs.filter($"doc_id" >= 5 && $"doc_id" < 7), nBuckets = 8)
    Retrieval.compactBm25Index(spark, dir) // g0
    // plan (and pin the file listing of) a reader against g0's state...
    val inFlight = Retrieval.bm25Stored(spark, dir, queries, k = 5,
      nBuckets = 8).orderBy("query_id", "rank")
    val want = inFlight.as[(Long, Long, Double, Long)].collect().toSeq
    // ...then advance the index a full cycle: a new batch + a second
    // compact, whose GC retires everything g0 had folded — but NOT g0
    // itself (the one-cycle grace copy)
    Retrieval.bm25IndexAppend(spark, dir, 2L,
      docs.filter($"doc_id" === 7), nBuckets = 8)
    Retrieval.compactBm25Index(spark, dir) // g1, GCs flat base + batch 1
    assert(IndexGenerations.current(spark, dir).gen === 1)
    // the in-flight reader's plan still resolves: its files live in g0
    val again = inFlight.as[(Long, Long, Double, Long)].collect().toSeq
    assert(again === want,
      "in-flight reader torn by a concurrent compact+GC")
    rm(dir)
  }

  test("phrase: appends + compact == fresh build; post-compact appends " +
    "stay live; resurrected folded batch invisible; in-flight reader " +
    "grace; GC retires folded dirs (L25 maintenance)") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown cat sleeps on the warm mat"),
      (2L, "a slow green turtle walks under the old bridge"),
      (3L, "quick quick quick repetition inflates nothing here"),
      (4L, "entirely disjoint vocabulary zone alpha beta gamma"),
      (5L, "the lazy dog naps beside the quick brown fox"),
      (6L, "gamma rays cross the warm bridge at dawn"),
      (7L, "late arrival mentions the quick brown otter")
    ).toDF("doc_id", "text")
    val dirInc = tmp("phrasecmp")
    val dirFull = tmp("phrasecmpfull")
    def run(dir: String) =
      PhraseIndex.phraseSearch(spark, dir, docs, "the quick brown",
        n = 3, nBuckets = 8).orderBy("doc_id").as[Long].collect().toSeq

    PhraseIndex.buildPhraseIndex(docs.filter($"doc_id" < 3), dirInc,
      n = 3, nBuckets = 8)
    PhraseIndex.phraseIndexAppend(spark, dirInc, 1L,
      docs.filter($"doc_id" >= 3 && $"doc_id" < 5), n = 3, nBuckets = 8)
    PhraseIndex.phraseIndexAppend(spark, dirInc, 2L,
      docs.filter($"doc_id" >= 5 && $"doc_id" < 7), n = 3, nBuckets = 8)
    PhraseIndex.buildPhraseIndex(docs.filter($"doc_id" < 7), dirFull,
      n = 3, nBuckets = 8)
    val before = run(dirInc)
    // non-degenerate: hits in the flat base (0,1) AND an append batch (5)
    assert(before === Seq(0L, 1L, 5L))
    assert(before === run(dirFull), "append path must equal fresh build")

    PhraseIndex.compactPhraseIndex(spark, dirInc)
    val b0 = IndexGenerations.current(spark, dirInc)
    assert(b0.gen === 0 && b0.maxFolded === 2L)
    assert(run(dirInc) === before, "fold must not change search results")
    // one-cycle grace: flat base and folded batch dirs still on disk
    assert(new java.io.File(s"$dirInc/grams").exists())
    assert(new java.io.File(s"$dirInc/appends/batch=1").exists())

    // crash-replay resurrects folded batch 2: the watermark (not
    // deletion) keeps it invisible
    PhraseIndex.phraseIndexAppend(spark, dirInc, 2L,
      docs.filter($"doc_id" >= 5 && $"doc_id" < 7), n = 3, nBuckets = 8)
    assert(run(dirInc) === before, "resurrected folded batch changed results")

    // a batch ABOVE the watermark is live immediately (doc 7 matches)
    PhraseIndex.phraseIndexAppend(spark, dirInc, 3L,
      docs.filter($"doc_id" === 7), n = 3, nBuckets = 8)
    val withLate = run(dirInc)
    assert(withLate === Seq(0L, 1L, 5L, 7L), "post-compact append not live")

    // in-flight reader planned against g0's file listing...
    val inFlight = PhraseIndex.phraseSearch(spark, dirInc, docs,
      "the quick brown", n = 3, nBuckets = 8).orderBy("doc_id")

    // second compact folds batch 3, GCs what g0 had folded + the flat base
    PhraseIndex.compactPhraseIndex(spark, dirInc)
    val b1 = IndexGenerations.current(spark, dirInc)
    assert(b1.gen === 1 && b1.maxFolded === 3L)
    assert(run(dirInc) === withLate)
    assert(!new java.io.File(s"$dirInc/grams").exists(),
      "flat base must be GC'd once two generations stand past it")
    assert(!new java.io.File(s"$dirInc/appends/batch=1").exists())
    assert(!new java.io.File(s"$dirInc/appends/batch=2").exists())
    assert(new java.io.File(s"$dirInc/g0").exists(),
      "previous generation is the in-flight readers' grace copy")
    // ...and still materializes against the grace generation
    assert(inFlight.as[Long].collect().toSeq === withLate,
      "in-flight reader torn by a concurrent compact+GC")

    // fresh build over all 8 docs closes the loop; fold collapsed files
    val dirAll = tmp("phrasecmpall")
    PhraseIndex.buildPhraseIndex(docs, dirAll, n = 3, nBuckets = 8)
    assert(run(dirInc) === run(dirAll))
    val genFiles = parquetFiles(s"$dirInc/g1/grams")
    val buckets = genFiles.flatMap(p =>
      "bucket=(\\d+)".r.findFirstMatchIn(p).map(_.group(1))).distinct
    assert(genFiles.size === buckets.size, "expected one file per bucket")
    rm(dirInc, dirFull, dirAll)
  }

  test("an append batch without _SUCCESS (mid-write or crashed writer) is " +
    "invisible to readers AND never folded; committing it makes it live") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a slow green turtle walks under the old bridge"),
      (5L, "the lazy dog naps beside the quick brown fox"),
      (7L, "late arrival mentions the quick brown otter")
    ).toDF("doc_id", "text")
    val dir = tmp("phraseinflight")
    def run() = PhraseIndex.phraseSearch(spark, dir, docs,
      "the quick brown", n = 3, nBuckets = 8)
      .orderBy("doc_id").as[Long].collect().toSeq
    PhraseIndex.buildPhraseIndex(docs.filter($"doc_id" < 2), dir,
      n = 3, nBuckets = 8)
    PhraseIndex.phraseIndexAppend(spark, dir, 1L,
      docs.filter($"doc_id" === 5L), n = 3, nBuckets = 8)
    // simulate an in-flight batch 2: the writer's job-level _SUCCESS has
    // not landed yet (a reader racing the foreachBatch append sees this)
    PhraseIndex.phraseIndexAppend(spark, dir, 2L,
      docs.filter($"doc_id" === 7L), n = 3, nBuckets = 8)
    val succ = new java.io.File(s"$dir/appends/batch=2/_SUCCESS")
    assert(succ.exists(), "appender must write the job-level marker")
    assert(succ.delete())
    assert(run() === Seq(0L, 5L), "uncommitted batch leaked into a read")
    // the compactor must not fold the in-flight batch either
    PhraseIndex.compactPhraseIndex(spark, dir)
    val b = IndexGenerations.current(spark, dir)
    assert(b.gen === 0 && b.maxFolded === 1L,
      "compactor folded a batch whose write had not committed")
    assert(run() === Seq(0L, 5L))
    // the writer finishes (marker lands): the batch is live immediately,
    // above the fold watermark
    assert(succ.createNewFile())
    assert(run() === Seq(0L, 5L, 7L))
    rm(dir)
  }

  test("phrase index _meta rejects an n/nBuckets mismatch instead of " +
    "silently losing matches") {
    val docs = Seq((0L, "the quick brown fox")).toDF("doc_id", "text")
    val dir = tmp("phrasemeta")
    PhraseIndex.buildPhraseIndex(docs, dir, n = 3, nBuckets = 8)
    val e1 = intercept[IllegalArgumentException] {
      PhraseIndex.phraseSearch(spark, dir, docs, "the quick brown",
        n = 3, nBuckets = 16)
    }
    assert(e1.getMessage.contains("nBuckets"))
    val e2 = intercept[IllegalArgumentException] {
      PhraseIndex.phraseIndexAppend(spark, dir, 1L, docs, n = 2,
        nBuckets = 8)
    }
    assert(e2.getMessage.contains("built with"))
    // matching parameters pass
    assert(PhraseIndex.phraseSearch(spark, dir, docs, "the quick brown",
      n = 3, nBuckets = 8).count() === 1)
    rm(dir)
  }

  test("ivf: appends + compact == same query results; rebuild over a " +
    "generational dir is a generation swap that retires old appends") {
    val emb = graft.query.Tables(spark, sf("sf0.001"), "embeddings")
    val dir = tmp("ivfcmp")
    VectorOps.writeIvfIndex(
      VectorOps.buildIvfIndex(emb.filter(col("vec_id") < 300)), dir)
    val late = emb.filter(col("vec_id") >= 300)
      .select("vec_id", "embedding")
    VectorOps.ivfAppendBatch(spark, dir, 0L,
      late.filter(col("vec_id") < 400))
    VectorOps.ivfAppendBatch(spark, dir, 1L,
      late.filter(col("vec_id") >= 400))
    def query() = VectorOps.ivfQuery(VectorOps.readIvfIndex(spark, dir),
        emb.filter(col("vec_id") < 5), k = 5, nProbe = 16)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSeq.sorted
    val before = query()
    assert(before.nonEmpty)

    VectorOps.compactIvfIndex(spark, dir)
    val b0 = IndexGenerations.current(spark, dir)
    assert(b0.gen === 0 && b0.maxFolded === 1L)
    assert(VectorOps.readIvfIndex(spark, dir).assignments.count()
      === emb.count(), "fold must carry every assignment exactly once")
    assert(query() === before, "fold must not change query results")

    // replay-resurrect folded batch 1: watermark keeps it invisible
    VectorOps.ivfAppendBatch(spark, dir, 1L,
      late.filter(col("vec_id") >= 400))
    assert(VectorOps.readIvfIndex(spark, dir).assignments.count()
      === emb.count())

    // full rebuild over the generational dir = generation swap whose
    // watermark retires every append batch present
    VectorOps.writeIvfIndex(VectorOps.buildIvfIndex(emb), dir)
    val b1 = IndexGenerations.current(spark, dir)
    assert(b1.gen === 1 && b1.maxFolded >= 1L)
    assert(VectorOps.readIvfIndex(spark, dir).assignments.count()
      === emb.count(), "rebuild must replace history, not add to it")
    rm(dir)
  }

  test("ivfpq: appends + compact == same query results through the fixed " +
    "quantizers") {
    val emb = graft.query.Tables(spark, sf("sf0.001"), "embeddings")
    val dir = tmp("ivfpqcmp")
    Pq.writeIvfPqIndex(
      Pq.buildIvfPqIndex(emb.filter(col("vec_id") < 300)), dir)
    Pq.ivfPqAppendBatch(spark, dir, 0L, emb.filter(col("vec_id") >= 300)
      .select("vec_id", "embedding"))
    def query() = Pq.ivfPqQuery(Pq.readIvfPqIndex(spark, dir), emb,
        emb.filter(col("vec_id") < 5), k = 5, nProbe = 16, shortlist = 256)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSeq.sorted
    val before = query()
    assert(before.nonEmpty)
    Pq.compactIvfPqIndex(spark, dir)
    assert(IndexGenerations.current(spark, dir).gen === 0)
    assert(Pq.readIvfPqIndex(spark, dir).assignments.count() === emb.count())
    assert(query() === before, "fold must not change IVF-PQ query results")
    rm(dir)
  }
}
