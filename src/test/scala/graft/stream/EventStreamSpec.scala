package graft.stream

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkFixture

case class Ev(ts: Timestamp, event_type: String, user_id: Long)

/** Streaming semantics (SURVEY.md §2.9): windowed aggregation + watermark
  * late-data handling via MemoryStream, and the AvailableNow file-ingest
  * loop end-to-end.
  */
class EventStreamSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window counts with watermark: late row beyond 1h is dropped (T2/T3)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = EventStream.tumblingCounts(mem.toDF())
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("update").start()
    try {
      mem.addData(
        Ev(ts("2024-02-29 01:10:00"), "a", 1),
        Ev(ts("2024-02-29 01:20:00"), "a", 2),
        Ev(ts("2024-02-29 03:30:00"), "a", 3)) // advances watermark to 02:30
      q.processAllAvailable()
      // this row's window [01:00,02:00) closed at watermark 02:30 -> dropped
      mem.addData(Ev(ts("2024-02-29 01:15:00"), "a", 4))
      q.processAllAvailable()
      val out = spark.table("tumbling")
        .select(date_format($"window.start", "HH:mm").as("w"), $"cnt")
        .as[(String, Long)].collect().toMap
      assert(out("01:00") === 2L) // late row NOT counted
      assert(out("03:00") === 1L)
    } finally q.stop()
  }

  test("session windows merge events within the gap (T∅)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.sessionCounts(mem.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      mem.addData(
        Ev(ts("2024-02-29 01:00:00"), "a", 7),
        Ev(ts("2024-02-29 01:03:00"), "a", 7),  // same session (gap 3m < 5m)
        Ev(ts("2024-02-29 01:20:00"), "a", 7),  // new session
        Ev(ts("2024-02-29 01:00:00"), "a", 9))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select($"user_id", $"cnt").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(got(7L) === Seq(1L, 2L))
      assert(got(9L) === Seq(1L))
    } finally q.stop()
  }

  test("dedupStream drops duplicate ids within the watermark horizon (L1 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("event_id", "ts")
    val q = EventStream.dedupStream(df)
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-02-29 01:00:00")),
        (1L, ts("2024-02-29 01:05:00")),   // dup id within horizon
        (2L, ts("2024-02-29 01:10:00")))
      q.processAllAvailable()
      assert(spark.table("dedup").select("event_id")
        .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("cleanDocStream gates quality and dedups exact text within the horizon (L1+L5 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val goodText = (1 to 40).map(i => s"word$i").mkString(" ")
    val degenerate = ("spam " * 60).trim           // trips dup-trigram rule
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.cleanDocStream(df)
      .writeStream.format("memory").queryName("cleandocs")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-02-29 01:00:00"), goodText),
        (2L, ts("2024-02-29 01:05:00"), goodText),    // exact dup -> dropped
        (3L, ts("2024-02-29 01:10:00"), degenerate))  // gate -> dropped
      q.processAllAvailable()
      assert(spark.table("cleandocs").select("doc_id")
        .as[Long].collect().toSeq === Seq(1L))
      // schema is preserved (filter + dedup only): payload columns survive
      assert(spark.table("cleandocs").columns.toSeq ===
        Seq("doc_id", "ts", "text"))
    } finally q.stop()
  }

  test("cleanDocStreamDecontaminated also drops span leakage against a static eval set") {
    implicit val sqlCtx = spark.sqlContext
    val evalText = (1 to 20).map(i => s"e$i").mkString(" ")
    val leaky = "intro words then " + (5 to 12).map(i => s"e$i").mkString(" ") +
      " " + (30 to 45).map(i => s"w$i").mkString(" ")
    val clean = (1 to 40).map(i => s"c$i").mkString(" ")
    val evalSet = Seq(evalText).toDF("text")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.cleanDocStreamDecontaminated(df, evalSet)
      .writeStream.format("memory").queryName("decondocs")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-02-29 01:00:00"), clean),
        (2L, ts("2024-02-29 01:05:00"), leaky))   // shares an 8-word span
      q.processAllAvailable()
      assert(spark.table("decondocs").select("doc_id")
        .as[Long].collect().toSeq === Seq(1L))
    } finally q.stop()
  }

  test("streaming decontamination parity law: stream output == batch compose over the same rows") {
    // law: cleanDocStreamDecontaminated over a MemoryStream must equal
    // decontaminateNgram over the batch-cleaned same rows, doc-for-doc —
    // the InSet probe and the broadcast semi-join must agree
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(20260814L)
    val evalDocs = (0 until 3).map { e =>
      (100L + e, (0 until 25).map(i => s"ev${e}q$i").mkString(" "))
    }
    val evalSet = evalDocs.toDF("doc_id", "text")
    // 24 quality-passing docs; every third one embeds an 8-word eval span
    // at a random offset, and one carries a 7-word span (too short to trip)
    val docs = (0 until 24).map { d =>
      val base = (0 until 40).map(i => s"d${d}w${i}x${rnd.nextInt(1000)}")
      val words =
        if (d % 3 == 0) {
          val e = (d / 3) % 3
          val off = rnd.nextInt(base.size)
          val spanLen = if (d == 21) 7 else 8
          val k = rnd.nextInt(25 - spanLen + 1)
          val span = (k until k + spanLen).map(i => s"ev${e}q$i")
          base.patch(off, span, 0)
        } else base
      (d.toLong, ts(f"2024-02-29 01:${d}%02d:00"), words.mkString(" "))
    }
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.cleanDocStreamDecontaminated(df, evalSet)
      .writeStream.format("memory").queryName("deconlaw")
      .outputMode("append").start()
    val streamed = try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      spark.table("deconlaw").select("doc_id").as[Long].collect().toSet
    } finally q.stop()
    val batchCleaned = docs.toDF("doc_id", "ts", "text")
      .filter(graft.llm.TextOps.qualityKeep("text"))
      .withColumn("_sha", sha2(col("text"), 256))
      .dropDuplicates("_sha").drop("_sha")
    val batch = graft.llm.TextOps.decontaminateNgram(batchCleaned, evalSet)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === batch)
    // the fixture is non-degenerate: something survived and something leaked
    assert(streamed.nonEmpty && streamed.size < 24)
  }

  test("userRunningStats accumulates per-key state across micro-batches (mapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val stats = EventStream.userRunningStats(spark,
      mem.toDF().select($"user_id", $"event_type", $"ts"))
    val q = stats.toDF().writeStream.format("memory").queryName("ustats")
      .outputMode("update").start()
    try {
      mem.addData(Ev(ts("2024-02-29 01:00:00"), "signup", 1),
        Ev(ts("2024-02-29 01:05:00"), "view", 1))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-02-29 02:00:00"), "purchase", 1),
        Ev(ts("2024-02-29 02:00:00"), "signup", 2))
      q.processAllAvailable()
      // latest state row per user wins (update mode emits one row per batch)
      val last = spark.table("ustats")
        .groupBy($"user_id").agg(max(struct($"n_events", $"last_type")).as("s"))
        .select($"user_id", $"s.n_events", $"s.last_type")
        .as[(Long, Long, String)].collect().toSet
      assert(last === Set((1L, 3L, "purchase"), (2L, 1L, "signup")))
    } finally q.stop()
  }

  test("enrich joins each micro-batch against the static dim; unmatched keys survive") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStream.enrich(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts("2024-02-29 01:00:00"), "view", 1),
        Ev(ts("2024-02-29 01:01:00"), "view", 9)) // 9 not in dim
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select($"user_id", $"tier").as[(Long, Option[String])]
        .collect().toSet
      assert(rows === Set((1L, Some("gold")), (9L, None)))
    } finally q.stop()
  }

  test("intervalJoin pairs same-user events inside the gap, drops outside (stream-stream)") {
    implicit val sqlCtx = spark.sqlContext
    val probe = MemoryStream[Ev]
    val base = MemoryStream[Ev]
    val q = EventStream.intervalJoin(probe.toDF(), base.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      base.addData(
        Ev(ts("2024-02-29 01:00:00"), "view", 1),   // 5 min before → match
        Ev(ts("2024-02-29 00:40:00"), "view", 1),   // 25 min before → outside gap
        Ev(ts("2024-02-29 01:00:00"), "view", 2))   // other user → no match
      probe.addData(Ev(ts("2024-02-29 01:05:00"), "purchase", 1))
      q.processAllAvailable()
      // advance both watermarks far enough to flush the joined results
      base.addData(Ev(ts("2024-02-29 09:00:00"), "view", 9))
      probe.addData(Ev(ts("2024-02-29 09:00:00"), "purchase", 9))
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select($"user_id", date_format($"probe_ts", "HH:mm").as("p"),
          date_format($"base_ts", "HH:mm").as("b"))
        .as[(Long, String, String)].collect().toSet
      assert(rows === Set((1L, "01:05", "01:00")))
    } finally q.stop()
  }

  test("intervalJoinLeft ALSO emits unmatched probes with nulls once the watermark proves absence") {
    implicit val sqlCtx = spark.sqlContext
    val probe = MemoryStream[Ev]
    val base = MemoryStream[Ev]
    val q = EventStream.intervalJoinLeft(probe.toDF(), base.toDF())
      .writeStream.format("memory").queryName("ssjoinl")
      .outputMode("append").start()
    try {
      base.addData(
        Ev(ts("2024-02-29 01:00:00"), "view", 1))   // in-gap → match for user 1
      probe.addData(
        Ev(ts("2024-02-29 01:05:00"), "purchase", 1),
        Ev(ts("2024-02-29 01:05:00"), "purchase", 2)) // user 2: no base event
      q.processAllAvailable()
      // push both watermarks way past probe_ts + gap: user 2's absence is
      // now PROVEN and its null-matched row must flush
      base.addData(Ev(ts("2024-02-29 09:00:00"), "view", 9))
      probe.addData(Ev(ts("2024-02-29 09:00:00"), "purchase", 9))
      q.processAllAvailable()
      base.addData(Ev(ts("2024-02-29 12:00:00"), "view", 9))
      probe.addData(Ev(ts("2024-02-29 12:00:00"), "purchase", 9))
      q.processAllAvailable()
      val rows = spark.table("ssjoinl")
        .filter($"user_id".isin(1L, 2L))
        .select($"user_id", $"base_type")
        .as[(Long, Option[String])].collect().toSet
      assert(rows === Set((1L, Some("view")), (2L, None)),
        s"got $rows — matched pair AND proven-absent null row expected")
    } finally q.stop()
  }

  test("closedSessions emits a session only when a later event closes it (flatMapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.closedSessions(spark,
      mem.toDF().select($"user_id", $"ts"))
      .toDF().writeStream.format("memory").queryName("closed")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts("2024-02-29 01:00:00"), "a", 1),
        Ev(ts("2024-02-29 01:02:00"), "a", 1))
      q.processAllAvailable()
      assert(spark.table("closed").count() === 0) // session still open
      // next batch: event 30 min later closes the first session
      mem.addData(Ev(ts("2024-02-29 01:32:00"), "a", 1))
      q.processAllAvailable()
      val rows = spark.table("closed")
        .select($"user_id", date_format($"session_start", "HH:mm").as("s"),
          $"n_events").as[(Long, String, Long)].collect().toSeq
      assert(rows === Seq((1L, "01:00", 2L)))
    } finally q.stop()
  }

  test("closedSessions: watermark timeout flushes the idle final session and evicts state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.closedSessions(spark,
      mem.toDF().select($"user_id", $"ts"), lateness = "10 minutes")
      .toDF().writeStream.format("memory").queryName("closedflush")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts("2024-02-29 01:00:00"), "a", 1))
      q.processAllAvailable()
      assert(spark.table("closedflush").count() === 0)
      // another USER's event pushes the watermark far past 01:05 + gap:
      // user 1 produces nothing more, yet their session must still close
      mem.addData(Ev(ts("2024-02-29 03:00:00"), "a", 2))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-02-29 03:00:01"), "a", 2)) // tick to fire timeout
      q.processAllAvailable()
      val rows = spark.table("closedflush")
        .select($"user_id", date_format($"session_end", "HH:mm").as("e"))
        .as[(Long, String)].collect().toSet
      assert(rows.contains((1L, "01:00")))
    } finally q.stop()
  }

  test("closedSessions: a late in-gap event extends the session, never rewinds it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.closedSessions(spark,
      mem.toDF().select($"user_id", $"ts"))
      .toDF().writeStream.format("memory").queryName("closedlate")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts("2024-02-29 01:00:00"), "a", 1),
        Ev(ts("2024-02-29 01:04:00"), "a", 1))
      q.processAllAvailable()
      // LATE event inside the open session: must not move last_ts back to
      // 01:01 (a rewind would let the 01:08 closer split the session)
      mem.addData(Ev(ts("2024-02-29 01:01:00"), "a", 1))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-02-29 01:30:00"), "a", 1)) // closes it
      q.processAllAvailable()
      val rows = spark.table("closedlate")
        .select(date_format($"session_start", "HH:mm").as("s"),
          date_format($"session_end", "HH:mm").as("e"), $"n_events")
        .as[(String, String, Long)].collect().toSeq
      assert(rows === Seq(("01:00", "01:04", 3L)))
    } finally q.stop()
  }

  test("closedSessions: an in-watermark event a full gap BEFORE the open session becomes its own session, not a rewind") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.closedSessions(spark,
      mem.toDF().select($"user_id", $"ts"))
      .toDF().writeStream.format("memory").queryName("closedfarlate")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts("2024-02-29 01:20:00"), "a", 1),
        Ev(ts("2024-02-29 01:22:00"), "a", 1))
      q.processAllAvailable()
      // 01:00 is inside the 1h watermark but 20 min before the open
      // session's start: merging would rewind start_ts to 01:00 and
      // report a 22-minute session that never happened
      mem.addData(Ev(ts("2024-02-29 01:00:00"), "a", 1))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-02-29 01:40:00"), "a", 1)) // closes 01:20-22
      q.processAllAvailable()
      val rows = spark.table("closedfarlate")
        .select(date_format($"session_start", "HH:mm").as("s"),
          date_format($"session_end", "HH:mm").as("e"), $"n_events")
        .as[(String, String, Long)].collect().toSeq.sorted
      assert(rows === Seq(("01:00", "01:00", 1L), ("01:20", "01:22", 2L)))
    } finally q.stop()
  }

  test("userRunningStats: a late-only micro-batch never rewinds the latest-event profile") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val stats = EventStream.userRunningStats(spark, mem.toDF())
    val q = stats.toDF().writeStream.format("memory").queryName("lateprofile")
      .outputMode("update").start()
    try {
      mem.addData(Ev(ts("2024-02-29 10:00:00"), "purchase", 1))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-02-29 09:00:00"), "view", 1)) // late
      q.processAllAvailable()
      val row = spark.table("lateprofile").orderBy($"n_events".desc)
        .select($"n_events", $"last_type",
          date_format($"last_ts", "HH:mm").as("t"))
        .as[(Long, String, String)].head()
      assert(row === ((2L, "purchase", "10:00"))) // counted, not rewound
    } finally q.stop()
  }

  test("ingestStream AvailableNow: NDJSON landing dir -> curated parquet, incremental (T1/T4)") {
    val base = Paths.get("/root/repo/target/tmp")
    Files.createDirectories(base)
    val dir = Files.createTempDirectory(base, "stream_ingest").toString
    Files.createDirectories(Paths.get(s"$dir/landing"))
    def watchLine(u: String, h: Int) =
      s"""{"type":"WatchEvent","actor":{"login":"$u"},"repo":{"name":"r/x"},"created_at":"2024-02-29T0$h:00:00Z","payload":{"action":"started"}}"""
    Files.write(Paths.get(s"$dir/landing/h1.json"),
      Seq(watchLine("u1", 1), watchLine("u2", 2)).mkString("\n").getBytes)

    val q1 = EventStream.ingestStream(spark, s"$dir/landing", s"$dir/out",
      s"$dir/ckpt", "watch")
    q1.awaitTermination()
    assert(spark.read.parquet(s"$dir/out").count() === 2)

    // drop one more hourly file; only the delta is processed (checkpoint)
    Files.write(Paths.get(s"$dir/landing/h2.json"),
      Seq(watchLine("u3", 3)).mkString("\n").getBytes)
    val q2 = EventStream.ingestStream(spark, s"$dir/landing", s"$dir/out",
      s"$dir/ckpt", "watch")
    q2.awaitTermination()
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() === 3)
    assert(back.select("username").as[String].collect().toSet
      === Set("u1", "u2", "u3"))
  }

  test("maintainIvfIndex: streamed vector batches become queryable; " +
    "batch replay does not duplicate (T∅ + L18++ e2e)") {
    import graft.llm.VectorOps
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.query.Tables(spark, sf("sf0.001"), "embeddings")
    val dir = Files.createTempDirectory("ivfstream").toString + "/idx"
    // index built + stored on the first 300 vectors
    VectorOps.writeIvfIndex(
      VectorOps.buildIvfIndex(emb.filter(col("vec_id") < 300)), dir)
    // stream the remaining vectors in as two micro-batches
    val mem = MemoryStream[(Long, Seq[Float])]
    val vecs = mem.toDF().toDF("vec_id", "embedding")
    val late = emb.filter(col("vec_id") >= 300)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val (b1, b2) = late.splitAt(late.length / 2)
    val ckpt = Files.createTempDirectory("ivfstream_ck").toString
    val q = EventStream.maintainIvfIndex(vecs, dir, ckpt)
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val grown = VectorOps.readIvfIndex(spark, dir)
    assert(grown.assignments.count() === emb.count())
    // streamed vectors surface in queries
    val res = VectorOps.ivfQuery(grown,
        emb.filter(col("vec_id") < 5), k = 5, nProbe = 16)
      .select("neighbor_id").as[Long].collect()
    assert(res.exists(_ >= 300), "streamed vectors never surface")
    // crash-replay discipline: re-running a batch id overwrites, never adds
    VectorOps.ivfAppendBatch(spark, dir, 1L,
      spark.createDataset(b2.toIndexedSeq).toDF("vec_id", "embedding"))
    assert(VectorOps.readIvfIndex(spark, dir).assignments.count()
      === emb.count())
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("maintainIvfPqIndex: streamed vectors are encoded under the stored " +
    "fixed quantizers; batch replay does not duplicate (T∅ + L3pq+ e2e)") {
    import graft.llm.Pq
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.query.Tables(spark, sf("sf0.001"), "embeddings")
    val dir = Files.createTempDirectory("ivfpqstream").toString + "/idx"
    Pq.writeIvfPqIndex(
      Pq.buildIvfPqIndex(emb.filter(col("vec_id") < 300)), dir)
    val mem = MemoryStream[(Long, Seq[Float])]
    val vecs = mem.toDF().toDF("vec_id", "embedding")
    val late = emb.filter(col("vec_id") >= 300)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val (b1, b2) = late.splitAt(late.length / 2)
    val ckpt = Files.createTempDirectory("ivfpqstream_ck").toString
    val q = EventStream.maintainIvfPqIndex(vecs, dir, ckpt)
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val grown = Pq.readIvfPqIndex(spark, dir)
    assert(grown.assignments.count() === emb.count())
    val res = Pq.ivfPqQuery(grown, emb, emb.filter(col("vec_id") < 5),
        k = 5, nProbe = 16, shortlist = 256)
      .select("neighbor_id").as[Long].collect()
    assert(res.exists(_ >= 300), "streamed vectors never surface")
    // crash-replay discipline: re-running a batch id overwrites, never adds
    Pq.ivfPqAppendBatch(spark, dir, 1L,
      spark.createDataset(b2.toIndexedSeq).toDF("vec_id", "embedding"))
    assert(Pq.readIvfPqIndex(spark, dir).assignments.count() === emb.count())
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("maintainBm25Index: streamed doc batches become searchable; " +
    "mid-stream compaction preserves results; forced replay of a folded " +
    "batch never double-counts postings (T∅ + L34s e2e)") {
    import graft.llm.Retrieval
    implicit val sqlCtx = spark.sqlContext
    val allDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown cat sleeps on the warm mat"),
      (2L, "a slow green turtle walks under the old bridge"),
      (3L, "quick quick quick repetition inflates term frequency here"),
      (4L, "entirely disjoint vocabulary zone alpha beta gamma delta"),
      (5L, "the lazy dog naps beside the quick brown fox"))
    val dir = Files.createTempDirectory("bm25stream").toString + "/idx"
    // index built on the first 2 docs; the rest stream in
    Retrieval.buildBm25Index(allDocs.take(2).toDF("doc_id", "text"), dir,
      nBuckets = 8)
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val ckpt = Files.createTempDirectory("bm25stream_ck").toString
    // compactEvery = 2: the second micro-batch triggers a fold mid-stream
    val q = EventStream.maintainBm25Index(docs, dir, ckpt, nBuckets = 8,
      compactEvery = 2)
    mem.addData(allDocs.slice(2, 4))
    q.processAllAvailable()
    mem.addData(allDocs.slice(4, 6))
    q.processAllAvailable()
    q.stop()
    // the stream's second batch compacted: a committed generation stands
    assert(graft.store.IndexGenerations.current(spark, dir).gen === 0)
    val queries = allDocs.toDF("doc_id", "text")
      .select(col("doc_id").as("query_id"),
        array_distinct(split(col("text"), " ")).as("terms"))
    def run() = Retrieval.bm25Stored(spark, dir, queries, k = 5,
        nBuckets = 8).orderBy("query_id", "rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val got = run()
    // every streamed doc is retrievable, and the index equals a
    // from-scratch build of the full corpus bit-for-bit
    assert(got.exists(_._2 >= 2L), "streamed docs never surface")
    val dirFull = Files.createTempDirectory("bm25full").toString + "/idx"
    Retrieval.buildBm25Index(allDocs.toDF("doc_id", "text"), dirFull,
      nBuckets = 8)
    val full = Retrieval.bm25Stored(spark, dirFull, queries, k = 5,
        nBuckets = 8).orderBy("query_id", "rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got === full)
    // crash-replay discipline across the fold: batch 0 (docs 2,3) was
    // FOLDED by the batch-1 compaction; a replayed foreachBatch re-append
    // of it resurrects the dir but the generation watermark keeps it
    // invisible — no double-counted postings
    Retrieval.bm25IndexAppend(spark, dir, 0L,
      allDocs.slice(2, 4).toDF("doc_id", "text"), nBuckets = 8)
    assert(run() === full, "replayed folded batch double-counted")
    Seq(dir, dirFull).foreach(d => org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d).getParentFile))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
  }

  test("maintainPhraseIndex: streamed doc batches become searchable; " +
    "mid-stream compaction preserves results; forced replay of a folded " +
    "batch never double-counts (T∅ + L25 e2e)") {
    import graft.llm.PhraseIndex
    implicit val sqlCtx = spark.sqlContext
    val allDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a slow green turtle walks under the old bridge"),
      (2L, "the quick brown cat sleeps on the warm mat"),
      (3L, "entirely disjoint vocabulary zone alpha beta gamma"),
      (4L, "the lazy dog naps beside the quick brown fox"),
      (5L, "gamma rays cross the warm bridge at dawn"))
    val dir = Files.createTempDirectory("phrasestream").toString + "/idx"
    // index built on the first 2 docs; the rest stream in
    PhraseIndex.buildPhraseIndex(allDocs.take(2).toDF("doc_id", "text"),
      dir, n = 3, nBuckets = 8)
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val ckpt = Files.createTempDirectory("phrasestream_ck").toString
    // compactEvery = 2: the second micro-batch triggers a fold mid-stream
    val q = EventStream.maintainPhraseIndex(docs, dir, ckpt, n = 3,
      nBuckets = 8, compactEvery = 2)
    mem.addData(allDocs.slice(2, 4))
    q.processAllAvailable()
    mem.addData(allDocs.slice(4, 6))
    q.processAllAvailable()
    q.stop()
    // the stream's second batch compacted: a committed generation stands
    assert(graft.store.IndexGenerations.current(spark, dir).gen === 0)
    val corpus = allDocs.toDF("doc_id", "text")
    def run() = PhraseIndex.phraseSearch(spark, dir, corpus,
      "the quick brown", n = 3, nBuckets = 8)
      .orderBy("doc_id").as[Long].collect().toSeq
    // hits span the pre-built base (0) and both streamed batches (2, 4)
    assert(run() === Seq(0L, 2L, 4L))
    // crash-replay discipline across the fold: batch 0 (docs 2,3) was
    // FOLDED by the batch-1 compaction; a replayed re-append resurrects
    // the dir but the generation watermark keeps it invisible
    PhraseIndex.phraseIndexAppend(spark, dir, 0L,
      allDocs.slice(2, 4).toDF("doc_id", "text"), n = 3, nBuckets = 8)
    assert(run() === Seq(0L, 2L, 4L), "replayed folded batch leaked")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
  }

  test("blocklistMonitorStream: streamed docs feed a live per-source " +
    "phrase-hit view; a replayed batch never double-counts (T∅ + L40 e2e)") {
    import graft.ingest.IncrementalViews
    implicit val sqlCtx = spark.sqlContext
    val phrases = Seq("slow join", "table scan")
    val mvDir = Files.createTempDirectory("blmon").toString + "/mv"
    val ckpt = Files.createTempDirectory("blmon_ck").toString
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "source")
    val q = EventStream.blocklistMonitorStream(docs, phrases, mvDir, ckpt)
    mem.addData(Seq(
      (0L, "a slow join happened here", "srcA"),
      (1L, "entirely clean text", "srcA")))
    q.processAllAvailable()
    mem.addData(Seq(
      (2L, "slow join again near a table scan", "srcB"),
      (3L, "another table scan in srcB", "srcB")))
    q.processAllAvailable()
    q.stop()
    def counts(): Map[(String, String), (Long, Long)] =
      IncrementalViews.freqView(spark, mvDir)
        .selectExpr("key", "explode(top) AS t")
        .selectExpr("key", "t.item", "t.lb", "t.ub")
        .as[(String, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val c = counts()
    // tiny vocab: sketch bounds are tight — lb == ub == exact count
    assert(c(("srcA", "slow join")) === ((1L, 1L)), s"got $c")
    assert(c(("srcB", "slow join")) === ((1L, 1L)), s"got $c")
    assert(c(("srcB", "table scan")) === ((2L, 2L)), s"got $c")
    assert(!c.contains(("srcA", "table scan")))
    // at-least-once replay of an already-folded batch: the batchId
    // watermark refuses the fold — counts unchanged
    val replayHits = graft.llm.Selection.blocklistScan(
      Seq((0L, "a slow join happened here", "srcA"))
        .toDF("doc_id", "text", "source"), phrases)
      .select(col("source"), explode(col("matched")).as("phrase"))
    val folded = IncrementalViews.maintainFreqSketches(
      spark, replayHits, mvDir, "source", "phrase", 0L)
    assert(!folded, "replayed batchId must be refused")
    assert(counts() === c, "replayed batch double-counted")
    // mvDir has a "/mv" suffix under its temp dir — delete the parent;
    // ckpt IS the temp dir — deleting ITS parent would wipe the shared
    // java.io.tmpdir out from under every concurrently-running suite
    org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(mvDir).getParentFile)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
  }

  test("mergeStream: streamed upserts land as MERGE state; replay is a no-op (T∅ + S13 e2e)") {
    import graft.store.TableStore
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("mergestream").toString + "/t"
    val base = (0L until 10L).map(i =>
      (i, s"v0-$i", java.sql.Date.valueOf("2024-01-01")))
      .toDF("id", "payload", "date")
    TableStore.append(base, dir)
    val mem = MemoryStream[(Long, String, java.sql.Date)]
    val updates = mem.toDF().toDF("id", "payload", "date")
    val ckpt = Files.createTempDirectory("mergestream_ck").toString
    val q = EventStream.mergeStream(updates, dir, ckpt, Seq("id"))
    // batch 1: update ids 3,4; batch 2: insert 100 + re-update 3
    mem.addData(Seq((3L, "v1-3", java.sql.Date.valueOf("2024-01-01")),
      (4L, "v1-4", java.sql.Date.valueOf("2024-01-01"))))
    q.processAllAvailable()
    mem.addData(Seq((100L, "new-100", java.sql.Date.valueOf("2024-01-01")),
      (3L, "v2-3", java.sql.Date.valueOf("2024-01-01"))))
    q.processAllAvailable()
    q.stop()
    val back = TableStore.read(spark, dir)
    assert(back.count() === 11)
    assert(back.filter($"id" === 3).select("payload").as[String].head() === "v2-3")
    assert(back.filter($"id" === 4).select("payload").as[String].head() === "v1-4")
    assert(back.filter($"id" === 100).count() === 1)
    // at-least-once replay discipline: re-merging batch 2 changes nothing
    TableStore.merge(spark,
      Seq((100L, "new-100", java.sql.Date.valueOf("2024-01-01")),
        (3L, "v2-3", java.sql.Date.valueOf("2024-01-01")))
        .toDF("id", "payload", "date"), dir, Seq("id"))
    val again = TableStore.read(spark, dir)
    assert(again.count() === 11)
    assert(again.filter($"id" === 3).select("payload").as[String].head() === "v2-3")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("quantileSketchStream: micro-batches fold into the view; replayed batch never double-counts") {
    import graft.ingest.IncrementalViews
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("kllstream").toString + "/mv"
    val ckpt = Files.createTempDirectory("kllstream_ck").toString
    val mem = MemoryStream[(String, Double)]
    val q = EventStream.quantileSketchStream(
      mem.toDF().toDF("k", "v"), dir, ckpt, "k", "v")
    try {
      mem.addData((1 to 1000).map(i => ("a", i.toDouble)): _*)
      q.processAllAvailable()
      mem.addData((1 to 1000).map(i => ("a", (i + 1000).toDouble)): _*)
      q.processAllAvailable()
      val p50 = IncrementalViews.quantileView(spark, dir, Seq(0.5))
        .as[(String, Seq[Double])].head()._2.head
      // all-history median over 1..2000, not a last-batch (1001..2000) one
      assert(math.abs(p50 - 1000) <= 120, s"p50=$p50")
      // at-least-once replay: re-fold batch id 1 directly — must be skipped
      val folded = IncrementalViews.maintainQuantileSketches(spark,
        (1 to 1000).map(i => ("a", (i + 1000).toDouble)).toDF("k", "v"),
        dir, "k", "v", batchId = 1L)
      assert(!folded, "replayed batch was folded again")
      val p50b = IncrementalViews.quantileView(spark, dir, Seq(0.5))
        .as[(String, Seq[Double])].head()._2.head
      assert(p50b === p50) // state bit-identical, not skewed toward replay
      // a batch-mode fold (no id) must CARRY the stream's watermark, not
      // reset it — replaying batch 1 afterwards must still be skipped
      assert(IncrementalViews.maintainQuantileSketches(spark,
        Seq(("b", 1.0)).toDF("k", "v"), dir, "k", "v"))
      assert(!IncrementalViews.maintainQuantileSketches(spark,
        (1 to 1000).map(i => ("a", (i + 1000).toDouble)).toDF("k", "v"),
        dir, "k", "v", batchId = 1L),
        "batch-mode fold reset the replay watermark")
    } finally q.stop()
  }

  test("freqSketchStream: micro-batches fold heavy hitters; replay never inflates counts") {
    import graft.ingest.IncrementalViews
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("freqstream").toString + "/mv"
    val ckpt = Files.createTempDirectory("freqstream_ck").toString
    val mem = MemoryStream[(String, String)]
    val q = EventStream.freqSketchStream(
      mem.toDF().toDF("k", "item"), dir, ckpt, "k", "item")
    def hotBounds(): (Long, Long) = {
      val r = IncrementalViews.freqView(spark, dir)
        .selectExpr("explode(top) AS t").selectExpr("t.item", "t.lb", "t.ub")
        .as[(String, Long, Long)].collect()
      val h = r.find(_._1 == "hot").get
      (h._2, h._3)
    }
    try {
      mem.addData((1 to 500).map(_ => ("a", "hot")) ++
        (1 to 100).map(i => ("a", s"t1_$i")): _*)
      q.processAllAvailable()
      mem.addData((1 to 500).map(_ => ("a", "hot")) ++
        (1 to 100).map(i => ("a", s"t2_$i")): _*)
      q.processAllAvailable()
      val (lb, ub) = hotBounds()
      assert(lb <= 1000 && 1000 <= ub, s"hot bounds [$lb,$ub]")
      // at-least-once replay of batch 1 must be skipped — a re-fold would
      // inflate hot's bounds past the truly-counted stream
      val folded = IncrementalViews.maintainFreqSketches(spark,
        ((1 to 500).map(_ => ("a", "hot")) ++
          (1 to 100).map(i => (("a", s"t2_$i")))).toDF("k", "item"),
        dir, "k", "item", batchId = 1L)
      assert(!folded, "replayed batch was folded again")
      assert(hotBounds() == ((lb, ub))) // state unchanged, counts not inflated
    } finally q.stop()
  }

  test("histogramStream: live PSI vs a frozen reference rises when the " +
    "distribution shifts; replay never double-counts") {
    import graft.ingest.IncrementalViews
    implicit val sqlCtx = spark.sqlContext
    val refDir = Files.createTempDirectory("histref").toString + "/mv"
    val liveDir = Files.createTempDirectory("histlive").toString + "/mv"
    val ckpt = Files.createTempDirectory("hist_ck").toString
    // reference snapshot: uniform over [0, 100)
    IncrementalViews.maintainHistogram(spark,
      (0 until 2000).map(i => (i % 100).toDouble).toDF("v"),
      refDir, "v", lo = 0.0, width = 10.0, nBuckets = 10)
    val mem = MemoryStream[Double]
    val q = EventStream.histogramStream(mem.toDF().toDF("v"),
      liveDir, ckpt, "v", lo = 0.0, width = 10.0, nBuckets = 10)
    def psi(): Double = IncrementalViews
      .histogramDrift(spark, liveDir, refDir, 10)
      .as[(Double, Long, Long)].head()._1
    try {
      // batch 1 matches the reference shape → PSI ~ 0
      mem.addData((0 until 1000).map(i => (i % 100).toDouble): _*)
      q.processAllAvailable()
      val stable = psi()
      assert(stable < 0.1, s"uniform-vs-uniform psi=$stable")
      // batch 2 piles into one bucket → PSI crosses the investigate bar
      mem.addData((0 until 1000).map(_ => 5.0): _*)
      q.processAllAvailable()
      val drifted = psi()
      assert(drifted > 0.25, s"shifted psi=$drifted")
      // replaying batch 1 directly must be skipped — additive state would
      // otherwise double-count and move the PSI
      assert(!IncrementalViews.maintainHistogram(spark,
        (0 until 1000).map(i => (i % 100).toDouble).toDF("v"),
        liveDir, "v", 0.0, 10.0, 10, batchId = 0L))
      assert(psi() === drifted)
    } finally q.stop()
  }
}
