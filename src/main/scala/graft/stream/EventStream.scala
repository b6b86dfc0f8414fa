package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.schema.GhaSchemas
import graft.ingest.Extract

/** Structured-Streaming surface (SURVEY.md §2.9). The reference is
  * micro-batch incremental — hourly files, a manual watermark, a 1-hour
  * late-data guard (`/root/reference/preprocess.py:178-190, 260, 277-280`).
  * Structured Streaming expresses all three natively: a file source with
  * `Trigger.AvailableNow` is the "process everything since the checkpoint"
  * loop, `withWatermark` is the incomplete-hour guard, and the windowed
  * aggregations below are the trend queries the product goals ask for.
  */
object EventStream {

  /** T2+T3: tumbling counts with late-data tolerance — the streaming form of
    * the reference's hourly batch with its 1-hour lag (preprocess.py:188-189).
    */
  def tumblingCounts(events: DataFrame, tsCol: String = "ts",
      window_ : String = "1 hour", lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Sliding-window counts (declared surface T∅). */
  def slidingCounts(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Session windows (5-minute gap) per user (declared surface T∅). */
  def sessionCounts(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(col("user_id"), session_window(col(tsCol), "5 minutes"))
      .agg(count(lit(1)).as("cnt"))

  /** T∅: stream-stream inner interval join — pair each row of `probe`
    * with same-key rows of `base` whose timestamp falls in the preceding
    * `gap` (e.g. purchases matched to the views that led to them). BOTH
    * sides carry watermarks and the join condition bounds the time span,
    * which is what makes the state store finite: Spark evicts buffered
    * rows once the other side's watermark passes `gap` + lateness — the
    * state held at 100 TB/day is two horizons of rows, never history.
    * An unbounded-condition stream-stream join would buffer forever and
    * is rejected here by construction.
    */
  def intervalJoin(probe: DataFrame, base: DataFrame,
      key: String = "user_id", tsCol: String = "ts",
      gap: String = "10 minutes", lateness: String = "1 hour"): DataFrame = {
    val l = probe.withWatermark(tsCol, lateness)
      .select(col(key), col(tsCol).as("probe_ts"),
        col("event_type").as("probe_type"))
    val r = base.withWatermark(tsCol, lateness)
      .select(col(key).as("__rk"), col(tsCol).as("base_ts"),
        col("event_type").as("base_type"))
    l.join(r,
      col(key) === col("__rk") &&
        col("base_ts") >= col("probe_ts") - expr(s"interval $gap") &&
        col("base_ts") < col("probe_ts"))
      .drop("__rk")
  }

  /** T∅: the LEFT-OUTER form of [[intervalJoin]] — probe rows with no
    * base event in their gap still emit, with nulls, once the watermark
    * proves no match can arrive ("purchases with no preceding click" is
    * the null-matched slice — the streaming anti-join idiom). Same
    * bounded state as the inner form: both watermarks + the time-bounded
    * condition keep two horizons of rows; unmatched results are simply
    * DEFERRED until the left row ages past the join window (the price of
    * proving absence on a stream).
    */
  def intervalJoinLeft(probe: DataFrame, base: DataFrame,
      key: String = "user_id", tsCol: String = "ts",
      gap: String = "10 minutes", lateness: String = "1 hour"): DataFrame = {
    val l = probe.withWatermark(tsCol, lateness)
      .select(col(key), col(tsCol).as("probe_ts"),
        col("event_type").as("probe_type"))
    val r = base.withWatermark(tsCol, lateness)
      .select(col(key).as("__rk"), col(tsCol).as("base_ts"),
        col("event_type").as("base_type"))
    l.join(r,
      col(key) === col("__rk") &&
        col("base_ts") >= col("probe_ts") - expr(s"interval $gap") &&
        col("base_ts") < col("probe_ts"),
      "leftOuter")
      .drop("__rk")
  }

  /** T∅: stream-static enrichment — each micro-batch joins against a
    * batch dimension table (the "attach user profile / repo metadata to
    * the event stream" shape). No streaming state at all: the static side
    * is re-planned per micro-batch, so a dimension REFRESH (overwritten
    * parquet, a new TableStore generation) is picked up on the next batch
    * without restarting the query; broadcast keeps the stream side
    * shuffle-free when the dimension is bounded.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String = "user_id")
      : DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** L1 in streaming form: exactly-once event dedup inside the watermark
    * horizon. State is bounded — ids older than the watermark are evicted,
    * so at 100 TB/day the state store holds one horizon of ids, not history.
    */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
      tsCol: String = "ts", lateness: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(idCol)

  /** L1+L5 in streaming form: the corpus-cleaning pipeline over a document
    * STREAM — the batch operators compose with Structured Streaming
    * unchanged. The quality gate (`TextOps.qualityKeep`) is a stateless
    * codegen'd filter, so it costs nothing in state; exact dedup keys on
    * `sha2(text)` (shuffle rows carry a 32-byte digest, not documents) and
    * `dropDuplicatesWithinWatermark` evicts digests older than the
    * watermark — state holds one lateness horizon of hashes, not corpus
    * history. At 100 TB/day this is the always-on front door that feeds
    * the batch near-dup stages.
    */
  def cleanDocStream(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", lateness: String = "1 hour"): DataFrame =
    docs.withWatermark(tsCol, lateness)
      .filter(graft.llm.TextOps.qualityKeep(textCol))
      .withColumn("_text_sha", sha2(col(textCol), 256))
      .dropDuplicatesWithinWatermark("_text_sha")
      .drop("_text_sha")

  /** [[cleanDocStream]] with the eval-leakage sweep in-line: docs sharing
    * any n-word span with the (static, bounded) eval set never enter the
    * corpus. The eval gram hashes are collected once (bounded by the same
    * "eval set broadcasts" assumption the batch path makes) and compiled
    * into an `InSet` probe — O(1) per gram, codegen'd, shipped with the
    * task binary like a broadcast. The filter is a stateless map, adding
    * ZERO state-store footprint on top of the digest dedup. An eval set
    * too large for this ships through the batch path
    * ([[graft.llm.TextOps.decontaminateNgram]]) against landed data.
    */
  def cleanDocStreamDecontaminated(docs: DataFrame, evalSet: DataFrame,
      textCol: String = "text", tsCol: String = "ts",
      lateness: String = "1 hour", n: Int = 8): DataFrame = {
    val evalGrams = evalSet
      .select(explode(graft.llm.TextOps.ngramHashes(col(textCol), n)).as("g"))
      .distinct().collect().map(_.getLong(0))
    if (evalGrams.isEmpty) cleanDocStream(docs, textCol, tsCol, lateness)
    else cleanDocStream(docs, textCol, tsCol, lateness)
      // coalesce: a null text has no grams, so it cannot leak — keep it,
      // exactly like the empty-eval branch and the batch anti-join (a bare
      // !exists(...) is NULL on null text and would silently drop the row)
      .filter(coalesce(
        !exists(graft.llm.TextOps.ngramHashes(col(textCol), n),
          g => g.isin(evalGrams.toIndexedSeq: _*)),
        lit(true)))
  }

  /** Per-user running profile kept in the state store. */
  case class UserState(user_id: Long, n_events: Long, last_type: String,
      last_ts: java.sql.Timestamp)

  /** T∅ custom state (`mapGroupsWithState`): a per-key accumulator the
    * built-in windowed aggs can't express — running event count + latest
    * event carried across micro-batches, emitted once per batch per active
    * key. State lives in the checkpointed store (RocksDB at scale), keyed
    * and shuffled once on user_id.
    */
  def userRunningStats(spark: SparkSession, events: DataFrame)
      : Dataset[UserState] = {
    import spark.implicits._
    events.selectExpr("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserState](
        GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserState]) =>
          val sorted = rows.toSeq.sortBy(_._3.getTime)
          val prev = state.getOption
            .getOrElse(UserState(uid, 0L, "", new java.sql.Timestamp(0)))
          // "latest" must compare against the STATE's timestamp, not just
          // within the batch: a micro-batch of only late events would
          // otherwise move the profile backwards in time
          val latest = sorted.lastOption
            .filter(_._3.getTime >= prev.last_ts.getTime)
          val next = UserState(uid, prev.n_events + sorted.size,
            latest.map(_._2).getOrElse(prev.last_type),
            latest.map(_._3).getOrElse(prev.last_ts))
          state.update(next)
          next
      }
  }

  case class OpenSession(user_id: Long, start_ts: Long, last_ts: Long,
      n_events: Long)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** T∅ custom state II (`flatMapGroupsWithState`): explicit sessionization
    * emitting 0..N closed sessions per key per batch — the shape
    * `session_window` can't express when the output needs custom
    * open/close semantics (here: a session closes when a later event
    * arrives more than `gapMs` after it; the still-open tail stays in the
    * state store across micro-batches).
    *
    * An EVENT-TIME TIMEOUT (driven by the `lateness` watermark) closes the
    * final session of a key that simply stops producing — without it every
    * user's last session is never emitted and its state entry lives
    * forever, which at 100 TB/day means unbounded state growth. Late
    * events that still land inside the open session extend it with
    * min/max, never backwards (a late event must not rewind the session
    * end below an already-seen later event).
    */
  def closedSessions(spark: SparkSession, events: DataFrame,
      gapMs: Long = 5 * 60 * 1000L,
      lateness: String = "1 hour"): Dataset[ClosedSession] = {
    import spark.implicits._
    events.selectExpr("user_id", "ts")
      .withWatermark("ts", lateness)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last_ts + gap with no new event: the open
            // session can never be extended again — flush and evict
            val o = state.get
            state.remove()
            Iterator.single(ClosedSession(uid,
              new java.sql.Timestamp(o.start_ts),
              new java.sql.Timestamp(o.last_ts), o.n_events))
          } else {
            val times = rows.map(_._2.getTime).toSeq.sorted
            var open = state.getOption
            // builder for LATE sessions: events inside the watermark but
            // more than a gap BEFORE the open session's start belong to an
            // earlier session of their own — merging them would rewind
            // start_ts arbitrarily far back and inflate the session span.
            // Only events landing within a gap of [start, last] extend the
            // open session. Late events sessionize among themselves with
            // the same gap rule and close at batch end (nothing after them
            // can be within a gap: the open session starts > gap later).
            var late: Option[OpenSession] = None
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            def emit(o: OpenSession): ClosedSession =
              ClosedSession(uid, new java.sql.Timestamp(o.start_ts),
                new java.sql.Timestamp(o.last_ts), o.n_events)
            for (t <- times) open match {
              case None => open = Some(OpenSession(uid, t, t, 1L))
              case Some(o) if t < o.start_ts - gapMs =>
                late match {
                  case Some(l) if t - l.last_ts < gapMs =>
                    late = Some(l.copy(last_ts = math.max(l.last_ts, t),
                      n_events = l.n_events + 1))
                  case Some(l) =>
                    closed += emit(l)
                    late = Some(OpenSession(uid, t, t, 1L))
                  case None => late = Some(OpenSession(uid, t, t, 1L))
                }
              case Some(o) if t - o.last_ts < gapMs =>
                open = Some(o.copy(
                  start_ts = math.min(o.start_ts, t),
                  last_ts = math.max(o.last_ts, t),
                  n_events = o.n_events + 1))
              case Some(o) =>
                closed += emit(o)
                open = Some(OpenSession(uid, t, t, 1L))
            }
            late.foreach(l => closed += emit(l))
            open.foreach { o =>
              state.update(o)
              // must stay above the current watermark or Spark rejects it
              state.setTimeoutTimestamp(math.max(o.last_ts + gapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** T1/T4: the incremental ingest loop as a streaming job — NDJSON landing
    * dir in, date-partitioned Parquet out, exactly-once via checkpoint.
    * `AvailableNow` processes the backlog then stops: identical cadence
    * semantics to the reference's hourly re-serve, without the manual
    * watermark bookkeeping.
    */
  /** T∅ + L18++: CONTINUOUS ANN-index maintenance — every micro-batch of
    * arriving vectors (vec_id, embedding) lands in the stored IVF index at
    * `indexDir` through the fixed-centroid append path. The write is the
    * IDEMPOTENT batch-keyed form ([[graft.llm.VectorOps.ivfAppendBatch]]):
    * foreachBatch is at-least-once under crash recovery, and a replayed
    * batch OVERWRITES its own `batch=<id>` directory instead of
    * duplicating rows — exactly-once index contents, checkpoint-compatible.
    * Queries against the index pick up new vectors at the next
    * [[graft.llm.VectorOps.readIvfIndex]]; centroid drift under sustained
    * appends is the caller's retrain trigger (rebuild + generation swap).
    */
  def maintainIvfIndex(vectors: DataFrame, indexDir: String,
      checkpointDir: String, compactEvery: Int = 0): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.VectorOps.ivfAppendBatch(
          batch.sparkSession, indexDir, batchId, batch)
        // the maintainer thread IS the single compactor (IndexGenerations
        // contract); a fold every `compactEvery` batches bounds the read
        // union width under a sustained stream. Compaction after a
        // replayed batch is safe: folded batches sit at or below the
        // generation watermark and are filtered on every read.
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          graft.llm.VectorOps.compactIvfIndex(batch.sparkSession, indexDir)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .start()

  /** [[maintainIvfIndex]] for the IVF-PQ code store: arriving vectors are
    * encoded + assigned under the stored FIXED quantizers
    * ([[graft.llm.Pq.ivfPqAppendBatch]] — idempotent batch-keyed
    * overwrite, exactly-once index contents from an at-least-once sink).
    * Quantizer drift under sustained appends is the caller's retrain
    * trigger, as with the float-vector index.
    */
  def maintainIvfPqIndex(vectors: DataFrame, indexDir: String,
      checkpointDir: String, compactEvery: Int = 0): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.Pq.ivfPqAppendBatch(
          batch.sparkSession, indexDir, batchId, batch)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          graft.llm.Pq.compactIvfPqIndex(batch.sparkSession, indexDir)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .start()

  /** Continuous BM25-index maintenance — the search-index member of the
    * index-maintainer family: every micro-batch of arriving documents
    * (doc_id, text) lands in the stored posting index at `indexDir`
    * through the idempotent batch-keyed append
    * ([[graft.llm.Retrieval.bm25IndexAppend]] — a crash-replayed batch
    * OVERWRITES its own `appends/batch=<id>` dirs, so index contents are
    * exactly-once from an at-least-once sink), keeping ranked retrieval
    * live at the reference's hourly cadence. Per-term df needs no
    * maintenance at all (derived from probed postings) and the stats rows
    * SUM, so a query after any number of batches equals a from-scratch
    * build of the union bit-for-bit. `compactEvery > 0` folds the append
    * batches into a new base generation every that-many batches
    * ([[graft.llm.Retrieval.compactBm25Index]]), bounding the read-time
    * union width; the maintainer thread is the single compactor. Caller
    * contract: a doc arrives whole in ONE batch.
    */
  def maintainBm25Index(docs: DataFrame, indexDir: String,
      checkpointDir: String, nBuckets: Int = 64,
      compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.Retrieval.bm25IndexAppend(
          batch.sparkSession, indexDir, batchId, batch, nBuckets)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          graft.llm.Retrieval.compactBm25Index(batch.sparkSession, indexDir)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .start()

  /** Continuous phrase-index maintenance — the last stored index to join
    * the append/compact/stream family: every micro-batch of arriving
    * documents (doc_id, text) lands in the stored n-gram posting index at
    * `indexDir` through the idempotent batch-keyed append
    * ([[graft.llm.PhraseIndex.phraseIndexAppend]] — a crash-replayed
    * batch OVERWRITES its own `appends/batch=<id>` dir, so index contents
    * are exactly-once from an at-least-once sink), keeping exact
    * substring search live at the reference's hourly cadence
    * (preprocess.py:277–280 re-serves hourly; its flagship " dask" grep
    * at preprocess.py:221–237 is the query this index answers without a
    * corpus scan). `compactEvery > 0` folds the append batches into a new
    * base generation every that-many batches
    * ([[graft.llm.PhraseIndex.compactPhraseIndex]]), bounding the
    * read-time union width; the maintainer thread is the single
    * compactor. Caller contract: a doc arrives whole in ONE batch, and
    * [[graft.llm.PhraseIndex.buildPhraseIndex]] ran first with the SAME
    * n/nBuckets (the `_meta` sidecar rejects a mismatch — appends-only
    * dirs are not a valid index, per the stored-index family contract).
    */
  def maintainPhraseIndex(docs: DataFrame, indexDir: String,
      checkpointDir: String, n: Int = 3, nBuckets: Int = 64,
      compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.PhraseIndex.phraseIndexAppend(
          batch.sparkSession, indexDir, batchId, batch, n, nBuckets)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          graft.llm.PhraseIndex.compactPhraseIndex(
            batch.sparkSession, indexDir)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .start()

  /** Streaming CDC apply (the Delta streaming-MERGE shape): each
    * micro-batch of keyed upserts MERGEs into the partitioned store
    * ([[graft.store.TableStore.merge]] — partition-local keys, touched
    * partitions only). Exactly-once BY IDEMPOTENCE rather than by batch
    * bookkeeping: foreachBatch is at-least-once under crash replay, and a
    * replayed batch re-merges the same rows onto the same keys — a state
    * no-op (the MergeSpec law) — where a blind append sink would
    * duplicate. The batch must carry the store's `date` partition column;
    * late-arriving corrections land in their ORIGINAL partition, which is
    * exactly what the partition-local key contract prescribes.
    */
  def mergeStream(updates: DataFrame, storeDir: String,
      checkpointDir: String, keyCols: Seq[String]): StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.store.TableStore.merge(batch.sparkSession, batch,
          storeDir, keyCols)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .start()

  /** Continuous per-key quantile maintenance: each micro-batch folds its
    * KLL sketches into the stored view ([[graft.ingest.IncrementalViews
    * .maintainQuantileSketches]]). Unlike [[mergeStream]], the fold is NOT
    * naturally idempotent (re-folding values skews a quantile sketch), so
    * exactly-once comes from the batchId committed atomically with the
    * sketches in the view's generation swap — a crash-replayed batch is
    * recognized and skipped, never double-counted.
    */
  def quantileSketchStream(updates: DataFrame, mvDir: String,
      checkpointDir: String, keyCol: String, valCol: String): StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.ingest.IncrementalViews.maintainQuantileSketches(
          batch.sparkSession, batch, mvDir, keyCol, valCol, id)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .start()

  /** Continuous per-key heavy-hitter maintenance — the frequent-items twin
    * of [[quantileSketchStream]]: each micro-batch folds its ItemsSketch
    * states into the stored view with the identical batchId-in-generation
    * exactly-once protocol (re-folding a replayed batch would INFLATE
    * counts; the view's bounds guarantee only holds over a
    * counted-once stream).
    */
  def freqSketchStream(updates: DataFrame, mvDir: String,
      checkpointDir: String, keyCol: String, itemCol: String): StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.ingest.IncrementalViews.maintainFreqSketches(
          batch.sparkSession, batch, mvDir, keyCol, itemCol, id)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .start()

  /** Continuous blocklist monitoring — the streaming face of the
    * Aho–Corasick blocklist filter ([[graft.llm.Selection.blocklistScan]]):
    * each micro-batch of documents is scanned ONCE per doc for the whole
    * phrase list, matches explode to (source, phrase) hits, and the hits
    * fold into the per-source frequent-items view with the
    * batchId-in-generation exactly-once protocol (a replayed batch would
    * otherwise inflate hit counts). The live view answers "which banned
    * phrases are arriving, from which sources, at what rate" —
    * [[graft.ingest.IncrementalViews.freqView]] — without ever re-scanning
    * history. Scale shape: the scan is map-only O(bytes + matches)
    * regardless of phrase count; the fold's state is sources × sketch
    * (KB-sized), corpus-independent.
    */
  def blocklistMonitorStream(docs: DataFrame, phrases: Seq[String],
      mvDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val hits = graft.llm.Selection.blocklistScan(batch, phrases)
          .select(col("source"),
            explode(col("matched")).as("phrase"))
        graft.ingest.IncrementalViews.maintainFreqSketches(
          batch.sparkSession, hits, mvDir, "source", "phrase", id)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .start()

  /** Continuous drift monitoring: each micro-batch folds its value
    * histogram into the stored view
    * ([[graft.ingest.IncrementalViews.maintainHistogram]] — additive, so
    * exactly-once rides the same batchId-in-generation protocol), and
    * [[graft.ingest.IncrementalViews.histogramDrift]] reads the live PSI
    * against a frozen reference snapshot at any time.
    */
  def histogramStream(updates: DataFrame, mvDir: String,
      checkpointDir: String, valCol: String, lo: Double, width: Double,
      nBuckets: Int): StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.ingest.IncrementalViews.maintainHistogram(
          batch.sparkSession, batch, mvDir, valCol, lo, width, nBuckets, id)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .start()

  def ingestStream(spark: SparkSession, landingDir: String, outDir: String,
      checkpointDir: String, table: String = "watch"): StreamingQuery = {
    val lines = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .text(landingDir)
    val parsed = Extract.parseRaw(lines)
    val curated = table match {
      case "commit"  => Extract.commits(parsed)
      case "create"  => Extract.creates(parsed)
      case "pr"      => Extract.prs(parsed)
      case "comment" => Extract.comments(parsed)
      case "watch"   => Extract.watches(parsed)
      case "fork"    => Extract.forks(parsed)
      case other => throw new IllegalArgumentException(
        s"unknown curated table '$other' — one of: commit, create, pr, " +
        "comment, watch, fork")
    }
    curated.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("date")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
