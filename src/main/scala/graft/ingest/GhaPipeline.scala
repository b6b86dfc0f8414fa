package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.TableStore
import graft.time.Increments

/** The production flow, end to end (SURVEY.md §3.1): NDJSON hourly files →
  * six curated date-partitioned tables → compaction → the two analytics
  * result tables (`/root/reference/preprocess.py:247-266`).
  *
  * Execution shape vs the reference: one declarative read replaces the
  * manual `client.map` fan-out (file-per-task falls out of gzip
  * unsplittability), the six table writes are six narrow jobs off one
  * persisted parse, barriers become job boundaries, and the Prefect layer
  * is this thin driver object.
  */
object GhaPipeline {

  /** Ingest a batch of NDJSON files into the curated store. */
  def ingest(spark: SparkSession, paths: Seq[String], storeDir: String): Unit = {
    val (raw, tables) = Ingest.extractAll(spark, paths)
    try tables.foreach { case (name, df) =>
      TableStore.append(df, s"$storeDir/$name")
    } finally raw.unpersist()
  }

  /** Hourly maintenance: compact + vacuum every curated table
    * (`preprocess.py:199-206`).
    */
  def compactAll(spark: SparkSession, storeDir: String): Unit =
    graft.schema.GhaSchemas.tableNames.foreach { t =>
      TableStore.compact(spark, s"$storeDir/$t",
        Some(graft.schema.GhaSchemas.curated(t)))
    }

  /** The `query_data` analytics (`preprocess.py:209-244`), parameterized by
    * keyword (reference hardcodes " dask"). Returns (commits, comments)
    * result frames; popular = repos with more than `minWatches` watchers.
    */
  def queryData(spark: SparkSession, storeDir: String,
      keyword: String = " dask", minWatches: Long = 5)
      : (DataFrame, DataFrame) = {
    import graft.schema.GhaSchemas.curated
    val watch = TableStore.read(spark, s"$storeDir/watch", curated("watch"))
    val commit = TableStore.read(spark, s"$storeDir/commit", curated("commit"))
    val comment =
      TableStore.read(spark, s"$storeDir/comment", curated("comment"))

    // repos = watches.repo.value_counts(); repos[repos > 5]  (215-216)
    val repos = watch.groupBy("repo").agg(count(lit(1)).as("count"))
      .filter(col("count") > minWatches)

    // commits mentioning the keyword in popular non-self repos (218-230)
    val commitsOut = commit
      .filter(!col("username").contains("bot"))
      .join(broadcast(repos), Seq("repo"))
      .filter(lower(col("message")).contains(keyword))
      .select("username", "repo", "message", "count")
      .filter(!col("repo").startsWith(keyword.trim + "/"))
      .orderBy(desc("count"), asc("username"), asc("message"))

    // comments mentioning the keyword (233-244)
    val commentsOut = comment
      .join(broadcast(repos), Seq("repo"))
      .filter(lower(col("comment")).contains(keyword))
      .select("username", "repo", "comment", "count")
      .filter(!col("repo").startsWith(keyword.trim + "/"))
      .orderBy(desc("count"), asc("username"), asc("comment"))

    (commitsOut, commentsOut)
  }

  /** Full workflow parity (`preprocess.py:247-266`): ingest → compact →
    * query → overwrite result tables.
    */
  def workflow(spark: SparkSession, paths: Seq[String], storeDir: String,
      keyword: String = " dask"): Unit = {
    ingest(spark, paths, storeDir)
    compactAll(spark, storeDir)
    val (commits, comments) = queryData(spark, storeDir, keyword)
    TableStore.overwrite(commits, s"$storeDir/results/commits")
    TableStore.overwrite(comments, s"$storeDir/results/comments")
  }

  /** The self-driving hourly run (`workflow(start=None, stop=None)` parity,
    * `preprocess.py:178-196, 247-266`): derive the range from the store's
    * own watermark, ingest only the landing files inside it, then compact +
    * query. Returns the ingested paths (empty when already caught up).
    *
    * Watermark source is the `comment` table, matching the reference's
    * `parse_start_stop` reading the comment tx log (`preprocess.py:181`).
    * File naming follows GH Archive: `YYYY-MM-DD-H.json` (hour unpadded).
    */
  def incrementalRun(spark: SparkSession, landingDir: String,
      storeDir: String, now: java.time.Instant,
      backfillStart: java.time.Instant,
      keyword: String = " dask"): Seq[String] = {
    val wm = Increments.watermark(spark, s"$storeDir/comment")
      .map(_.toInstant)
    val (start, stop) = Increments.nextRange(wm, now, backfillStart)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd-").withZone(java.time.ZoneOffset.UTC)
    val hours = Iterator.iterate(start)(_.plusSeconds(3600))
      .takeWhile(!_.isAfter(stop))
    val paths = hours.map { h =>
      val hh = h.atZone(java.time.ZoneOffset.UTC).getHour
      s"$landingDir/${fmt.format(h)}$hh.json"
    }.filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      .toSeq
    if (paths.nonEmpty) workflow(spark, paths, storeDir, keyword)
    paths
  }
}
