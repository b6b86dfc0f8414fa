package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, element_at, lit, pmod, typedLit}

/** Generation layout shared by the STORED-INDEX families (BM25 postings,
  * IVF assignments, IVF-PQ code tables) — the mechanism that keeps their
  * idempotent `appends/batch=<id>` maintenance bounded. Without it every
  * streaming micro-batch adds a directory forever: reads degrade into a
  * thousand-leg union (file listing + per-leg footer reads dominate), the
  * exact failure the reference's hourly cadence would hit within weeks
  * (gha.ipynb's 9,504 hourly files is the cautionary corpus;
  * preprocess.py:277-280 re-serves hourly).
  *
  * Layout under an index root `dir`:
  *  - flat legacy base (index-specific subdirs, e.g. `postings/`) — the
  *    pre-compaction layout, still written by the builders; "generation -1"
  *  - `g<N>/<subdirs>` + `_max_folded_batch` + `_SUCCESS` — compacted
  *    generation N; `_SUCCESS` is the COMMIT POINT (a generation with no
  *    marker is a dead compactor's leftovers and is never read)
  *  - `appends/batch=<id>/...` — the idempotent batch-keyed append dirs
  *
  * Correctness NEVER depends on deletion: a reader resolves the newest
  * committed generation, reads its `_max_folded_batch` watermark, and
  * unions only append batches ABOVE it — so an append dir that was folded
  * but not yet GC'd (or was re-created by an at-least-once replay of a
  * folded batch) is simply filtered out. Deletion is pure garbage
  * collection, with one full compaction cycle of grace: committing g<N>
  * deletes only the append batches g<N-1> had already folded and the
  * generations older than N-1, so any reader that resolved its file list
  * against the PREVIOUS generation still finds every file it planned.
  * (Same retention discipline as [[TableStore.compact]]'s
  * retainGenerations=2 default, specialized to the index stores.)
  *
  * Single-compactor contract: compaction is invoked by the index's one
  * maintainer (the streaming foreachBatch thread between batches, or an
  * operator's scheduled job) — the multi-writer claim protocol of the
  * table store is deliberately NOT replicated here. Concurrent APPENDS
  * race compaction safely (a batch landing after the compactor pinned its
  * fold list stays above the new watermark and is unioned by readers).
  */
object IndexGenerations {

  /** The resolved base of an index: `gen` = -1 for the legacy flat layout
    * (paths are the index's flat subdirs), else the newest committed
    * generation (paths live under `dir/g<gen>/`); `maxFolded` = the append
    * watermark — batches <= maxFolded are IN the base.
    */
  final case class Base(gen: Int, maxFolded: Long) {
    /** Path of an index subdir (e.g. "postings") under this base. */
    def sub(dir: String, name: String): String =
      if (gen < 0) s"$dir/$name" else s"$dir/g$gen/$name"
  }

  private[store] def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val GenDir = "g(\\d+)".r
  private val BatchDir = "batch=(\\d+)".r

  /** Newest committed generation, or the flat base if none exists. */
  def current(spark: SparkSession, dir: String): Base = {
    val f = fsFor(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) return Base(-1, -1L)
    val gens = f.listStatus(root).collect {
      case s if s.isDirectory => s.getPath.getName match {
        case GenDir(n) if f.exists(new Path(s.getPath, "_SUCCESS")) => n.toInt
        case _ => -1
      }
    }.filter(_ >= 0)
    if (gens.isEmpty) Base(-1, -1L)
    else {
      val g = gens.max
      Base(g, readWatermark(f, new Path(s"$dir/g$g")))
    }
  }

  /** COMMITTED append batch ids + paths under `dir/<sub>` (e.g.
    * "appends"), ascending by id. Missing dir = no batches. A batch dir
    * without the writer's job-level `_SUCCESS` marker is invisible: it is
    * either mid-write (a reader unioning it would fail schema inference on
    * an empty dir, or silently see a PARTIAL batch between task commits)
    * or a crashed writer's debris that the at-least-once replay will
    * overwrite — in both cases correctness says skip it. The appenders
    * write through the default committer, which emits `_SUCCESS` at job
    * commit, so visibility is atomic at that marker (the same commit-point
    * discipline as the generation dirs). The compactor reads batches
    * through this listing too, so a mid-write batch is never folded.
    */
  def batches(spark: SparkSession, dir: String,
      sub: String): Seq[(Long, String)] = {
    val f = fsFor(spark, dir)
    val p = new Path(s"$dir/$sub")
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.collect {
      case s if s.isDirectory => s.getPath.getName match {
        case BatchDir(id) if f.exists(new Path(s.getPath, "_SUCCESS")) =>
          Some(id.toLong -> s.getPath.toString)
        case _ => None
      }
    }.flatten.sortBy(_._1)
  }

  /** The batches a reader on `base` must union: ids above the fold
    * watermark (folded-but-not-yet-GC'd dirs and replay-resurrected
    * folded batches are both correctly excluded here).
    */
  def liveBatches(spark: SparkSession, dir: String, sub: String,
      base: Base): Seq[String] =
    batches(spark, dir, sub).collect {
      case (id, p) if id > base.maxFolded => p
    }

  /** Commit generation `gen`: persist the fold watermark, then the
    * `_SUCCESS` marker (the atomic visibility point — readers that list
    * before the marker lands keep resolving the previous base).
    */
  def commit(spark: SparkSession, dir: String, gen: Int,
      maxFolded: Long): Unit = {
    val f = fsFor(spark, dir)
    val g = new Path(s"$dir/g$gen")
    val wm = f.create(new Path(g, "_max_folded_batch"), true)
    try wm.write(maxFolded.toString.getBytes("UTF-8")) finally wm.close()
    f.create(new Path(g, "_SUCCESS"), true).close()
  }

  private def readWatermark(f: FileSystem, genDir: Path): Long = {
    val p = new Path(genDir, "_max_folded_batch")
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try {
        val bytes = new Array[Byte](64)
        val n = in.read(bytes)
        new String(bytes, 0, math.max(n, 0), "UTF-8").trim.toLong
      } finally in.close()
    }
  }

  /** Bounded-task fold layout shared by the compactors: repartition `df`
    * so every `partCol` group (bucket / cell) lands whole in one task —
    * each partition dir collapses to one file, the point of a fold —
    * UNLESS the group exceeds `maxRows`, in which case it splits across
    * `ceil(rows / maxRows)` sub-tasks keyed by `subKey`. Without the
    * bound, `repartition(col(partCol))` puts 1/nBuckets of the WHOLE
    * postings set in one task: at 100 TB with the default 64 buckets that
    * is ~1.5 TB of fold input for one executor — an OOM/spill cliff the
    * build scaladoc's "make nBuckets large" note only avoids if the caller
    * read it. Rows proxy bytes here because postings rows are fixed-width
    * (~tens of bytes); the default bound keeps a task's input in the
    * low-GB range. Cost: one extra counting pass over the fold input
    * (partial-agg, group-count collect bounded by the partition-value
    * cardinality), paid only at compaction cadence.
    */
  def boundedFold(df: DataFrame, partCol: String, subKey: Column,
      maxRows: Long = 64L * 1024 * 1024): DataFrame = {
    require(maxRows >= 1, s"maxRows must be >= 1, got $maxRows")
    val counts = df.groupBy(partCol).count().collect()
      .map(r => String.valueOf(r.get(0)) ->
        math.max(1L, (r.getLong(1) + maxRows - 1) / maxRows)).toMap
    if (counts.valuesIterator.forall(_ == 1L)) df.repartition(col(partCol))
    else {
      val fat = counts.filter(_._2 > 1L)
      System.err.println(s"[graft] boundedFold: ${fat.size} $partCol " +
        s"group(s) exceed $maxRows rows (max split ${fat.values.max}); " +
        "splitting into sub-files — consider a larger bucket modulus at " +
        s"rebuild: ${fat.keys.toSeq.sorted.take(8).mkString(", ")}")
      // string-keyed so int buckets and long cells share one literal form;
      // sub-split keys come from subKey (a hash varying WITHIN a group —
      // the group value itself is constant mod the bucket modulus)
      val splits = coalesce(element_at(typedLit(counts),
        col(partCol).cast("string")), lit(1L))
      // EXPLICIT partition count: without it AQE coalesces the (small at
      // test scale, but also possible mid-range) shuffle back into few
      // partitions and re-merges the very sub-groups the split created.
      // 2x the combo count keeps hash-collision double-loading rare; the
      // bound is then maxRows x small-constant, never bucket-sized.
      val combos = math.min(counts.valuesIterator.sum, 32768L).toInt
      val nParts = math.max(
        df.sparkSession.sparkContext.defaultParallelism, 2 * combos)
      df.repartition(nParts, col(partCol), pmod(subKey, splits))
    }
  }

  /** Garbage-collect after committing generation `newGen` over previous
    * base `prev`: drop append batches the PREVIOUS base had already
    * folded (ids <= prev.maxFolded) from every append subdir, generations
    * older than the previous, and — once a committed generation stands
    * between them and the head — the legacy flat subdirs. One-cycle grace
    * for in-flight readers, per the object contract.
    */
  def gc(spark: SparkSession, dir: String, newGen: Int, prev: Base,
      appendSubs: Seq[String], flatSubs: Seq[String]): Unit = {
    val f = fsFor(spark, dir)
    appendSubs.foreach { sub =>
      batches(spark, dir, sub).foreach { case (id, p) =>
        if (id <= prev.maxFolded) f.delete(new Path(p), true)
      }
    }
    val root = new Path(dir)
    if (f.exists(root)) f.listStatus(root).foreach { s =>
      if (s.isDirectory) s.getPath.getName match {
        case GenDir(n) if n.toInt < newGen - 1 => f.delete(s.getPath, true)
        case _ => ()
      }
    }
    if (prev.gen >= 0) // flat base is >= 2 generations old: dead bytes
      flatSubs.foreach(sub => f.delete(new Path(s"$dir/$sub"), true))
  }
}
