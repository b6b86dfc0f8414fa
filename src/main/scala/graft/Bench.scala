package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is fully materialized through the noop
  * sink (computes every output column; `.count()` would let Catalyst prune
  * the plan to a row count and under-measure).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // task-level byte counters: shuffle volume is the number that predicts
    // 100 TB behavior (wall-clock on a shared 32-core box mostly measures
    // ambient load). Deltas are read per query after draining the async
    // listener bus, so each query's bytes are exactly its own.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val inputBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            shuffleBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            inputBytes.addAndGet(m.inputMetrics.bytesRead)
          }
        }
      })

    def runOnce(name: String): (Double, Long, Long) = {
      val fn = SparkEntry.queries(name)
      // queries that persist() intermediates would otherwise hand their
      // cache to the second run and min-of-two would report warm-cache time
      spark.catalog.clearCache()
      // localCheckpoint blocks are NOT released by clearCache — they live
      // until their RDD is garbage-collected and the ContextCleaner drops
      // the blocks. Across 100+ queries the leaked blocks fill the unified
      // memory pool and the later (shuffle-heavy) queries run against
      // starved execution memory: measured 2.4 s -> 25 s for
      // q_dedup_resolve at position ~90 of the run. An explicit GC between
      // queries keeps each measurement independent of its predecessors.
      System.gc()
      org.apache.spark.graft.CoreBridge.drainListenerBus(spark.sparkContext)
      val sh0 = shuffleBytes.get(); val in0 = inputBytes.get()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return (-1.0, 0L, 0L)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.CoreBridge.drainListenerBus(spark.sparkContext)
      (dt, shuffleBytes.get() - sh0, inputBytes.get() - in0)
    }

    // best-of-N (default 2): the box is shared with the driver harness and
    // ambient load spikes swing single runs 2-3x; min-of-N reports the
    // query's cost, not the neighbor's. (Plan construction re-runs too —
    // cached plans are not reused because each call rebuilds the DataFrame.)
    // Byte counters are deterministic, so the last run's are reported
    // (first-run footer/cache warmup can differ). SPARK_GRAFT_RUNS=3 is the
    // solo-pinning mode BASELINE.md records.
    val nRuns = sys.env.get("SPARK_GRAFT_RUNS").map(_.trim).filter(_.nonEmpty)
      .map(s => scala.util.Try(s.toInt).getOrElse(
        sys.error(s"SPARK_GRAFT_RUNS must be a positive int, got '$s'")))
      .getOrElse(2)
    require(nRuns >= 1, s"SPARK_GRAFT_RUNS must be >= 1, got $nRuns")
    def run(name: String): (Double, Long, Long) = {
      val a = runOnce(name)
      if (a._1 < 0) return a
      (2 to nRuns).foldLeft(a) { (best, _) =>
        val b = runOnce(name)
        if (b._1 < 0) best else (math.min(best._1, b._1), b._2, b._3)
      }
    }

    // untimed warmup: JIT + classloading + parquet footer caches for every
    // table (otherwise the first query touching each table absorbs its
    // footer-read + codec-init cost and the per-query numbers skew)
    for (t <- Seq("lineitem", "orders", "customer", "supplier", "part",
        "nation", "region", "events", "documents", "embeddings"))
      try graft.query.Tables(spark, sfDir, t).count()
      catch { case _: Throwable => () }

    // SPARK_GRAFT_ONLY=a,b,c times a subset in isolation — the regression-
    // pinning loop (memory: isolated numbers beat in-suite numbers; compare
    // like with like)
    val names = sys.env.get("SPARK_GRAFT_ONLY").filter(_.nonEmpty) match {
      case Some(csv) =>
        val want = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val known = SparkEntry.registry.map(_.name)
        val unknown = want -- known.toSet
        // a typo'd name must fail loudly — silently dropping it records a
        // truncated (or 0-query) bench as a valid regression-pin number
        require(unknown.isEmpty,
          s"SPARK_GRAFT_ONLY names not in the registry: ${unknown.mkString(", ")}")
        known.filter(want)
      case None => SparkEntry.registry.map(_.name)
    }
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, (v, sh, in)) =>
      f""""$k":{"sec":$v,"shuffle_mb":${sh / 1e6}%.2f,"input_mb":${in / 1e6}%.2f}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val totalShuffleMb = results.map(_._2._2).sum / 1e6
    // Full per-query detail first (its own line; too long for the harness's
    // stdout tail window, but still readable by humans in the captured tail).
    println(s"""{"metric":"detail","queries":$qs,"sf":"$sfDir"}""")
    // The FINAL JSON line must fit — with sbt's trailing [success] line —
    // inside the harness's last-2000-chars capture, or it records
    // parsed:null (observed rounds 1-2 with the full 86-query line). Keep it
    // compact: total + the slowest queries only, 3-decimal values.
    val slow = results.filter(_._2._1 >= 0).sortBy(-_._2._1).take(25)
    val qsTop = slow.map { case (k, (v, _, _)) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${names.size},"shuffle_mb":$totalShuffleMb%.1f,"queries":$qsTop,"sf":"$sfDir"}""")
    spark.stop()
  }
}
