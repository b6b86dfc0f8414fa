package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: per-query job breakdown — construction vs execution wall
  * time plus every Spark job's wall time, 3 repeats in one JVM. Usage:
  * DevJobProbe <sfDir> <query> [query...]. Not part of the driver
  * contract.
  */
object DevJobProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DevJobProbe <sfDir> <query>...")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(e.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(starts.get(e.jobId)).foreach(t0 =>
            jobs.put(e.jobId, System.nanoTime() - t0))
      })
    for (t <- Seq("lineitem", "orders", "customer", "supplier", "part",
        "nation", "region", "events", "documents", "embeddings"))
      try graft.query.Tables(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    for (q <- args.drop(1); r <- 1 to 3) {
      spark.catalog.clearCache()
      System.gc()
      org.apache.spark.graft.CoreBridge.drainListenerBus(spark.sparkContext)
      jobs.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      org.apache.spark.graft.CoreBridge.drainListenerBus(spark.sparkContext)
      val sorted = jobs.entrySet().toArray
        .map(_.asInstanceOf[java.util.Map.Entry[Int, Long]])
        .sortBy(_.getKey)
      println(f"$q run$r construct=${(t1 - t0) / 1e9}%.3f execute=${(t2 - t1) / 1e9}%.3f " +
        f"jobs=${sorted.length} " +
        sorted.map(e => f"${e.getValue / 1e9}%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
