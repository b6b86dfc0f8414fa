package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession

/** Dump the EXECUTED (post-AQE) plan for registry queries — the runtime
  * counterpart of [[PlanDump]]: runs each query through the noop sink
  * first, then prints `queryExecution.executedPlan`, so AQE decisions
  * (ReusedExchange, AQEShuffleRead, join-strategy rewrites) are visible.
  * The static dump shows duplicated subtrees that runtime exchange reuse
  * may unify; this is the tool that shows whether it did (guide §7.2:
  * "the SQL tab shows the final re-optimised plan after the query has
  * run" — this is that view, as text).
  *
  * Usage: ExecutedPlanDump <sfDir> <outDir> <names_csv>
  */
object ExecutedPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExecutedPlanDump <sfDir> <outDir> <names_csv>")
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    Files.createDirectories(outDir)
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
    spark.sparkContext.setLogLevel("ERROR")

    // the noop save runs its OWN QueryExecution (dumping the DataFrame's
    // queryExecution after the save would show isFinalPlan=false) — a
    // listener captures the execution that actually ran
    val lastPlan = new java.util.concurrent.atomic.AtomicReference[String]("")
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          lastPlan.set(qe.executedPlan.toString)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    val want = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
    val known = SparkEntry.registry.map(_.name)
    val unknown = want -- known.toSet
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    for (n <- known.filter(want)) {
      spark.catalog.clearCache()
      System.gc()
      val txt =
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          org.apache.spark.graft.CoreBridge
            .drainListenerBus(spark.sparkContext)
          lastPlan.get()
        } catch { case scala.util.control.NonFatal(e) => s"FAILED: ${e}" }
      Files.write(outDir.resolve(s"$n.txt"), txt.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      println(s"[execplandump] $n -> ${outDir.resolve(s"$n.txt")}")
    }
    spark.stop()
  }
}
