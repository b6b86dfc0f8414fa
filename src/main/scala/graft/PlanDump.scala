package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registry queries to files.
  *
  * Usage: PlanDump <sfDir> <outDir> [names_csv]
  *   writes <outDir>/<name>.txt per query (the optimization-round evidence
  *   the judge diffs against the code). Query-construction side effects
  *   (demo store builds, persisted intermediates) run as in the bench; the
  *   dumped plan is the one the noop sink would execute.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <outDir> [names_csv]")
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

    val names: Seq[String] = if (args.length >= 3 && args(2).nonEmpty) {
      val want = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
      val known = SparkEntry.registry.map(_.name)
      val unknown = want -- known.toSet
      require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
      known.filter(want)
    } else SparkEntry.registry.map(_.name)

    for (n <- names) {
      spark.catalog.clearCache()
      System.gc()
      val txt =
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"FAILED: ${e}" }
      Files.write(outDir.resolve(s"$n.txt"),
        txt.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      println(s"[plandump] $n -> ${outDir.resolve(s"$n.txt")}")
    }
    spark.stop()
  }
}
