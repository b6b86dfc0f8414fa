package graft

import org.apache.spark.sql.SparkSession

/** One shared local session per suite (SURVEY.md §5.2). */
trait SparkFixture {
  lazy val spark: SparkSession = SparkFixture.session
  def sf(name: String) = s"/root/testdata/$name"
}

object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
