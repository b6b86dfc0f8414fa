package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Date-partitioned Parquet table store (S4/S6/S7/S8/S9 in SURVEY.md §2.1).
  *
  * The reference stores curated tables in Delta Lake — append per hourly
  * batch, partitioned by `date`, with periodic `optimize.compact()` +
  * `vacuum()` (`/root/reference/preprocess.py:165-206`). No Delta jars ship
  * with this Spark, so the same operational surface is provided over plain
  * partitioned Parquet:
  *
  *  - append/overwrite writers partitioned by `date` — partition pruning on
  *    any date-bounded query is free (`PartitioningAwareFileIndex`);
  *  - compaction = read → `repartition(n)` → write-to-temp → atomic directory
  *    swap (the Spark-native analog of Delta OPTIMIZE);
  *  - vacuum = removal of the swapped-out generation.
  *
  * Single-writer assumption: the reference serves exactly one flow instance
  * (`preprocess.py:277-280`), so a tx log is not needed for correctness; the
  * swap is a rename, which is atomic on HDFS/local FS. At 100 TB the
  * interesting property is that compaction is per-partition parallel and
  * never rewrites partitions that aren't listed.
  */
object TableStore {

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** S6: append one batch, partitioned by `date` (`preprocess.py:165-175`). */
  def append(df: DataFrame, dir: String): Unit =
    df.write.mode("append").partitionBy("date").parquet(dir)

  /** Idempotent per-partition overwrite — the engine's exactly-once story
    * for hourly re-runs (replaces Delta ACID append + retries=10,
    * `preprocess.py:261`): re-writing the same hour's partitions replaces
    * rather than duplicates them.
    */
  def upsertPartitions(spark: SparkSession, df: DataFrame, dir: String): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy("date").parquet(dir)
  }

  /** S7: full-table overwrite for derived result tables
    * (`preprocess.py:226-230, 240-244` — the reference does rm+mkdir+write;
    * Spark's overwrite mode is the atomic-enough equivalent).
    */
  def overwrite(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Schema-declared read: required for tables that may hold zero rows (an
    * ingested batch with no events of some type writes only `_SUCCESS`, so
    * there is no footer to infer from), and the right default everywhere —
    * the curated schemas of `GhaSchemas` are the contract, not the files.
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(dir)

  /** Parquet data files under a table dir (recursive, excludes _SUCCESS). */
  def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else {
      val it = f.listFiles(p, true)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet"))
          out += s.getPath.toString
      }
      out.toSeq
    }
  }

  /** S8+S9: compact a date-partitioned table to one file per partition, then
    * vacuum the superseded generation (`preprocess.py:199-206`). Returns
    * (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String,
      schema: Option[StructType] = None): (Long, Long) = {
    val before = dataFiles(spark, dir).size.toLong
    val tmp = dir.stripSuffix("/") + ".compact.tmp"
    val old = dir.stripSuffix("/") + ".compact.old"
    val reader = schema.fold(spark.read)(s => spark.read.schema(s))
    val df = reader.parquet(dir)
    // hash-repartition on the partition column: every date lands wholly in
    // one task, so partitionBy("date") emits exactly one file per date.
    // Parallelism scales with #dates, and untouched data never moves twice.
    df.repartition(df.col("date"))
      .write.mode("overwrite").partitionBy("date").parquet(tmp)
    val f = fs(spark, dir)
    f.rename(new Path(dir), new Path(old))          // swap out
    f.rename(new Path(tmp), new Path(dir))          // swap in (atomic visible)
    f.delete(new Path(old), true)                   // vacuum, retention=0
    (before, dataFiles(spark, dir).size.toLong)
  }
}
