package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S24: physical storage audit — "which column owns the bytes" — from
  * parquet FOOTERS only, never data pages. At 100 TB the question "why
  * did this table grow 3x" is answered by per-column compressed /
  * uncompressed totals (a blown-up column shows immediately, and the
  * compression ratio flags encoding regressions, e.g. a string column
  * that stopped dictionary-encoding); reading the data itself to answer
  * it would cost the whole scan this audit avoids.
  *
  * Distributed the same way as the quarantine sweep and the z-order stats
  * pass: one task per footer batch, session Hadoop conf shipped to tasks
  * (S3A credentials live there), O(files) footer reads, O(columns) rows
  * out. The numbers are the footer's own thrift fields
  * (`total_compressed_size` / `total_uncompressed_size` / value counts),
  * so any parquet reader — DuckDB's `parquet_metadata()` included —
  * reproduces them byte-for-byte, which is exactly how the oracle checks
  * this operator.
  */
object StorageAudit {

  /** Per-column (column, compressed_bytes, uncompressed_bytes, n_values)
    * aggregated over every row group of every file in `files`.
    */
  def columnProfile(spark: SparkSession, files: Seq[String]): DataFrame = {
    require(files.nonEmpty, "columnProfile needs >= 1 file")
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val confEntries = spark.sparkContext.hadoopConfiguration.iterator()
      .asScala.map(e => (e.getKey, e.getValue)).toArray
    spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 64)))
      .flatMap { p =>
        import scala.jdk.CollectionConverters._
        val conf = new org.apache.hadoop.conf.Configuration()
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          for (b <- r.getFooter.getBlocks.asScala.toSeq;
               c <- b.getColumns.asScala.toSeq)
            yield (c.getPath.toDotString,
              c.getTotalSize, c.getTotalUncompressedSize, c.getValueCount)
        } finally r.close()
      }
      .toDF("column", "comp", "unc", "nv")
      .groupBy("column")
      .agg(org.apache.spark.sql.functions.sum("comp").as("compressed_bytes"),
        org.apache.spark.sql.functions.sum("unc").as("uncompressed_bytes"),
        org.apache.spark.sql.functions.sum("nv").as("n_values"))
  }
}
