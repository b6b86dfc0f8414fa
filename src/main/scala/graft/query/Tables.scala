package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata tables (TESTDATA.md) + shared
  * oracle-safe expression helpers.
  */
object Tables {

  /** Read a testdata table, normalizing every time column to a plain
    * session-TZ `TimestampType` regardless of how the driver encoded it.
    * Observed encodings across testdata drops:
    *   - `events.ts` as parquet TIMESTAMP(NANOS): only readable with
    *     `nanosAsLong=true`, arriving as `LongType` nanos → converted via
    *     `timestamp_micros(ts div 1000)`;
    *   - `timestamp[us]` with isAdjustedToUTC=false: Spark 4 infers
    *     `TIMESTAMP_NTZ` → cast to `TimestampType` (identical wall-clock
    *     under the UTC session TZ every entry point sets, and what all
    *     downstream operators and the DuckDB oracle expect).
    *
    * NOTE the nanosAsLong flag is SESSION-wide and stays set: any later
    * read of a nanos-timestamp parquet in the same session gets LongType
    * instead of the default analysis error. Engine entry points
    * (Verify/Bench/tests) set it at session build anyway.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(s"$dir/events.parquet")
        df.schema("ts").dataType match {
          case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case _ => df
        }
      case _ => spark.read.parquet(s"$dir/$name.parquet")
    }
    val ntzFields = raw.schema.fields.filter(_.dataType == TimestampNTZType)
    // NTZ -> TimestampType preserves the wall-clock ONLY when the session
    // TZ is UTC (which every engine entry point sets); in any other TZ the
    // cast shifts the epoch under later timestamp arithmetic — fail loudly
    // instead of returning silently skewed data to an ad-hoc session
    if (ntzFields.nonEmpty) {
      val tz = spark.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"$name carries TIMESTAMP_NTZ columns; Tables normalizes them to " +
          s"TimestampType assuming a UTC session, but timeZone=$tz")
    }
    ntzFields.foldLeft(raw) {
      (df, f) => df.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  // ---- oracle-parity helpers ------------------------------------------
  // The driver hash-compares Spark output against DuckDB. Rules of the road
  // (SURVEY.md §7.5): timestamps leave the engine as strings; doubles leave
  // either bit-identical (decimal-cast sums, int ratios) or rounded.

  /** Timestamp → 'yyyy-MM-dd HH:mm:ss' (DuckDB: strftime '%Y-%m-%d %H:%M:%S'). */
  def tsSec(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Timestamp → 'yyyy-MM-dd' (DuckDB: strftime '%Y-%m-%d'). */
  def day(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Exact money sum: doubles carrying 2-decimal values are summed as
    * DECIMAL(18,2) so the result is order-independent and bit-identical to
    * DuckDB's `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. A plain
    * double sum differs across engines in the last ulps (summation order).
    */
  def sumMoney(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Same for 4-decimal products like extendedprice*(1-discount). */
  def sumMoney4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  def cnt: Column = count(lit(1))
}
