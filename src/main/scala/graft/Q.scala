package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle twin run by the
  * driver on the same parquet tables. `oracle = None` downgrades the
  * driver's check to rows-only (used for approx/hash-based operators whose
  * exact output is engine-defined but deterministic).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
