package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping — the
  * Spark-native analog of Delta's `OPTIMIZE ... ZORDER BY (x, y)`
  * (the reference's Delta store exposes the same knob through
  * `optimize.compact()`, `/root/reference/preprocess.py:199-206`).
  *
  * Why it matters at 100 TB: a table sorted by ONE column skips scans
  * filtered on that column only. Interleaving the bits of SEVERAL
  * columns' quantile-bucket ranks gives every participating column
  * locality: rows close in z-value are close in every dimension, so
  * Parquet file/row-group min-max stats become tight hyper-rectangles and
  * a range predicate on ANY of the z-columns prunes most files
  * ([[TableStore.readPruned]]) and row groups (Spark's built-in parquet
  * predicate pushdown) without reading data.
  *
  * Bucketing is QUANTILE-based (one `approxQuantile` pass over all
  * z-columns), not min-max-uniform: a skewed column (e.g. repo activity,
  * power-law) would otherwise collapse almost all rows into a few
  * buckets and the interleave would carry no information for it.
  */
object ZOrder {

  /** Max total z-bits: the z-value is built in a signed long. */
  private val MaxTotalBits = 62

  /** Per-column quantile boundaries for `2^bits` buckets, computed in one
    * pass over all columns (Greenwald-Khanna sketch underneath — sampled,
    * driver-resident output of `(2^bits - 1) × cols` doubles, scale-safe).
    */
  def boundaries(df: DataFrame, cols: Seq[String], bits: Int): Seq[Array[Double]] = {
    require(cols.nonEmpty, "z-order needs ≥1 column")
    require(bits >= 1 && bits * cols.size <= MaxTotalBits,
      s"bits=$bits × ${cols.size} cols exceeds $MaxTotalBits z-bits")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    df.stat.approxQuantile(cols.toArray, probs, 0.01).toSeq
  }

  /** Bucket rank of `c` given sorted quantile `bounds`: the number of
    * boundaries ≤ value — one array HOF over a literal, no shuffle.
    * Nulls rank 0 (lowest bucket) so they cluster together.
    */
  private def bucketOf(c: Column, bounds: Array[Double]): Column = {
    val arr = typedLit(bounds.toSeq)
    coalesce(
      size(filter(arr, b => c.cast("double") >= b)).cast("long"),
      lit(0L))
  }

  /** Morton interleave of the columns' bucket ranks: bit j of column i
    * lands at z-bit `j * ncols + i` — pure shift/and/or built-ins, fully
    * codegen'd.
    */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value column for `cols` over `df`'s value distribution.
    * `bits` buckets-per-column = `2^bits`; default 6 (64 buckets/column)
    * keeps the bucketing expression small while giving file-grain
    * selectivity far below typical file counts per partition.
    */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 6): Column = {
    val bs = boundaries(df, cols, bits)
    interleave(cols.zip(bs).map { case (c, b) => bucketOf(col(c), b) }, bits)
  }
}
