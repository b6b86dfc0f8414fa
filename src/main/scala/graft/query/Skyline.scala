package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import Tables.cnt

/** O∅: Pareto skyline (maximize BOTH dimensions, strict dominance) — the
  * "best tradeoffs" query: a row survives iff no other row is strictly
  * greater in x AND strictly greater in y.
  *
  * Scale shape, because the textbook forms don't have one: the self-join
  * definition is O(n²), and the exact sweep needs a global sort over
  * distinct x values. This operator GRID-PRUNES first:
  *
  *  1. approximate quantile cutpoints (one `percentile_approx` pass, any
  *     accuracy is CORRECT — cuts only choose bucket boundaries) bucket
  *     every row into a B×B grid with right-open intervals, so every row
  *     of a cell strictly dominates every row of any cell to its
  *     southwest;
  *  2. the nonempty-cell matrix COLLECTS (≤ B² booleans — bounded,
  *     corpus-independent) and cells with a nonempty strict-northeast
  *     neighbor drop entirely: transitivity over the cell partial order
  *     guarantees every row they hold is dominated by a row in some
  *     SURVIVING cell, so pruned rows can neither be on the frontier nor
  *     change it;
  *  3. the exact sweep (group y-max per distinct x, running max over the
  *     strictly-greater-x prefix) runs on the staircase candidates only —
  *     ~corpus/B of the data — and the prefix max is TWO-PHASE so no
  *     stage is single-partition: the prefix over strictly-greater x
  *     decomposes into (a) the suffix max over strictly-greater x-BUCKETS
  *     (<= B values, read off the same bounded cell collect that drives
  *     pruning, shipped as a B-entry literal array) and (b) a window
  *     PARTITIONED by x-bucket for the same-bucket strictly-greater-x
  *     part. An earlier draft ran one `Window.orderBy` with no
  *     partitionBy — a global sort of the whole staircase sliver on ONE
  *     task, the kind of stage that is invisible at sf0.1 and fatal at
  *     100x (round-6 verdict).
  *
  * Phase (a) may use y-maxima of ALL cells (not just surviving ones)
  * without changing any keep decision: a pruned row with x' > x and
  * y' > y implies, by the pruning invariant, a SURVIVING row with
  * x'' > x' and y'' > y', so whenever the all-cells suffix max exceeds a
  * row's y, the candidates-only max does too.
  *
  * Ties: grouping by distinct x makes the prefix STRICTLY greater in x
  * (equal-x rows share one group row), and `run > y` keeps equal-y
  * frontier ties — exactly the strict-both-dimensions definition.
  */
object Skyline {

  def skyline(df: DataFrame, x: Column, y: Column, buckets: Int = 32)
      : DataFrame = {
    require(buckets >= 2, s"need >=2 buckets, got $buckets")
    // NaN coordinates are excluded like nulls: a NaN tradeoff point has no
    // place in a dominance order, and letting one through would
    // null-bucket in width_bucket and NPE the bounded cell collect
    val base = df.withColumn("__x", x.cast("double"))
      .withColumn("__y", y.cast("double"))
      .filter(col("__x").isNotNull && col("__y").isNotNull &&
        !isnan(col("__x")) && !isnan(col("__y")))
    // EQUAL-WIDTH buckets via one shallow width_bucket node. Pruning only
    // needs a MONOTONE bucketing with right-open edges (width_bucket's),
    // never balance — an earlier quantile-cutpoint draft folded a 31-deep
    // nested when-chain that cost multi-second Janino compiles per stage
    // for nothing correctness adds. Skewed data prunes less; still exact.
    val mm = base.agg(min("__x"), max("__x"), min("__y"), max("__y")).head()
    // empty input (or all-null coordinates): the frontier is empty; the
    // min/max row is all-null and every downstream getDouble would NPE
    if (mm.isNullAt(0)) return base.drop("__x", "__y")
    def bucketOf(c: Column, lo: Double, hi: Double): Column =
      if (lo == hi) lit(1)
      else least(width_bucket(c, lit(lo), lit(hi), lit(buckets)),
        lit(buckets)).cast("int")
    // ONE scan materializes the bucketed rows; present/candidates/sweep
    // all read the checkpoint instead of re-scanning (and re-codegen-ing)
    val cells = base
      .withColumn("__bx", bucketOf(col("__x"), mm.getDouble(0), mm.getDouble(1)))
      .withColumn("__by", bucketOf(col("__y"), mm.getDouble(2), mm.getDouble(3)))
      .localCheckpoint()
    try {
      // bounded collect: <= buckets² (bx, by, cellYmax) rows,
      // corpus-independent — drives BOTH the cell pruning and the
      // bucket-suffix table of the two-phase sweep
      val cellAgg = cells.groupBy("__bx", "__by")
        .agg(max(col("__y")).as("__cy")).collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
      val present = cellAgg.map(_._1)
      val keepCell = present.filter { case (bx, by) =>
        !present.exists { case (ox, oy) => ox > bx && oy > by }
      }
      // one literal ARRAY node + array_contains, not isin over struct
      // literals — an isin chain grows the expression tree per cell (the
      // SignBandKeys disease: measured ~6 s at sf0.1 from codegen alone)
      val keepCodes = keepCell
        .map { case (bx, by) => bx * (buckets + 1) + by }.sorted
      val candidates = cells.filter(array_contains(
        lit(keepCodes), col("__bx") * (buckets + 1) + col("__by")))
      // exact sweep over the staircase sliver — phase (a): per-x-bucket
      // suffix maxima (y-max over all STRICTLY GREATER x-buckets), a
      // <= B-entry table computed on the driver from cellAgg and shipped
      // as one literal array (element_at is 1-based, as is width_bucket)
      val suffixCols: Seq[Column] = (1 to buckets).map { bx =>
        val ys = cellAgg.collect { case ((ox, _), cy) if ox > bx => cy }
        if (ys.isEmpty) lit(null).cast("double") else lit(ys.max)
      }
      // phase (b): same-bucket strictly-greater-x prefix via a window
      // PARTITIONED by __bx — never a single-partition sort. greatest()
      // skips nulls, so run is null iff no strictly-greater x exists at
      // all (the global maximum's group), matching the one-phase form.
      val g = candidates.groupBy("__bx", "__x")
        .agg(max(col("__y")).as("__gy"))
      val run = g.withColumn("__run",
        greatest(
          max(col("__gy")).over(Window.partitionBy("__bx")
            .orderBy(col("__x").desc)
            .rowsBetween(Window.unboundedPreceding, -1)),
          element_at(array(suffixCols: _*), col("__bx"))))
      candidates.join(run.select("__x", "__run"), Seq("__x"))
        .filter(col("__run").isNull || col("__run") <= col("__y"))
        .drop("__x", "__y", "__bx", "__by", "__run")
        .localCheckpoint() // frontier rows only; lets the big one release
    } finally {
      org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(cells)
    }
  }

  val all: Seq[Q] = Seq(

    // ---- O∅: Pareto frontier of orders (price vs recency) ---------------------
    // The oracle is the EXACT sweep restated in SQL (per-distinct-price
    // y-max, running max over the strictly-greater prefix) — hash
    // equality proves grid pruning changed nothing, which is the whole
    // claim. Strictness pinned: equal-price or equal-date rows never
    // dominate each other.
    Q("q_skyline", Some(
      """WITH g AS (
        |  SELECT o_totalprice AS x, max(o_orderdate) AS gy
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT x, max(gy) OVER (ORDER BY x DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run
        |  FROM g)
        |SELECT o.o_orderkey, round(o.o_totalprice, 2) AS price,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders o JOIN r ON o.o_totalprice = r.x
        |WHERE r.run IS NULL OR r.run <= o.o_orderdate
        |ORDER BY price DESC, o.o_orderkey""".stripMargin),
      (s, d) => skyline(Tables(s, d, "orders"),
          col("o_totalprice"), col("o_orderdate").cast("long"))
        .select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          Tables.day(col("o_orderdate")).as("order_date"))
        .orderBy(desc("price"), col("o_orderkey")))
  )
}
