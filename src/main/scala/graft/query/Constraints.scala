package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Q
import Tables.cnt

/** Declarative data-quality constraint audit (the Deequ / dbt-test shape):
  * callers declare WHAT must hold — column not null, value in range, key
  * unique, foreign key resolves — and the audit compiles the checks into
  * the minimum number of scans and returns one row per constraint with its
  * violation count. The step a production pipeline runs between ingest and
  * publish; the reference's notebook eyeballs these properties manually
  * (bad-record counts, type filters), this makes them a queryable operator.
  *
  * Scale shape: all row-local checks against one table (not-null, range)
  * FUSE into a single aggregate over ONE scan — each check is a
  * `sum(when(violated, 1))` column, map-side partials, no shuffle, and the
  * result is one row regardless of table size. Uniqueness is the one
  * exact-distinct hash shuffle on the key (`count(*) − count(distinct
  * key)` = excess rows). A foreign key is a left anti-join against the
  * parent's distinct keys — the parent side reduces to its key column and
  * broadcasts when small (dimension tables), shuffles otherwise; either
  * way only keys move, never rows. The audit output is O(checks) rows —
  * nothing corpus-sized ever leaves the executors.
  */
object Constraints {

  sealed trait Check { def name: String }

  /** `col IS NULL` is a violation. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null:$col"
  }

  /** Non-null value outside [lo, hi] is a violation (NULLs are
    * [[NotNull]]'s business — a range check double-counting nulls would
    * make the two checks non-additive).
    */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"range:$col[$lo,$hi]"
  }

  /** Duplicate key tuples: violation count = rows in excess of one per
    * distinct key (0 on a unique column).
    */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString(",")}"
  }

  /** Child rows whose non-null `col` has no match in `parentCol` of the
    * parent table (orphans). NULL children are not orphans (SQL FK
    * semantics — nullable FKs are legal).
    */
  final case class ForeignKey(col: String, parent: DataFrame,
      parentCol: String, parentName: String) extends Check {
    def name = s"fk:$col->$parentName.$parentCol"
  }

  /** Run every check against `df`; returns (constraint, n_violations),
    * one row per check, in no particular order (callers sort).
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs >=1 check")
    // fuse all row-local checks into one aggregate over one scan
    val rowLocal = checks.collect {
      case c: NotNull => c.name ->
        sum(when(col(c.col).isNull, 1L).otherwise(0L))
      case c: InRange => c.name ->
        sum(when(col(c.col).isNotNull &&
          (col(c.col) < c.lo || col(c.col) > c.hi), 1L).otherwise(0L))
    }
    val fused: Option[DataFrame] = if (rowLocal.isEmpty) None else Some {
      val aggd = df.agg(rowLocal.head._2.as("c0"),
        rowLocal.tail.zipWithIndex.map { case ((_, e), i) =>
          e.as(s"c${i + 1}") }: _*)
      // melt the 1-row wide aggregate into (constraint, n_violations)
      val pairs = rowLocal.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("constraint"),
          coalesce(col(s"c$i"), lit(0L)).as("n_violations"))
      }
      aggd.select(explode(array(pairs: _*)).as("r")).select("r.*")
    }
    val others = checks.collect {
      case c: Unique =>
        df.agg((cnt - count_distinct(col(c.cols.head),
            c.cols.tail.map(col): _*)).as("n_violations"))
          .select(lit(c.name).as("constraint"), col("n_violations"))
      case c: ForeignKey =>
        df.filter(col(c.col).isNotNull)
          .join(c.parent.select(col(c.parentCol).as("__pk")).distinct(),
            col(c.col) === col("__pk"), "left_anti")
          .agg(cnt.as("n_violations"))
          .select(lit(c.name).as("constraint"), col("n_violations"))
    }
    (fused.toSeq ++ others).reduce(_ unionByName _)
  }

  val all: Seq[Q] = Seq(

    // ---- DQ: constraint audit over the star schema -------------------------------
    // Mixed passing and failing checks so both verdicts are exercised: the
    // deliberately-tight range and the orders->lineitem "FK" (orders
    // without lineitems exist) must report non-zero counts the oracle
    // reproduces exactly.
    Q("q_constraints", Some(
      """SELECT * FROM (
        |  SELECT 'not_null:o_custkey' AS constraint,
        |    CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
        |      AS n_violations FROM orders
        |  UNION ALL
        |  SELECT 'range:o_totalprice[0.0,100000.0]',
        |    CAST(count(*) FILTER (WHERE o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0 OR o_totalprice > 100000)) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique:o_orderkey',
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'fk:o_custkey->customer.c_custkey',
        |    CAST(count(*) AS BIGINT) FROM orders
        |  WHERE o_custkey IS NOT NULL
        |    AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'fk:o_orderkey->lineitem.l_orderkey',
        |    CAST(count(*) AS BIGINT) FROM orders
        |  WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem))
        |ORDER BY "constraint"""".stripMargin),
      (s, d) => {
        val orders = Tables(s, d, "orders")
        audit(orders, Seq(
          NotNull("o_custkey"),
          InRange("o_totalprice", 0.0, 100000.0),
          Unique(Seq("o_orderkey")),
          ForeignKey("o_custkey", Tables(s, d, "customer"), "c_custkey",
            "customer"),
          ForeignKey("o_orderkey", Tables(s, d, "lineitem"), "l_orderkey",
            "lineitem")))
          .orderBy("constraint")
      })
  )
}
