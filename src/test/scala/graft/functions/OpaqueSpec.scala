package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkFixture

/** Laws for the Opaque once-per-row wrapper (r11 optimization):
  * values identical to the unwrapped expression, and the optimizer can no
  * longer duplicate the wrapped expression by substituting its alias into
  * a pushed-down filter (q_null_guard's double JsonToStructs).
  */
class OpaqueSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("k", StringType)))

  // a real (parquet) scan: over a LocalRelation the pushed filter is
  // constant-folded away by ConvertToLocalRelation and the control shows
  // nothing — the duplication under test is pushdown toward a scan
  private lazy val frame = {
    val path = java.nio.file.Files.createTempDirectory("opaque_spec")
    val dir = path.toString
    // temp parquet is removed with the JVM, not left in /tmp
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(path.toFile)
    }
    Seq(
      (1L, """{"k":"7"}"""), (2L, """not json"""), (3L, """{"x":1}"""),
      (4L, """{"k":"42"}"""), (5L, null.asInstanceOf[String])
    ).toDF("id", "props").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("wrapped value identical to unwrapped (incl. null-guard filter)") {
    def proj(wrap: Boolean) = {
      val e = from_json(col("props"), schema).getField("k").cast("long")
      frame.select(col("id"), (if (wrap) Opaque.once(e) else e).as("k"))
        .filter(col("k").isNotNull).orderBy("id")
    }
    assert(proj(wrap = true).collect().toSeq === proj(wrap = false).collect().toSeq)
  }

  test("alias is not substituted into the pushed filter: one parse per row") {
    val e = from_json(col("props"), schema).getField("k").cast("long")
    val plain = frame.select(col("id"), e.as("k"))
      .filter(col("k").isNotNull)
    val wrapped = frame.select(col("id"), Opaque.once(e).as("k"))
      .filter(col("k").isNotNull)
    def parses(df: org.apache.spark.sql.DataFrame): Int = {
      // count on the optimized LOGICAL plan: the duplication is the
      // optimizer's filter-pushdown alias substitution, and the physical
      // tree hides under an AdaptiveSparkPlanExec leaf when AQE is on
      val plan = df.queryExecution.optimizedPlan
      plan.flatMap(_.expressions.flatMap(_.collect {
        case j: org.apache.spark.sql.catalyst.expressions.JsonToStructs => j
      })).size
    }
    // assume, not assert: the control pins CURRENT Catalyst behavior
    // (filter-pushdown alias substitution duplicates the expression). A
    // Spark upgrade that stops duplicating would invalidate the control
    // without making Opaque wrong — cancel with the actionable message
    // instead of failing the suite.
    assume(parses(plain) >= 2,
      "optimizer no longer duplicates the bare alias — Opaque may be removable")
    assert(parses(wrapped) === 1, "Opaque must pin exactly one evaluation")
  }
}
