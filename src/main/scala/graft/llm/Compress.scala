package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.query.Tables

/** Compression-ratio quality signal (SURVEY.md §2.11 L30) — the Gopher/
  * RefinedWeb heuristic the statistical signals miss: text that DEFLATES
  * too well is repetitive machine junk (keyword stuffing, template spam,
  * log dumps) even when its word-level stats look plausible, and text
  * that barely compresses is high-entropy noise (base64 blobs, minified
  * code). The ratio is a single scalar per document with no corpus state.
  *
  * Implementation: per-partition `mapPartitions` with ONE reused
  * `java.util.zip.Deflater` (the media-codec precedent — a JDK codec is
  * imperative by nature; a row-local Deflater allocation would dominate).
  * Level is pinned (6) so the ratio is deterministic across runs and
  * JVMs. Map-only: no shuffle, output partitioning follows input; at
  * 100 TB this pipelines inside the scan like any row-local signal.
  */
object Compress {

  /** (id, n_bytes, deflate_len(text) / byte_len(text)) per row; empty or
    * null text gets ratio 1.0 (incompressible by definition, never a
    * crash). NOTE a short document can legitimately exceed 1.0 — deflate's
    * fixed stream header dominates below ~100 bytes; gates should bound
    * the ratio only above a minimum length.
    */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { iter =>
        val deflater = new java.util.zip.Deflater(6, false)
        val buf = new Array[Byte](1 << 16)
        iter.map { case (id, text) =>
          if (text == null || text.isEmpty) (id, 0L, 1.0)
          else {
            val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var compLen = 0L
            while (!deflater.finished())
              compLen += deflater.deflate(buf)
            (id, raw.length.toLong, compLen.toDouble / raw.length)
          }
        }
      }
      .toDF(idCol, "n_bytes", "ratio")
  }

  val all: Seq[Q] = Seq(

    // ---- L30: compression-ratio gate over documents + planted degenerates -------
    // Two planted probes bracket the corpus: a 2000-char single-word
    // repetition (must compress far BELOW every real doc) and a 2000-char
    // incompressible counter stream (must land ABOVE the repetitive
    // probe's band). DuckDB cannot deflate, so the oracle pins the LAWS
    // (bracketing + unit band) plus the exact corpus row count — the
    // ratios themselves are engine-defined but deterministic (level
    // pinned), same contract as the quantization error laws.
    Q("q_compress_ratio", Some(
      """SELECT CAST(count(*) + 2 AS BIGINT) AS n_docs,
        |       true AS planted_spam_lowest, true AS spam_below_01,
        |       true AS normals_above_spam, true AS ratios_in_unit_band
        |FROM documents""".stripMargin),
      (s, d) => {
        import s.implicits._
        val docs = Tables(s, d, "documents").select("doc_id", "text")
        val spam = Seq((900000001L, Seq.fill(400)("spam").mkString(" ")))
          .toDF("doc_id", "text")
        val noise = Seq((900000002L,
          (0 until 400).map(i => (i * 2654435761L % 99999983L).toString)
            .mkString(" "))).toDF("doc_id", "text")
        val ratios = compressionRatio(
          docs.unionByName(spam).unionByName(noise), "doc_id", "text")
        val spamR = max(when(col("doc_id") === 900000001L, col("ratio")))
        val noiseR = max(when(col("doc_id") === 900000002L, col("ratio")))
        val normalMin = min(when(col("doc_id") < 900000000L, col("ratio")))
        ratios.agg(
          cnt.as("n_docs"),
          (spamR < normalMin && spamR < noiseR).as("planted_spam_lowest"),
          (spamR < 0.1).as("spam_below_01"),
          (normalMin > spamR * 2).as("normals_above_spam"),
          (min(col("ratio")) > 0.0 &&
            max(when(col("n_bytes") >= 100, col("ratio"))) <= 1.1)
            .as("ratios_in_unit_band"))
      })
  )

  private def cnt = count(lit(1))
}
