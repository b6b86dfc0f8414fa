package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale probe (not part of the driver contract): replicates the
  * sf0.1 fixtures 5x / 10x and times the LSH dedup stack at each size, to
  * MEASURE how the hot operators scale instead of guessing.
  *
  * NOTE the replication is a HEAVY-DUPLICATION stress, not a
  * realistic-density corpus: a one-token prefix shifts only one 3-shingle,
  * so every cross-copy pair remains a true near-dup and verified pairs grow
  * ~quadratically in the copy count (255 → 247k at 10x). That is the point
  * — the probe shows runtime tracking corpus size ~linearly even while the
  * true-pair count explodes, i.e. the verify stage is the only quadratic
  * touchpoint and it is bounded by real duplicate density.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    def replicateDocs(docs: DataFrame, copies: Int): DataFrame =
      (0 until copies).map { c =>
        docs.select((col("doc_id") + lit(c * 1000000L)).as("doc_id"),
          concat(lit(s"copy$c "), col("text")).as("text"))
      }.reduce(_ union _)

    def replicateEmb(emb: DataFrame, copies: Int): DataFrame =
      (0 until copies).map { c =>
        emb.select((col("vec_id") + lit(c * 1000000L)).as("vec_id"),
          transform(col("embedding"),
            x => x + lit(c * 0.37f)).as("embedding"))
      }.reduce(_ union _)

    val docs = graft.query.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
    val emb = graft.query.Tables(spark, sfDir, "embeddings")

    for (copies <- Seq(1, 5, 10)) {
      val d = replicateDocs(docs, copies).localCheckpoint()
      val n = d.count()
      val pairs = time(s"minhash LSH pairs    n=$n") {
        graft.llm.VectorOps.minhashPairsNative(d, 0.5, maxBucket = 64).count()
      }
      println(s"    pairs=$pairs")
      time(s"dedup resolve        n=$n") {
        graft.llm.TextOps.dedupClusters(
          graft.llm.VectorOps.minhashPairsNative(d, 0.5, maxBucket = 64))
          .count()
      }
      d.unpersist()
    }

    for (copies <- Seq(1, 5, 10)) {
      val e = replicateEmb(emb, copies).localCheckpoint()
      val n = e.count()
      val pairs = time(s"sign-LSH cosine pairs n=$n") {
        graft.llm.VectorOps.cosinePairsNative(e, 0.9, maxBucket = 64).count()
      }
      println(s"    pairs=$pairs")
      e.unpersist()
    }
    spark.stop()
  }
}
