package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only CORE-scaling probe (VERDICT r11 item 7): the sf0.1 bench
  * cannot demonstrate that anything parallelizes — every 8-vs-32-core
  * ratio is ≈1 because per-query fixed overhead (plan, codegen, stage
  * scheduling) dominates sub-3 s queries. This probe times the heavy
  * operator FAMILIES on ×`copies`-replicated inputs (the ScaleProbe
  * replication), with the core count taken from `$SPARK_GRAFT_CPUS`, so
  * running it at 8 and at 32 cores yields an honest core-scaling curve
  * for work that is big enough to parallelize.
  *
  * Usage: SPARK_GRAFT_CPUS=8|32 CoreScaleProbe <sfDir> [copies] [families]
  * (families: comma-separated subset of the printed names; empty = all)
  */
object CoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val fams: Set[String] =
      args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .filter(_.nonEmpty).getOrElse(Set.empty)
    def want(s: String): Boolean = fams.isEmpty || fams.exists(s.startsWith)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[corescale] cpus=$cpus copies=$copies sf=$sfDir")

    def time(name: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[corescale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s (n=$n)")
    }

    def replicateDocs(copies: Int) = {
      val docs = graft.query.Tables(spark, sfDir, "documents")
        .select("doc_id", "text")
      (0 until copies).map { c =>
        docs.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
          .withColumn("text", concat(lit(s"copy$c "), col("text")))
      }.reduce(_ union _)
    }
    def replicateEmb(copies: Int) = {
      val emb = graft.query.Tables(spark, sfDir, "embeddings")
      (0 until copies).map { c =>
        emb.select((col("vec_id") + lit(c * 1000000L)).as("vec_id"),
          transform(col("embedding"), x => x + lit(c * 0.37f)).as("embedding"))
      }.reduce(_ union _)
    }

    val d = replicateDocs(copies).localCheckpoint()
    val e = replicateEmb(copies).localCheckpoint()
    println(s"[corescale] docs=${d.count()} embeddings=${e.count()}")

    // the bench's heaviest families, at replicated size
    if (want("dedup_resolve")) time("dedup_resolve(minhash+CC)") {
      graft.llm.TextOps.dedupClusters(
        graft.llm.VectorOps.minhashPairsNative(d, 0.5, maxBucket = 64)).count()
    }
    if (want("cosine_pairs")) time("cosine_pairs(signLSH)") {
      graft.llm.VectorOps.cosinePairsNative(e, 0.9, maxBucket = 64).count()
    }
    if (want("kmeans_fit")) time("kmeans_fit(k=64,it=3)") {
      val c = e.select(col("vec_id"),
        graft.llm.VectorOps.toDouble(col("embedding")).as("v"))
      graft.llm.Clustering.kmeansFit(c, k = 64, iters = 3).length.toLong
    }
    if (want("semantic_clusters")) time("semantic_clusters(knn+CC)") {
      graft.llm.Clustering.semanticClusters(e,
        nCells = 16 * copies, nProbe = 4).count()
    }
    if (want("decontaminate_semantic")) time("decontaminate_semantic") {
      val evalSet = e.filter(col("vec_id") % 100 === 0)
      graft.llm.VectorOps.semanticContaminationPairs(
        e.select(col("vec_id"),
          graft.llm.VectorOps.toDouble(col("embedding")).as("embedding")),
        evalSet, 0.9).count()
    }
    // compute-dominated variants: the small-kernel families above are
    // fixed-overhead-bound even at ×50 (ratios ≈1 at any core count);
    // these two scale the KERNEL work (rows × evals × dim / rows × k ×
    // dim) until executor compute dominates wall, which is what a core-
    // scaling curve can honestly measure on this box.
    if (want("decontaminate_big")) time("decontaminate_big(evals=10%)") {
      val evalSet = e.filter(col("vec_id") % 10 === 0)
      graft.llm.VectorOps.semanticContaminationPairs(
        e.select(col("vec_id"),
          graft.llm.VectorOps.toDouble(col("embedding")).as("embedding")),
        evalSet, 0.9).count()
    }
    if (want("decontaminate_xl")) time("decontaminate_xl(evals=50%)") {
      val evalSet = e.filter(col("vec_id") % 2 === 0)
      graft.llm.VectorOps.semanticContaminationPairs(
        e.select(col("vec_id"),
          graft.llm.VectorOps.toDouble(col("embedding")).as("embedding")),
        evalSet, 0.9).count()
    }
    if (want("kmeans_big")) time("kmeans_big(k=512,it=5)") {
      val c = e.select(col("vec_id"),
        graft.llm.VectorOps.toDouble(col("embedding")).as("v"))
      graft.llm.Clustering.kmeansFit(c, k = 512, iters = 5).length.toLong
    }
    if (want("dsir_weights")) time("dsir_weights") {
      graft.llm.Dsir.importanceWeights(
        d.withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(4)))),
        col("source") === "src0", hashBuckets = 65536).count()
    }
    if (want("bm25_topk")) time("bm25_topk(ad-hoc)") {
      val queries = d.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"),
          array_distinct(split(col("text"), " ")).as("terms"))
      graft.llm.Retrieval.bm25(d, queries, 10).count()
    }
    if (want("triangles")) time("triangles") {
      val li = graft.query.Tables(spark, sfDir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select("l_orderkey", "l_partkey")
      val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      val b = li.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("v"))
      val pairs = a.join(b,
          col("l_orderkey") === col("ok_b") && col("u") < col("v"))
        .select("u", "v").distinct()
      graft.query.Graph.triangleStats(pairs).count()
    }
    spark.stop()
  }
}
