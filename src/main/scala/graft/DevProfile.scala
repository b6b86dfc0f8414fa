package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for hotspot queries (not part of the driver
  * contract). Times each stage of the banded-minhash pipeline repeatedly in
  * one JVM so numbers aren't swamped by load variance.
  */
object DevProfile {
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

    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s run$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s  (n=$n)")
      }
    }

    val docs = graft.query.Tables(spark, sfDir, "documents")
    println(s"docs: ${docs.count()}")

    val sh = docs.select(col("doc_id"),
      graft.llm.TextOps.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles") { sh.write.format("noop").mode("overwrite").save(); sh.count() }

    val hs = sh.withColumn("hs", transform(col("sh"), s => xxhash64(s)))
    val sig = hs.select(col("doc_id"),
      transform(sequence(lit(0), lit(63)),
        i => array_min(transform(col("hs"), h => xxhash64(h, i)))).as("sig"))
    time("signatures(64) inlined") { sig.write.format("noop").mode("overwrite").save(); 0L }

    // barrier variant: hs materialized once (persist blocks CollapseProject
    // from inlining the string-hash pass into the 64-perm loop)
    val hsP = sh.withColumn("hs", transform(col("sh"), s => xxhash64(s))).persist()
    hsP.count()
    val sigB = hsP.select(col("doc_id"),
      transform(sequence(lit(0), lit(63)),
        i => array_min(transform(col("hs"), h => xxhash64(h, i)))).as("sig"))
    time("signatures(64) barrier") { sigB.write.format("noop").mode("overwrite").save(); 0L }

    // parallelism check: repartition before the heavy projection
    val sigR = hsP.repartition(32).select(col("doc_id"),
      transform(sequence(lit(0), lit(63)),
        i => array_min(transform(col("hs"), h => xxhash64(h, i)))).as("sig"))
    time("signatures(64) barrier+rep") { sigR.write.format("noop").mode("overwrite").save(); 0L }

    val bands = sigB.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(7)),
        j => xxhash64(slice(col("sig"), j * 8 + 1, lit(8)), j))))
      .toDF("doc_id", "band_idx", "band_hash")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    time("bands+candidates") { cand.count() }

    time("full q_dedup_minhash") {
      spark.catalog.clearCache() // cold per run: internal persists otherwise carry over
      graft.llm.VectorOps.minhashPairsNative(docs, 0.5).count()
    }

    // ---- cosine sign-LSH stages ----
    val emb = graft.query.Tables(spark, sfDir, "embeddings")
    println(s"embeddings: ${emb.count()}")
    def plane(j: Int) = array((0 until 64).map(k =>
      (xxhash64(lit(j), lit(k)).cast("double") / lit(Long.MaxValue))): _*)
    val vDf = emb.repartition(32)
      .select(col("vec_id"),
        graft.llm.VectorOps.toDouble(col("embedding")).as("v")).persist()
    val sigCols = (0 until 64).map { j =>
      when(graft.functions.GraftFunctions.dotNative(col("v"), plane(j)) >= 0,
        1L).otherwise(0L)
    }
    val withSig = vDf.select(col("vec_id"), col("v"), array(sigCols: _*).as("bits"))
    time("cos signatures(64 bits)") {
      withSig.write.format("noop").mode("overwrite").save(); 0L }

    // variant: ONE typedLit 2-D plane array + HOF zip_with dot — tiny plan
    // (1 literal vs 4096), interpreted arithmetic
    val planeVals: Seq[Seq[Double]] = spark.range(1)
      .select(array((0 until 64).map(j => plane(j)): _*).as("p"))
      .head().getSeq[scala.collection.Seq[Double]](0)
      .map(_.toSeq).toSeq
    val planesLit = org.apache.spark.sql.functions.typedLit(planeVals)
    val withSigHof = vDf.select(col("vec_id"), col("v"),
      transform(planesLit, p =>
        when(aggregate(zip_with(col("v"), p, (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x) >= 0, 1L).otherwise(0L)).as("bits"))
    time("cos signatures HOF-lit") {
      withSigHof.write.format("noop").mode("overwrite").save(); 0L }
    val withSigP = withSig.persist(); withSigP.count()
    val cbands = withSigP.select(col("vec_id"),
      posexplode(transform(sequence(lit(0), lit(7)),
        j => xxhash64(slice(col("bits"), j * 8 + 1, lit(8)), j))))
      .toDF("vec_id", "band_idx", "band_hash")
    val ccand = cbands.as("a").join(cbands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    time("cos candidates") { ccand.count() }
    val withSigP2 = withSig.persist(); withSigP2.count()
    val ccandP = ccand.persist(); ccandP.count()
    val verified = ccandP
      .join(withSigP2.select(col("vec_id").as("id_a"), col("v").as("va")), "id_a")
      .join(withSigP2.select(col("vec_id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(graft.llm.VectorOps.cosine(col("va"), col("vb")), 4).as("cos"))
      .filter(col("cos") >= 0.35)
    time("cos verify (persisted in)") { verified.count() }
    time("full q_embed_neardup") {
      spark.catalog.clearCache()
      graft.llm.VectorOps.cosinePairsNative(emb, 0.35).count()
    }

    // ---- top-k-per-key: window row_number form vs custom heap plan ----------
    // The interesting number is SHUFFLE VOLUME (window moves every row,
    // the heap plan moves ≤ k·keys·partitions) — wall-clock at sf0.1 only
    // hints at it; the lineitem variant (6x rows, 200k keys) shows the
    // high-cardinality regime where the partial pass stops winning.
    {
      import org.apache.spark.sql.expressions.Window
      val orders = graft.query.Tables(spark, sfDir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val winForm = orders.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 3).drop("_rn")
      time("topk window (5 keys)") { winForm.count() }
      val heapForm = graft.plans.TopK.perKey(orders, Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      time("topk heap   (5 keys)") { heapForm.count() }
      val li = graft.query.Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
      val wl = Window.partitionBy("l_orderkey")
        .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
      val liWin = li.withColumn("_rn", row_number().over(wl))
        .filter(col("_rn") <= 2).drop("_rn")
      time("topk window (hi-card)") { liWin.count() }
      val liHeap = graft.plans.TopK.perKey(li, Seq("l_orderkey"),
        Seq(col("l_extendedprice").desc, col("l_linenumber").asc), 2)
      time("topk heap   (hi-card)") { liHeap.count() }
    }
    spark.stop()
  }
}
