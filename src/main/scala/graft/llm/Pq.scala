package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.GraftFunctions
import graft.query.Tables

/** L3pq: product-quantized ANN — the regime where the corpus no longer
  * affords a float scan (SURVEY.md §2.11; reference scale stance
  * `/root/reference/gha.ipynb:42-45`, 200-worker reads).
  *
  * The 100 TB arithmetic that motivates it: 64-dim float32 embeddings are
  * 256 bytes/vector; PQ codes at m=8 subspaces × 256 centroids are 8
  * BYTES/vector — a 32× scan-volume cut — and scoring a query batch against
  * the code table is table lookups, not vector arithmetic. The classic
  * three-stage search (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", IEEE TPAMI 2011):
  *
  *  1. TRAIN (driver, bounded): per-subspace Lloyd k-means over a
  *     deterministic sample — same regime as [[VectorOps.ivfCentroids]]:
  *     one TakeOrdered job, the corpus is never scanned by training;
  *  2. ENCODE (one codegen'd map pass, no shuffle): unit-normalize, then
  *     per subspace pick the argmin-L2 centroid —
  *     [[graft.functions.PqEncode]];
  *  3. SEARCH: the driver builds one (query × subspace × centroid) dot
  *     lookup table for the whole query batch; ONE map pass over the code
  *     table emits every query's ADC score per row
  *     ([[graft.functions.AdcScores]] — the corpus crosses no wire), the
  *     bounded-exchange heap plan ([[graft.plans.TopK]]) keeps the
  *     per-query ADC shortlist, and only shortlist×queries rows (ids) ever
  *     leave the scan. Exact cosine RERANKS the shortlist: the lossy code
  *     decides CANDIDACY, never the final order — the precision story that
  *     makes a 0.8-recall law honest at every SF.
  *
  * Unit-normalizing before encode makes inner-product ADC approximate
  * cosine directly (dot of unit vectors), so train/encode/search all share
  * one metric and the rerank is a drop-in exact refinement.
  */
object Pq {

  /** A trained codebook set: m subspaces × ksub centroids × dsub dims,
    * flattened row-major (subspace-major) for the kernels.
    */
  final case class PqModel(m: Int, dsub: Int, ksub: Int, flat: Seq[Double])

  private def unitInPlace(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n > 0) { i = 0; while (i < v.length) { v(i) /= n; i += 1 } }
    v
  }

  /** Unit-normalized double vector as a column; zero vectors pass through
    * (norm floor). The norm is staged as its own attribute so it is not a
    * lambda-captured aggregate re-evaluated per ELEMENT (the
    * [[VectorOps.quantize]] lesson — measured ~40x there).
    */
  private def unitCol(v: Column): (Column, Column) = {
    val d = VectorOps.toDouble(v)
    (d, greatest(sqrt(GraftFunctions.dotNative(d, d)), lit(1e-30)))
  }

  /** Per-subspace Lloyd on a bounded deterministic sample (lowest `vec_id`s
    * — one TakeOrdered job, like [[VectorOps.ivfCentroids]]). Sample
    * vectors are unit-normalized first, matching the encode path. Init =
    * first ksub sample subvectors; ties to the LOWEST centroid; empty
    * cells keep their previous centroid. Driver cost is
    * O(sample · ksub · dim · iters) — ~0.5 s at the 4096×256×64×4 default
    * — and ZERO additional Spark jobs.
    */
  def train(corpus: DataFrame, m: Int = 8, ksub: Int = 256,
      iters: Int = 4, trainSample: Int = 4096): PqModel = {
    require(m > 0 && ksub > 1, s"need m>0, ksub>1; got $m, $ksub")
    // hash-spread, deterministic training sample (see kmeansFit's seeding
    // note: lowest-id samples concentrate wherever the small ids live)
    val sample: Array[Array[Double]] = corpus
      .orderBy(org.apache.spark.sql.functions.xxhash64(col("vec_id")),
        col("vec_id"))
      .limit(math.max(trainSample, ksub))
      .select(VectorOps.toDouble(col("embedding")).as("v"))
      .collect().map(r => unitInPlace(r.getSeq[Double](0).toArray))
    require(sample.nonEmpty, "PQ training needs a nonempty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val k = math.min(ksub, sample.length)
    val flat = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < m) {
      val base = j * dsub
      val pts: Array[Array[Double]] =
        sample.map(v => java.util.Arrays.copyOfRange(v, base, base + dsub))
      val cents: Array[Array[Double]] = Array.tabulate(k)(c => pts(c).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.ofDim[Double](k, dsub)
        val counts = new Array[Int](k)
        var p = 0
        while (p < pts.length) {
          val x = pts(p)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            val cc = cents(c)
            var d2 = 0.0; var i = 0
            while (i < dsub) { val t = x(i) - cc(i); d2 += t * t; i += 1 }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += x(i); i += 1 }
          counts(best) += 1
          p += 1
        }
        var c = 0
        while (c < k) {
          if (counts(c) > 0) {
            var i = 0
            while (i < dsub) { cents(c)(i) = sums(c)(i) / counts(c); i += 1 }
          }
          c += 1
        }
        it += 1
      }
      // k < ksub (tiny corpus): leave the tail rows zero — a zero centroid
      // is a valid argmin target and the code space simply stays unused
      var c = 0
      while (c < k) {
        System.arraycopy(cents(c), 0, flat, j * ksub * dsub + c * dsub, dsub)
        c += 1
      }
      j += 1
    }
    PqModel(m, dsub, ksub, flat.toIndexedSeq)
  }

  /** One codegen'd map pass: (vec_id, codes array<int> of m). No shuffle;
    * at scale this IS the stored index (parquet dictionary-encodes the
    * small ints to ~1 byte each).
    */
  def encode(corpus: DataFrame, model: PqModel): DataFrame = {
    val (d, n) = unitCol(col("embedding"))
    corpus
      .select(col("vec_id"), d.as("_v"), n.as("_n"))
      .select(col("vec_id"), GraftFunctions.pqEncode(
        transform(col("_v"), x => x / col("_n")),
        model.flat, model.m, model.dsub, model.ksub).as("codes"))
  }

  /** The flat (subspace × centroid × centroid) SDC lookup table for
    * code-vs-code scoring ([[graft.functions.SdcScore]]): entry (j,a,b) =
    * dot(centroid (j,a), centroid (j,b)). m·ksub² doubles — 32 K at the
    * knn-graph m=8/ksub=64 shape — computed once per trained model on the
    * driver (m·ksub²·dsub flops) and shipped to executors as ONE reference
    * object on the expression node.
    */
  def sdcTables(model: PqModel): Seq[Double] = {
    import model.{m, dsub, ksub, flat}
    val out = new Array[Double](m * ksub * ksub)
    var j = 0
    while (j < m) {
      val base = j * ksub * dsub
      var a = 0
      while (a < ksub) {
        var b = a
        while (b < ksub) {
          var s = 0.0
          var i = 0
          while (i < dsub) {
            s += flat(base + a * dsub + i) * flat(base + b * dsub + i)
            i += 1
          }
          out(j * ksub * ksub + a * ksub + b) = s
          out(j * ksub * ksub + b * ksub + a) = s
          b += 1
        }
        a += 1
      }
      j += 1
    }
    out.toIndexedSeq
  }

  /** The flat (query × subspace × centroid) ADC lookup table for a query
    * batch: entry (q,j,c) = dot(unit-query subvector j, centroid (j,c)).
    */
  private def adcTables(qvs: Array[Array[Double]], model: PqModel): Seq[Double] = {
    val out = new Array[Double](qvs.length * model.m * model.ksub)
    var q = 0
    while (q < qvs.length) {
      val v = qvs(q)
      var j = 0
      while (j < model.m) {
        var c = 0
        while (c < model.ksub) {
          val off = j * model.ksub * model.dsub + c * model.dsub
          var s = 0.0; var i = 0
          val lim = math.min(model.dsub, v.length - j * model.dsub)
          while (i < lim) { s += v(j * model.dsub + i) * model.flat(off + i); i += 1 }
          out(q * model.m * model.ksub + j * model.ksub + c) = s
          c += 1
        }
        j += 1
      }
      q += 1
    }
    out.toIndexedSeq
  }

  /** ADC shortlist + exact rerank, the full PQ search. Output matches
    * [[VectorOps.bruteForceTopK]]: (query_id, neighbor_id, rank, cos).
    * `queries` must be a bounded batch (collected once).
    */
  def pqTopK(codes: DataFrame, corpus: DataFrame, queries: DataFrame,
      model: PqModel, k: Int, shortlist: Int = 64): DataFrame = {
    val qRows = queries.orderBy("vec_id")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), unitInPlace(r.getSeq[Double](1).toArray)))
    require(qRows.nonEmpty, "pqTopK needs a nonempty query batch")
    val ids: Array[Long] = qRows.map(_._1)
    val tables = adcTables(qRows.map(_._2), model)
    // ONE pass over the code table scores every query; only ids + scores
    // leave the scan, and the heap plan bounds the exchange at
    // shortlist · queries · partitions rows
    val scored = codes
      .select(col("vec_id").as("neighbor_id"),
        posexplode(GraftFunctions.adcScores(
          col("codes"), tables, model.ksub, ids.length)).as(Seq("qi", "adc")))
      .withColumn("query_id", element_at(lit(ids), col("qi") + 1))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "adc")
    val short = graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(col("adc").desc, col("neighbor_id").asc), shortlist)
    // exact rerank of the tiny shortlist: candidates join back to their
    // float vectors by id (broadcast — shortlist·queries rows), so the
    // lossy ADC order never decides the final ranking
    val tv = corpus.select(col("vec_id").as("neighbor_id"),
      VectorOps.toDouble(col("embedding")).as("tv"))
    val qv = queries.select(col("vec_id").as("query_id"),
      VectorOps.toDouble(col("embedding")).as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    tv.join(broadcast(short.select("query_id", "neighbor_id")), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("tv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** A stored IVF-PQ index: coarse cells for pruning, PQ codes for the
    * scan — the FAISS `IndexIVFPQ` architecture. `assignments` holds
    * (neighbor_id, codes, cell) ONLY: the stored index is ~8 bytes of
    * code + an id per vector, never the floats; the rerank fetches float
    * vectors from the CORPUS table by id — at scale through
    * [[ivfPqQueryPruned]]'s Bloom-sidecar file-skipping fetch, which
    * reads the embedding column only from files that can hold a
    * shortlisted id.
    */
  final case class IvfPqIndex(centroids: Seq[(Int, Seq[Double])],
      model: PqModel, assignments: DataFrame)

  private def flatCents(cents: Seq[(Int, Seq[Double])]): (Seq[Double], Int) = {
    val ordered = cents.sortBy(_._1)
    (ordered.flatMap(_._2), ordered.head._2.length)
  }

  /** Train both quantizers on the bounded sample (two driver fits, one
    * TakeOrdered job each), then ONE corpus scan computes the coarse cell
    * and the PQ codes together — both kernels ride the same projection.
    */
  def buildIvfPqIndex(corpus: DataFrame, nCells: Int = 16,
      kmeansIters: Int = 2, m: Int = 8, ksub: Int = 64,
      pqIters: Int = 3): IvfPqIndex = {
    val cents = VectorOps.ivfCentroids(corpus, nCells, kmeansIters).toIndexedSeq
    val model = train(corpus, m, ksub, pqIters)
    IvfPqIndex(cents, model, encodeAssign(corpus, cents, model))
  }

  /** The shared one-scan projection both build and append run: coarse cell
    * + PQ codes from FIXED quantizers (both kernels in one select).
    */
  def encodeAssign(corpus: DataFrame, cents: Seq[(Int, Seq[Double])],
      model: PqModel): DataFrame = {
    val (flat, dim) = flatCents(cents)
    val (d, n) = unitCol(col("embedding"))
    corpus
      .select(col("vec_id").as("neighbor_id"), d.as("_v"), n.as("_n"))
      .select(col("neighbor_id"),
        GraftFunctions.pqEncode(transform(col("_v"), x => x / col("_n")),
          model.flat, model.m, model.dsub, model.ksub).as("codes"),
        GraftFunctions.nearestCentroid(col("_v"), flat, dim,
          euclidean = false).as("cell"))
  }

  /** Persist: code table partitioned by cell (probing = partition
    * pruning, like [[VectorOps.writeIvfIndex]]), centroids + codebooks as
    * tiny parquets.
    */
  def writeIvfPqIndex(index: IvfPqIndex, dir: String): Unit = {
    import index.assignments.sparkSession.implicits._
    val spark = index.assignments.sparkSession
    val G = graft.store.IndexGenerations
    val prev = G.current(spark, dir)
    val appendIds = G.batches(spark, dir, "appends").map(_._1)
    val fresh = prev.gen < 0 && appendIds.isEmpty
    // a rebuild over a live (generational or appended-to) index is a
    // generation swap: both quantizers may have retrained, so the commit's
    // fold watermark covers every append batch present — the rebuilt index
    // REPLACES history. Appender QUIESCENCE required across a rebuild,
    // per [[VectorOps.writeIvfIndex]] (a racing append would stay live
    // with codes from the superseded quantizers)
    val tgt = if (fresh) dir else s"$dir/g${prev.gen + 1}"
    index.assignments.write.mode("overwrite").partitionBy("cell")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(s"$tgt/assignments")
    index.centroids.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(s"$tgt/centroids")
    Seq((index.model.m, index.model.dsub, index.model.ksub,
      index.model.flat))
      .toDF("m", "dsub", "ksub", "flat")
      .coalesce(1).write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(s"$tgt/codebooks")
    if (!fresh) {
      G.commit(spark, dir, prev.gen + 1, (prev.maxFolded +: appendIds).max)
      G.gc(spark, dir, prev.gen + 1, prev, Seq("appends"),
        Seq("assignments", "centroids", "codebooks"))
    }
  }

  def readIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): IvfPqIndex = {
    import spark.implicits._
    val G = graft.store.IndexGenerations
    val b = G.current(spark, dir)
    val cents = spark.read.parquet(b.sub(dir, "centroids"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    val mdl = spark.read.parquet(b.sub(dir, "codebooks"))
      .as[(Int, Int, Int, Seq[Double])].head()
    val base = spark.read.parquet(b.sub(dir, "assignments"))
      .select(col("neighbor_id"), col("codes"),
        col("cell").cast("int").as("cell"))
    // streaming appends (ivfPqAppendBatch) live under appends/batch=N/
    // cell=M; `cell` stays a partition-filter level on both layouts. Only
    // batches above the generation's fold watermark union in.
    val live = G.liveBatches(spark, dir, "appends", b)
    val assigned = if (live.isEmpty) base else {
      base.unionByName(spark.read.option("basePath", s"$dir/appends")
        .parquet(live: _*)
        .select(col("neighbor_id"), col("codes"),
          col("cell").cast("int").as("cell")))
    }
    IvfPqIndex(cents, PqModel(mdl._1, mdl._2, mdl._3, mdl._4), assigned)
  }

  /** Fold live append batches into a new committed generation — the
    * IVF-PQ twin of [[VectorOps.compactIvfIndex]]: quantizers are FIXED
    * under appends, so the fold rewrites the code table only (centroids +
    * codebooks copy into the generation); query results are bit-identical
    * before and after (law-tested). Same visibility/GC/single-compactor
    * contract as [[graft.store.IndexGenerations]].
    */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxFoldRows: Long = 64L * 1024 * 1024): Unit = {
    val G = graft.store.IndexGenerations
    val prev = G.current(spark, dir)
    val toFold = G.batches(spark, dir, "appends").filter(_._1 > prev.maxFolded)
    if (toFold.isEmpty && prev.gen >= 0) return
    val assigned = {
      val b = spark.read.parquet(prev.sub(dir, "assignments"))
        .select(col("neighbor_id"), col("codes"),
          col("cell").cast("int").as("cell"))
      if (toFold.isEmpty) b
      else b.unionByName(spark.read.option("basePath", s"$dir/appends")
        .parquet(toFold.map(_._2): _*)
        .select(col("neighbor_id"), col("codes"),
          col("cell").cast("int").as("cell")))
    }
    val tgt = s"$dir/g${prev.gen + 1}"
    // fat cells split into bounded sub-files instead of one 1/nCells-of-
    // the-corpus fold task ([[graft.store.IndexGenerations.boundedFold]])
    graft.store.IndexGenerations.boundedFold(assigned, "cell",
        xxhash64(col("neighbor_id")), maxFoldRows)
      .write.mode("overwrite").partitionBy("cell")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(s"$tgt/assignments")
    Seq("centroids", "codebooks").foreach { sub =>
      spark.read.parquet(prev.sub(dir, sub))
        .coalesce(1).write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(s"$tgt/$sub")
    }
    G.commit(spark, dir, prev.gen + 1,
      (prev.maxFolded +: toFold.map(_._1)).max)
    G.gc(spark, dir, prev.gen + 1, prev, Seq("appends"),
      Seq("assignments", "centroids", "codebooks"))
  }

  /** Probe + ADC + exact rerank against a built (possibly store-loaded)
    * index. Per query, the nProbe nearest cells are computed driver-side
    * from the collected query batch, so the probed-cell union reaches the
    * stored code table as ONE `cell IN (...)` partition filter — unprobed
    * cells are never read. Scoring then rides the one AdcScores pass with
    * a tiny broadcast (query_id, cell) join keeping each query's scores
    * restricted to the cells IT probed; shortlist + rerank as [[pqTopK]].
    */
  def ivfPqQuery(index: IvfPqIndex, corpus: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int = 2, shortlist: Int = 64): DataFrame = {
    val (_, short) = adcShortlist(index, queries, nProbe, shortlist)
    val tv = corpus.select(col("vec_id").as("neighbor_id"),
      VectorOps.toDouble(col("embedding")).as("tv"))
    val qv = queries.select(col("vec_id").as("query_id"),
      VectorOps.toDouble(col("embedding")).as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    tv.join(broadcast(short.select("query_id", "neighbor_id")), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("tv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** The shared probe + ADC + shortlist stage of [[ivfPqQuery]] and
    * [[ivfPqQueryPruned]]: returns the collected raw query rows and the
    * per-query ADC shortlist frame (query_id, neighbor_id).
    */
  private def adcShortlist(index: IvfPqIndex, queries: DataFrame,
      nProbe: Int, shortlist: Int)
      : (Array[(Long, Array[Double])], DataFrame) = {
    val qRows = queries.orderBy("vec_id")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qRows.nonEmpty, "ivfPqQuery needs a nonempty query batch")
    val ids: Array[Long] = qRows.map(_._1)
    // driver-side probe: nProbe best cells per query by the same spherical
    // dot metric the assignment used (queries are a bounded batch)
    val (flat, dim) = flatCents(index.centroids)
    val kCells = index.centroids.length
    def probeCells(v: Array[Double]): Seq[Int] = {
      val scores = (0 until kCells).map { c =>
        val cent = flat.slice(c * dim, c * dim + dim)
        var s = 0.0; var i = 0
        val lim = math.min(dim, v.length)
        while (i < lim) { s += v(i) * cent(i); i += 1 }
        (s, c)
      }
      scores.sortBy { case (s, c) => (-s, c) }.take(nProbe).map(_._2)
    }
    val probes: Seq[(Long, Int)] = qRows.toSeq.flatMap { case (id, v) =>
      probeCells(v).map(c => (id, c))
    }
    val probedCells = probes.map(_._2).distinct.sorted
    val tables = adcTables(qRows.map(_._2.clone()).map(unitInPlace), index.model)
    import queries.sparkSession.implicits._
    val probeDf = probes.toDF("query_id", "cell")
    val scored = index.assignments
      // ONE IN-list partition filter — the probed union; per-(query,cell)
      // restriction happens on the tiny broadcast join below
      .filter(col("cell").isin(probedCells: _*))
      .select(col("neighbor_id"), col("cell"),
        posexplode(GraftFunctions.adcScores(
          col("codes"), tables, index.model.ksub, ids.length))
          .as(Seq("qi", "adc")))
      .withColumn("query_id", element_at(lit(ids), col("qi") + 1))
      .join(broadcast(probeDf), Seq("query_id", "cell"), "left_semi")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "adc")
    (qRows, graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(col("adc").desc, col("neighbor_id").asc), shortlist))
  }

  /** [[ivfPqQuery]] with a PRUNED exact-rerank fetch — the 100 TB read
    * path for a STORE-BACKED corpus. The exact form's rerank re-attaches
    * float vectors by an id probe whose scan side is the FULL corpus
    * vector column: correct, but per query batch it re-reads the very
    * bytes the 8-byte code table exists to avoid (stored-IVF dodges this
    * by keeping floats IN the index, which PQ deliberately does not — the
    * 32× scan cut IS the index). Here the ADC shortlist ids (bounded by
    * construction: ≤ shortlist × queries) collect to the driver and the
    * floats fetch through [[graft.store.BloomSkip.readPrunedEq]] on a
    * corpus store carrying a `vec_id` Bloom sidecar — the rerank reads
    * only files that can hold a shortlisted vector (files-read-bounded,
    * asserted in PqSpec). Query vectors re-use the already-collected
    * batch (zero extra corpus reads). Results are bit-identical to
    * [[ivfPqQuery]] on the same index (law-tested).
    *
    * Build the sidecar once with `BloomSkip.write(spark, corpusDir,
    * Seq("vec_id"))`; vectors appended after the sidecar are kept
    * conservatively, never wrongly skipped. `onFetch` receives
    * (filesKept, filesTotal) — the production monitoring hook.
    */
  def ivfPqQueryPruned(index: IvfPqIndex,
      spark: org.apache.spark.sql.SparkSession, corpusDir: String,
      queries: DataFrame, k: Int, nProbe: Int = 2, shortlist: Int = 64,
      onFetch: (Int, Int) => Unit = (_, _) => ()): DataFrame = {
    import spark.implicits._
    val (qRows, short) = adcShortlist(index, queries, nProbe, shortlist)
    // bounded by construction: TopK caps the shortlist at
    // shortlist·|queries| rows before this collect
    val pairs = short.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = pairs.map(_._2).distinct.toSeq
    if (ids.isEmpty)
      return spark.emptyDataset[(Long, Long, Long, Double)]
        .toDF("query_id", "neighbor_id", "rank", "cos")
    val pr = graft.store.BloomSkip.readPrunedEq(spark, corpusDir, "vec_id",
      ids)
    onFetch(pr.filesKept, pr.filesTotal)
    val tv = pr.df.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("neighbor_id"),
        VectorOps.toDouble(col("embedding")).as("tv"))
    val pairsDf = pairs.toSeq.toDF("query_id", "neighbor_id")
    val qv = qRows.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("query_id", "qv")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    tv.join(broadcast(pairsDf), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("tv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Incremental maintenance of a stored IVF-PQ index — add a vector
    * batch WITHOUT rebuild ([[VectorOps.ivfAppend]]'s contract extended
    * to both quantizers): centroids AND codebooks stay fixed, the batch
    * is encoded + assigned in ONE scan and lands `mode("append")` into
    * the cell partitions. With both quantizers fixed, post-append query
    * results EQUAL a from-scratch encode of the union (law-tested);
    * recall drifts only as data drifts from the trained quantizers —
    * the retrain trigger is a rebuild + [[writeIvfPqIndex]] generation
    * swap. Delivery semantics are the caller's, as with ivfAppend.
    */
  def ivfPqAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
      newVectors: DataFrame): Unit = {
    val idx = readIvfPqIndex(spark, dir)
    // lands in the CURRENT generation's code table (additive new files)
    val tgt = graft.store.IndexGenerations.current(spark, dir)
      .sub(dir, "assignments")
    encodeAssign(newVectors, idx.centroids, idx.model)
      .write.mode("append").partitionBy("cell").parquet(tgt)
  }

  /** IDEMPOTENT batch-keyed append for streaming IVF-PQ maintenance —
    * [[VectorOps.ivfAppendBatch]]'s replay discipline on the code store:
    * batch `batchId`'s encoded assignments OVERWRITE their own
    * `appends/batch=<id>` directory, so a foreachBatch crash-replay
    * rewrites the same files instead of duplicating index rows.
    */
  def ivfPqAppendBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
      batchId: Long, newVectors: DataFrame): Unit = {
    // an empty micro-batch must not write a file-less batch directory —
    // parquet schema inference over it would poison later index reads
    if (newVectors.isEmpty) return
    val idx = readIvfPqIndex(spark, dir)
    encodeAssign(newVectors, idx.centroids, idx.model)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/appends/batch=$batchId")
  }

  /** Session-scoped stored IVF-PQ demo indexes, keyed by sfDir — built
    * once per JVM so repeated q_ann_ivfpq runs time the stored-index
    * QUERY path (the [[VectorOps]] ivfDemos pattern).
    */
  private val ivfPqDemos =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val all: Seq[Q] = Seq(

    // ---- L3pq: PQ-compressed ANN, oracled via the same RECALL law as the
    // IVF family (exact top-1 from DuckDB brute force + recall@5 >= 0.8
    // per query). The approximate stage is engine-defined (codes), so the
    // declared frame is the law harness; the exact rerank makes the law
    // hold with margin at every SF.
    Q("q_ann_pq", Some(
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
        |p AS (
        |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |    list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * t.v[i]))
        |    / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
        |       * sqrt(list_sum(list_transform(t.v, x -> x * x)))) AS cos
        |  FROM q, e t WHERE q.vec_id <> t.vec_id),
        |r AS (SELECT query_id, neighbor_id, row_number() OVER (
        |        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        |      FROM p)
        |SELECT query_id, neighbor_id AS exact_top1, true AS mean_recall_ok
        |FROM r WHERE rn = 1 ORDER BY query_id""".stripMargin),
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        // fixture-scale codebooks (64 centroids/subspace) — the IVF
        // registration's nCells=16 stance; production default stays 256.
        // Recall head-room is unaffected: the exact rerank only needs the
        // ADC shortlist to CONTAIN the true top-5, and the sf0.01 oracle
        // gate proves it per driver round.
        val model = train(emb, ksub = 64, iters = 3)
        val codes = encode(emb, model)
        val exact = VectorOps.bruteForceTopK(emb, queries, 5).localCheckpoint()
        // shortlist 128: the fixture embeddings are near-uniform on the
        // sphere (worst case for ANY quantizer — true-neighbor cosine
        // margins are tiny, so ADC noise reorders aggressively); at 64 one
        // sf0.001 query deterministically dropped 2 of its true top-5 out
        // of the shortlist. 128 holds recall@5 = 1.0 at every driver SF
        // while staying a constant — at scale shortlist grows with corpus
        // like nCells/k do, not with this literal.
        val approx = pqTopK(codes, emb, queries, model, 5, shortlist = 128)
        val hits = exact.select("query_id", "neighbor_id")
          .join(approx.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(Tables.cnt.as("hits"))
        // batch-MEAN recall@5 >= 0.8, aligning the whole ANN family on one
        // law form (q_ann_ivf/q_ann_ivfpq/q_knn_graph): per-query recall on
        // the isotropic fixture is binomial-noisy — shortlist 128 holds
        // per-query 4/5 today, but a fixture regeneration could flake it
        // while the batch mean keeps honest margin.
        val top1 = exact.filter(col("rank") === 1)
          .select(col("query_id"), col("neighbor_id").as("exact_top1"))
        val mr = top1.join(hits, Seq("query_id"), "left")
          .agg((sum(coalesce(col("hits"), lit(0L))) /
            (Tables.cnt * lit(5.0))).as("mr"))
        top1.crossJoin(broadcast(mr))
          .select(col("query_id"), col("exact_top1"),
            (col("mr") >= 0.8).as("mean_recall_ok"))
          .orderBy("query_id")
      }),

    // ---- L3pq+: the STORED IVF-PQ index, same recall law through a round
    // trip — the FAISS IndexIVFPQ architecture under the driver gate:
    // build once, persist codes partitioned by cell, read back, query
    // with probes as partition filters + ADC over codes + exact rerank.
    // shortlist 256 ≥ half the probed population at fixture scale, so the
    // law's slack is the coarse probe's (q_ann_ivf's regime), never the
    // code's.
    Q("q_ann_ivfpq", Some(
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
        |p AS (
        |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |    list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * t.v[i]))
        |    / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
        |       * sqrt(list_sum(list_transform(t.v, x -> x * x)))) AS cos
        |  FROM q, e t WHERE q.vec_id <> t.vec_id),
        |r AS (SELECT query_id, neighbor_id, row_number() OVER (
        |        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        |      FROM p)
        |SELECT query_id, neighbor_id AS exact_top1, true AS mean_recall_ok
        |FROM r WHERE rn = 1 ORDER BY query_id""".stripMargin),
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        // built once per (sfDir, JVM): the production path being timed is
        // the partition-pruned stored-index query + Bloom-pruned rerank
        // fetch, not the build. The corpus store (multi-file + vec_id
        // Bloom sidecar) is what the rerank reads at scale — the float
        // column is never scanned whole.
        val root = ivfPqDemos.computeIfAbsent(d, _ => {
          val t = graft.query.Pipelines.demoRoot("graft_ivfpq").toString
          writeIvfPqIndex(buildIvfPqIndex(emb), s"$t/index")
          emb.repartitionByRange(16, col("vec_id"))
            .write.parquet(s"$t/corpus")
          graft.store.BloomSkip.write(s, s"$t/corpus", Seq("vec_id"))
          t
        })
        val stored = readIvfPqIndex(s, s"$root/index")
        val exact = VectorOps.bruteForceTopK(emb, queries, 5).localCheckpoint()
        val approx = ivfPqQueryPruned(stored, s, s"$root/corpus", queries,
          5, nProbe = 12, shortlist = 256)
        val hits = exact.select("query_id", "neighbor_id")
          .join(approx.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(Tables.cnt.as("hits"))
        // MEAN recall@5 >= 0.8 over the batch (the q_knn_graph form — see
        // q_ann_ivf: per-query recall of a coarse probe on isotropic
        // fixture vectors is binomial-noisy; the batch mean is the
        // standard ANN contract and holds with honest margin)
        val top1 = exact.filter(col("rank") === 1)
          .select(col("query_id"), col("neighbor_id").as("exact_top1"))
        val mr = top1.join(hits, Seq("query_id"), "left")
          .agg((sum(coalesce(col("hits"), lit(0L))) /
            (Tables.cnt * lit(5.0))).as("mr"))
        top1.crossJoin(broadcast(mr))
          .select(col("query_id"), col("exact_top1"),
            (col("mr") >= 0.8).as("mean_recall_ok"))
          .orderBy("query_id")
      })
  )
}
