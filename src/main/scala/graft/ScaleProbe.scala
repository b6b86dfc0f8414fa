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
    // optional section filter: comma-separated names from {lsh, cosine,
    // textops, tick, ngram, cluster, boilerplate, bucket, phrase,
    // probefetch,
    // ivfappend, zorder, merge, bloom, pagerank, bpe, sketch, triangles,
    // replace, ewma, semdecon, skyline, hotcluster, pq, labelprop,
    // containment, scd2, retrieval}; absent/empty = run all
    val sections: Set[String] =
      args.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .filter(_.nonEmpty).getOrElse(Set.empty)
    def want(s: String): Boolean = sections.isEmpty || sections.contains(s)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      // same hygiene as Bench: localCheckpoint blocks from earlier stages
      // are only freed at GC; without this the later (bigger) stages run
      // against starved execution memory and the probe reports memory
      // pressure, not the operator's scaling behavior
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // generic over any extra columns (lang etc.): only id and text mutate
    def replicateDocs(docs: DataFrame, copies: Int): DataFrame =
      (0 until copies).map { c =>
        docs.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
          .withColumn("text", concat(lit(s"copy$c "), col("text")))
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

    if (want("lsh")) for (copies <- Seq(1, 5, 10)) {
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

    if (want("cosine")) for (copies <- Seq(1, 5, 10)) {
      val e = replicateEmb(emb, copies).localCheckpoint()
      val n = e.count()
      val pairs = time(s"sign-LSH cosine pairs n=$n") {
        graft.llm.VectorOps.cosinePairsNative(e, 0.9, maxBucket = 64).count()
      }
      println(s"    pairs=$pairs")
      e.unpersist()
    }

    // ---- round-3 text ops: gate / chunk-dedup / packing at growing size ----
    // All three claim map-only or single-bounded-shuffle shapes; the probe
    // checks wall-clock tracks corpus size ~linearly (no quadratic stage
    // hiding behind the fixture scale).
    if (want("textops")) for (copies <- Seq(1, 5, 10)) {
      val d = replicateDocs(graft.query.Tables(spark, sfDir, "documents")
        .select("doc_id", "text", "lang"), copies).localCheckpoint()
      val n = d.count()
      time(s"quality gate          n=$n") {
        graft.llm.TextOps.qualityRules(d)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"chunk dedup           n=$n") {
        graft.llm.TextOps.chunkDedup(d, 32)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"pack sequences        n=$n") {
        graft.llm.TextOps.packSequences(d, 2048L, Seq("lang"), Seq("doc_id"),
          size(split(col("text"), " ")))
          .write.format("noop").mode("overwrite").save()
      }
      d.unpersist()
    }

    // ---- incremental dedup: tick cost vs history size ----------------------
    // The L17 claim: a tick costs O(batch signing + band hits); history
    // contributes only a signature-table scan (64 longs/doc), so growing
    // history 10x must not grow the tick 10x.
    if (want("tick")) {
      val batch = replicateDocs(graft.query.Tables(spark, sfDir, "documents")
        .select("doc_id", "text"), 1)
        .withColumn("doc_id", col("doc_id") + lit(900000000L))
        .localCheckpoint()
      for (copies <- Seq(1, 5, 10)) {
        val hist = replicateDocs(graft.query.Tables(spark, sfDir, "documents")
          .select("doc_id", "text"), copies)
        val sigs = graft.llm.VectorOps.minhashSignatures(hist).localCheckpoint()
        val nh = sigs.count()
        time(s"dedup tick (batch=5k)  hist=$nh") {
          val (kept, _) = graft.llm.VectorOps.dedupIncrement(
            batch, sigs, maxBucket = 64)
          kept.count()
        }
      }
    }

    // ---- L9 n-gram decontamination: corpus grows, eval side fixed ----------
    // The claim: the eval set broadcasts once (its cost is fixed), the
    // corpus is scanned once with no corpus-side exchange below the
    // broadcast gram join, so wall-clock tracks corpus size ~linearly for
    // both the drop view and the pair-grain audit report. (Replicated
    // copies share every original 8-gram, so contaminated-row counts grow
    // linearly too — the report's post-join shuffle is bounded by them.)
    if (want("ngram")) {
      val baseDocs = graft.query.Tables(spark, sfDir, "documents")
        .select("doc_id", "text")
      val evalSet = baseDocs.filter(col("doc_id") % 10 === 0).localCheckpoint()
      val ne = evalSet.count()
      for (copies <- Seq(1, 5, 10)) {
        val d = replicateDocs(baseDocs, copies).localCheckpoint()
        val n = d.count()
        val kept = time(s"decontaminate ngram   n=$n eval=$ne") {
          graft.llm.TextOps.decontaminateNgram(d, evalSet).count()
        }
        val pairs = time(s"contamination report  n=$n eval=$ne") {
          graft.llm.TextOps.contaminationReport(d, evalSet,
            excludeSelfPairs = true).count()
        }
        println(s"    kept=$kept pairs=$pairs")
        d.unpersist()
      }
      org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(evalSet)
    }

    // ---- round-6 clustering ops: k-means / semantic dedup / k-NN graph -----
    // The contracts under test: (a) a Lloyd iteration is one scan + a
    // k x dim-bounded exchange, so fit wall-clock tracks corpus size;
    // (b) SemDeDup's pair stage is bounded by CLUSTER population — k grows
    // with the corpus (here k = 16 x copies, holding ~125 vectors/cluster)
    // so the quadratic term stays flat per row; (c) the k-NN graph's
    // candidate fan-out is nProbe x cellSize per vector — nCells grows with
    // the corpus, so candidates/vector stay constant. Centroids stay
    // driver-resident literals (the IVF coarse-quantizer regime, k <= ~1k);
    // the probe also exposes where plan-literal codegen cost starts to
    // matter as k grows.
    if (want("cluster")) for (copies <- Seq(1, 5, 10)) {
      val e = replicateEmb(emb, copies).localCheckpoint()
      val n = e.count()
      val k = 16 * copies
      val prep = e.select(col("vec_id"),
        graft.llm.VectorOps.toDouble(col("embedding")).as("v"))
      time(f"kmeans fit+assign k=$k%-3d  n=$n") {
        val cents = graft.llm.Clustering.kmeansFit(prep, k, iters = 3)
        graft.llm.Clustering.kmeansAssign(prep, cents)
          .write.format("noop").mode("overwrite").save()
      }
      time(f"semantic dedup  k=$k%-3d    n=$n") {
        graft.llm.Clustering.semanticDedup(prep, k, iters = 2,
          cosThreshold = 0.95).write.format("noop").mode("overwrite").save()
      }
      time(f"knn graph nCells=$k%-3d    n=$n") {
        graft.llm.Clustering.knnGraph(e, k = 5, nCells = k, nProbe = 4)
          .write.format("noop").mode("overwrite").save()
      }
      e.unpersist()
    }

    // ---- round-7 hot-cluster/hot-cell skew caps -----------------------------
    // DEGENERATE corpus: every vector in one dense mode, so k-means/IVF
    // put (nearly) everything in ONE cluster/cell and the uncapped pair
    // join is all-pairs (n²). The cap must hold wall-clock ~flat while
    // the uncapped form grows quadratically — the claim behind
    // semanticDedup(maxCluster)/knnGraph(maxCell).
    if (want("hotcluster")) {
      println("\n== hot-cluster skew caps: one dense mode, n x4 ==")
      def mode(n: Long) = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(16)), j =>
          (when(j === 1, lit(100.0)).otherwise(lit(0.0))
            + pmod(xxhash64(col("id") * 17L + j), lit(1000L)) / 10000.0)
          ).as("v"))
      for (n <- Seq(8000L, 16000L, 32000L)) {
        val c = mode(n).localCheckpoint()
        time(f"semanticDedup UNCAPPED     n=$n%-6d") {
          graft.llm.Clustering.semanticDedup(c, k = 8, iters = 2,
            cosThreshold = 0.999999)
            .write.format("noop").mode("overwrite").save()
        }
        time(f"semanticDedup cap=64       n=$n%-6d") {
          graft.llm.Clustering.semanticDedup(c, k = 8, iters = 2,
            cosThreshold = 0.999999, maxCluster = 64)
            .write.format("noop").mode("overwrite").save()
        }
        val e = c.select(col("vec_id"),
          transform(col("v"), x => x.cast("float")).as("embedding"))
          .localCheckpoint()
        time(f"knnGraph UNCAPPED          n=$n%-6d") {
          graft.llm.Clustering.knnGraph(e, k = 5, nCells = 4, nProbe = 1)
            .write.format("noop").mode("overwrite").save()
        }
        time(f"knnGraph maxCell=64        n=$n%-6d") {
          graft.llm.Clustering.knnGraph(e, k = 5, nCells = 4, nProbe = 1,
            maxCell = 64)
            .write.format("noop").mode("overwrite").save()
        }
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(c)
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(e)
      }
    }

    // ---- round-6 boilerplate removal: df-count + broadcast probe ----------
    // One 8-byte-hash shuffle for document frequency + a broadcast of the
    // hot set + one doc_id-keyed reassembly — wall-clock must track corpus
    // size with the hot-set broadcast cost flat.
    if (want("boilerplate")) for (copies <- Seq(1, 5, 10)) {
      val d = replicateDocs(docs, copies).localCheckpoint()
      val n = d.count()
      time(s"boilerplate remove    n=$n") {
        graft.llm.TextOps.boilerplateRemove(d, segSize = 8, minDocs = 2)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"lm score              n=$n") {
        graft.llm.TextOps.lmScore(d)
          .write.format("noop").mode("overwrite").save()
      }
      d.unpersist()
    }

    // ---- round-6 bucketed join: write-once shuffle amortization ------------
    // Build cost (the one-time shuffle paid at write) and join cost are
    // timed separately; the join must stay exchange-free (0 shuffle rows)
    // and track input size linearly at every corpus size.
    if (want("bucket")) {
      val li = graft.query.Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = graft.query.Tables(spark, sfDir, "orders")
        .select("o_orderkey", "o_orderpriority")
      for (copies <- Seq(1, 5, 10)) {
        val bigLi = (0 until copies).map(c => li.withColumn("l_orderkey",
          col("l_orderkey") + lit(c * 100000000L))).reduce(_ union _)
        val bigOrd = (0 until copies).map(c => ord.withColumn("o_orderkey",
          col("o_orderkey") + lit(c * 100000000L))).reduce(_ union _)
        val n = bigLi.count()
        val base = java.nio.file.Paths.get("/root/repo/target/tmp")
        java.nio.file.Files.createDirectories(base)
        val root = java.nio.file.Files
          .createTempDirectory(base, "bprobe").toString
        val (liT, ordT) = (s"probe_li_$copies", s"probe_ord_$copies")
        time(s"bucketed build        n=$n") {
          bigLi.repartition(4).write.mode("overwrite")
            .option("path", s"$root/li")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(liT)
          bigOrd.repartition(4).write.mode("overwrite")
            .option("path", s"$root/ord")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ordT)
        }
        time(s"co-located join       n=$n") {
          spark.table(liT)
            .join(spark.table(ordT).hint("merge"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_orderkey", "o_orderpriority")
            .agg(count(lit(1)).as("n_items"))
            .write.format("noop").mode("overwrite").save()
        }
        spark.sql(s"DROP TABLE IF EXISTS $liT")
        spark.sql(s"DROP TABLE IF EXISTS $ordT")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(root))
      }
    }

    // ---- round-6 phrase index: build linear, search flat -------------------
    // The claim: build is one map-only pass + partitioned write (linear in
    // corpus); search reads ONLY the phrase's buckets + verifies a
    // near-empty candidate set, so search wall-clock stays flat while the
    // corpus (and the postings) grow 10x.
    if (want("phrase")) for (copies <- Seq(1, 5, 10)) {
      val d = replicateDocs(docs, copies).localCheckpoint()
      val n = d.count()
      val base = java.nio.file.Paths.get("/root/repo/target/tmp")
      java.nio.file.Files.createDirectories(base)
      val dir = java.nio.file.Files
        .createTempDirectory(base, "pprobe").toString
      time(s"phrase index build    n=$n") {
        graft.llm.PhraseIndex.buildPhraseIndex(d, dir)
      }
      val hits = time(s"phrase search         n=$n") {
        graft.llm.PhraseIndex.phraseSearch(spark, dir, d, "key agg row")
          .count()
      }
      // r10 maintenance triple: a FIXED-size append tick must cost
      // O(batch) regardless of index size (hourly-cadence claim); the
      // search reads base ∪ live appends; the generation fold restores
      // the 2-leg read with identical results
      val batch = d.limit(500)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          // every appended doc matches, so +append/folded counts PROVE the
          // appends are actually read (hits grow by exactly the batch)
          concat(lit("key agg row "), col("text")).as("text"))
        .localCheckpoint()
      time(s"phrase append tick=500 idx=$n") {
        graft.llm.PhraseIndex.phraseIndexAppend(spark, dir, 1L, batch)
      }
      val corpus2 = d.unionByName(batch)
      val hits2 = time(s"phrase search +append n=$n") {
        graft.llm.PhraseIndex.phraseSearch(spark, dir, corpus2,
          "key agg row").count()
      }
      time(s"phrase compact        idx=$n") {
        graft.llm.PhraseIndex.compactPhraseIndex(spark, dir)
      }
      val hits3 = time(s"phrase search folded  n=$n") {
        graft.llm.PhraseIndex.phraseSearch(spark, dir, corpus2,
          "key agg row").count()
      }
      println(s"    hits=$hits +append=$hits2 folded=$hits3" +
        (if (hits2 == hits3) "" else "  MISMATCH"))
      batch.unpersist()
      d.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }

    // ---- round-11 pruned candidate fetch: search cost flat vs corpus -------
    // The claim behind phraseSearchPruned / ivfPqQueryPruned: with the
    // candidate id set bounded by the index, the verify/rerank FETCH reads
    // a bounded file set (Bloom-pruned) — so search cost tracks the
    // candidate count while the corpus (and its store's file count) grows
    // 10x. filesKept must track candidates, filesTotal the corpus.
    if (want("probefetch")) for (copies <- Seq(1, 5, 10)) {
      val d = replicateDocs(docs, copies).localCheckpoint()
      val n = d.count()
      val base = java.nio.file.Paths.get("/root/repo/target/tmp")
      java.nio.file.Files.createDirectories(base)
      val dir = java.nio.file.Files
        .createTempDirectory(base, "pfprobe").toString
      time(s"probefetch build+store n=$n") {
        graft.llm.PhraseIndex.buildPhraseIndex(d, s"$dir/index")
        d.repartitionByRange(16 * copies, col("doc_id"))
          .write.parquet(s"$dir/docs")
        graft.store.BloomSkip.write(spark, s"$dir/docs", Seq("doc_id"))
      }
      var pf = (0, 0)
      val hits = time(s"probefetch phrase      n=$n") {
        graft.llm.PhraseIndex.phraseSearchPruned(spark, s"$dir/index",
          s"$dir/docs", "key agg row",
          onFetch = (k, t) => pf = (k, t)).count()
      }
      println(s"    phrase hits=$hits fetch=${pf._1}/${pf._2} files")
      val e = replicateEmb(emb, copies).localCheckpoint()
      val en = e.count()
      val idx = graft.llm.Pq.buildIvfPqIndex(e)
      e.repartitionByRange(16 * copies, col("vec_id"))
        .write.parquet(s"$dir/corpus")
      graft.store.BloomSkip.write(spark, s"$dir/corpus", Seq("vec_id"))
      val queries = e.filter(col("vec_id") < 10)
      var vf = (0, 0)
      val rows = time(s"probefetch ivfpq       n=$en") {
        graft.llm.Pq.ivfPqQueryPruned(idx, spark, s"$dir/corpus", queries,
          k = 5, nProbe = 4, shortlist = 32,
          onFetch = (k, t) => vf = (k, t)).count()
      }
      println(s"    ivfpq rows=$rows fetch=${vf._1}/${vf._2} files")
      d.unpersist(); e.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }

    // ---- round-6 incremental IVF append: tick cost vs index size -----------
    // The claim: an append tick costs O(batch) — one assignment scan of the
    // BATCH with stored centroids — so growing the existing index 10x must
    // not grow the tick.
    if (want("ivfappend")) {
      val batch = emb.select((col("vec_id") + 900000000L).as("vec_id"),
        col("embedding")).localCheckpoint()
      val nb = batch.count()
      for (copies <- Seq(1, 5, 10)) {
        val e = replicateEmb(emb, copies)
        val base = java.nio.file.Paths.get("/root/repo/target/tmp")
        java.nio.file.Files.createDirectories(base)
        val dir = java.nio.file.Files
          .createTempDirectory(base, "iaprobe").toString
        graft.llm.VectorOps.writeIvfIndex(
          graft.llm.VectorOps.buildIvfIndex(e), dir)
        val ni = graft.llm.VectorOps.readIvfIndex(spark, dir)
          .assignments.count()
        time(s"ivf append tick (batch=$nb) index=$ni") {
          graft.llm.VectorOps.ivfAppend(spark, dir, batch)
        }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
    }

    // ---- z-order + footer-stats skipping at growing file counts ------------
    // The question at scale isn't the layout cost (a one-time compaction
    // write) but whether the skip RATIO holds as files multiply and whether
    // the stats pass stays trivial next to the scan it avoids.
    if (want("zorder")) {
      import graft.store.TableStore
      val ev = graft.query.Tables(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          to_date(col("ts")).as("date"))
      for (copies <- Seq(1, 5, 10)) {
        val big = (0 until copies).map(c => ev.select(
          (col("event_id") + lit(c * 10000000L)).as("event_id"),
          (col("user_id") + lit(c * 1000L)).as("user_id"),
          col("value"), col("date"))).reduce(_ union _).localCheckpoint()
        val n = big.count()
        val base = java.nio.file.Paths.get("/root/repo/target/tmp")
        java.nio.file.Files.createDirectories(base)
        val dir = java.nio.file.Files
          .createTempDirectory(base, "zprobe").toString + "/t"
        TableStore.append(big.repartition(8), dir)
        time(s"zorder compact        n=$n") {
          TableStore.compact(spark, dir, zorderBy = Seq("user_id", "value"),
            targetFileBytes = 64L * 1024)
        }
        val pr = time(s"stats prune pass      n=$n") {
          TableStore.readPruned(spark, dir, Seq(
            TableStore.ColRange("user_id", 100, 160),
            TableStore.ColRange("value", 20, 60)))
        }
        println(s"    files kept ${pr.filesKept}/${pr.filesTotal}")
        val pruned = time(s"pruned filtered scan  n=$n") {
          pr.df.filter(col("user_id").between(100, 160) &&
            col("value").between(20, 60)).count()
        }
        val full = time(s"full filtered scan    n=$n") {
          TableStore.read(spark, dir).filter(
            col("user_id").between(100, 160) &&
            col("value").between(20, 60)).count()
        }
        require(pruned == full, s"pruning changed the result: $pruned != $full")
        big.unpersist()
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir).getParentFile)
      }
    }
    // ---- round-6 merge: fixed batch, table x10 -> flat ---------------------
    // The claim: TableStore.merge is O(touched partitions). Replication
    // here adds NEW date partitions (copy c shifts dates +40c days), the
    // batch always touches the same 7 original dates — so the table grows
    // 10x while merge wall-clock stays flat.
    if (want("merge")) {
      import graft.store.TableStore
      val ev = graft.query.Tables(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), to_date(col("ts")).as("date"))
      for (copies <- Seq(1, 5, 10)) {
        val big = (0 until copies).map(c => ev.select(
          (col("event_id") + lit(c * 10000000L)).as("event_id"),
          col("user_id"), col("event_type"), col("value"),
          date_add(col("date"), c * 40).as("date"))).reduce(_ union _)
          .localCheckpoint()
        val n = big.count()
        val base = java.nio.file.Paths.get("/root/repo/target/tmp")
        java.nio.file.Files.createDirectories(base)
        val dir = java.nio.file.Files
          .createTempDirectory(base, "mprobe").toString + "/t"
        TableStore.append(big.repartition(4), dir)
        val batch = ev.filter(col("event_id") % 37 === 0 &&
            col("date") <= lit("2024-01-07").cast("date"))
          .withColumn("value", col("value") + 1000)
        time(s"merge fixed batch     n=$n") {
          TableStore.merge(spark, batch, dir, Seq("event_id"))
        }
        big.unpersist()
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir).getParentFile)
      }
    }

    // ---- round-6 bloom sidecar: build linear, point lookup sublinear -------
    // The claim: the bloom build is one scan (linear); the point lookup
    // reads the sidecar + surviving files only, while the full filtered
    // scan reads everything — the gap widens with table size.
    if (want("bloom")) {
      import graft.store.{BloomSkip, TableStore}
      val ev = graft.query.Tables(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          to_date(col("ts")).as("date"))
      for (copies <- Seq(1, 5, 10)) {
        val big = (0 until copies).map(c => ev.select(
          (col("event_id") + lit(c * 10000000L)).as("event_id"),
          col("user_id"), col("value"), col("date"))).reduce(_ union _)
          .localCheckpoint()
        val n = big.count()
        val base = java.nio.file.Paths.get("/root/repo/target/tmp")
        java.nio.file.Files.createDirectories(base)
        val dir = java.nio.file.Files
          .createTempDirectory(base, "blprobe").toString + "/t"
        TableStore.append(big.repartition(4), dir)
        TableStore.compact(spark, dir, zorderBy = Seq("user_id", "value"),
          targetFileBytes = 64L * 1024)
        time(s"bloom build           n=$n") {
          BloomSkip.write(spark, dir, Seq("event_id"))
        }
        val probes = Seq(17L, 733L, 9000017L)
        val pr = time(s"bloom point lookup    n=$n") {
          val p = BloomSkip.readPrunedEq(spark, dir, "event_id", probes)
          p.df.filter(col("event_id").isin(probes: _*)).count() -> p
        }
        println(s"    files kept ${pr._2.filesKept}/${pr._2.filesTotal}")
        val full = time(s"full filtered scan    n=$n") {
          TableStore.read(spark, dir)
            .filter(col("event_id").isin(probes: _*)).count()
        }
        require(pr._1 == full, s"bloom pruning changed the result: ${pr._1} != $full")
        big.unpersist()
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir).getParentFile)
      }
    }

    // ---- round-6 pagerank: graph x10 -> per-round cost tracks edges --------
    // The claim: each iteration is one edges-join + one dst-aggregate, so
    // wall-clock tracks edge count. Replication unions offset node-id
    // copies of the nation trade graph — 10x nodes, 10x edges, disjoint
    // components (ranks must be identical across copies, asserted).
    if (want("pagerank")) {
      val li = graft.query.Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_suppkey")
      val o = graft.query.Tables(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey")
      val c0 = graft.query.Tables(spark, sfDir, "customer")
        .select("c_custkey", "c_nationkey")
      val su = graft.query.Tables(spark, sfDir, "supplier")
        .select("s_suppkey", "s_nationkey")
      val baseEdges = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c0, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w")).localCheckpoint()
      val baseNodes = graft.query.Tables(spark, sfDir, "nation")
        .select(col("n_nationkey").as("node")).localCheckpoint()
      for (copies <- Seq(1, 5, 10)) {
        val edges = (0 until copies).map(k => baseEdges.select(
          (col("src") + lit(k * 100L)).as("src"),
          (col("dst") + lit(k * 100L)).as("dst"), col("w")))
          .reduce(_ union _)
        val nodes = (0 until copies).map(k =>
          baseNodes.select((col("node") + lit(k * 100L)).as("node")))
          .reduce(_ union _)
        val nE = edges.count()
        val ranks = time(s"pagerank 8 rounds     edges=$nE") {
          graft.query.Graph.pageRank(edges, nodes, iters = 8,
            nNodes = Some(25L * copies))
        }
        // disjoint copies of the same graph: every copy's rank vector must
        // equal the others' up to the 1/N teleport rescale — distinct
        // (node mod 100 -> set of ranks) collapses to 25 rows
        val distinctPerBase = ranks
          .select(pmod(col("node"), lit(100L)).as("b"), col("rank"))
          .distinct().groupBy("b").count()
          .agg(max("count")).head().getLong(0)
        require(distinctPerBase == 1L,
          s"copies diverged: $distinctPerBase rank values per base node")
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(ranks)
      }
      org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(baseEdges)
      org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(baseNodes)
    }

    // ---- BPE trainer: corpus grows 10x, vocabulary FIXED ----------------------
    // The claim to measure: training cost after the one word-count shuffle
    // is corpus-size-INDEPENDENT (merge rounds run on the vocabulary
    // frame). Synthetic corpus: 40 words/doc drawn deterministically from
    // a fixed 5k-pseudoword vocabulary (md5-hex words — the symbol
    // alphabet is 0-9a-f, 16 chars, so 8 rounds always find merges).
    if (want("bpe")) {
      println("\n== BPE train: corpus 10x, vocab fixed at 5k ==")
      def corpus(nDocs: Long): org.apache.spark.sql.DataFrame =
        spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(40)),
            i => substring(md5(pmod(xxhash64(col("id") * 41L + i), lit(5000L))
              .cast("string")), 1, 8))).as("text"))
      for (n <- Seq(20000L, 100000L, 200000L)) {
        val c = corpus(n).localCheckpoint()
        val merges = time(f"bpe 8 rounds          docs=$n%-7d") {
          graft.llm.Bpe.train(c, "text", 8)
        }
        require(merges.length == 8, s"expected 8 merges, got ${merges.length}")
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(c)
      }
      // batched merge rounds: the vocab-scale path. Per-merge cost is
      // dominated by the per-round job barrier (pair-count job + argmax
      // collect), so batch=b should cut wall-clock toward 1/b until the
      // admission rate (how many of the top pairs are pairwise disjoint)
      // caps it — the number that decides whether a 32k vocab is 32k jobs
      // or a few hundred.
      println("\n== BPE batched: 64 merges, batch 1 vs 8 vs 16 ==")
      val cb = corpus(50000L).localCheckpoint()
      for (b <- Seq(1, 8, 16)) {
        val m = time(f"bpe 64 merges batch=$b%-3d docs=50000 ") {
          graft.llm.Bpe.train(cb, "text", 64, batch = b)
        }
        require(m.length == 64, s"expected 64 merges, got ${m.length}")
      }
      org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(cb)
    }
    // ---- round-8: REAL tokenizer-scale BPE (32k vocab) ------------------------
    // The batched trainer's headline claim, exercised for real: jobs must
    // track rounds (≈ vocab / admitted-per-round), not vocab — 32k merges
    // as a few hundred job barriers, not 32k. A 50k-word alphabet keeps
    // pair diversity far above the merge count (upper bound ~ distinct
    // words x 7 pair types ≈ 350k), so the run never exhausts.
    if (want("bpe32k")) {
      println("\n== BPE 32k vocab: tokenizer-scale run, batch=128 ==")
      val c32 = spark.range(50000L).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(40)),
          i => substring(md5(pmod(xxhash64(col("id") * 41L + i), lit(50000L))
            .cast("string")), 1, 8))).as("text")).localCheckpoint()
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val jl = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(jl)
      val m32 = time("bpe 32768 merges batch=128 docs=50000") {
        graft.llm.Bpe.train(c32, "text", 32768, batch = 128)
      }
      spark.sparkContext.removeSparkListener(jl)
      println(f"    merges=${m32.length} sparkJobs=${jobs.get}" +
        f" jobsPerMerge=${jobs.get.toDouble / m32.length}%.3f")
      require(m32.length == 32768, s"expected 32768 merges, got ${m32.length}")
      org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(c32)
    }

    // ---- round-8: the x100 sweep (500k docs / 200k vectors) -------------------
    // The closest the sandbox allows to the 100 TB design claim: push the
    // dedup + ANN + clustering stack TWO orders past the fixture with the
    // skew caps engaged and check growth stays sub-quadratic. Replicated
    // copies make every copy-group an all-pairs near-dup clique, so the
    // TRUE pair count grows ~copies² — runtime must track corpus size
    // (bucketed, capped), never the clique count.
    if (want("heavy100")) {
      println("\n== heavy stack at x100: dedup ==")
      for (copies <- Seq(10, 100)) {
        val d = replicateDocs(docs, copies).repartition(32).localCheckpoint()
        val n = d.count()
        val pairs = time(f"minhash LSH pairs     n=$n%-7d") {
          graft.llm.VectorOps.minhashPairsNative(d, 0.5, maxBucket = 64).count()
        }
        println(s"    pairs=$pairs")
        time(f"dedup resolve         n=$n%-7d") {
          graft.llm.TextOps.dedupClusters(
            graft.llm.VectorOps.minhashPairsNative(d, 0.5, maxBucket = 64))
            .count()
        }
        // boilerplate-capped containment: at copies > maxDf EVERY shared
        // shingle is dropped (conservative under-estimate by design) —
        // the probe pins that the index build stays corpus-linear
        val cp = time(f"containment maxDf=60  n=$n%-7d") {
          graft.llm.TextOps.containmentPairs(d, 0.15, maxDf = 60).count()
        }
        println(s"    containment pairs=$cp")
        // heavy hitters from the vocab-sized aggregate (r8 shape): the
        // only materialized frame is (word, count) — corpus x100 grows the
        // tokenize scan, never the persisted state
        time(f"heavy hitters (CMS)   n=$n%-7d") {
          val agg = d.select(explode(graft.llm.TextOps.words(col("text")))
            .as("w")).groupBy("w").agg(count(lit(1)).as("cnt")).persist()
          try {
            import spark.implicits._
            val sk = agg.select(col("w"), col("cnt")).as[(String, Long)]
              .rdd.treeAggregate(
                org.apache.spark.util.sketch.CountMinSketch
                  .create(0.001, 0.99, 42))(
                (s, wc) => { s.add(wc._1, wc._2); s },
                (a, b) => { a.mergeInPlace(b); a })
            println(s"    vocab=${agg.count()} cmsBytes=${sk.toByteArray.length}")
          } finally agg.unpersist()
        }
        d.unpersist()
      }
      println("\n== heavy stack at x100: vectors ==")
      for (copies <- Seq(10, 100)) {
        val e = replicateEmb(emb, copies).repartition(32).localCheckpoint()
        val n = e.count()
        // k/nCells SCALE WITH THE CORPUS — the documented SemDeDup/IVF
        // contract (fixed target cluster size keeps the within-cluster
        // pair stage linear in n). The first x100 run capped k at 512:
        // clusters grew to ~390 members, the pair stage went ~quadratic
        // (391 s) and knnGraph's candidate fan-out filled the disk — the
        // cliff this probe exists to catch, recorded in BASELINE.md.
        val k = 16 * copies
        val prep = e.select(col("vec_id"),
          graft.llm.VectorOps.toDouble(col("embedding")).as("v"))
        time(f"semantic dedup k=$k%-4d  n=$n%-7d") {
          graft.llm.Clustering.semanticDedup(prep, k, iters = 2,
            cosThreshold = 0.95, maxCluster = 4096)
            .write.format("noop").mode("overwrite").save()
        }
        time(f"knn graph nCells=$k%-4d n=$n%-7d") {
          graft.llm.Clustering.knnGraph(e, k = 5, nCells = k, nProbe = 4,
            maxCell = 4096)
            .write.format("noop").mode("overwrite").save()
        }
        e.unpersist()
      }
    }

    // ---- round-9: knnGraph SDC pre-rank vs exact-all verify ------------------
    // heavy100 recorded knnGraph as the one super-linear curve (15x time
    // for 10x vectors — candidate-bound by construction: the exact verify
    // touches n * nProbe * cellSize re-attached vector pairs). refine=N
    // inserts the PQ/SDC pre-rank so the exact stage touches n * k * N
    // rows regardless of cell size; this probe measures the same x10/x100
    // points with the pre-rank on, plus the relative recall@5 of the
    // refined graph against the exact-all-verify graph (isolating what the
    // quantized pre-rank loses — the IVF probe recall is common to both).
    if (want("knnrefine")) {
      println("\n== knnGraph: SDC pre-rank (refine=3) vs exact-all verify ==")
      for (copies <- Seq(1, 10, 100)) {
        val e = replicateEmb(emb, copies).repartition(32).localCheckpoint()
        val n = e.count()
        val k = 16 * copies
        val base = time(f"knnGraph refine=0   nCells=$k%-5d n=$n%-7d") {
          graft.llm.Clustering.knnGraph(e, k = 5, nCells = k, nProbe = 4,
            maxCell = 4096).localCheckpoint()
        }
        // guardMinRecall = 0: this probe measures the PRE-RANK's cost
        // curve; on the replicated (near-tie) fixture the default guard
        // correctly refuses the pre-rank — its firing + fallback cost is
        // what the `guarded` row below measures
        val fast = time(f"knnGraph refine=3   nCells=$k%-5d n=$n%-7d") {
          graft.llm.Clustering.knnGraph(e, k = 5, nCells = k, nProbe = 4,
            maxCell = 4096, refine = 3, guardMinRecall = 0.0)
            .localCheckpoint()
        }
        // default-guard call on the same corpus: the audit (50 queries,
        // bounded) runs, fires on this near-tie fixture, and the call
        // falls back to the exact path — the row's delta vs refine=0 is
        // the guard's total overhead (audit + PQ train/encode)
        val guarded = time(f"knnGraph refine=3 GUARDED (fires) n=$n%-7d") {
          graft.llm.Clustering.knnGraph(e, k = 5, nCells = k, nProbe = 4,
            maxCell = 4096, refine = 3).localCheckpoint()
        }
        guarded.unpersist()
        val tot = base.count()
        val hit = base.join(fast, Seq("query_id", "neighbor_id"), "left_semi")
          .count()
        // identity recall vs NEIGHBOR QUALITY: on the replicated fixture
        // every candidate is a near-tie (copies differ by ~1e-3 cosine), so
        // exact-top-5 membership is decided past the quantization
        // resolution — the honest measure of what the pre-rank loses is
        // the exact cosine of the edges each graph RETURNS (both paths
        // exact-score their survivors)
        val mb = base.agg(avg("cos")).head.getDouble(0)
        val mf = fast.agg(avg("cos")).head.getDouble(0)
        println(f"    edges=$tot  relative recall@5 = ${hit.toDouble / tot}%.4f" +
          f"  mean-cos exact-all $mb%.6f vs refined $mf%.6f")
        base.unpersist(); fast.unpersist(); e.unpersist()
      }
    }

    // ---- round-9: selection layer at scale ------------------------------------
    // budgetSelect claims two scans + a prefix-partition-only window; the
    // probe grows the corpus 10x/100x with a FIXED budget and checks the
    // wall-clock tracks the scan, not the corpus-sized window the naive
    // form would run. blocklist claims O(bytes + matches) INDEPENDENT of
    // phrase count; the probe grows the phrase list 10x/100x on a fixed
    // corpus and compares against the contains-per-phrase reduce plan.
    if (want("selection")) {
      val docsS = graft.query.Tables(spark, sfDir, "documents")
        .select("doc_id", "text", "source")
      println("\n== budgetSelect: fixed budget, corpus x10/x100 ==")
      for (copies <- Seq(1, 10, 100)) {
        val d = replicateDocs(docsS, copies).repartition(32).localCheckpoint()
        val n = d.count()
        val sel = time(f"budgetSelect budget=10k  n=$n%-7d") {
          graft.llm.Selection.budgetSelect(d, budget = 10000L).count()
        }
        println(s"    selected=$sel")
        d.unpersist()
      }
      println("\n== budgetSelectPerSource: 90%-skew source, corpus x10/x100 ==")
      // the r9-weak regression probe: one source holds ~90% of the corpus
      // (the web-source shape) under a FIXED small budget. The per-source
      // two-phase form must track the scan (flat-ish), never the one-task
      // whole-source sort the bare-source window would run.
      for (copies <- Seq(1, 10, 100)) {
        // first copy keeps real sources; the rest all collapse into "web"
        val d = (0 until copies).map { c =>
          val shifted = docsS
            .withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
            .withColumn("text", concat(lit(s"copy$c "), col("text")))
          if (c == 0) shifted else shifted.withColumn("source", lit("web"))
        }.reduce(_ union _).repartition(32).localCheckpoint()
        val n = d.count()
        val sel = time(f"perSource 90%%-skew     n=$n%-7d") {
          graft.llm.Selection.budgetSelectPerSource(d,
            Map("web" -> 5000L, "src0" -> 800L, "src1" -> 500L)).count()
        }
        println(s"    selected=$sel")
        d.unpersist()
      }

      println("\n== quality-model GD: 3 iterations, corpus x10/x100 ==")
      // the trainer claims iters x one-scan cost (kmeansFit's model):
      // time must track the corpus linearly, never the iteration count
      // superlinearly
      for (copies <- Seq(1, 10, 100)) {
        val d = replicateDocs(graft.query.Tables(spark, sfDir, "documents")
          .select("doc_id", "text", "lang"), copies)
          .repartition(32).localCheckpoint()
        val n = d.count()
        val w = time(f"logisticFitHard i=3   n=$n%-7d") {
          val feats = graft.llm.QualityModel.featureFrame(d)
          graft.llm.QualityModel.logisticFitHard(
            feats, Seq("x1", "x2", "x3"), "y", iters = 3, lr = 0.5)
        }
        println(s"    w=${w.map(x => f"$x%.6f").mkString(",")}")
        d.unpersist()
      }

      println("\n== quality-model FULL (rules + LM-score features), corpus x10/x100 ==")
      // the production composition: featureFrame = map-only rules + the
      // L26 hash-keyed bigram LM pipeline, assembled by one doc_id join;
      // cost must track the corpus (the LM count tables are vocab-sized,
      // not corpus-sized — replication keeps vocab ~fixed)
      for (copies <- Seq(1, 10, 100)) {
        val d = replicateDocs(graft.query.Tables(spark, sfDir, "documents")
          .select("doc_id", "text", "lang"), copies)
          .repartition(32).localCheckpoint()
        val n = d.count()
        val w = time(f"qualityModelFull i=3  n=$n%-7d") {
          val feats = graft.llm.QualityModel.productionFeatures(d)
            .localCheckpoint() // one assembly pass feeds 3 GD scans + score
          val ws = graft.llm.QualityModel.logisticFitHard(
            feats, Seq("x1", "x2", "x3", "x4"), "y", iters = 3, lr = 0.5)
          feats.unpersist()
          ws
        }
        println(s"    w=${w.map(x => f"$x%.6f").mkString(",")}")
        d.unpersist()
      }

      println("\n== substring-dedup fixpoint: rounds to quiescence, corpus x10 ==")
      // replicated corpora are the worst case for ROUND 1 (nearly every
      // gram repeats); the probe pins that quiescence arrives in few
      // rounds and the per-round cost SHRINKS (later rounds only re-gram
      // the rewritten residue)
      for (copies <- Seq(1, 10)) {
        val d = replicateDocs(docsS, copies).select("doc_id", "text")
          .repartition(32).localCheckpoint()
        val n = d.count()
        val (out, rounds) = time(f"cleanFixpoint k=8     n=$n%-7d") {
          graft.llm.SubstringDedup.cleanFixpoint(d, k = 8, maxRounds = 6)
        }
        println(s"    rounds=${rounds.mkString(",")} kept_docs=${out.count()}")
        out.unpersist(); d.unpersist()
      }

      println("\n== blocklist: fixed corpus (x10), phrases x10/x100 ==")
      val d = replicateDocs(docsS, 10).repartition(32).localCheckpoint()
      val n = d.count()
      val vocab = Seq("spark", "join", "filter", "window", "merge", "sort",
        "batch", "stream", "table", "hash")
      for (nPhrases <- Seq(6, 60, 600)) {
        // synthetic 3-word phrases off the fixture vocabulary (some hit,
        // most miss — cost is what's probed, match counts are printed)
        val phrases = (0 until nPhrases).map(i =>
          s"${vocab(i % 10)} ${vocab((i / 10) % 10)} ${vocab((i / 100) % 10)}")
          .distinct
        val hits = time(f"aho-corasick p=${phrases.length}%-4d n=$n%-7d") {
          graft.llm.Selection.blocklistScan(d, phrases)
            .select(explode(col("matched"))).count()
        }
        // the naive LEFT-NESTED reduce (a+b+c+...) StackOverflows the
        // analyzer at 600 phrases before a single row is read — balance
        // the tree to even get a comparison number out of the plan
        def bal(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
          if (cs.lengthCompare(1) == 0) cs.head
          else { val (l, r) = cs.splitAt(cs.length / 2); bal(l) + bal(r) }
        val hits2 = time(f"contains-reduce p=${phrases.length}%-4d n=$n%-7d") {
          d.select(bal(phrases.map(p =>
            when(col("text").contains(p), 1).otherwise(0))).as("hits"))
            .agg(sum("hits")).head.getLong(0)
        }
        println(s"    matches: ac=$hits contains=$hits2")
      }
      d.unpersist()
    }

    // ---- round-8 dev: stage breakdown of semanticDedup at x100 ---------------
    // (profiling aid for the heavy100 super-linear finding; not a claim)
    if (want("semprof")) {
      println("\n== semanticDedup stage breakdown, n=200k k=1600 ==")
      val e = replicateEmb(emb, 100).repartition(32).localCheckpoint()
      val n = e.count()
      println(s"    n=$n dim=" + e.select(size(col("embedding"))).head().getInt(0))
      val prep = e.select(col("vec_id"),
        graft.llm.VectorOps.toDouble(col("embedding")).as("v"))
      val cents = time("kmeansFit iters=2 k=1600") {
        graft.llm.Clustering.kmeansFit(prep, 1600, iters = 2)
      }
      val assigned = time("assign + checkpoint") {
        graft.llm.Clustering.kmeansAssign(prep, cents).localCheckpoint()
      }
      val a0 = assigned.select(col("cluster"), col("vec_id").as("__id_a"),
        col("v").as("__va"))
      val capped = time("maxCluster cap (TopK 4096)") {
        graft.plans.TopK.perKey(a0, Seq("cluster"),
          Seq(col("__id_a").asc), 4096).localCheckpoint()
      }
      val b = assigned.select(col("cluster"), col("vec_id").as("__id_b"),
        col("v").as("__vb"))
      val nPairs = time("pair join count (no cosine)") {
        capped.join(b, Seq("cluster"))
          .filter(col("__id_a") < col("__id_b")).count()
      }
      println(s"    pairs=$nPairs")
      val nDrop = time("pair join + cosine + distinct") {
        capped.join(b, Seq("cluster"))
          .filter(col("__id_a") < col("__id_b"))
          .filter(graft.llm.VectorOps.cosine(col("__va"), col("__vb")) >= 0.95)
          .select(col("__id_b")).distinct().count()
      }
      println(s"    dropped=$nDrop")
      time("stats agg: select(cluster, posexplode) one-step") {
        prep.select(graft.llm.Clustering.clusterOf(cents)(col("v"))
            .as("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cluster", "dim")
          .agg(sum("x").as("s"), count(lit(1)).as("n")).count()
      }
      time("stats agg: cluster -> barrier -> posexplode") {
        prep.select(graft.llm.Clustering.clusterOf(cents)(col("v"))
            .as("cluster"), col("v"))
          .repartition(32)
          .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cluster", "dim")
          .agg(sum("x").as("s"), count(lit(1)).as("n")).count()
      }
      e.unpersist()
    }

    // ---- sketch aggregates: rows 10x, state FIXED -----------------------------
    // The claim to measure: per-key KLL + Theta aggregation cost tracks the
    // scan linearly while the aggregate STATE stays constant-size (the
    // whole point of mergeable sketches — a 10x table does not grow the
    // view). Values are deterministic pseudo-random doubles, 5 keys.
    if (want("sketch")) {
      println("\n== sketch aggs: rows 10x, state fixed ==")
      import graft.functions.SketchAggs._
      for (n <- Seq(1000000L, 5000000L, 10000000L)) {
        val df = spark.range(n).select(
          (col("id") % 5).cast("string").as("key"),
          (pmod(xxhash64(col("id")), lit(100000L)) / 1000.0).as("v"),
          pmod(xxhash64(col("id"), lit(7)), lit(1000000L)).as("u"))
        val sizes = time(f"kll+theta per key     rows=$n%-8d") {
          df.groupBy("key").agg(
              kllAgg(col("v")).as("kll"), thetaAgg(col("u")).as("th"))
            .select(length(col("kll")).as("lk"), length(col("th")).as("lt"))
            .agg(max("lk"), max("lt")).head()
        }
        println(s"    state bytes: kll=${sizes.getInt(0)} theta=${sizes.getInt(1)}")
        // frequent-items: a zipf-ish item column (hash-bucketed with a
        // quadratic skew) — state must stay <= maxMapSize counters while
        // rows x10, and the per-key heavy hitter must keep its bounds
        val fsizes = time(f"freq items per key    rows=$n%-8d") {
          df.withColumn("item",
              concat(lit("i"), (pmod(xxhash64(col("u"), lit(3)),
                lit(1000L)) * pmod(xxhash64(col("u"), lit(3)),
                lit(1000L)) / 10000L).cast("long").cast("string")))
            .groupBy("key").agg(freqAgg(col("item"), 256).as("fs"))
            .select(length(col("fs")).as("lf")).agg(max("lf")).head()
        }
        println(s"    state bytes: freq=${fsizes.getInt(0)}")
      }
    }

    // ---- triangle counting: disjoint graph copies, count law ------------------
    // Edges x k via disjoint copies: runtime must track m (the oriented
    // wedge join is O(m^1.5) worst-case but the graph's degree profile is
    // fixed across copies, so observed cost is ~linear), and the triangle
    // count must be EXACTLY k x the base count — a per-copy correctness law.
    if (want("triangles")) {
      println("\n== triangles: disjoint graph copies ==")
      val li = graft.query.Tables(spark, sfDir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select("l_orderkey", "l_partkey")
      val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      val b = li.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("v"))
      val basePairs = a.join(b,
          col("l_orderkey") === col("ok_b") && col("u") < col("v"))
        .select("u", "v").distinct().localCheckpoint()
      var baseTri = -1L
      for (copies <- Seq(1, 5, 10)) {
        val pairs = (0 until copies).map(k => basePairs.select(
          (col("u") + lit(k * 10000000L)).as("u"),
          (col("v") + lit(k * 10000000L)).as("v"))).reduce(_ union _)
        val m = pairs.count()
        val r = time(s"triangles             m=$m") {
          graft.query.Graph.triangleStats(pairs).head()
        }
        val tri = r.getLong(2)
        if (copies == 1) baseTri = tri
        require(tri == baseTri * copies,
          s"triangle law broken: $tri != $baseTri x $copies")
      }
      org.apache.spark.sql.graft.ColumnBridge
        .releaseLocalCheckpoint(basePairs)
    }

    // ---- replaceWhere: table grows by NEW partitions, slice fixed -------------
    // The merge-probe claim applied to backfill: replace of a fixed 3-date
    // slice must stay FLAT while the table grows 10x by unrelated dates
    // (only touched partitions are read + rewritten).
    if (want("replace")) {
      println("\n== replaceWhere: fixed slice, table 10x by new dates ==")
      val ev0 = graft.query.Tables(spark, sfDir, "events")
        .select(col("event_id"), col("event_type"),
          to_date(col("ts")).as("date"))
      for (copies <- Seq(1, 5, 10)) {
        val t = graft.query.Pipelines.demoRoot("graft_rp").toString + "/t"
        val big = (0 until copies).map(k => ev0.select(
          (col("event_id") + lit(k * 10000000L)).as("event_id"),
          col("event_type"), date_add(col("date"), k * 40).as("date")))
          .reduce(_ union _)
        graft.store.TableStore.append(big.repartition(8), t)
        val batch = ev0
          .filter(col("date").between(lit("2024-01-03"), lit("2024-01-04")))
          .filter(col("event_type") =!= "error" || col("event_type").isNull)
        val nDates = copies * 30
        time(f"replace 3-date slice  dates=$nDates%-5d") {
          graft.store.TableStore.replaceWhere(spark, batch, t,
            col("date").between(lit("2024-01-03"), lit("2024-01-05")))
        }
      }
    }

    // ---- semantic decontamination: corpus 10x, eval fixed ---------------------
    // The claim: one map-only corpus pass (normalize + argbest kernel) +
    // broadcast idx-join — runtime tracks the scan, eval-side cost flat.
    if (want("semdecon")) {
      println("\n== semantic decon: corpus 10x, eval fixed at 50 ==")
      val evalSet = emb.filter(col("vec_id") % 10 === 0).limit(50)
        .localCheckpoint()
      for (copies <- Seq(1, 5, 10)) {
        val corpus = replicateEmb(emb, copies).localCheckpoint()
        val n = corpus.count()
        time(s"semantic decon        corpus=$n") {
          graft.llm.VectorOps.semanticContaminationPairs(
            corpus, evalSet, 0.9).count()
        }
        org.apache.spark.sql.graft.ColumnBridge
          .releaseLocalCheckpoint(corpus)
      }
      org.apache.spark.sql.graft.ColumnBridge
        .releaseLocalCheckpoint(evalSet)
    }

    // ---- skyline: rows 10x, staircase sliver bounded --------------------------
    // The claim: one scan + a ≤B² cell collect; the exact sweep touches
    // only staircase-cell rows (~corpus/B), so runtime tracks the scan
    // while frontier size stays data-shaped, not corpus-shaped.
    if (want("skyline")) {
      println("\n== skyline: orders 10x ==")
      val o0 = graft.query.Tables(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate").cast("long").as("od"))
      for (copies <- Seq(1, 5, 10)) {
        val big = (0 until copies).map(k => o0.select(
          (col("o_orderkey") + lit(k * 100000000L)).as("o_orderkey"),
          // jitter keeps the copies from being exact duplicates
          (col("o_totalprice") + lit(k * 0.001)).as("o_totalprice"),
          col("od"))).reduce(_ union _).localCheckpoint()
        val n = big.count()
        val fr = time(s"skyline               n=$n") {
          graft.query.Skyline.skyline(big,
            col("o_totalprice"), col("od")).count()
        }
        println(s"    frontier=$fr")
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(big)
      }
      // WORST case for grid pruning: anti-correlated points (y = -x).
      // Nothing dominates anything, every diagonal cell survives pruning,
      // and the exact sweep sees the ENTIRE corpus as candidates — the
      // uniform orders case above is the best case (sliver ~2n/B). The
      // round-7 two-phase prefix max spreads that corpus-sized sweep
      // across B window partitions; the pre-fix single-partition window
      // put it all on one task. Bar: runtime tracks n ~linearly and the
      // frontier equals n (every point survives).
      println("\n== skyline: anti-correlated (no pruning) ==")
      for (copies <- Seq(1, 5, 10)) {
        val n0 = 150000L * copies
        val big = spark.range(n0).select(col("id"),
            col("id").cast("double").as("x"),
            (-col("id")).cast("double").as("y"))
          .repartition(32).localCheckpoint()
        val fr = time(s"skyline anti-corr     n=$n0") {
          graft.query.Skyline.skyline(big, col("x"), col("y")).count()
        }
        println(s"    frontier=$fr")
        assert(fr == n0, s"anti-correlated frontier must be n ($n0), got $fr")
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(big)
      }
    }

    // ---- time-series: events 10x, rollup cardinality fixed --------------------
    // The claim: the decayed-sum self-join and the anomaly window run on
    // the daily ROLLUP (types x days — constant under row replication), so
    // cost beyond the one scan+aggregate is flat.
    if (want("ewma")) {
      println("\n== ewma/anomaly: rows 10x, rollup fixed ==")
      val ev0 = graft.query.Tables(spark, sfDir, "events")
        .select(col("event_type"), col("ts"), col("user_id"))
      for (copies <- Seq(1, 5, 10)) {
        val big = (0 until copies).map(k => ev0.select(col("event_type"),
          col("ts"), (col("user_id") + lit(k * 1000000L)).as("user_id")))
          .reduce(_ union _).localCheckpoint()
        val n = big.count()
        val daily = big.groupBy(col("event_type"),
            to_date(col("ts")).as("day")).agg(count(lit(1)).as("cnt"))
        time(s"ewma decayed sum      rows=$n") {
          val a2 = daily.select(col("event_type"), col("day"), col("cnt"))
          val b2 = daily.select(col("event_type").as("et_b"),
            col("day").as("day_b"), col("cnt").as("cnt_b"))
          a2.join(b2, col("event_type") === col("et_b") &&
              datediff(col("day"), col("day_b")).between(0, 13))
            .groupBy("event_type", "day")
            .agg(sum(col("cnt_b") *
              pow(lit(0.5), datediff(col("day"), col("day_b")) / 7.0))
              .as("decayed"))
            .count()
        }
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(big)
      }
    }
    // ---- label propagation: disjoint graph copies, structure law --------------
    // Copies shift node ids, so communities replicate exactly: runtime
    // must track m (edges), and the distinct-community count must be
    // EXACTLY k x the base count — per-copy structural law, like the
    // triangles probe.
    if (want("labelprop")) {
      println("\n== label propagation: disjoint graph copies ==")
      val li = graft.query.Tables(spark, sfDir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select("l_orderkey", "l_partkey")
      val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      val b = li.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("v"))
      val basePairs = a.join(b,
          col("l_orderkey") === col("ok_b") && col("u") < col("v"))
        .select("u", "v").distinct().localCheckpoint()
      var baseComms = -1L
      for (copies <- Seq(1, 5, 10)) {
        val pairs = (0 until copies).map(k => basePairs.select(
            (col("u") + lit(k * 100000000L)).as("u"),
            (col("v") + lit(k * 100000000L)).as("v")))
          .reduce(_ union _).localCheckpoint()
        val m = pairs.count()
        val comms = time(s"label prop (2 rounds) m=$m") {
          graft.query.Graph.labelPropagation(pairs, rounds = 2)
            .select("label").distinct().count()
        }
        if (baseComms < 0) baseComms = comms
        println(s"    communities=$comms")
        assert(comms == baseComms * copies,
          s"copies=$copies: expected ${baseComms * copies}, got $comms")
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(pairs)
      }
      org.apache.spark.sql.graft.ColumnBridge
        .releaseLocalCheckpoint(basePairs)
    }

    // ---- containment: replicated docs, df-cap skew guard ----------------------
    // Replication grows every shared shingle's document frequency k x, so
    // uncapped per-hash pair cost is Σ df² ~ k² in principle; at these
    // fixture sizes fixed job costs dominate and both variants stay flat
    // — the probe pins THAT (no blowup at 5x), while the cap's
    // drop-the-boilerplate behavior itself is pinned by the planted
    // hot-shingle unit test (TextOpsSpec).
    if (want("containment")) {
      println("\n== containment: docs 10x, df cap vs uncapped ==")
      val base = graft.query.Tables(spark, sfDir, "documents")
        .filter(col("doc_id") < 150).select("doc_id", "text")
      for (copies <- Seq(1, 3, 5)) {
        val d = replicateDocs(base, copies).localCheckpoint()
        val n = d.count()
        time(s"containment UNCAPPED  docs=$n") {
          graft.llm.TextOps.containmentPairs(d, 0.5).count()
        }
        time(s"containment maxDf=60  docs=$n") {
          graft.llm.TextOps.containmentPairs(d, 0.5, maxDf = 60).count()
        }
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(d)
      }
    }

    // ---- SCD2 point-in-time join: facts 10x, dim fixed ------------------------
    // The claim: pitJoin is an equi-join with residual interval bounds —
    // cost tracks the FACT scan linearly; the versioned dim is the small
    // broadcast side regardless of fact growth, and output cardinality
    // equals matched-fact cardinality (totality, asserted per size).
    if (want("scd2")) {
      println("\n== scd2 pitJoin: facts 10x, dim fixed ==")
      val dimDir = java.nio.file.Files
        .createTempDirectory("scd2probe").toString + "/dim"
      val cust = graft.query.Tables(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.store.Scd2.init(cust, dimDir, java.sql.Date.valueOf("1995-01-01"))
      graft.store.Scd2.apply(spark, dimDir, cust.withColumn("c_mktsegment",
          when(col("c_custkey") % 7 === 0, lit("MOVED"))
            .otherwise(col("c_mktsegment"))),
        Seq("c_custkey"), java.sql.Date.valueOf("1998-01-01"))
      val o0 = graft.query.Tables(spark, sfDir, "orders").select(
        col("o_custkey").as("c_custkey"), col("o_orderdate"))
      for (copies <- Seq(1, 5, 10)) {
        val facts = (0 until copies).map(_ => o0).reduce(_ union _)
          .localCheckpoint()
        val n = facts.count()
        val joined = time(s"pitJoin               facts=$n") {
          graft.store.Scd2.pitJoin(facts, spark, dimDir,
            Seq("c_custkey"), col("o_orderdate")).count()
        }
        assert(joined == n,
          s"totality: every fact key is a known dim key, got $joined of $n")
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(facts)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(dimDir).getParentFile)
    }

    // ---- product quantization: corpus 10x, query batch fixed ------------------
    // The claims, stage by stage: TRAIN cost is bounded (fixed driver
    // sample — one TakeOrdered job + driver Lloyd, corpus-independent);
    // ENCODE is one codegen'd map pass that tracks the scan; SEARCH is one
    // pass over the 8-int-per-vector code table plus a shortlist-bounded
    // exact rerank, so query latency tracks corpus size with the CODE
    // scan's constant, never the float scan's.
    if (want("pq")) {
      println("\n== product quantization: corpus 10x, 10 queries ==")
      val pqQueries = emb.filter(col("vec_id") < 10).localCheckpoint()
      for (copies <- Seq(1, 5, 10)) {
        val corpus = replicateEmb(emb, copies).localCheckpoint()
        val n = corpus.count()
        val model = time(s"pq train              corpus=$n") {
          graft.llm.Pq.train(corpus)
        }
        val codes = time(s"pq encode             corpus=$n") {
          val c = graft.llm.Pq.encode(corpus, model).localCheckpoint()
          c.count(); c
        }
        time(s"pq adc+rerank top5    corpus=$n") {
          graft.llm.Pq.pqTopK(codes, corpus, pqQueries, model, 5).count()
        }
        // the STORED IVF-PQ path: build+persist is the one-time cost;
        // the query must stay flat — probed cells reach the scan as
        // partition filters and the scanned bytes are codes, not floats
        val idxDir = java.nio.file.Files
          .createTempDirectory("pqprobe").toString + "/idx"
        time(s"ivfpq build+store     corpus=$n") {
          graft.llm.Pq.writeIvfPqIndex(
            graft.llm.Pq.buildIvfPqIndex(corpus), idxDir)
        }
        val stored = graft.llm.Pq.readIvfPqIndex(spark, idxDir)
        time(s"ivfpq stored query    corpus=$n") {
          graft.llm.Pq.ivfPqQuery(stored, corpus, pqQueries, 5,
            nProbe = 4, shortlist = 128).count()
        }
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(idxDir).getParentFile)
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(codes)
        org.apache.spark.sql.graft.ColumnBridge.releaseLocalCheckpoint(corpus)
      }
      org.apache.spark.sql.graft.ColumnBridge
        .releaseLocalCheckpoint(pqQueries)
    }

    // ---- round-8 session 2: the retrieval/substring/DSIR stack ---------------
    // Replicated copies are WORST-CASE inputs for all three text ops: every
    // content gram repeats `copies` times (substring dedup cuts almost the
    // whole corpus), and the query terms cover the fixture vocabulary (bm25
    // postings ≈ all token occurrences). Runtime must track corpus size.
    if (want("retrieval")) {
      println("\n== retrieval + substring dedup + DSIR at x100 ==")
      for (copies <- Seq(10, 100)) {
        val d = replicateDocs(docs, copies).repartition(32).localCheckpoint()
        val n = d.count()
        val queries = d.filter(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"),
            array_distinct(split(col("text"), " ")).as("terms"))
        time(f"bm25 top-10           n=$n%-7d") {
          graft.llm.Retrieval.bm25(d, queries, 10).count()
        }
        val kept = time(f"substring dedup k=8   n=$n%-7d") {
          graft.llm.SubstringDedup.clean(d, 8)
            .agg(sum(col("kept_tokens"))).head.getLong(0)
        }
        println(s"    kept_tokens=$kept")
        time(f"dsir hashed 64k       n=$n%-7d") {
          graft.llm.Dsir.importanceWeights(d,
            pmod(col("doc_id"), lit(20L)) === 0L, hashBuckets = 65536)
            .agg(avg(col("logw"))).head
        }
        d.unpersist()
      }
      for (copies <- Seq(10, 100)) {
        val d = replicateDocs(docs, copies).repartition(32).localCheckpoint()
        val e = replicateEmb(emb, copies).repartition(32).localCheckpoint()
        val n = d.count()
        time(f"hybrid RRF top-10     n=$n%-7d") {
          graft.llm.Retrieval.hybridRrf(d, e, Seq(0L, 1L, 2L, 3L, 4L),
            k = 10, n = 50).count()
        }
        d.unpersist(); e.unpersist()
      }
    }
    spark.stop()
  }
}
