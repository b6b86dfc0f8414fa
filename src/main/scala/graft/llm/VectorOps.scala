package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import graft.Q
import graft.query.Tables
import graft.query.Tables.cnt

/** Similarity search + hashing-based near-dup detection over embedding and
  * text columns (SURVEY.md §2.11 L2/L3/L4).
  *
  * Two tiers, matching the 100 TB design stance:
  *  - exact brute-force cosine top-k: correct baseline + the verifier; cross
  *    join is bounded by a small query set, so it is a broadcast of the
  *    queries against a single scan of the corpus — O(|corpus| x |queries|)
  *    with no shuffle of the corpus;
  *  - LSH-bucketed variants (MinHash for Jaccard, random-projection for
  *    cosine/L2): candidate generation via bucket join — the only pairs ever
  *    materialized share a bucket, so cost tracks true-neighbor density, not
  *    |corpus|^2.
  */
object VectorOps {

  /** Elementwise float→double, so arithmetic is double everywhere (matches
    * the oracle, avoids float32 summation drift).
    */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via higher-order fold — stays inside codegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** L3 baseline: exact top-k cosine neighbors for each query vector.
    * `queries` must be small (broadcast side).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("qv"))
    val t = corpus.select(col("vec_id").as("neighbor_id"),
      toDouble(col("embedding")).as("tv"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    t.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("tv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** L2 scale path: MinHash-LSH near-dup candidate pairs over word
    * 3-shingles. shingle → HashingTF (sparse binary) → MinHash signatures →
    * bucket join. Deterministic under the fixed seed.
    */
  def minhashPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = docs.select(col("doc_id"),
      TextOps.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val featured = tf.transform(sh)
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = mh.fit(featured)
    // signatures are computed once and persisted: the self-join would
    // otherwise re-shingle + re-hash the corpus for each side (and at 100 TB
    // the signature table, not the corpus, is what you want shuffling).
    val signed = model.transform(featured)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    model.approxSimilarityJoin(signed, signed, threshold, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("id_a"),
        col("datasetB.doc_id").as("id_b"),
        round(lit(1.0) - col("jaccard_dist"), 4).as("est_jaccard"))
      .filter(col("id_a") < col("id_b"))
  }

  /** L3 scale path: approximate cosine ANN via random-projection LSH on
    * unit-normalized vectors (Euclidean distance on the unit sphere is a
    * monotone transform of cosine: d^2 = 2(1 - cos)).
    */
  private def unitFeatures(df: DataFrame): DataFrame = {
    val v = toDouble(col("embedding"))
    df.select(col("vec_id"),
      array_to_vector(transform(v, x => x / l2norm(v))).as("features"))
  }

  private def brpLsh = new BucketedRandomProjectionLSH()
    .setInputCol("features").setOutputCol("hashes")
    .setBucketLength(0.5).setNumHashTables(4).setSeed(42L)

  private def annSelect(joined: DataFrame): DataFrame = joined
    .select(
      col("datasetA.vec_id").as("query_id"),
      col("datasetB.vec_id").as("neighbor_id"),
      round(lit(1.0) - col("dist") * col("dist") / 2.0, 4).as("est_cos"))
    .filter(col("query_id") =!= col("neighbor_id"))

  def annCosine(corpus: DataFrame, queries: DataFrame, cosThreshold: Double)
      : DataFrame = {
    val corpusU = unitFeatures(corpus)
    val model = brpLsh.fit(corpusU)
    // pre-hash + persist the corpus side once; the (small) query side is
    // hashed on its own — don't pay the full corpus transform twice.
    val corpusH = model.transform(corpusU)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    annSelect(model.approxSimilarityJoin(
      model.transform(unitFeatures(queries)), corpusH,
      math.sqrt(2.0 * (1.0 - cosThreshold)), "dist").toDF())
  }

  /** All-pairs variant: hash the corpus exactly once and self-join the
    * persisted signature table (the shape an LSH dedup sweep has at scale).
    */
  def annCosineSelf(corpus: DataFrame, cosThreshold: Double): DataFrame = {
    val corpusU = unitFeatures(corpus)
    val model = brpLsh.fit(corpusU)
    val signed = model.transform(corpusU)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    annSelect(model.approxSimilarityJoin(signed, signed,
      math.sqrt(2.0 * (1.0 - cosThreshold)), "dist").toDF())
  }

  val all: Seq[Q] = Seq(

    // ---- L3: exact cosine top-5 for the first 10 vectors ---------------------
    Q("q_cosine_topk", Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
        |p AS (
        |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |    list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * t.v[i]))
        |    / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
        |       * sqrt(list_sum(list_transform(t.v, x -> x * x)))) AS cos
        |  FROM q, e t WHERE q.vec_id <> t.vec_id)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank,
        |       round(cos, 3) AS cosine
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        |      FROM p)
        |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin),
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 5)
          .withColumn("cosine", round(col("cos"), 3))
          .select("query_id", "neighbor_id", "rank", "cosine")
          .orderBy("query_id", "rank")
      }),

    // ---- L2: MinHash-LSH near-dup pairs (approx: rows-only check) -------------
    Q("q_dedup_minhash", None,
      (s, d) => minhashPairs(Tables(s, d, "documents"), 0.6)
        .filter(col("est_jaccard") >= 0.5)
        .select("id_a", "id_b", "est_jaccard")
        .orderBy("id_a", "id_b")),

    // ---- L3: LSH-bucketed ANN (approx: rows-only check) ------------------------
    Q("q_ann_lsh", None,
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        annCosine(emb, emb.filter(col("vec_id") < 10), 0.2)
          .orderBy("query_id", "neighbor_id")
      }),

    // ---- L2 on embeddings: near-duplicate vectors via LSH buckets ---------------
    // (threshold tuned to the synthetic fixture's cosine range: max pairwise
    // cosine is ~0.45, so 0.35 marks the "suspiciously close" tail)
    Q("q_embed_neardup", None,
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        annCosineSelf(emb, 0.35)
          .filter(col("query_id") < col("neighbor_id"))
          .select(col("query_id").as("id_a"),
            col("neighbor_id").as("id_b"), col("est_cos"))
          .orderBy("id_a", "id_b")
      })
  )
}
