package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class SamplingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("splitBucket: deterministic, disjoint-covering, roughly uniform") {
    val df = spark.range(10000).toDF("id")
    val b1 = df.select(Sampling.splitBucket($"id", 10).as("b"))
    val b2 = df.select(Sampling.splitBucket($"id", 10).as("b"))
    // re-run stability: identical assignment both times
    assert(b1.collect().map(_.getLong(0)).toSeq
      === b2.collect().map(_.getLong(0)).toSeq)
    val counts = b1.groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet === (0L until 10L).toSet) // covering
    // uniformity: every bucket within 20% of the expected 1000
    assert(counts.values.forall(n => n > 800 && n < 1200), counts.toString)
    // a different salt re-deals the assignment
    val b3 = df.select(Sampling.splitBucket($"id", 10, salt = 7L).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b3 !== b1.collect().map(_.getLong(0)).toSeq)
  }

  test("shardShuffle: total permutation — every row once, contiguous " +
    "positions per shard, bit-stable across re-runs, salt re-deals") {
    val df = spark.range(1000).toDF("id")
    val s1 = Sampling.shardShuffle(df, $"id", 8)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    // totality: every input id appears exactly once
    assert(s1.map(_._1).sorted.toSeq === (0L until 1000L).toSeq)
    // per shard: positions are exactly 1..n (a permutation, no gaps/dupes)
    for ((_, rows) <- s1.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    // re-run stability: identical (shard, pos) for every id
    val s2 = Sampling.shardShuffle(df, $"id", 8)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(s1.sortBy(_._1).toSeq === s2.sortBy(_._1).toSeq)
    // the shard-local order is scrambled, not id order
    val shard0 = s1.filter(_._2 == s1.head._2).sortBy(_._3).map(_._1)
    assert(shard0.toSeq !== shard0.sorted.toSeq)
    // a different salt produces a different permutation
    val s3 = Sampling.shardShuffle(df, $"id", 8, salt = 9L)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(s3.sortBy(_._1).toSeq !== s1.sortBy(_._1).toSeq)
  }

  test("writeTrainingShards: one pre-sorted file per shard; reading a " +
    "shard streams the training order with no sort") {
    val df = spark.range(500).toDF("id")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString + "/t"
    Sampling.writeTrainingShards(df, $"id", 4, dir)
    val want = Sampling.shardShuffle(df, $"id", 4)
      .select("shard", "pos", "id").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 4)
    for (sd <- shardDirs) {
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: expected one file per shard")
      val shard = sd.getName.stripPrefix("shard=").toLong
      // file order IS training order: no sort on read
      val got = spark.read.parquet(files.head.toString)
        .select("id").as[Long].collect().toSeq
      assert(got == want(shard), s"shard $shard order mismatch")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("stratifiedTake: exactly k per stratum, stable, honors the order key") {
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "parity")
    val got = Sampling.stratifiedTake(df, "parity", col("id"), 3)
      .select("parity", "id").as[(String, Long)].collect().toSet
    // order by id -> the 3 lowest ids of each stratum
    assert(got === Set(("odd", 1L), ("odd", 3L), ("odd", 5L),
      ("even", 2L), ("even", 4L), ("even", 6L)))
    // strata smaller than k return all their rows, no padding
    val tiny = Seq((1L, "a"), (2L, "b")).toDF("id", "parity")
    assert(Sampling.stratifiedTake(tiny, "parity", col("id"), 5).count() === 2)
    // a DESCENDING order key (the top-k-per-stratum curation use) must be
    // honored, not re-wrapped into ascending
    val top = Sampling.stratifiedTake(df, "parity", col("id").desc, 2)
      .select("parity", "id").as[(String, Long)].collect().toSet
    assert(top === Set(("even", 100L), ("even", 98L),
      ("odd", 99L), ("odd", 97L)))
  }

  test("temperatureMix: alpha=1 is the natural distribution, alpha=0 is " +
    "uniform-over-sources, lower alpha boosts the tail share; quotas cap " +
    "kept counts and reruns are bit-identical") {
    // a head source 8x the tail: 8000 / 1000 / 1000 docs
    val df = (1L to 10000L)
      .map(i => (i, if (i <= 8000) "head" else if (i <= 9000) "mid" else "tail"))
      .toDF("doc_id", "source")
    def run(alpha: Double) = Sampling.temperatureMix(df, budget = 1000, alpha)
      .select("source", "n_avail", "quota", "n_kept", "id_sum")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val nat = run(1.0)
    // alpha = 1: quota proportional to n -> head gets 800, mid/tail 100
    assert(nat("head")._3 === 800L && nat("mid")._3 === 100L
      && nat("tail")._3 === 100L, nat.toString)
    val uni = run(0.0)
    // alpha = 0: pow(n,0)=1 -> equal thirds (floor of 333.333)
    assert(uni("head")._3 === 333L && uni("tail")._3 === 333L, uni.toString)
    val damped = run(0.5)
    // in between: head share damped below natural, tail boosted above it
    assert(damped("head")._3 < nat("head")._3)
    assert(damped("tail")._3 > nat("tail")._3)
    // kept never exceeds quota or availability; here quota < n_avail so ==
    for ((_, (_, nAvail, quota, kept, _)) <- damped)
      assert(kept === math.min(quota, nAvail))
    // a genuinely tail-short source contributes all it has, no padding
    val short = df.filter(col("source") =!= "tail")
      .union(Seq((9999L, "tail"), (10000L, "tail")).toDF("doc_id", "source"))
    val sm = Sampling.temperatureMix(short, budget = 1000, alpha = 0.0)
      .select("source", "n_kept").as[(String, Long)].collect().toMap
    assert(sm("tail") === 2L)
    // determinism: identical selected sets (id_sum checksum) across runs
    assert(run(0.5).toSeq.sortBy(_._1) === damped.toSeq.sortBy(_._1))
  }

  test("epochMix: emits exactly quota rows per source; upsampled sources " +
    "repeat docs across contiguous epochs 1..reps; downsampled sources " +
    "never repeat; deterministic across reruns") {
    val df = (1L to 1000L)
      .map(i => (i, if (i <= 900) "head" else "tail")).toDF("doc_id", "source")
    // alpha=0 -> each source gets floor(2000 * 0.5) = 1000:
    // head (900 docs) upsamples, tail (100 docs) upsamples 10 epochs
    val out = Sampling.epochMix(df, budget = 2000, alpha = 0.0)
      .select("doc_id", "source", "epoch").as[(Long, String, Long)].collect()
    val bySrc = out.groupBy(_._2)
    assert(bySrc("head").length === 1000 && bySrc("tail").length === 1000)
    // every tail doc appears exactly 10 times, epochs exactly 1..10
    for ((_, rows) <- bySrc("tail").groupBy(_._1))
      assert(rows.map(_._3).sorted.toSeq === (1L to 10L))
    // head: 900 docs, quota 1000 -> 100 docs twice, 800 once; epochs
    // contiguous from 1 for every doc
    val headReps = bySrc("head").groupBy(_._1).map(_._2.length)
    assert(headReps.count(_ == 2) * 2 + headReps.count(_ == 1) === 1000)
    for ((_, rows) <- bySrc("head").groupBy(_._1))
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length))
    // a big corpus under a small budget downsamples: no doc repeats
    val down = Sampling.epochMix(df, budget = 100, alpha = 0.0)
      .select("doc_id", "epoch").as[(Long, Long)].collect()
    assert(down.length === 100 && down.forall(_._2 == 1L))
    // determinism
    val out2 = Sampling.epochMix(df, budget = 2000, alpha = 0.0)
      .select("doc_id", "source", "epoch").as[(Long, String, Long)].collect()
    assert(out.sortBy(r => (r._1, r._3)).toSeq
      === out2.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("weighted mixing via splitBucket: rates hold and re-runs are identical") {
    val df = (1L to 9000L)
      .map(i => (i, s"src${i % 3}")).toDF("id", "source")
    def mix() = df
      .withColumn("rate", when(col("source") === "src0", 100)
        .when(col("source") === "src1", 50).otherwise(20))
      .filter(Sampling.splitBucket(col("id"), 100) < col("rate"))
    val counts = mix().groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(counts("src0") === 3000L) // rate 100 keeps everything
    // hash-uniform rates: within 15% of target on 3000 rows/source
    assert(math.abs(counts("src1") - 1500L) < 225, counts.toString)
    assert(math.abs(counts("src2") - 600L) < 90, counts.toString)
    // determinism: the sampled ID SET is identical across runs
    val ids1 = mix().select("id").as[Long].collect().toSet
    val ids2 = mix().select("id").as[Long].collect().toSet
    assert(ids1 === ids2)
  }
}
