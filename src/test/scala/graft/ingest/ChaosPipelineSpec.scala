package graft.ingest

import java.nio.file.{Files, Paths}
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.store.TableStore

/** Chaos sweep over the continuous pipeline (the round-7 verdict's item 6):
  * for EVERY named crash point inside a tick — after the inflight marker,
  * after each curated-table append, before the view folds, after ingest,
  * after compaction, after the result publish, after the hwm — kill tick 2
  * of a 3-tick run at that point, resume, and prove the final store,
  * result tables, and views are CONTENT-IDENTICAL to a never-crashed
  * 3-tick run. One golden run, eight deaths, eight equivalence proofs —
  * the exactly-once claim as a sweep instead of a single hand-picked
  * crash (ContinuousPipelineSpec keeps the original worst-point case).
  *
  * The kill is an exception thrown from `GhaPipeline.chaosHook`
  * (everything the process wrote up to that point stays on disk, exactly
  * like a kill -9 at that instruction); the injected clock makes each
  * tick's hour range deterministic.
  */
class ChaosPipelineSpec extends AnyFunSuite with SparkFixture {

  private def watchLine(user: String, h: Int) =
    s"""{"type":"WatchEvent","actor":{"login":"$user"},"repo":{"name":"r/x"},"created_at":"2024-02-29T0$h:10:00Z","payload":{"action":"started"}}"""
  private def pushLine(user: String, h: Int) =
    s"""{"type":"PushEvent","actor":{"login":"$user"},"repo":{"name":"r/x"},"created_at":"2024-02-29T0$h:20:00Z","payload":{"commits":[{"sha":"s$h","message":"use dask"}]}}"""
  private def commentLine(user: String, h: Int) =
    s"""{"type":"IssueCommentEvent","actor":{"login":"$user"},"repo":{"name":"r/x"},"created_at":"2024-02-29T0$h:30:00Z","payload":{"issue":{"number":1,"title":"t","created_at":"2024-02-29T01:00:00Z","user":{"login":"x"}},"comment":{"body":"try dask for this","author_association":"NONE"}}}"""

  private val hours: Seq[(Int, Seq[String])] = Seq(
    1 -> ((1 to 6).map(i => watchLine(s"w$i", 1)) ++
      Seq(pushLine("alice", 1), commentLine("ada", 1))),
    2 -> Seq(watchLine("w7", 2), watchLine("w8", 2), pushLine("bob", 2)),
    3 -> Seq(watchLine("w9", 3), pushLine("carol", 3), commentLine("eve", 3)))

  private val backfill = Instant.parse("2024-02-29T01:00:00Z")
  private def tickNow(h: Int): Instant =
    Instant.parse(f"2024-02-29T0${h + 2}%d:10:00Z")

  private def mkDirs(tag: String): (String, String, String) = {
    val base = Paths.get("/root/repo/target/tmp")
    Files.createDirectories(base)
    val dir = Files.createTempDirectory(base, s"chaos_$tag").toString
    val landing = s"$dir/landing"
    Files.createDirectories(Paths.get(landing))
    (landing, s"$dir/store", s"$dir/mv")
  }

  private def land(landing: String, h: Int): Unit =
    Files.write(Paths.get(s"$landing/2024-02-29-$h.json"),
      hours.find(_._1 == h).get._2.mkString("\n").getBytes)

  private def tick(landing: String, store: String, mv: String,
      h: Int): Seq[String] =
    GhaPipeline.incrementalRunWithViews(
      spark, landing, store, mv, tickNow(h), backfill)

  /** Everything observable, as sorted row strings — the content-identity
    * fingerprint (file names/UUIDs legitimately differ across runs).
    */
  private def fingerprint(store: String, mv: String): Map[String, Seq[String]] = {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val curated = graft.schema.GhaSchemas.tableNames.map { t =>
      t -> rows(TableStore.read(spark, s"$store/$t",
        graft.schema.GhaSchemas.curated(t)))
    }.toMap
    curated ++ Map(
      "results/commits" -> rows(
        TableStore.read(spark, s"$store/results/commits")),
      "results/comments" -> rows(
        TableStore.read(spark, s"$store/results/comments")),
      "mv/repo_counts" -> rows(TableStore.read(spark, s"$mv/repo_counts",
        new org.apache.spark.sql.types.StructType()
          .add("repo", "string").add("count", "long"))))
  }

  private def resetHook(): Unit = GhaPipeline.chaosHook = _ => ()

  test("kill tick 2 at EVERY chaos point: the resumed run is " +
    "content-identical to the never-crashed run") {
    // golden: 3 clean ticks
    val (gl, gs, gm) = mkDirs("gold")
    for (h <- 1 to 3) { land(gl, h); assert(tick(gl, gs, gm, h).size === 1) }
    val golden = fingerprint(gs, gm)
    assert(golden("watch").size === 9, "fixture sanity")

    val killPoints = Seq("post-inflight-marker", "post-append:watch",
      "post-append:commit", "pre-views", "post-ingest", "post-compact",
      "post-results", "post-hwm")
    for (kp <- killPoints) {
      val (l, s, m) = mkDirs(kp.replace(":", "_").replace("-", "_"))
      land(l, 1); assert(tick(l, s, m, 1).size === 1)
      land(l, 2)
      // arm the kill for tick 2 only
      GhaPipeline.chaosHook = name =>
        if (name == kp) {
          resetHook() // one-shot: the resume must run clean
          throw new RuntimeException(s"chaos kill @ $kp")
        }
      val died =
        try { tick(l, s, m, 2); false }
        catch { case e: RuntimeException if e.getMessage.contains("chaos") =>
          true }
      finally resetHook()
      assert(died, s"$kp never fired — a renamed hook point breaks the sweep")
      // resume: re-run tick 2 (recovery + re-ingest), then tick 3
      val resumed = tick(l, s, m, 2)
      // post-hwm death already counted the hour; every earlier death re-runs it
      assert(resumed.size === (if (kp == "post-hwm") 0 else 1),
        s"$kp: unexpected resume ingest count ${resumed.size}")
      land(l, 3); assert(tick(l, s, m, 3).size === 1)
      val got = fingerprint(s, m)
      for ((table, want) <- golden)
        assert(got(table) === want, s"$kp: $table diverged from the clean run")
    }
  }
}
