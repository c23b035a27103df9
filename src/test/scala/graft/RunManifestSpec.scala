package graft

import java.nio.file.Files

import graft.sources.RunManifest

/** The incremental-run ledger contract (reference schedule surface,
  * main_dag.py:491-523): intervals tile half-open without gaps,
  * replayed run_ids no-op, uncommitted (crashed) runs re-process. */
class RunManifestSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_manifest").toString

  test("consecutive runs tile half-open intervals; watermark advances") {
    val path = tmp()
    implicit val s = spark
    var seen = Vector.empty[(Long, Long)]
    assert(RunManifest.incrementalRun(spark, path, "r1", 100L, epochFloor = 0L) {
      (lo, hi) => seen :+= ((lo, hi)) } === Some((0L, 100L)))
    assert(RunManifest.incrementalRun(spark, path, "r2", 250L) {
      (lo, hi) => seen :+= ((lo, hi)) } === Some((100L, 250L)))
    assert(seen === Vector((0L, 100L), (100L, 250L)))
    assert(RunManifest.lastWatermark(spark, path) === Some(250L))
  }

  test("a replayed committed run_id is a no-op (body never runs)") {
    val path = tmp()
    var calls = 0
    RunManifest.incrementalRun(spark, path, "weekly-2026-08-09", 100L, 0L) {
      (_, _) => calls += 1 }
    assert(RunManifest.incrementalRun(spark, path, "weekly-2026-08-09", 999L, 0L) {
      (_, _) => calls += 1 } === None)
    assert(calls === 1)
    assert(RunManifest.lastWatermark(spark, path) === Some(100L))
  }

  test("a crashed run leaves no ledger row; the retry re-processes its interval") {
    val path = tmp()
    intercept[RuntimeException] {
      RunManifest.incrementalRun(spark, path, "r1", 100L, 0L) {
        (_, _) => throw new RuntimeException("job died before landing") }
    }
    // nothing committed -> watermark unmoved -> the retry sees the
    // SAME interval (outputs are idempotent, so re-landing is safe)
    assert(RunManifest.lastWatermark(spark, path) === None)
    assert(RunManifest.incrementalRun(spark, path, "r1-retry", 100L, 0L) {
      (_, _) => () } === Some((0L, 100L)))
  }

  test("an early-fired schedule (hi <= committed watermark) is a no-op") {
    val path = tmp()
    RunManifest.incrementalRun(spark, path, "r1", 100L, 0L) { (_, _) => () }
    assert(RunManifest.incrementalRun(spark, path, "r2", 100L) {
      (_, _) => fail("empty interval must not run") } === None)
  }

  test("commit race on one run_id: exactly one winner, the loser throws loudly") {
    val path = tmp()
    // the race window is 'both committers passed the replay probe
    // before either committed' — reproduce the second committer's
    // state by driving the commit step directly for the same run_id
    RunManifest.commit(spark, path, "r1", 0L, 100L)
    val e = intercept[IllegalStateException] {
      RunManifest.commit(spark, path, "r1", 0L, 100L)
    }
    assert(e.getMessage.contains("lost the commit race"))
    // the ledger holds ONE row for r1 — never a silent duplicate —
    // and no staging debris survives the lost race
    assert(RunManifest.runs(spark, path).count() === 1)
    assert(RunManifest.lastWatermark(spark, path) === Some(100L))
    val leftovers = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith(".staging"))
    assert(leftovers.isEmpty, s"staging debris: ${leftovers.toSeq}")
    // a racing committer for a DIFFERENT run_id is unaffected
    RunManifest.commit(spark, path, "r2", 100L, 200L)
    assert(RunManifest.lastWatermark(spark, path) === Some(200L))
  }

  test("run_id is constrained to partition-safe characters") {
    val path = tmp()
    intercept[IllegalArgumentException] {
      RunManifest.incrementalRun(spark, path, "bad/id with:stuff", 10L, 0L) {
        (_, _) => () }
    }
  }
}
