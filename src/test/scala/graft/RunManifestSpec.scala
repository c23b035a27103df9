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
}
