package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("upsertLatest keeps exactly the greatest version per key") {
    val base = Seq((1L, 10, "old"), (2L, 10, "keep")).toDF("k", "v", "tag")
    val delta = Seq((1L, 20, "new"), (3L, 5, "insert")).toDF("k", "v", "tag")
    val out = Pipeline.upsertLatest(base, delta, Seq("k"), Seq(col("v")))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((1L, "new"), (2L, "keep"), (3L, "insert")))
  }

  test("upsertLatest tiebreak makes the merge deterministic") {
    val base = Seq((1L, 10, "a")).toDF("k", "v", "tag")
    val delta = Seq((1L, 10, "b")).toDF("k", "v", "tag")
    val out = Pipeline.upsertLatest(base, delta, Seq("k"), Seq(col("v"), col("tag")))
    assert(out.select("tag").as[String].collect() === Array("b"))
  }

  test("deletedKeys finds snapshot keys missing from the seen batch") {
    val snap = Seq(1L, 2L, 3L).toDF("k")
    val seen = Seq(2L).toDF("sk")
    val out = Pipeline.deletedKeys(snap, seen, "k", "sk")
    assert(out.as[Long].collect().sorted === Array(1L, 3L))
  }

  test("sorted_pairs emits all i<j pairs, any element type") {
    val longs = Seq(Seq(1L, 2L, 3L)).toDF("xs")
      .select(explode(graft.functions.expr.NativeFunctions.sorted_pairs(col("xs"))).as("p"))
      .select("p.a", "p.b").as[(Long, Long)].collect()
    assert(longs === Array((1L, 2L), (1L, 3L), (2L, 3L)))
    val strs = Seq(Seq("x", "y")).toDF("xs")
      .select(explode(graft.functions.expr.NativeFunctions.sorted_pairs(col("xs"))).as("p"))
      .select("p.a", "p.b").as[(String, String)].collect()
    assert(strs === Array(("x", "y")))
    // empty and singleton arrays -> no pairs
    val none = Seq(Seq.empty[Long], Seq(7L)).toDF("xs")
      .select(explode(graft.functions.expr.NativeFunctions.sorted_pairs(col("xs"))).as("p"))
    assert(none.count() === 0L)
  }

  test("pairCounts counts unordered co-occurrence per year") {
    // set 100: members 1,2,3 (year 2020) -> pairs (1,2),(1,3),(2,3)
    // set 200: members 1,2   (year 2020) -> pair (1,2)
    val facts = Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 1L), // dup member row
      (200L, 1L), (200L, 2L)).toDF("set_id", "member")
    val yearOf = Seq((100L, 2020), (200L, 2020)).toDF("set_id", "year")
    // year table passed with columns deliberately reordered: the join
    // key is named explicitly, not positional
    val out = Pipeline.pairCounts(facts, "set_id", "member",
      yearOf.select("year", "set_id"), "set_id")
      .orderBy("member_a", "member_b")
      .select("year", "member_a", "member_b", "n_co")
      .as[(Int, Long, Long, Long)].collect()
    assert(out === Array((2020, 1L, 2L, 2L), (2020, 1L, 3L, 1L), (2020, 2L, 3L, 1L)))
  }

  test("volumeMetrics counts totals, new rows, distinct keys") {
    val df = Seq(("a", true), ("a", false), ("b", true)).toDF("k", "is_new")
    val r = Pipeline.volumeMetrics(df, col("is_new"), "k").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 2L)))
  }

  test("scd2Intervals tiles each key: valid_to(n) == valid_from(n+1), one current row") {
    val df = Seq((1L, 10, "a"), (1L, 20, "b"), (1L, 30, "c"), (2L, 5, "x"))
      .toDF("k", "v", "tag")
    val out = Pipeline.scd2Intervals(df, Seq("k"), Seq(col("v"), col("tag")))
      .orderBy("k", "version_n")
      .select("k", "version_n", "valid_from", "valid_to", "is_current")
      .as[(Long, Int, Int, Option[Int], Boolean)].collect()
    assert(out === Array(
      (1L, 1, 10, Some(20), false),
      (1L, 2, 20, Some(30), false),
      (1L, 3, 30, None, true),
      (2L, 1, 5, None, true)))
  }

  test("mergeApply applies I/U/D delta ops in one pass") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val delta = Seq((2L, "B", "U"), (3L, "c", "D"), (4L, "d", "I"))
      .toDF("k", "v", "op")
    val out = Pipeline.mergeApply(base, delta, "k", "op")
      .orderBy("k").as[(Long, String)].collect()
    // 1 untouched, 2 updated image, 3 deleted, 4 inserted
    assert(out === Array((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("mergeApply fails loudly on a malformed delta op instead of silently deleting") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val delta = Seq((1L, "x", null.asInstanceOf[String])).toDF("k", "v", "op")
    val ex = intercept[Throwable] {
      Pipeline.mergeApply(base, delta, "k", "op").collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("must be I/U/D"), s"unexpected failure: $msgs")
  }

  test("profile reports per-column stats from one scan") {
    val df = Seq((1L, "x", 2.5), (2L, "y", 1.0), (2L, null, 4.0))
      .toDF("id", "s", "v")
    val p = graft.operators.Profile.profile(df, Seq("id", "s", "v"), exactNdv = true)
      .orderBy("column")
      .as[(String, Long, Long, String, String)].collect()
    assert(p === Array(
      ("id", 3L, 2L, "1", "2"),
      ("s", 2L, 2L, "x", "y"),
      ("v", 3L, 3L, "1.0", "4.0")))
  }

  test("histogram bins values equi-width and drops out-of-range") {
    val df = Seq(0.0, 4.9, 5.0, 9.99, 10.0, -1.0, 30.0).toDF("v")
    val h = graft.operators.Profile.histogram(df, "v", lo = 0.0, width = 5.0, nBins = 6)
      .orderBy("bin").as[(Long, Long)].collect()
    assert(h === Array((0L, 2L), (1L, 2L), (2L, 1L))) // -1 and 30 dropped
  }

  test("snapshotDiff classifies added / removed / changed / unchanged") {
    val base = Seq((1L, "p1"), (2L, "p2"), (3L, "p3")).toDF("k", "payload")
    val delta = Seq((2L, "p2"), (3L, "CHANGED"), (4L, "p4")).toDF("k", "payload")
    val out = Pipeline.snapshotDiff(base, delta, "k", df => md5(df("payload")))
      .orderBy("k").as[(Long, String)].collect()
    assert(out === Array((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }
}
