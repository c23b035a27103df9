package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Events, Profile, Relational}
import graft.sources.Tables

/** Trade volume, MAD outliers, equi-depth histogram, window suite,
  * shard assignment (the batch-3 depth operators). */
class DepthOpsSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def ev(id: Long, s: Int, v: Double, typ: String = "a") =
    (id, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${s}%02d"), 1L, typ, v)

  private def evDf(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  // ---- tradeVolume ----

  test("tradeVolume matches an independent formulation and drops same-nation trade") {
    val (li, o, c, su, n) = (Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.nation(spark, sfDir))
    val out = Relational.tradeVolume(li, o, c, su, n)
    // independent cross-nation item count: plain join chain, no agg sharing
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .count()
    assert(out.agg(sum("n_items")).as[Long].head === expected)
    assert(out.filter(col("cust_nation") === col("supp_nation")).count() === 0L)
  }

  test("tradeVolume broadcasts both nation roles and the supplier dim") {
    val p = plan(Relational.tradeVolume(Tables.lineitem(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.supplier(spark, sfDir), Tables.nation(spark, sfDir)))
    assert(p.split("BroadcastHashJoin").length >= 4,
      s"expected >=3 broadcast joins (supplier + both nation roles):\n$p")
  }

  // ---- madOutliers ----

  test("MAD flags what a variance-inflated z-score misses") {
    val outliers = (100L to 104L)
    val rows = (0 until 20).map(i => ev(i, i, 5.0 + 0.01 * (i % 5))) ++
      outliers.map(id => ev(id, 30 + id.toInt - 100, 1000.0))
    val df = evDf(rows)
    // five coordinated 1000s inflate the stddev enough that moment-z
    // stays under 2.5 for every row...
    assert(Events.zscoreOutliers(df, 2.5).count() === 0L)
    // ...but the median/MAD screen still catches exactly them
    val robust = Events.madOutliers(df, 3.5).select("event_id").as[Long].collect().toSet
    assert(robust === outliers.toSet)
  }

  test("madOutliers stays quiet on a tight cluster") {
    val df = evDf((0 until 12).map(i => ev(i, i, 5.0 + 0.01 * (i % 4))))
    assert(Events.madOutliers(df, 3.5).count() === 0L)
  }

  // ---- equidepthHistogram ----

  test("equi-depth buckets hold ~equal counts and tile the range") {
    val o = Tables.orders(spark, sfDir)
    val n = o.count()
    val out = Profile.equidepthHistogram(o, "o_totalprice", 10)
      .orderBy("bucket").as[(Int, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq === (0 until 10))
    assert(out.map(_._2).sum === n)
    // each bucket within 25% of n/10 (cutpoint ties can shift rows)
    out.foreach { case (b, c, _, _) =>
      assert(math.abs(c - n / 10.0) < 0.25 * n / 10.0, s"bucket $b holds $c of $n") }
    // bucket ranges are ordered and non-overlapping
    out.sliding(2).foreach {
      case Array((_, _, _, hi), (_, _, lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }

  test("equi-depth never shuffles the fact (broadcast cuts + map-side agg)") {
    val p = plan(Profile.equidepthHistogram(Tables.orders(spark, sfDir), "o_totalprice", 10))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"cutpoints must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact shuffled for the cut join:\n$p")
  }

  // ---- seasonalZscoreOutliers ----

  test("seasonal z-screen ignores the daily cycle and flags the off-hours value") {
    def at(id: Long, hh: Int, i: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-0${1 + i % 5} $hh%02d:00:${i % 60}%02d"),
        1L, "a", v)
    // a strong clean cycle: ~100 at hour 08, ~10 at hour 20
    val cycle = (0 until 40).map(i => at(i, 8, i, 100.0 + (i % 5))) ++
      (100 until 140).map(i => at(i, 20, i, 10.0 + (i % 5)))
    // the anomaly: a peak-hour value arriving in the quiet hour
    val planted = at(999, 20, 7, 100.0)
    val df = evDf(cycle :+ planted)
    val seasonal = Events.seasonalZscoreOutliers(df, threshold = 2.5, minN = 30)
      .select("event_id").as[Long].collect().toSet
    assert(seasonal === Set(999L),
      "the quiet-hour cell must flag the planted peak-hour value and nothing else")
    // the plain screen can't see it: 100.0 is an ordinary global value
    val plain = Events.zscoreOutliers(df, threshold = 2.5)
      .select("event_id").as[Long].collect().toSet
    assert(!plain.contains(999L), "globally, 100.0 is unremarkable — the point")
  }

  test("seasonal z-screen stays silent below minN observations per cell") {
    def at(id: Long, hh: Int, s: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-01 $hh%02d:00:$s%02d"), 1L, "a", v)
    val df = evDf((0 until 10).map(i => at(i, 3, i, 5.0)) :+ at(99, 3, 50, 900.0))
    assert(Events.seasonalZscoreOutliers(df, 2.5, minN = 30).count() === 0L)
  }

  // ---- percentile_approx sketch twins (q21a/q47a/q48a) ----

  test("percentile_approx at gate accuracy IS exact rank selection (ceil(p·n), 1-based)") {
    // the property the q21a/q47a/q48a oracles rely on: above 2·n the
    // GK sketch never merges samples, so query(p) returns the element
    // at 1-based rank ceil(p·n) exactly
    val o = Tables.orders(spark, sfDir)
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val approx = o.groupBy("o_orderpriority")
        .agg(expr(s"percentile_approx(o_totalprice, $p, 1000000)").as("v"))
        .as[(String, Double)].collect().toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority").orderBy("o_totalprice")
      val ranked = o.select(col("o_orderpriority"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          count("*").over(org.apache.spark.sql.expressions.Window
            .partitionBy("o_orderpriority")).as("n"))
        .filter(col("rn") === ceil(lit(p) * col("n")).cast("long"))
        .select("o_orderpriority", "o_totalprice")
        .as[(String, Double)].collect().toMap
      assert(approx === ranked, s"rank rule broke at p=$p")
    }
  }

  test("sketch equi-depth matches exact equi-depth to within cut-gap tolerance") {
    val o = Tables.orders(spark, sfDir)
    val exact = Profile.equidepthHistogram(o, "o_totalprice", 10)
      .orderBy("bucket").as[(Int, Long, Double, Double)].collect()
    val sketch = Profile.equidepthHistogram(o, "o_totalprice", 10,
        approxAccuracy = Some(1000000))
      .orderBy("bucket").as[(Int, Long, Double, Double)].collect()
    assert(sketch.map(_._1).toSeq === exact.map(_._1).toSeq)
    assert(sketch.map(_._2).sum === exact.map(_._2).sum)
    // discrete (rank-selected) cuts sit within one element of the
    // interpolated cuts, so each bucket count moves by at most 1
    exact.zip(sketch).foreach { case ((b, ne, _, _), (_, ns, _, _)) =>
      assert(math.abs(ne - ns) <= 1, s"bucket $b: exact=$ne sketch=$ns") }
  }

  test("sketch MAD outliers flag the same rows as exact MAD outliers") {
    val ev = Tables.events(spark, sfDir)
    val exact = Events.madOutliers(ev, 3.5).select("event_id").as[Long].collect().toSet
    val sketch = Events.madOutliers(ev, 3.5, approxAccuracy = Some(1000000))
      .select("event_id").as[Long].collect().toSet
    // the discrete median differs from the interpolated one by less
    // than the 3.5·1.4826·MAD threshold margin on this data
    assert(sketch === exact)
  }

  // ---- windowSuite ----

  test("window suite hand-check") {
    val df = evDf(Seq(ev(1, 1, 10.0), ev(2, 2, 30.0), ev(3, 3, 20.0), ev(4, 4, 40.0)))
    val out = Events.windowSuite(df).orderBy("event_id")
      .as[(Long, Long, Double, Option[Double], Option[Double], Double, Double, Double)]
      .collect()
    assert(out(0) === ((1L, 1L, 10.0, None, Some(30.0), 10.0, 10.0, 0.25)))
    assert(out(1) === ((2L, 1L, 30.0, Some(10.0), Some(20.0), 10.0, 30.0, 0.5)))
    assert(out(2) === ((3L, 1L, 20.0, Some(30.0), Some(40.0), 10.0, 30.0, 0.75)))
    assert(out(3) === ((4L, 1L, 40.0, Some(20.0), None, 10.0, 40.0, 1.0)))
  }

  test("window suite plans ONE Window over one shuffle") {
    val p = plan(Events.windowSuite(Tables.events(spark, sfDir)))
    assert("(?s)Window".r.findAllIn(p).size >= 1)
    assert(p.split("Exchange").length == 2, s"expected exactly one shuffle:\n$p")
  }

  // ---- shardAssign ----

  test("shardAssign: uniform-ish shards, contiguous positions, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val out = Curation.shardAssign(docs, "doc_id", col("text"), 8)
      .select(col("doc_id"), col("shard"), col("pos"))
    val byShard = out.groupBy("shard").agg(count("*").as("n"), max("pos").as("maxp"),
        min("pos").as("minp"))
      .as[(Long, Long, Int, Int)].collect()
    assert(byShard.map(_._1).toSet.subsetOf((0L until 8L).toSet))
    // positions are exactly 1..n within each shard
    byShard.foreach { case (s, n, maxp, minp) =>
      assert(minp === 1 && maxp === n, s"shard $s: pos range $minp..$maxp for $n rows") }
    val again = Curation.shardAssign(docs, "doc_id", col("text"), 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Int)].collect().toSet
    assert(out.as[(Long, Long, Int)].collect().toSet === again)
  }
}
