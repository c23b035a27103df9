package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.operators.Pipeline

/** Property-based check of the reference's core Q2 semantics
  * (main_dag.py:265-290): pairCounts — through the native SortedPairs
  * expression — must match the naive itertools.combinations model on
  * random memberships (duplicate rows, singleton sets, groups missing
  * a year). */
class PairCountsPropertySpec extends SparkSpec {
  import spark.implicits._

  // few groups/members force duplicate memberships and shared pairs
  private val rowGen = for {
    set <- Gen.choose(1L, 6L)
    member <- Gen.choose(1L, 5L)
  } yield (set, member)

  private def model(rows: Seq[(Long, Long)], years: Map[Long, Int])
      : Set[(Int, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq
      .collect { case (set, ms) if years.contains(set) =>
        val members = ms.map(_._2).distinct.sorted
        for {
          i <- members.indices
          j <- (i + 1) until members.size
        } yield (years(set), members(i), members(j))
      }
      .flatten
      .groupBy(identity)
      .map { case (k, v) => (k._1, k._2, k._3, v.size.toLong) }
      .toSet

  test("pairCounts == combinations model on random memberships (40 cases)") {
    val yearGen = Gen.mapOf(Gen.zip(Gen.choose(1L, 6L), Gen.choose(1996, 1998)))
    val prop = Prop.forAll(Gen.listOfN(25, rowGen), yearGen) { (rows, years) =>
      val df = rows.toDF("set_key", "member")
      val yearDf = years.toSeq.toDF("set_key", "year")
      val out = Pipeline.pairCounts(df, "set_key", "member", yearDf, "set_key")
        .as[(Int, Long, Long, Long)].collect().toSet
      val expected = model(rows, years)
      if (out != expected) {
        System.err.println(s"rows=$rows years=$years\nout=$out\nexpected=$expected")
      }
      out == expected
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(40).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
