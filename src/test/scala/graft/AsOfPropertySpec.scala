package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.operators.Events
import graft.plans.AsOf

/** Property-based equivalence: on random key/ts data (with heavy key
  * collisions and coincident timestamps), the whole-operator
  * AsOfJoinExec, the composed union+window formulation, and a naive
  * in-memory reference model must all agree. Null-free domains — the
  * two operators intentionally differ on nulls (SQL semantics vs
  * window grouping; see AsOfJoin scaladoc). */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  // small domains force collisions: few keys, coarse timestamps
  private val rowGen = for {
    key <- Gen.choose(1L, 5L)
    t <- Gen.choose(0L, 50L)
  } yield (key, t)

  private def model(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)])
      : Set[(Long, Option[Long])] =
    left.map { case (id, k, t) =>
      val cand = right.filter(r => r._2 == k && r._3 <= t)
      // unique (key, ts) on the right → at most one latest row
      id -> cand.sortBy(_._3).lastOption.map(_._1)
    }.toSet

  /** Shared harness: generate colliding left/right rows (right
    * deduped per (key, ts) — the documented operator contract), run
    * each labelled operator-under-test, compare against the model. */
  private def checkAsOfProp(
      model: (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]) => Set[(Long, Option[Long])])(
      ops: (String, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =>
        org.apache.spark.sql.DataFrame)*): Unit = {
    val prop = Prop.forAll(
      Gen.listOfN(30, rowGen), Gen.listOfN(20, rowGen)) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val right = rs.distinctBy(r => (r._1, r._2)).zipWithIndex
        .map { case ((k, t), i) => (1000L + i, k, t) }
      val lDf = left.map { case (id, k, t) => (id, k, ts(t * 1000)) }
        .toDF("event_id", "user_id", "ts")
      val rDf = right.map { case (id, k, t) => (k, ts(t * 1000), id) }
        .toDF("user_id", "ts", "r_id")
      val expected = model(left, right)
      val results = ops.map { case (label, op) =>
        label -> op(lDf, rDf)
          .select("event_id", "r_id").as[(Long, Option[Long])].collect().toSet
      }
      val ok = results.forall(_._2 == expected)
      if (!ok) {
        System.err.println(s"left=$left\nright=$right\n" +
          results.map { case (l, got) =>
            s"$l diff=${got.diff(expected)}/${expected.diff(got)}" }.mkString("\n"))
      }
      ok
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(50).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("exec == composed == in-memory model on random data (50 cases)") {
    checkAsOfProp(model)(
      "exec" -> ((l, r) => AsOf.join(l, r, "user_id", "ts", Seq("r_id"))),
      "composed" -> ((l, r) => Events.asOfJoin(l, r, "user_id", "ts", Seq("r_id"))))
  }

  private def modelForward(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)])
      : Set[(Long, Option[Long])] =
    left.map { case (id, k, t) =>
      val cand = right.filter(r => r._2 == k && r._3 >= t)
      id -> cand.sortBy(_._3).headOption.map(_._1)
    }.toSet

  test("forward as-of == in-memory next-event model on random data (50 cases)") {
    checkAsOfProp(modelForward)(
      "forward" -> ((l, r) =>
        Events.asOfJoin(l, r, "user_id", "ts", Seq("r_id"), forward = true)))
  }
}
