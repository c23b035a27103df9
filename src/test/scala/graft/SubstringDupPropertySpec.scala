package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.operators.Dedup

/** Property-based check of substringDupSpans against a naive model:
  * tiny vocab + short docs force heavy window collisions, island
  * fragmentation, and boundary spans. */
class SubstringDupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val docGen: Gen[String] =
    Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))

  private def model(docs: Seq[(Long, String)]): Set[(Long, Int, Int, Long, Long)] = {
    val windows = docs.flatMap { case (id, text) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty)
      (0 to t.length - K).map(i => (id, i + 1, t.slice(i, i + K).mkString(" ")))
    }
    val nDocs = windows.groupBy(_._3).map { case (s, ws) =>
      s -> ws.map(_._1).distinct.size.toLong
    }
    val hits = windows.filter(w => nDocs(w._3) >= 2)
    hits.groupBy(_._1).toSeq.flatMap { case (id, ws) =>
      val sorted = ws.map(w => (w._2, nDocs(w._3))).sortBy(_._1)
      // islands of consecutive positions
      val islands = sorted.foldLeft(List.empty[List[(Int, Long)]]) {
        case (acc, p) => acc match {
          case head :: tail if head.head._1 == p._1 - 1 => (p :: head) :: tail
          case _ => List(p) :: acc
        }
      }
      islands.map { isl =>
        val ps = isl.map(_._1)
        (id, ps.min, ps.max + K - 1, isl.size.toLong, isl.map(_._2).max)
      }
    }.toSet
  }

  test("substringDupSpans == naive model on random corpora (40 cases)") {
    val prop = Prop.forAll(Gen.listOfN(6, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val out = Dedup.substringDupSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", K)
        .as[(Long, Int, Int, Long, Long)].collect().toSet
      val expected = model(docs)
      if (out != expected) {
        System.err.println(s"docs=$docs\nout=$out\nexpected=$expected")
      }
      out == expected
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(40).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
