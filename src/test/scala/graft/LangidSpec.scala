package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.{Curation, Langid}

/** Trained langid (NB over hashed char-3-grams) vs the stopword
  * heuristic. The driver gate runs the same operator on the real
  * corpus (where the lang label is independent of the text — an
  * honest near-chance readout); THIS spec plants a corpus where
  * language genuinely lives in the characters and shows the trained
  * model separates what the fixed dictionary cannot. */
class LangidSpec extends SparkSpec {
  import spark.implicits._

  // three planted languages with DISJOINT vocabularies, none of which
  // appear in Text.langStopwords — the dictionary heuristic is blind
  // here by construction, a trained model is not
  private val vocab = Map(
    "xqa" -> Seq("zorp", "blik", "quux", "vrell", "snib", "drax"),
    "xqb" -> Seq("mipo", "tallu", "renga", "soopi", "lumen", "carto"),
    "xqc" -> Seq("ujek", "wyrd", "fenk", "ghast", "ilber", "okkun"))
  private val langs = vocab.keys.toSeq.sorted

  private def planted = {
    val rows = for {
      (lang, words) <- vocab.toSeq.sortBy(_._1)
      d <- 0 until 120
    } yield {
      var seed = (lang.hashCode.toLong << 16) + d * 2654435761L
      val n = 12 + (math.abs(seed) % 8).toInt
      val text = (0 until n).map { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        words(((seed >>> 33) % words.length).toInt)
      }.mkString(" ")
      (lang, text)
    }
    rows.toDF("lang", "text")
  }

  test("NB separates planted languages the stopword heuristic cannot") {
    val docs = planted
    val bucket = Curation.hashBucket(col("text"), 100)
    val conf = Langid.nbConfusion(
      docs.filter(bucket < 80), docs.filter(bucket >= 80),
      "lang", "text", langs, buckets = 16).collect()
    val total = conf.map(_.getAs[Long]("n")).sum
    val correct = conf.filter(r =>
      r.getAs[String]("lang") == r.getAs[String]("predicted_lang"))
      .map(_.getAs[Long]("n")).sum
    assert(total > 50, s"holdout too small: $total")
    val nbAcc = correct.toDouble / total
    // the heuristic on the SAME holdout: no planted word is a known
    // stopword, so every prediction is 'und' — zero accuracy
    val heur = docs.filter(bucket >= 80)
      .select(col("lang"), Text.langId(col("text")).as("p"))
      .agg(avg(when(col("lang") === col("p"), 1.0).otherwise(0.0)))
      .collect().head.getDouble(0)
    assert(nbAcc >= 0.95, s"trained langid accuracy $nbAcc below 0.95")
    assert(heur === 0.0, s"heuristic unexpectedly scored $heur here")
    assert(nbAcc > heur, "trained model must strictly improve the heuristic")
  }

  test("nbTrain emits the full exact-count model; holdout docs never train") {
    val docs = planted
    val bucket = Curation.hashBucket(col("text"), 100)
    val train = docs.filter(bucket < 80)
    val model = Langid.nbTrain(train, "lang", "text", langs, buckets = 16)
      .collect()
    // one prior row + 16 bucket rows per language
    assert(model.length === langs.size * 17)
    val priors = model.filter(_.getAs[String]("feature") == "prior")
    assert(priors.map(_.getAs[Long]("cnt")).sum === train.count())
    // smoothed log-probs are finite and negative
    model.foreach { r =>
      val lp = r.getAs[Double]("logp")
      assert(lp < 0.0 && !lp.isInfinite && !lp.isNaN,
        s"bad logp $lp at ${r.getAs[String]("lang")}/${r.getAs[String]("feature")}")
    }
    // per-lang likelihoods sum to ~1 after unsmoothing is not required
    // — but each lang's bucket counts must equal its docs' gram mass
    val cntByLang = model.filter(_.getAs[String]("feature") != "prior")
      .groupBy(_.getAs[String]("lang"))
      .map { case (l, rs) => l -> rs.map(_.getAs[Long]("cnt")).sum }
    val gramMass = Langid.withGramCounts(
        train, "text", 16, Seq(col("lang")))
      .groupBy("lang")
      .agg(sum((0 until 16).map(b => col(s"x$b")).reduce(_ + _)).as("m"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("m")).toMap
    cntByLang.foreach { case (l, c) =>
      assert(c === gramMass(l), s"lang $l: model counts $c vs corpus mass")
    }
  }

  test("prediction is deterministic and total (short docs fall to prior)") {
    val docs = planted
    val tiny = Seq(("xqa", "ab"), ("xqb", "")).toDF("lang", "text")
    val conf = Langid.nbConfusion(docs, tiny, "lang", "text", langs, 16)
      .collect()
    // every doc predicted (no dropped rows), prediction non-null
    assert(conf.map(_.getAs[Long]("n")).sum === 2)
    conf.foreach(r => assert(langs.contains(r.getAs[String]("predicted_lang"))))
    // prior-only scoring: both tiny docs get the majority-prior lang,
    // deterministically — run twice, same answer
    val again = Langid.nbConfusion(docs, tiny, "lang", "text", langs, 16)
      .collect()
    assert(conf.map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
      === again.map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted)
  }

  test("char_gram_bucket_counts survives k large enough to wrap the Long fold") {
    // the poly-31 fold is non-negative only for k ≤ 9; at k=17 on a
    // high-codepoint string the fold wraps negative and a plain %
    // would index out of bounds — floorMod must keep every gram in
    // [0, buckets) and the total equal to n-k+1
    val s = "ჿ0ჿ1" * 20 // high-codepoint mix: 32 of the 64 grams fold negative
    val out = Seq(Tuple1(s)).toDF("text")
      .select(graft.functions.expr.NativeFunctions
        .char_gram_bucket_counts(col("text"), 17, 16).as("c"))
      .collect().head.getSeq[Long](0)
    val n = s.codePointCount(0, s.length)
    assert(out.forall(_ >= 0L))
    assert(out.sum === (n - 17 + 1).toLong,
      s"gram mass ${out.sum} != ${n - 16}")
  }
}
