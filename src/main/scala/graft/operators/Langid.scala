package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED language identification: multinomial Naive Bayes over
  * hashed character-3-gram buckets — the classic langid shape
  * (langid.py / CLD are NB or NB-like over char n-grams; fastText's
  * langid adds a trained projection on the same features). The
  * heuristic [[graft.functions.Text.langId]] sees only a fixed
  * stopword list; this model LEARNS each language's character
  * distribution from labeled data, so it separates languages the
  * dictionary has never heard of (spec: a planted multilingual corpus
  * where the heuristic collapses and the trained model doesn't).
  *
  * Everything is oracle-expressible by construction: features are
  * exact integer gram counts (in-row — the hashedTokenFeatures
  * shape), training is ONE map-side-combining 1-row aggregate of
  * exact longs (closed form — no GD iterations to unroll), and
  * scoring is a fixed left-assoc chain over 6dp-rounded log
  * likelihoods, mirrored term-for-term in SQL.
  *
  * Scale shape: train = one aggregate over the corpus (model is
  * K·(B+1) longs — broadcast-as-literal territory); predict = one
  * codegen'd pass with the 1-row stats crossJoined in (broadcast by
  * construction); no shuffle anywhere but the final confusion
  * groupBy, which carries (lang, lang) pairs. At a million-bucket
  * vocabulary the same model factors through the long-form sparse
  * frame (the logisticTrainSparse stance); B here is the GATE width.
  */
object Langid {

  /** Per-char-3-gram hash buckets as an in-row array. The gram hash
    * is a plain poly-31 fold over three codepoints — max value
    * ~0x10FFFF·31² < 2^31, so the arithmetic is exact in both
    * engines with no mod-2^64 machinery. Docs under 3 chars get an
    * empty array (prior-only scoring). */
  private def gramBuckets(textCol: Column, buckets: Int): Column = {
    val codes = transform(
      filter(split(lower(textCol), ""), c => c =!= ""),
      c => ascii(c).cast("long"))
    when(size(codes) >= 3,
      transform(sequence(lit(1), size(codes) - 2),
        i => pmod(
          (element_at(codes, i) * 31 + element_at(codes, i + 1)) * 31
            + element_at(codes, i + 2),
          lit(buckets.toLong))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Append exact integer bucket-count columns x0..x{B-1}; the gram
    * array materializes ONCE per row (the hashedTokenFeatures
    * discipline — B in-row filters over one array, not B gram
    * pipelines). */
  def withGramCounts(df: DataFrame, textCol: String, buckets: Int,
      keep: Seq[Column]): DataFrame = {
    val withB = df.withColumn("__gb", gramBuckets(col(textCol), buckets))
    val xs = (0 until buckets).map(b =>
      size(filter(col("__gb"), g => g === lit(b.toLong)))
        .cast("long").as(s"x$b"))
    withB.select(keep ++ xs: _*)
  }

  /** The model as ONE 1-row aggregate: total docs `n`, per-lang doc
    * counts `n_<lang>`, per-(lang, bucket) gram counts `c_<lang>_<b>`
    * — all exact longs (order-free sums). */
  private def stats(train: DataFrame, langCol: String, textCol: String,
      langs: Seq[String], buckets: Int): DataFrame = {
    val f = withGramCounts(train, textCol, buckets, Seq(col(langCol)))
    val aggs = Seq(count(lit(1)).as("n")) ++
      langs.sorted.flatMap { l =>
        val isL = col(langCol) === lit(l)
        sum(when(isL, 1L).otherwise(0L)).as(s"n_$l") +:
          (0 until buckets).map(b =>
            sum(when(isL, col(s"x$b")).otherwise(0L)).as(s"c_${l}_$b"))
      }
    f.agg(aggs.head, aggs.tail: _*)
  }

  private def totalOf(l: String, buckets: Int): Column =
    (0 until buckets).map(b => col(s"c_${l}_$b")).reduce(_ + _)

  /** Laplace-smoothed log prior / log likelihood (6dp — the rounding
    * edge every trained gate in this engine shares, so the ln() libm
    * ulp can never flip a downstream comparison). */
  private def prior(l: String, k: Int): Column =
    round(log((col(s"n_$l") + lit(1)).cast("double") / (col("n") + lit(k))), 6)
  private def likelihood(l: String, b: Int, buckets: Int): Column =
    round(log((col(s"c_${l}_$b") + lit(1)).cast("double")
      / (totalOf(l, buckets) + lit(buckets))), 6)

  /** Train: the fitted model as (lang, feature, cnt, logp) rows —
    * 'prior' carries the doc count and smoothed log prior, 'bNN'
    * rows carry the exact gram count and smoothed log likelihood. */
  def nbTrain(train: DataFrame, langCol: String, textCol: String,
      langs: Seq[String], buckets: Int): DataFrame = {
    val st = stats(train, langCol, textCol, langs, buckets)
    val k = langs.size
    val rows = langs.sorted.flatMap { l =>
      struct(lit(l).as("lang"), lit("prior").as("feature"),
        col(s"n_$l").as("cnt"), prior(l, k).as("logp")) +:
        (0 until buckets).map(b =>
          struct(lit(l).as("lang"), lit(f"b$b%02d").as("feature"),
            col(s"c_${l}_$b").as("cnt"),
            likelihood(l, b, buckets).as("logp")))
    }
    st.select(explode(array(rows: _*)).as("m"))
      .select(col("m.lang").as("lang"), col("m.feature").as("feature"),
        col("m.cnt").as("cnt"), col("m.logp").as("logp"))
  }

  /** Score `test` under the model fitted on `train`: per-doc
    * z_lang = log prior + Σ_b x_b · log P(b|lang) as a fixed
    * left-assoc chain, argmax with first-match-in-sorted-order tie
    * break (deterministic, SQL-mirrorable CASE), aggregated to the
    * integer confusion matrix (lang, predicted_lang, n). */
  def nbConfusion(train: DataFrame, test: DataFrame, langCol: String,
      textCol: String, langs: Seq[String], buckets: Int): DataFrame = {
    val st = stats(train, langCol, textCol, langs, buckets)
    val k = langs.size
    val sorted = langs.sorted
    val scored = withGramCounts(test, textCol, buckets,
      Seq(col(langCol).as("lang"))).crossJoin(broadcast(st))
    val zCols = sorted.map { l =>
      val terms = (0 until buckets).map(b =>
        col(s"x$b").cast("double") * likelihood(l, b, buckets))
      (prior(l, k) +: terms).reduce(_ + _).as(s"__z_$l")
    }
    val withZ = scored.select(col("lang") +: zCols: _*)
    var pred: Column = lit(sorted.last)
    sorted.dropRight(1).reverse.foreach { l =>
      val cond = sorted.filter(_ != l)
        .map(o => col(s"__z_$l") >= col(s"__z_$o")).reduce(_ && _)
      pred = when(cond, lit(l)).otherwise(pred)
    }
    withZ.select(col("lang"), pred.as("predicted_lang"))
      .groupBy("lang", "predicted_lang").agg(count(lit(1)).as("n"))
  }
}
