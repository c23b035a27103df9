package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expr.NativeFunctions

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
  * exact integer gram counts (in-row — one native
  * [[graft.functions.expr.CharGramBucketCounts]] pass per document),
  * training is ONE map-side-combining 1-row aggregate of exact longs
  * (closed form — no GD iterations to unroll), and scoring is a fixed
  * left-assoc chain over 6dp-rounded log likelihoods, mirrored
  * term-for-term in SQL.
  *
  * Scale shape: train = one aggregate over the corpus (model is
  * K·(B+1) longs — literally collected to the driver and baked into
  * the scoring plan as LITERALS, the broadcast-as-literal pattern the
  * BPE/PQ expressions share). Predict = one codegen'd pass whose only
  * non-literal input is the per-doc count vector; no shuffle anywhere
  * but the final confusion groupBy, which carries (lang, lang) pairs.
  * At a million-bucket vocabulary the same model factors through the
  * long-form sparse frame (the logisticTrainSparse stance); B here is
  * the GATE width.
  *
  * r10 perf note: the r9 version built a per-CHARACTER array via
  * `split∘transform(ascii)` HOFs, derived B=16 `size(filter(…))`
  * columns from it, and referenced those through K×B² z-chains —
  * after projection collapse the duplicated interpreted trees cost
  * 166 s / 209 s at sf0.1 against a ~2 s single-node baseline. The
  * native one-pass count vector plus literal model brings the pair
  * back to sub-second scans with an UNCHANGED oracle.
  */
object Langid {

  /** Per-doc exact bucket-count vector (length `buckets`): one native
    * pass over the lowercased text. Element b equals the oracle's
    * `len(list_filter(gb, h -> h = b))`. */
  private def gramCounts(textCol: Column, buckets: Int): Column =
    NativeFunctions.char_gram_bucket_counts(lower(textCol), 3, buckets)

  /** Append exact integer bucket-count columns x0..x{B-1}, all views
    * over ONE materialized count-vector column (CollapseProject's
    * duplication guard keeps the non-cheap native expression from
    * being inlined per reference). */
  def withGramCounts(df: DataFrame, textCol: String, buckets: Int,
      keep: Seq[Column]): DataFrame = {
    val withB = df.withColumn("__gx", gramCounts(col(textCol), buckets))
    val xs = (0 until buckets).map(b =>
      element_at(col("__gx"), b + 1).as(s"x$b"))
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

  /** Laplace-smoothed log prior / log likelihood over the COLLECTED
    * exact-count model row, as constant-foldable Column expressions —
    * the same round/log/÷ shapes the oracle's nbtr CTE computes, with
    * literal inputs, so Catalyst folds them with its OWN arithmetic
    * and the 6dp values are bit-identical to the SQL's. (The r9
    * column-reference version embedded the 16-term totalOf chain per
    * likelihood; after projection collapse nbTrain's Generate carried
    * 85 of those and blew the 64 KB codegen limit — literals fold to
    * a single array constant instead.) */
  private def priorLit(st: org.apache.spark.sql.Row, l: String,
      k: Int): Column =
    round(log((lit(st.getAs[Long](s"n_$l")) + lit(1)).cast("double")
      / (lit(st.getAs[Long]("n")) + lit(k))), 6)
  private def likLit(st: org.apache.spark.sql.Row, l: String, tot: Long,
      b: Int, buckets: Int): Column =
    round(log((lit(st.getAs[Long](s"c_${l}_$b")) + lit(1)).cast("double")
      / (lit(tot) + lit(buckets))), 6)
  private def totalOf(st: org.apache.spark.sql.Row, l: String,
      buckets: Int): Long =
    (0 until buckets).map(b => st.getAs[Long](s"c_${l}_$b")).sum

  /** Train: the fitted model as (lang, feature, cnt, logp) rows —
    * 'prior' carries the doc count and smoothed log prior, 'bNN'
    * rows carry the exact gram count and smoothed log likelihood.
    * The 1-row exact-count aggregate is collected (bounded driver
    * state: K·(B+1)+1 longs) and re-emitted through constant-folded
    * literal expressions. */
  def nbTrain(train: DataFrame, langCol: String, textCol: String,
      langs: Seq[String], buckets: Int): DataFrame = {
    val k = langs.size
    val st = stats(train, langCol, textCol, langs, buckets).collect()(0)
    val rows = langs.sorted.flatMap { l =>
      val tot = totalOf(st, l, buckets)
      struct(lit(l).as("lang"), lit("prior").as("feature"),
        lit(st.getAs[Long](s"n_$l")).as("cnt"),
        priorLit(st, l, k).as("logp")) +:
        (0 until buckets).map(b =>
          struct(lit(l).as("lang"), lit(f"b$b%02d").as("feature"),
            lit(st.getAs[Long](s"c_${l}_$b")).as("cnt"),
            likLit(st, l, tot, b, buckets).as("logp")))
    }
    train.sparkSession.range(1)
      .select(explode(array(rows: _*)).as("m"))
      .select(col("m.lang").as("lang"), col("m.feature").as("feature"),
        col("m.cnt").as("cnt"), col("m.logp").as("logp"))
  }

  /** Score `test` under the model fitted on `train`: the K·(B+1)-long
    * exact-count model is collected (one aggregate job, bounded driver
    * state) and baked into the scoring projection as LITERAL inputs to
    * the SAME round/log/÷ expression shapes the r9 column version
    * used — Catalyst constant-folds them with its own arithmetic, so
    * the 6dp values are bit-identical to what the oracle's nbtr CTE
    * computes. Per-doc z_lang = log prior + Σ_b x_b · log P(b|lang)
    * as a fixed left-assoc chain over the count vector, argmax with
    * first-match-in-sorted-order tie break (deterministic,
    * SQL-mirrorable CASE), aggregated to the integer confusion matrix
    * (lang, predicted_lang, n). */
  def nbConfusion(train: DataFrame, test: DataFrame, langCol: String,
      textCol: String, langs: Seq[String], buckets: Int): DataFrame = {
    val k = langs.size
    val sorted = langs.sorted
    val st = stats(train, langCol, textCol, langs, buckets).collect()(0)
    val scored = test.select(col(langCol).as("lang"),
      gramCounts(col(textCol), buckets).as("__gx"))
    val zCols = sorted.map { l =>
      val tot = totalOf(st, l, buckets)
      val terms = (0 until buckets).map(b =>
        element_at(col("__gx"), b + 1).cast("double")
          * likLit(st, l, tot, b, buckets))
      (priorLit(st, l, k) +: terms).reduce(_ + _).as(s"__z_$l")
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
