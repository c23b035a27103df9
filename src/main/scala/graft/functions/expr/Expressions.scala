package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions with code generation — for hot-path
  * scalar work where a Scala UDF would box every row and break
  * whole-stage codegen (SURVEY.md §2c: simhash verify + rolling-hash
  * fingerprints run over every document of a 100 TB corpus).
  */

/** Hamming distance between two 64-bit signatures:
  * Long.bitCount(a ^ b). Generates straight-line Java — stays inside
  * the surrounding WholeStageCodegen span. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit polynomial rolling hash of a string's UNICODE CODEPOINTS
  * (h = h * 31 + codepoint, seeded) — an order-sensitive content
  * fingerprint cheaper than md5 (no digest object, in-place UTF-8
  * decode, no String allocation), used for shard-local duplicate
  * pre-screens.
  *
  * Codepoints, not UTF-8 bytes, since r4: the oracle engine's only
  * portable character fold is `ord(c)` over per-character splits, so
  * a byte fold agreed with it on ASCII only. The codepoint fold is
  * identical on ASCII (byte == codepoint there — every committed
  * gate hash is unchanged) and agrees on the full Unicode plane,
  * closing the documented non-ASCII oracle-parity gap. */
case class RollingHash(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = seed
    var i = 0
    while (i < bytes.length) {
      val d = TokenHashing.decode(bytes, i)
      h = h * 31L + (d >>> 3)
      i += (d & 7)
    }
    h
  }

  // same decode rule as TokenHashing.decode: valid multi-byte
  // sequences fold as one codepoint; a malformed lead or truncated/
  // invalid continuation folds that SINGLE byte (unsigned) and
  // advances one — deterministic, and never swallows valid
  // characters after a corrupt byte
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |byte[] ${ev.value}_b = $c.getBytes();
         |long ${ev.value}_h = ${seed}L;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_b.length; ) {
         |  int ${ev.value}_x = ${ev.value}_b[${ev.value}_i] & 0xff;
         |  int ${ev.value}_cp; int ${ev.value}_l;
         |  if (${ev.value}_x < 0x80) { ${ev.value}_cp = ${ev.value}_x; ${ev.value}_l = 1; }
         |  else if (${ev.value}_x >= 0xC2 && ${ev.value}_x <= 0xDF) { ${ev.value}_cp = ${ev.value}_x & 0x1F; ${ev.value}_l = 2; }
         |  else if (${ev.value}_x >= 0xE0 && ${ev.value}_x <= 0xEF) { ${ev.value}_cp = ${ev.value}_x & 0x0F; ${ev.value}_l = 3; }
         |  else if (${ev.value}_x >= 0xF0 && ${ev.value}_x <= 0xF4) { ${ev.value}_cp = ${ev.value}_x & 0x07; ${ev.value}_l = 4; }
         |  else { ${ev.value}_cp = ${ev.value}_x; ${ev.value}_l = 1; }
         |  if (${ev.value}_l > 1) {
         |    if (${ev.value}_i + ${ev.value}_l > ${ev.value}_b.length) { ${ev.value}_cp = ${ev.value}_x; ${ev.value}_l = 1; }
         |    else {
         |      for (int ${ev.value}_k = 1; ${ev.value}_k < ${ev.value}_l; ${ev.value}_k++) {
         |        int ${ev.value}_cb = ${ev.value}_b[${ev.value}_i + ${ev.value}_k] & 0xff;
         |        if ((${ev.value}_cb & 0xC0) != 0x80) { ${ev.value}_cp = ${ev.value}_x; ${ev.value}_l = 1; break; }
         |        ${ev.value}_cp = (${ev.value}_cp << 6) | (${ev.value}_cb & 0x3F);
         |      }
         |    }
         |  }
         |  ${ev.value}_h = ${ev.value}_h * 31L + ${ev.value}_cp;
         |  ${ev.value}_i += ${ev.value}_l;
         |}
         |${ev.value} = ${ev.value}_h;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dot product of two array<double> columns as a tight primitive
  * loop — no per-element boxing, no lambda-variable indirection, and
  * it code-generates into the surrounding WholeStageCodegen span.
  * The higher-order-function form (aggregate ∘ zip_with) evaluates
  * interpreted and allocates an intermediate array per row — measured
  * ~20× slower on a 200k-pair × 64-dim similarity join. Accumulates
  * left-to-right like the HOF form, so results are bit-identical. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_s = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_s += $a.getDouble(${ev.value}_i) * $b.getDouble(${ev.value}_i);
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `bits` random-hyperplane sign bits of a vector in ONE pass:
  * reads each vector element once and accumulates every bit's
  * projection simultaneously (weight matrix attached via
  * addReferenceObj, flat row-major `[bit][dim]`), then packs the
  * signs into a long.
  *
  * Replaces `bits` independent DotProduct evaluations (each of which
  * re-read the full vector and its own per-bit literal weight array)
  * — the r14 judge measured that form 3.7-10.5× slower than the
  * identical math in the columnar oracle engine. Per-bit accumulation
  * here runs in the same ascending-index order as a standalone
  * left-fold dot product, so every signature (and therefore every
  * committed LSH bucket, dedup pair, and oracle hash) is
  * bit-identical to the old form.
  *
  * Accepts array<float> (widened exactly, as the old array<double>
  * cast did) or array<double>, so no per-row cast allocation sits in
  * front of the kernel. Sign rule matches Spark's `proj >= 0`
  * comparison semantics: NaN compares largest (bit set), and -0.0
  * cannot arise from a +0.0-seeded sum. */
case class HyperplaneSig(child: Expression, weights: IndexedSeq[Double],
    dim: Int, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, s"HyperplaneSig: need 1 <= bits <= 64, got $bits")
  require(weights.length == dim * bits,
    s"HyperplaneSig: weight length ${weights.length} != dim*bits (${dim * bits})")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig requires array<float> or array<double>, got ${t.catalogString}")
    }

  @transient private lazy val w = weights.toArray

  @transient private lazy val readsFloat = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(v.numElements(), dim)
    val acc = new Array[Double](bits)
    var i = 0
    while (i < n) {
      val x = if (readsFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var b = 0
      var base = i
      while (b < bits) { acc(b) += x * w(base); base += dim; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      val p = acc(b)
      if (p >= 0.0 || java.lang.Double.isNaN(p)) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hpWeights", w, "double[]")
    val getter = if (readsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |int ${ev.value}_n = java.lang.Math.min($c.numElements(), $dim);
         |double[] ${ev.value}_acc = new double[$bits];
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  double ${ev.value}_x = (double) $c.$getter(${ev.value}_i);
         |  int ${ev.value}_w = ${ev.value}_i;
         |  for (int ${ev.value}_b = 0; ${ev.value}_b < $bits; ${ev.value}_b++) {
         |    ${ev.value}_acc[${ev.value}_b] += ${ev.value}_x * $wRef[${ev.value}_w];
         |    ${ev.value}_w += $dim;
         |  }
         |}
         |long ${ev.value}_s = 0L;
         |for (int ${ev.value}_b = 0; ${ev.value}_b < $bits; ${ev.value}_b++) {
         |  double ${ev.value}_p = ${ev.value}_acc[${ev.value}_b];
         |  if (${ev.value}_p >= 0.0 || java.lang.Double.isNaN(${ev.value}_p)) {
         |    ${ev.value}_s |= 1L << ${ev.value}_b;
         |  }
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-bucket token counts of a token array in ONE pass: each token's
  * rolling poly-31 hash (the [[RollingHash]] fold, same seed and
  * UTF-8 decode rule) masked to the power-of-two bucket count, one
  * increment per token — the hashed-feature primitive behind the
  * fastText-shape quality classifier ([[graft.operators.Curation]]
  * hashedTokenFeatures).
  *
  * Replaces `transform(t, rolling_hash ∘ mask)` followed by B
  * independent interpreted `size(filter(__b, h === b))` passes —
  * each of which re-walked the bucket array and allocated a filtered
  * copy per bucket per row. Null elements count nowhere (the filter
  * form's `null === b` is null → dropped), so counts are identical.
  * CodegenFallback like the other array-producing kernels; consumers
  * follow the Langid two-step convention (counts as a real column,
  * then element_at per bucket — CollapseProject does not inline
  * non-cheap expressions used more than once). */
case class TokenBucketCounts(child: Expression, seed: Long, nBuckets: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
    s"TokenBucketCounts: nBuckets must be a power of two, got $nBuckets")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_bucket_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_bucket_counts requires array<string>, got ${t.catalogString}")
    }

  private val mask = (nBuckets - 1).toLong

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val counts = new Array[Long](nBuckets)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var h = seed
        var j = 0
        while (j < bytes.length) {
          val d = TokenHashing.decode(bytes, j)
          h = h * 31L + (d >>> 3)
          j += (d & 7)
        }
        counts((h & mask).toInt) += 1L
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ_b count_b · w_b over an array of bucket ids in ONE pass — the
  * DSIR importance-weight dot ([[graft.operators.Curation]]
  * dsirDotCol). Counts each in-range bucket id, then folds the
  * per-bucket terms in ascending-b order STARTING FROM THE FIRST
  * TERM (not 0.0 — `reduce(_ + _)` semantics, so a −0.0 first term
  * survives exactly as the chained form produced it). Out-of-range
  * and null ids contribute nothing, matching the per-bucket
  * `filter(h === b)` form. Replaces B interpreted size∘filter passes
  * (each allocating a filtered array copy) per row. */
case class BucketDot(child: Expression, weights: IndexedSeq[Double])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(weights.nonEmpty, "BucketDot: need at least one bucket weight")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "bucket_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_dot requires array<long>, got ${t.catalogString}")
    }

  @transient private lazy val w = weights.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val counts = new Array[Long](w.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val b = arr.getLong(i)
        if (b >= 0L && b < w.length) counts(b.toInt) += 1L
      }
      i += 1
    }
    var s = counts(0).toDouble * w(0)
    var b = 1
    while (b < w.length) { s += counts(b).toDouble * w(b); b += 1 }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All (prefix_h, bigram_h, token_h) xxhash64 triples of a token
  * array's adjacent pairs in ONE pass — the corpus-scale stage of the
  * bigram/interpolated-LM family ([[graft.operators.Curation]]'s
  * bigramHashRows convention: seed-literal 1L decorrelates the
  * prefix/token key space from the 2L bigram space).
  *
  * Replaces `zip_with(slice(t,1,n−1), slice(t,2,n−1), …)` with three
  * `xxhash64` calls per element — the HOF evaluates interpreted,
  * copies two sub-arrays per ROW, and re-hashes every token twice
  * per position. Here each token's seed-1L hash is computed once and
  * shared between the pair that uses it as prefix and the pair that
  * uses it as token. Hashing delegates to Spark's own
  * XxHash64Function (the builtin's interpreted kernel), so every
  * emitted long is bit-identical to the composed form by
  * construction, including the null-element pass-through (a null
  * argument leaves the accumulated seed unchanged) and the 42L root
  * seed. CodegenFallback like the other array<struct> producers
  * (CdcChunkHashes): the downstream explode dominates, and the eval
  * is a single tight loop. */
case class BigramHashes(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("prefix_h", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bigram_h", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("token_h", LongType, nullable = false))),
      containsNull = false)
  override def prettyName: String = "bigram_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bigram_hashes requires array<string>, got ${t.catalogString}")
    }

  // xxhash64(lit(1L), x) = hash(x, hash(1L, 42L)); the long-literal
  // prefix folds to a constant seed
  @transient private lazy val seed1 =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      1L, LongType, 42L)
  @transient private lazy val seed2 =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      2L, LongType, 42L)

  private def hashStr(s: UTF8String, seed: Long): Long =
    if (s == null) seed
    else org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, org.apache.spark.sql.types.StringType, seed)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    // per-position seed-1L hash computed once, shared by the pair
    // using it as prefix and the pair using it as token
    val h1 = new Array[Long](n)
    var i = 0
    while (i < n) {
      h1(i) = hashStr(if (arr.isNullAt(i)) null else arr.getUTF8String(i), seed1)
      i += 1
    }
    val out = new Array[Any](n - 1)
    i = 0
    while (i < n - 1) {
      val a = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val b = if (arr.isNullAt(i + 1)) null else arr.getUTF8String(i + 1)
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        h1(i), hashStr(b, hashStr(a, seed2)), h1(i + 1))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest coarse centroid of a vector in ONE pass — the IVF
  * assignment kernel. Computes every centroid's L2 rank
  * `d_j = |c_j|² − 2·(v·c_j)` reading the vector once (centroid
  * matrix and the driver-precomputed |c_j|² attached via
  * addReferenceObj, flat row-major `[cid][dim]`), and returns the
  * argmin under Spark's struct-min ordering on `(d, cid)`: doubles
  * compare with NaN greatest, ties take the smaller cid (ascending
  * iteration keeps the first). Note on ±0.0: the interpreted
  * DoubleType ordering is java.lang.Double.compare, which orders
  * -0.0 < +0.0 — but a -0.0 rank is UNREACHABLE here (d = c2 − 2·acc
  * with c2 a sum of squares ≥ +0.0 can produce exact +0.0 but never
  * -0.0), so strict `<` agrees with the composed struct-min form on
  * every reachable value. A future rank formula that CAN produce
  * -0.0 must revisit this comparison.
  *
  * Replaces `array_min(array(struct(lit(c2_j) − 2·dot(v, array(lit…)),
  * cid_j)…))` — a form that re-read the vector and materialized a
  * dim-literal centroid array PER ROW PER CENTROID (the pre-r15
  * HyperplaneSig disease; measured as ann_ivf's dominant single-task
  * second at sf0.1). Per-centroid accumulation runs in the same
  * ascending-index order as the standalone left-fold dot product, and
  * c2 is the same driver-side sum the literal carried, so every
  * assignment (and therefore every stored IVF list and oracle hash)
  * is bit-identical to the old form. */
case class NearestCentroid(child: Expression, cents: IndexedSeq[Double],
    c2: IndexedSeq[Double], dim: Int, nc: Int)
    extends UnaryExpression {

  require(nc >= 1, s"NearestCentroid: need at least one centroid, got $nc")
  require(cents.length == dim * nc,
    s"NearestCentroid: centroid length ${cents.length} != dim*nc (${dim * nc})")
  require(c2.length == nc, s"NearestCentroid: c2 length ${c2.length} != nc ($nc)")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires array<float> or array<double>, got ${t.catalogString}")
    }

  @transient private lazy val w = cents.toArray
  @transient private lazy val cn = c2.toArray

  @transient private lazy val readsFloat = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(v.numElements(), dim)
    val acc = new Array[Double](nc)
    var i = 0
    while (i < n) {
      val x = if (readsFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var j = 0
      var base = i
      while (j < nc) { acc(j) += x * w(base); base += dim; j += 1 }
      i += 1
    }
    var best = 0
    var bestD = cn(0) - 2.0 * acc(0)
    var j = 1
    while (j < nc) {
      val dj = cn(j) - 2.0 * acc(j)
      // Spark double ordering: NaN greatest; strict < keeps the
      // earlier (smaller) cid on ties. −0.0 is unreachable for this
      // rank (see class doc), so the Double.compare −0.0 < +0.0
      // distinction never fires
      if (dj < bestD || (java.lang.Double.isNaN(bestD) && !java.lang.Double.isNaN(dj))) {
        best = j; bestD = dj
      }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("ncCents", w, "double[]")
    val cnRef = ctx.addReferenceObj("ncC2", cn, "double[]")
    val getter = if (readsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |int ${ev.value}_n = java.lang.Math.min($c.numElements(), $dim);
         |double[] ${ev.value}_acc = new double[$nc];
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  double ${ev.value}_x = (double) $c.$getter(${ev.value}_i);
         |  int ${ev.value}_w = ${ev.value}_i;
         |  for (int ${ev.value}_j = 0; ${ev.value}_j < $nc; ${ev.value}_j++) {
         |    ${ev.value}_acc[${ev.value}_j] += ${ev.value}_x * $wRef[${ev.value}_w];
         |    ${ev.value}_w += $dim;
         |  }
         |}
         |int ${ev.value}_best = 0;
         |double ${ev.value}_bd = $cnRef[0] - 2.0 * ${ev.value}_acc[0];
         |for (int ${ev.value}_j = 1; ${ev.value}_j < $nc; ${ev.value}_j++) {
         |  double ${ev.value}_dj = $cnRef[${ev.value}_j] - 2.0 * ${ev.value}_acc[${ev.value}_j];
         |  if (${ev.value}_dj < ${ev.value}_bd ||
         |      (java.lang.Double.isNaN(${ev.value}_bd) && !java.lang.Double.isNaN(${ev.value}_dj))) {
         |    ${ev.value}_best = ${ev.value}_j;
         |    ${ev.value}_bd = ${ev.value}_dj;
         |  }
         |}
         |${ev.value} = ${ev.value}_best;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared tokenizer for the shingle expressions: whitespace-split
  * token poly-31 hashes over UNICODE CODEPOINTS (in-place UTF-8
  * decode — identical to the old byte fold on ASCII, and since r4
  * identical to the oracle's `ord(c)` fold on all of Unicode). */
private[expr] object TokenHashing {
  // full Java \s class: space, tab, LF, VT, FF, CR — Text.tokens and
  // the DuckDB oracles split on \s+, so a narrower set here would
  // shingle \f- or \x0B-bearing documents differently than the oracle
  @inline private def isSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == 0x0b || cp == 0x0c

  /** (codepoint, utf8len) packed as (cp << 3) | len. Valid multi-byte
    * sequences (lead C2-DF/E0-EF/F0-F4 + 80-BF continuations, fully
    * inside the buffer) decode as one codepoint; anything malformed —
    * stray continuation byte, overlong/invalid lead, truncated tail —
    * folds that SINGLE byte (unsigned) and advances one, so corrupt
    * bytes never swallow the valid characters after them and the fold
    * stays deterministic on arbitrary binary-cast input. */
  @inline private[expr] def decode(bytes: Array[Byte], i: Int): Int = {
    val b = bytes(i) & 0xff
    var cp = b
    var len = 1
    if (b >= 0xc2 && b <= 0xdf) { cp = b & 0x1f; len = 2 }
    else if (b >= 0xe0 && b <= 0xef) { cp = b & 0x0f; len = 3 }
    else if (b >= 0xf0 && b <= 0xf4) { cp = b & 0x07; len = 4 }
    if (len > 1) {
      if (i + len > bytes.length) { cp = b; len = 1 }
      else {
        var k = 1
        var ok = true
        var acc = cp
        while (ok && k < len) {
          val cb = bytes(i + k) & 0xff
          if ((cb & 0xc0) != 0x80) ok = false
          else { acc = (acc << 6) | (cb & 0x3f); k += 1 }
        }
        if (ok) cp = acc else { cp = b; len = 1 }
      }
    }
    (cp << 3) | len
  }

  def tokenPolyHashes(bytes: Array[Byte]): java.util.ArrayList[Long] = {
    val tokHashes = new java.util.ArrayList[Long]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      var d = 0
      while (i < n && { d = decode(bytes, i); isSpace(d >>> 3) }) i += (d & 7)
      if (i < n) {
        var h = 17L
        while (i < n && { d = decode(bytes, i); !isSpace(d >>> 3) }) {
          h = h * 31L + (d >>> 3); i += (d & 7)
        }
        tokHashes.add(h)
      }
    }
    tokHashes
  }
}

/** Distinct word-k-gram hashes of a string in one pass: tokenize on
  * ASCII whitespace runs, hash each token (poly-31 over Unicode
  * codepoints), combine each window of k consecutive token hashes
  * into one 64-bit shingle hash, dedupe.
  *
  * This replaces a `transform(sequence)∘slice∘concat_ws∘array_distinct`
  * higher-order pipeline that evaluated interpreted per shingle and
  * dominated the dedup stages (measured ~6 s per pass over 5k docs vs
  * ~0.2 s here). Downstreams (Jaccard inverted index, MinHash perms)
  * only ever consume shingle hashes, never the strings.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val tokHashes = TokenHashing.tokenPolyHashes(bytes)
    val m = tokHashes.size - k + 1
    if (m <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    else {
      val seen = new java.util.LinkedHashSet[Long]()
      var j = 0
      while (j < m) {
        var h = 1125899906842597L
        var w = 0
        while (w < k) { h = h * -7046029254386353131L + tokHashes.get(j + w); w += 1 }
        seen.add(h)
        j += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var p = 0
      while (it.hasNext) { out(p) = it.next(); p += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Every word-k-gram hash of a string IN POSITION ORDER (the
  * non-deduplicating sibling of [[ShingleHashes]]): element i is the
  * hash of tokens [i, i+k). posexplode over the result yields
  * (position, window-hash) pairs — the input to substring-level dedup,
  * where WHERE a duplicated span sits matters, not just that it
  * exists. Same tokenizer and hash constants as ShingleHashes, so the
  * two are interchangeable in oracles. */
case class ShingleHashesAll(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_all"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val tokHashes = TokenHashing.tokenPolyHashes(bytes)
    val m = tokHashes.size - k + 1
    if (m <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](m)
      var j = 0
      while (j < m) {
        var h = 1125899906842597L
        var w = 0
        while (w < k) { h = h * -7046029254386353131L + tokHashes.get(j + w); w += 1 }
        out(j) = h
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** CONTENT-DEFINED CHUNKING of a string's token stream in one pass —
  * the Rabin-style CDC primitive of storage dedup, applied at word
  * granularity for corpus-level duplicated-passage detection: a chunk
  * BOUNDARY falls after word i whenever the rolling window hash of
  * the last `w` words satisfies `hash mod D == D-1` (D a power of
  * two, expected chunk length ≈ D words). Because boundaries are
  * decided by CONTENT, not position, an insertion or deletion only
  * perturbs the chunks that overlap the edit — every chunk outside
  * the edit window keeps its exact hash, which is what makes
  * chunk-hash equality a near-dup signal robust to prefix/infix edits
  * where fixed-stride windows ([[ShingleHashesAll]] spans) all shift.
  *
  * Output: array<struct<hash: long, len: int>> in chunk order — the
  * poly fold (shingle seed/mix constants, mod 2^64) of each chunk's
  * word hashes plus its word count. Tokenizer and word hash are
  * [[TokenHashing.tokenPolyHashes]] (the engine-wide convention), so
  * the whole pipeline replays in HUGEINT SQL. The window hash is
  * recomputed per position (w multiplies — w is small); the first
  * w-1 positions carry no window and cannot end a chunk; the final
  * chunk always flushes. Empty/whitespace-only input → empty array. */
case class CdcChunkHashes(child: Expression, w: Int, modD: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(w >= 1, s"window $w must be >= 1")
  require(modD >= 2 && (modD & (modD - 1)) == 0,
    s"boundary modulus $modD must be a power of two >= 2 (mask == unsigned mod)")

  private val mask = (modD - 1).toLong

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("hash", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("len",
          org.apache.spark.sql.types.IntegerType, nullable = false))),
      containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val wh = TokenHashing.tokenPolyHashes(bytes)
    val n = wh.size
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val seed = 1125899906842597L
    val mult = -7046029254386353131L
    var ch = seed
    var len = 0
    var i = 0
    while (i < n) {
      ch = ch * mult + wh.get(i)
      len += 1
      var boundary = false
      if (i >= w - 1) {
        var rh = seed
        var j = i - w + 1
        while (j <= i) { rh = rh * mult + wh.get(j); j += 1 }
        boundary = (rh & mask) == mask
      }
      if (boundary) {
        out += org.apache.spark.sql.catalyst.InternalRow(ch, len)
        ch = seed
        len = 0
      }
      i += 1
    }
    if (len > 0) out += org.apache.spark.sql.catalyst.InternalRow(ch, len)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact char-k-gram hash-bucket COUNT VECTOR of a string in ONE
  * pass: walk the codepoints of the (already-lowercased) input,
  * poly-31-fold each window of k codepoints (max value for k=3 is
  * ~0x10FFFF·31² < 2^31 — exact in both engines, no mod-2^64
  * machinery), `% buckets`, and increment that slot of a
  * length-`buckets` long array. Element b equals the oracle's
  * `len(list_filter(gb, h -> h = b))` over the per-gram list.
  *
  * This replaces a `split(lower)∘transform(ascii)∘sequence∘transform`
  * per-CHARACTER higher-order pipeline whose B=16 `size(filter(…))`
  * derived columns fanned into K×B² scoring chains after projection
  * collapse (measured 166 s / 209 s for the trained-langid pair at
  * sf0.1 vs ~2 s for the identical arithmetic single-node — the
  * expression-tree duplication was the whole cost). Inputs shorter
  * than k codepoints yield the all-zero vector (prior-only scoring
  * downstream), matching the oracle's empty-list branch. */
case class CharGramBucketCounts(child: Expression, k: Int, buckets: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_bucket_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new Array[Long](buckets)
    val n = s.codePointCount(0, s.length)
    if (n >= k) {
      val codes = new Array[Long](n)
      var ci = 0
      var p = 0
      while (p < s.length) {
        val cp = s.codePointAt(p)
        codes(ci) = cp.toLong
        ci += 1
        p += Character.charCount(cp)
      }
      var i = 0
      val m = n - k + 1
      while (i < m) {
        var h = 0L
        var w = 0
        while (w < k) { h = h * 31L + codes(i + w); w += 1 }
        // floorMod: the poly-31 fold is provably non-negative only for
        // k <= 9 (0x10FFFF·31^8 < 2^63); a larger k may wrap the Long
        // negative, and a plain % would then index out of bounds
        out(java.lang.Math.floorMod(h, buckets.toLong).toInt) += 1L
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document DEFLATE compression ratio (compressed/raw bytes) —
  * the Gopher/RefinedWeb-family quality signal the heuristic gates
  * don't capture: machine-generated boilerplate and duplicated spans
  * compress far below natural prose (ratio ≪ typical), while
  * random/gibberish text compresses above it (ratio ≈ 1) — one score
  * flags BOTH ends. Computed with the JDK's zlib at a fixed level so
  * it is deterministic within a JVM generation; treated as a
  * test-gated signal (no SQL engine replays DEFLATE), thresholds are
  * corpus-calibrated like the C4/Gopher knobs. One pass, no shuffle;
  * empty docs return 0.0 rather than dividing by zero. */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(level >= 1 && level <= 9, s"deflate level $level outside [1, 9]")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].getBytes
    if (raw.isEmpty) 0.0
    else {
      val d = new java.util.zip.Deflater(level, true)
      try {
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        total.toDouble / raw.length
      } finally d.end()
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Pack an exact 0..255 code array into ONE binary value — the SQ8
  * index's stored representation: 1 byte per dimension, 8× smaller
  * than the float64 vector it encodes (64 bytes at D=64). The codes
  * arrive as exact small integers in doubles (the quantizer's
  * round()); anything outside [0, 255] is a caller bug and throws
  * rather than silently wrapping. */
case class Sq8Pack(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "sq8_pack"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = arr.getDouble(i)
      if (c < 0.0 || c > 255.0)
        throw new IllegalArgumentException(s"SQ8 code $c outside [0, 255] at dim $i")
      out(i) = c.toInt.toByte
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dequantize a packed SQ8 code binary under the (literal)
  * per-dimension ranges: x̂_d = min_d + code_d/255·span_d — the same
  * left-assoc arithmetic as the in-plan zip_with form, so the
  * serving path scores bit-identically to the inline operator. */
case class Sq8Dequant(child: Expression, mins: Seq[Double], spans: Seq[Double])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(mins.length == spans.length,
    s"mins/spans length mismatch: ${mins.length} vs ${spans.length}")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "sq8_dequant"

  @transient private lazy val mn = mins.toArray
  @transient private lazy val sp = spans.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    require(bytes.length == mn.length,
      s"code width ${bytes.length} != range width ${mn.length}")
    val out = new Array[Double](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = mn(i) + (bytes(i) & 0xff) / 255.0 * sp(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Murmur-style 64-bit finalizer (the MinHashAgg.mix avalanche without
  * the permutation constant): xor-shift / multiply rounds with Java
  * long wrap semantics. A native expression rather than Column
  * arithmetic because ANSI mode (Spark 4 default) makes `*` on longs
  * THROW on overflow — wraparound is the point here. Turns structured
  * hashes (poly-31 of short tokens barely varies in the high bits)
  * into avalanche-quality bits, and stays reproducible in the oracle
  * engine's HUGEINT arithmetic, which xxhash64 is not. */
case class Avalanche64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "avalanche64"

  @inline private def mix(h: Long): Long = {
    var x = h
    x ^= x >>> 33; x *= -49064778989728563L
    x ^= x >>> 33; x *= -4265267296055464877L
    x ^= x >>> 33
    x
  }

  override protected def nullSafeEval(input: Any): Any =
    mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |long ${ev.value}_x = $c;
         |${ev.value}_x ^= ${ev.value}_x >>> 33; ${ev.value}_x *= -49064778989728563L;
         |${ev.value}_x ^= ${ev.value}_x >>> 33; ${ev.value}_x *= -4265267296055464877L;
         |${ev.value}_x ^= ${ev.value}_x >>> 33;
         |${ev.value} = ${ev.value}_x;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All unordered (i < j) element pairs of an array, as
  * array<struct<a,b>> — one pass, no intermediate slices.
  *
  * Replaces the `flatten(transform(slice...))` higher-order pipeline
  * in pair counting: HOFs evaluate interpreted and `slice` copies a
  * sub-array per element, so the HOF form does O(n²) allocations per
  * row on top of per-lambda dispatch. Element type is taken from the
  * input array (works for any atomic type). Pass a sorted array to
  * get a < b pairs. */
case class SortedPairs(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private def elemType: DataType =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", elemType, nullable = true),
        org.apache.spark.sql.types.StructField("b", elemType, nullable = true))),
      containsNull = false)
  override def prettyName: String = "sorted_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val et = elemType
    val n = arr.numElements()
    // n*(n-1)/2 in Int wraps negative past n=65536 — fail intelligibly
    // instead of NegativeArraySizeException deep in eval (callers
    // should cap pathological set sizes upstream; see
    // Pipeline.pairCounts maxSetSize)
    val nPairs = n.toLong * (n - 1) / 2
    require(nPairs <= Int.MaxValue - 8,
      s"sorted_pairs: $n elements produce $nPairs pairs, past the array " +
        "limit — cap the set size upstream")
    val out = new Array[Any](nPairs.toInt)
    var p = 0
    var i = 0
    while (i < n) {
      val a = arr.get(i, et)
      var j = i + 1
      while (j < n) {
        out(p) = InternalRow(a, arr.get(j, et))
        p += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder: split a D-dim vector into `m`
  * subspaces of D/m dims, snap each sub-vector to its nearest of
  * `kCent` trained sub-centroids (L2, lowest index on ties), and pack
  * the `m` code bytes into ONE long — 8 bytes replace 8·D vector
  * bytes (32× at D=64/float). `codebook` is laid out
  * [subspace][centroid][dim], trained offline (driver-side Lloyd on a
  * sample — the same "small model state as literals" pattern as the
  * IVF coarse quantizer). Requires m ≤ 8 and kCent ≤ 256 so codes
  * fit the long. */
case class PqEncode(child: Expression, codebook: IndexedSeq[Double], m: Int, kCent: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(m >= 1 && m <= 8 && kCent >= 1 && kCent <= 256,
    "PqEncode: need 1 <= m <= 8 and 1 <= kCent <= 256")
  require(codebook.length % (m * kCent) == 0,
    "PqEncode: codebook length must be m * kCent * subDim")

  private val subDim = codebook.length / (m * kCent)
  private val cb = codebook.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // a ragged row (corrupt corpus) must fail intelligibly, not AIOOBE
    // on short vectors or silently encode a prefix of long ones
    require(v.numElements() == m * subDim,
      s"pq_encode: vector has ${v.numElements()} dims, codebook expects ${m * subDim}")
    var code = 0L
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestD = Double.MaxValue
      var kk = 0
      while (kk < kCent) {
        val base = (mm * kCent + kk) * subDim
        var d2 = 0.0
        var dd = 0
        while (dd < subDim) {
          val diff = v.getDouble(mm * subDim + dd) - cb(base + dd)
          d2 += diff * diff
          dd += 1
        }
        if (d2 < bestD) { bestD = d2; best = kk }
        kk += 1
      }
      code |= best.toLong << (8 * mm)
      mm += 1
    }
    code
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance lookup for PQ codes: given a packed code and a
  * per-query table of sub-dot-products (layout [subspace][centroid],
  * m·kCent doubles), the approximate inner product is `m` array
  * lookups — no vector math per candidate pair at all. The table is
  * computed ONCE per query row (O(m·kCent·subDim)); every corpus
  * candidate then costs O(m). */
case class PqAdc(left: Expression, right: Expression, m: Int, kCent: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(code: Any, table: Any): Any = {
    val c = code.asInstanceOf[Long]
    val t = table.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var s = 0.0
    var mm = 0
    while (mm < m) {
      val kk = ((c >>> (8 * mm)) & 0xffL).toInt
      s += t.getDouble(mm * kCent + kk)
      mm += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Byte-pair-encoding primitives. The merge semantics shared by
  * training and encoding (and replayed by the oracle's recursive-CTE
  * fold): one LEFT-TO-RIGHT pass per rule, expressed as a fold —
  * merge when the accumulator's last symbol is `lhs` and the incoming
  * symbol is `rhs`. The fold equals the classic skip-two scan because
  * a merged cell's text (lhs+rhs) can never equal lhs (rhs is
  * non-empty), and one pass per rule is a fixpoint (a merge cannot
  * create a new (lhs, rhs) adjacency for the same rule). */
object BpeOps {
  def mergeOnce(syms: Array[String], lhs: String, rhs: String,
      merged: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      val s = syms(j)
      if (out.nonEmpty && out(out.length - 1) == lhs && s == rhs)
        out(out.length - 1) = merged
      else out += s
      j += 1
    }
    out.toArray
  }

  /** Split a word into per-codepoint symbols (ASCII = per char;
    * matches the oracle's string_split(w, '') on non-combining
    * text). */
  def codepointSyms(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + cc)
      i += cc
    }
    out.toArray
  }
}

/** Encode one word as BPE subwords: codepoint symbols, then every
  * merge rule applied in training order (one fold pass each — see
  * [[BpeOps]]). The rule list rides in the expression (broadcast
  * model state as literals, the PqEncode codebook pattern). */
case class BpeEncode(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(input: Any): Any = {
    var syms = BpeOps.codepointSyms(input.asInstanceOf[UTF8String].toString)
    rules.foreach { case (a, b) => syms = BpeOps.mergeOnce(syms, a, b, a + b) }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      syms.map(UTF8String.fromString(_)): Array[UTF8String])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One BPE merge round over an already-symbolized array — the
  * training-loop step ([[BpeEncode]] composes these from raw text).
  */
case class BpeMergeStep(child: Expression, lhs: String, rhs: String)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_step"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val syms = new Array[String](arr.numElements())
    var i = 0
    while (i < syms.length) { syms(i) = arr.getUTF8String(i).toString; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      BpeOps.mergeOnce(syms, lhs, rhs, lhs + rhs)
        .map(UTF8String.fromString(_)): Array[UTF8String])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Viterbi-segment one word under a unigram piece model — the
  * SentencePiece-style tokenizer's encode ([[graft.operators.Unigram]]).
  * The (piece → log-prob) table rides in the expression as literals
  * (the BpeEncode model-in-plan pattern). dp over codepoint
  * positions; candidates check LONGEST length first with a
  * strictly-greater replace, so ties go to the longer piece —
  * matching the oracle's CASE order exactly. A position no piece
  * covers falls back to its single codepoint at `unkLogp`. */
/** WordPiece GREEDY encode of one word (Wu et al. '16 / BERT's
  * tokenizer — the third tokenizer family next to BPE's merge replay
  * and Unigram's Viterbi): at each position take the LONGEST vocab
  * piece that matches, where position 0 consults the word-initial
  * vocabulary and later positions the continuation vocabulary
  * (emitted with the `##` marker). If NO piece matches at some
  * position — not even a single character — the WHOLE word encodes
  * to `[UNK]` (the BERT contract: unknown words are opaque, not
  * partially split). Deterministic: longest-first is the only rule,
  * no scores, no ties. */
case class WordPieceEncode(child: Expression, initPieces: Seq[String],
    contPieces: Seq[String], maxLen: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(maxLen >= 1, s"maxLen $maxLen must be >= 1")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val initSet: Set[String] = initPieces.toSet
  @transient private lazy val contSet: Set[String] = contPieces.toSet

  override protected def nullSafeEval(input: Any): Any = {
    val syms = BpeOps.codepointSyms(input.asInstanceOf[UTF8String].toString)
    val n = syms.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[UTF8String])
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var pos = 0
    while (pos < n) {
      val vocab = if (pos == 0) initSet else contSet
      var l = math.min(maxLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val piece = syms.slice(pos, pos + l).mkString
        if (vocab.contains(piece)) hit = piece else l -= 1
      }
      if (hit == null)
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array(UTF8String.fromString("[UNK]")))
      out += UTF8String.fromString(if (pos == 0) hit else "##" + hit)
      pos += l
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Seed-1L xxhash64 of every array element in ONE pass (r16):
  * `array<string> → array<long>` — the in-row twin of the
  * post-explode `xxhash64(lit(1L), tok)` projection, sharing
  * [[BigramHashes]]' exact seed fold (hash(x, hash(1L, 42L))), so
  * every emitted long is bit-identical by construction and joins
  * the same token_h key space. Exploding the LONG array instead of
  * strings-then-hash keeps the generator output 8 bytes/row and
  * hashes each element exactly once. Null elements pass the seed
  * through, matching xxhash64's null semantics in the composed
  * form. */
case class TokenHashes(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_hashes requires array<string>, got ${t.catalogString}")
    }

  @transient private lazy val seed1 =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      1L, LongType, 42L)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) seed1
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          arr.getUTF8String(i), StringType, seed1)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All unordered token pairs within `window` positions, ONE pass
  * (r16): for every distance d ≤ window and position i, emit
  * struct(min(t_i, t_{i+d}), max(t_i, t_{i+d})) under UTF-8-byte
  * string order — exactly the multiset (and d-major order) of
  * pmiCollocations' previous per-distance interpreted
  * `transform`+`concat` chain, which re-walked the token array and
  * re-evaluated two `element_at`s per emitted struct per distance.
  * Elements are cloned once up front (retained UTF8Strings must not
  * alias the reusable input row buffer) and each is then shared by
  * all ≤ 2·window pairs touching it. Null elements (unreachable
  * after the upstream empty-token filter) follow least/greatest
  * semantics: the non-null partner fills both slots. */
case class WindowPairs(child: Expression, window: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(window >= 1, s"window $window must be >= 1")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w1", StringType, nullable = true),
        org.apache.spark.sql.types.StructField("w2", StringType, nullable = true))),
      containsNull = false)
  override def prettyName: String = "window_pairs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"window_pairs requires array<string>, got ${t.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).clone()
      i += 1
    }
    var total = 0
    var d = 1
    while (d <= window) { total += math.max(n - d, 0); d += 1 }
    val out = new Array[Any](total)
    var k = 0
    d = 1
    while (d <= window) {
      i = 0
      while (i < n - d) {
        val a = toks(i)
        val b = toks(i + d)
        // least/greatest under UTF8String binary order; nulls yield
        // the non-null partner in both slots (least≡greatest≡it)
        val (w1, w2) =
          if (a == null) (b, b)
          else if (b == null) (a, a)
          else if (a.compareTo(b) <= 0) (a, b)
          else (b, a)
        out(k) = org.apache.spark.sql.catalyst.InternalRow(w1, w2)
        k += 1
        i += 1
      }
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The Viterbi segmentation shared by [[UnigramEncode]] and the
  * driver-local unigram trainer ([[graft.operators.Unigram]]) — ONE
  * implementation, so the local EM rounds are bit-identical to the
  * distributed E-step by construction. */
object UnigramOps {
  def viterbi(word: String, lp: Map[String, Double], maxLen: Int,
      unkLogp: Double): Array[String] = {
    val syms = BpeOps.codepointSyms(word)
    val n = syms.length
    if (n == 0) return Array.empty[String]
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestDp = Double.NegativeInfinity
      var bestL = 0
      var l = math.min(maxLen, i)
      while (l >= 1) {
        val piece = syms.slice(i - l, i).mkString
        val plp =
          if (l == 1) Some(lp.getOrElse(piece, unkLogp))
          else lp.get(piece)
        plp.foreach { v =>
          val cand = dp(i - l) + v
          if (cand > bestDp) { bestDp = cand; bestL = l }
        }
        l -= 1
      }
      dp(i) = bestDp
      back(i) = bestL
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val l = back(pos)
      out += syms.slice(pos - l, pos).mkString
      pos -= l
    }
    out.reverseIterator.toArray
  }
}

case class UnigramEncode(child: Expression, pieces: Seq[(String, Double)],
    maxLen: Int, unkLogp: Double)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val lp: Map[String, Double] = pieces.toMap

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      UnigramOps.viterbi(input.asInstanceOf[UTF8String].toString, lp,
          maxLen, unkLogp)
        .map(UTF8String.fromString(_)): Array[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass URL canonicalization — lowercase scheme+host, default
  * port stripped (:80 for http, :443 for https), trailing path
  * slashes collapsed (root stays "/"), tracking params (the utm_
  * prefix family, fbclid, gclid, ref_src) dropped, surviving params sorted
  * (UTF-8 binary order, = code-point order), fragment dropped.
  *
  * Replaces [[graft.functions.Urls.canonicalizeColumns]]'s chain of
  * 8 regex Column ops: each regexp_extract/regexp_replace/rlike runs
  * its own NFA over the row, so the chain pays ~10 pattern engines
  * per URL where one left-to-right scan suffices (the r12 bench
  * measured the chain 3.4× over the DuckDB oracle's vectorized RE2 —
  * a per-row CPU constant, no scale risk, but why pay it). The
  * output contract is EXACTLY the Column form's — including its
  * degenerate no-scheme behavior ("://" + "/" skeleton) and
  * first-'?'-anywhere query detection — property-spec'd equal on
  * adversarial inputs (UrlCanonSpec). ASCII chars lowercase via the
  * fast path; non-ASCII falls back to String.toLowerCase, the same
  * route UTF8String.toLowerCase takes.
  *
  * Codegen emits one static call — the expression stays inside the
  * enclosing WholeStageCodegen span (no CodegenFallback row boxing).
  */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "url_canonicalize"

  override protected def nullSafeEval(input: Any): Any =
    UrlCanonicalize.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.UrlCanonicalize.canon($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlCanonicalize {

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isSchemeChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  private def lowerAscii(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (!ascii) s.toLowerCase // the UTF8String.toLowerCase non-ASCII route
    else {
      val b = new java.lang.StringBuilder(s.length)
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        i += 1
      }
      b.toString
    }
  }

  /** `^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref_src)=` — the
    * [[graft.functions.Urls.trackingParamPattern]] contract, scanned. */
  private def isTracking(p: String): Boolean = {
    if (p.startsWith("fbclid=") || p.startsWith("gclid=") || p.startsWith("ref_src=")) true
    else if (p.startsWith("utm_")) {
      var i = 4
      while (i < p.length && {
        val c = p.charAt(i)
        isAlpha(c) || (c >= '0' && c <= '9') || c == '_'
      }) i += 1
      i < p.length && p.charAt(i) == '='
    } else false
  }

  // UTF-8 binary order == code-point lexicographic order (what
  // array_sort does on strings); String.compareTo is UTF-16-unit
  // order, which misorders supplementary characters
  private def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def canon(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    // scheme: ^[A-Za-z][A-Za-z0-9+.-]*:// — the class excludes ':',
    // so the maximal run must be followed by "://" exactly
    var schemeEnd = -1
    if (n > 0 && isAlpha(s.charAt(0))) {
      var i = 1
      while (i < n && isSchemeChar(s.charAt(i))) i += 1
      if (s.regionMatches(i, "://", 0, 3)) schemeEnd = i
    }
    val sch = if (schemeEnd < 0) "" else lowerAscii(s.substring(0, schemeEnd))
    var hostport = ""
    var rawPath = ""
    if (schemeEnd >= 0) {
      var i = schemeEnd + 3
      val hostStart = i
      while (i < n && { val c = s.charAt(i); c != '/' && c != '?' && c != '#' }) i += 1
      hostport = lowerAscii(s.substring(hostStart, i))
      val pathStart = i
      while (i < n && { val c = s.charAt(i); c != '?' && c != '#' }) i += 1
      rawPath = s.substring(pathStart, i)
    }
    val host =
      if (sch == "http" && hostport.endsWith(":80"))
        hostport.substring(0, hostport.length - 3)
      else if (sch == "https" && hostport.endsWith(":443"))
        hostport.substring(0, hostport.length - 4)
      else hostport
    var pe = rawPath.length
    while (pe > 0 && rawPath.charAt(pe - 1) == '/') pe -= 1
    val path = if (pe == 0) "/" else rawPath.substring(0, pe)
    // query: first '?' ANYWHERE (the \?([^#]*) contract), to '#'/end
    val qMark = s.indexOf('?')
    val rawQ =
      if (qMark < 0) ""
      else {
        val h = s.indexOf('#', qMark + 1)
        if (h < 0) s.substring(qMark + 1) else s.substring(qMark + 1, h)
      }
    val out = new java.lang.StringBuilder(n)
    out.append(sch).append("://").append(host).append(path)
    if (!rawQ.isEmpty) {
      val params = new java.util.ArrayList[String](8)
      var st = 0
      var i = 0
      while (i <= rawQ.length) {
        if (i == rawQ.length || rawQ.charAt(i) == '&') {
          if (i > st) {
            val p = rawQ.substring(st, i)
            if (!isTracking(p)) params.add(p)
          }
          st = i + 1
        }
        i += 1
      }
      if (!params.isEmpty) {
        params.sort((a: String, b: String) => cpCompare(a, b))
        out.append('?')
        var k = 0
        while (k < params.size) {
          if (k > 0) out.append('&')
          out.append(params.get(k))
          k += 1
        }
      }
    }
    UTF8String.fromString(out.toString)
  }
}

/** Single-pass HTML-to-text extraction — the raw-crawl→text step a
  * training-data pipeline runs before any quality gate: drop
  * script/style payloads and nav boilerplate, strip remaining tags,
  * collapse whitespace.
  *
  * The executable contract is the regex Column chain
  * [[graft.functions.Html.textFromHtmlColumns]] (each step an
  * oracle-replayable RE2-compatible pattern):
  *   1. `(?s)<script[^>]*>.*?</script>` → " "  (then style, nav)
  *   2. `<[^>]*>` → " "
  *   3. `[ \t\n\x0B\f\r]+` → " ", trim (explicit class — RE2's
  *      \s lacks VT, java's has it; spelling the set keeps Spark,
  *      the native scan, and the DuckDB oracle identical).
  * This expression is the fused one-scan form, property-spec'd equal
  * (HtmlSpec) — including the chain's edge behaviors: an UNCLOSED
  * script/style/nav container keeps its body (only the open tag
  * strips), a '<' with no '>' stays literal text, close tags match
  * lowercase-exactly ("</script>", no spaces). Container matching is
  * first-close non-greedy, lowercase tag names only — the
  * synthesize-parse gates control casing; real crawl HTML would be
  * lowercased upstream.
  *
  * Codegen is one static call — stays inside the enclosing
  * WholeStageCodegen span (the UrlCanonicalize pattern).
  */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "html_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.HtmlText.extract($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlText {

  // the java \s class (non-UNICODE_CHARACTER_CLASS): space, tab, LF,
  // VT, FF, CR. NOT RE2's \s (which lacks VT) — the Column chain and
  // the oracle spell the set as an explicit [ \t\n\x0B\f\r] class
  // so all three engines collapse the same characters
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u000b' || c == '\f'

  /** One global pass of `(?s)<name[^>]*>.*?</name>` → " " as a
    * left-to-right scan: a match at a position needs "<name", then a
    * '>' (attrs cannot contain '>'), then the FIRST "</name>" after
    * it (non-greedy); a position where any piece is missing is not a
    * match start and the char passes through — exactly the
    * Matcher.find/appendReplacement walk, so each pass is
    * mechanically equivalent to its regex. */
  private def dropContainers(s: String, name: String): String = {
    val close = "</" + name + ">"
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      var matched = false
      if (s.charAt(i) == '<' && s.regionMatches(i + 1, name, 0, name.length)) {
        var gt = -1
        var m = i + 1 + name.length
        while (gt < 0 && m < n) { if (s.charAt(m) == '>') gt = m else m += 1 }
        if (gt >= 0) {
          val c = s.indexOf(close, gt + 1)
          if (c >= 0) { out.append(' '); i = c + close.length; matched = true }
        }
      }
      if (!matched) { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** `<[^>]*>` → " ", same walk: '<' with a later '>' is a tag, '<'
    * with none stays literal text. */
  private def dropTags(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        var gt = -1
        var m = i + 1
        while (gt < 0 && m < n) { if (s.charAt(m) == '>') gt = m else m += 1 }
        if (gt >= 0) { out.append(' '); i = gt + 1 }
        else { out.append('<'); i += 1 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** `[ \t\n\x0B\f\r]+` → " " then trim — runs collapse to one space; after the
    * collapse the ends can only be single spaces, so the space-only
    * trim of Spark/DuckDB `trim()` finishes the job. */
  private def collapseWs(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var emitted = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) pendingSpace = emitted
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c); emitted = true
      }
      i += 1
    }
    out.toString
  }

  /** The five chain passes, fused per pass but sequenced exactly as
    * the Column form sequences its regexes (pass order matters on
    * pathological overlaps — a container opened inside another tag's
    * attributes resolves identically). */
  def extract(u: UTF8String): UTF8String = {
    var s = u.toString
    s = dropContainers(s, "script")
    s = dropContainers(s, "style")
    s = dropContainers(s, "nav")
    s = dropTags(s)
    UTF8String.fromString(collapseWs(s))
  }
}

object NativeFunctions {
  /** Column API for HammingDistance. */
  def hamming_distance(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      HammingDistance(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))

  /** Column API for RollingHash. */
  def rolling_hash(c: Column, seed: Long = 1125899906842597L): Column =
    ColumnBridge.toColumn(RollingHash(ColumnBridge.toExpr(c), seed))

  /** Column API for DotProduct (array<double> inputs). */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      DotProduct(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))

  /** Column API for HyperplaneSig (array<float|double> → packed sign
    * bits; weights flat row-major [bit][dim]). */
  def hyperplane_sig(v: Column, weights: IndexedSeq[Double], dim: Int, bits: Int): Column =
    ColumnBridge.toColumn(
      HyperplaneSig(ColumnBridge.toExpr(v), weights, dim, bits))

  /** Column API for BigramHashes (array<string> → per-adjacent-pair
    * xxhash64 struct<prefix_h,bigram_h,token_h>). */
  def bigram_hashes(tokens: Column): Column =
    ColumnBridge.toColumn(BigramHashes(ColumnBridge.toExpr(tokens)))

  /** Column API for WindowPairs (array<string> → all unordered
    * within-`window` position pairs as struct<w1,w2>, one pass). */
  def window_pairs(tokens: Column, window: Int): Column =
    ColumnBridge.toColumn(WindowPairs(ColumnBridge.toExpr(tokens), window))

  /** Column API for TokenHashes (array<string> → per-element seed-1L
    * xxhash64 longs, one pass — the BigramHashes token_h space). */
  def token_hashes(tokens: Column): Column =
    ColumnBridge.toColumn(TokenHashes(ColumnBridge.toExpr(tokens)))

  /** Column API for TokenBucketCounts (array<string> → length-B
    * rolling-hash bucket count vector). */
  def token_bucket_counts(tokens: Column, nBuckets: Int,
      seed: Long = 1125899906842597L): Column =
    ColumnBridge.toColumn(
      TokenBucketCounts(ColumnBridge.toExpr(tokens), seed, nBuckets))

  /** Column API for BucketDot (array<long> bucket ids × literal
    * weights → Σ count_b·w_b). */
  def bucket_dot(bucketIds: Column, weights: IndexedSeq[Double]): Column =
    ColumnBridge.toColumn(BucketDot(ColumnBridge.toExpr(bucketIds), weights))

  /** Column API for NearestCentroid (array<float|double> → argmin
    * cid; centroids flat row-major [cid][dim], c2 = per-centroid
    * |c|² computed driver-side). */
  def nearest_centroid(v: Column, cents: IndexedSeq[Double],
      c2: IndexedSeq[Double], dim: Int, nc: Int): Column =
    ColumnBridge.toColumn(
      NearestCentroid(ColumnBridge.toExpr(v), cents, c2, dim, nc))

  /** Column API for ShingleHashes. */
  def shingle_hashes(text: Column, k: Int): Column =
    ColumnBridge.toColumn(ShingleHashes(ColumnBridge.toExpr(text), k))

  /** Column API for ShingleHashesAll (positional, non-deduplicating). */
  def shingle_hashes_all(text: Column, k: Int): Column =
    ColumnBridge.toColumn(ShingleHashesAll(ColumnBridge.toExpr(text), k))

  /** Column API for DeflateRatio (text → compressed/raw byte ratio). */
  def deflate_ratio(text: Column, level: Int = 6): Column =
    ColumnBridge.toColumn(DeflateRatio(ColumnBridge.toExpr(text), level))

  /** Column API for Sq8Pack (0..255 code array → 1-byte/dim binary). */
  def sq8_pack(codes: Column): Column =
    ColumnBridge.toColumn(Sq8Pack(ColumnBridge.toExpr(codes)))

  /** Column API for Sq8Dequant (code binary + literal ranges → array<double>). */
  def sq8_dequant(code: Column, mins: Seq[Double], spans: Seq[Double]): Column =
    ColumnBridge.toColumn(Sq8Dequant(ColumnBridge.toExpr(code), mins, spans))

  /** Column API for WordPieceEncode (word → greedy piece array). */
  def wordpiece_encode(word: Column, initPieces: Seq[String],
      contPieces: Seq[String], maxLen: Int): Column =
    ColumnBridge.toColumn(WordPieceEncode(ColumnBridge.toExpr(word),
      initPieces, contPieces, maxLen))

  /** Column API for CdcChunkHashes (string → array<struct<hash,len>>). */
  def cdc_chunk_hashes(text: Column, w: Int, modD: Int): Column =
    ColumnBridge.toColumn(CdcChunkHashes(ColumnBridge.toExpr(text), w, modD))

  /** Column API for CharGramBucketCounts (string → length-B count vector). */
  def char_gram_bucket_counts(text: Column, k: Int, buckets: Int): Column =
    ColumnBridge.toColumn(
      CharGramBucketCounts(ColumnBridge.toExpr(text), k, buckets))

  /** Column API for SortedPairs (array input → array<struct<a,b>>). */
  def sorted_pairs(arr: Column): Column =
    ColumnBridge.toColumn(SortedPairs(ColumnBridge.toExpr(arr)))

  /** Column API for Avalanche64 (murmur-style 64-bit finalizer). */
  def avalanche64(c: Column): Column =
    ColumnBridge.toColumn(Avalanche64(ColumnBridge.toExpr(c)))

  /** Column API for UrlCanonicalize (messy URL → canonical form). */
  def url_canonicalize(c: Column): Column =
    ColumnBridge.toColumn(UrlCanonicalize(ColumnBridge.toExpr(c)))

  /** Column API for HtmlText (raw HTML → boilerplate-stripped text). */
  def html_text(c: Column): Column =
    ColumnBridge.toColumn(HtmlText(ColumnBridge.toExpr(c)))

  /** Column API for RobotsAllowed (robots.txt payload + path → may
    * `agent` fetch it, per RFC 9309). */
  def robots_allowed(robots: Column, path: Column, agent: String): Column =
    ColumnBridge.toColumn(RobotsAllowed(
      ColumnBridge.toExpr(robots), ColumnBridge.toExpr(path), agent))

  /** Column API for CharsetSniff (raw fetched bytes → charset name). */
  def charset_sniff(c: Column): Column =
    ColumnBridge.toColumn(CharsetSniff(ColumnBridge.toExpr(c)))

  /** Column API for CharsetDecode (raw fetched bytes → repaired text). */
  def charset_decode(c: Column): Column =
    ColumnBridge.toColumn(CharsetDecode(ColumnBridge.toExpr(c)))

  /** Column API for BpeEncode (word string → subword array). */
  def bpe_encode(word: Column, rules: Seq[(String, String)]): Column =
    ColumnBridge.toColumn(BpeEncode(ColumnBridge.toExpr(word), rules))

  /** Column API for UnigramEncode (word string → piece array). */
  def unigram_encode(word: Column, pieces: Seq[(String, Double)],
      maxLen: Int, unkLogp: Double): Column =
    ColumnBridge.toColumn(
      UnigramEncode(ColumnBridge.toExpr(word), pieces, maxLen, unkLogp))

  /** Column API for BpeMergeStep (symbol array → symbol array). */
  def bpe_merge_step(syms: Column, lhs: String, rhs: String): Column =
    ColumnBridge.toColumn(BpeMergeStep(ColumnBridge.toExpr(syms), lhs, rhs))

  /** Column API for PqEncode (array<double> → packed code long). */
  def pq_encode(vec: Column, codebook: IndexedSeq[Double], m: Int, kCent: Int): Column =
    ColumnBridge.toColumn(PqEncode(ColumnBridge.toExpr(vec), codebook, m, kCent))

  /** Column API for PqAdc (packed code + per-query table → approx dot). */
  def pq_adc(code: Column, table: Column, m: Int, kCent: Int): Column =
    ColumnBridge.toColumn(PqAdc(ColumnBridge.toExpr(code), ColumnBridge.toExpr(table), m, kCent))
}
