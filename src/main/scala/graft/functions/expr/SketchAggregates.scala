package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sketch aggregates as TypedImperativeAggregate: one mutable buffer
  * object per group and a tight JVM loop per input row.
  *
  * The declarative alternative — `perms` separate min() aggregate
  * expressions — code-generates an update method whose bytecode blows
  * the JIT's HugeMethodLimit, so the hot loop never compiles and the
  * stage runs interpreted (measured ~10× slower at 128 perms).
  */

/** MinHash signature aggregate: for each of `perms` permutations,
  * the min over the group's 64-bit shingle hashes of a cheap
  * avalanche re-mix of (hash, perm). Input: LongType column of
  * shingle hashes. Output: array<long> of length `perms`.
  */
case class MinHashAgg(child: Expression, perms: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(perms)(Long.MaxValue)

  // murmur3 finalizer over (h ^ perm-specific odd constant): cheap,
  // well-distributed, and deterministic across executors/retries
  @inline private def mix(h: Long, i: Int): Long = {
    var x = h ^ (i.toLong * -7046029254386353131L + 1442695040888963407L)
    x ^= x >>> 33; x *= -49064778989728563L
    x ^= x >>> 33; x *= -4265267296055464877L
    x ^= x >>> 33
    x
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < perms) {
        val m = mix(h, i)
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(perms * 8)
    var i = 0
    while (i < perms) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(perms)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** SimHash-64 aggregate: per 64-bit token hash, add +1/-1 to each bit
  * position's counter by whether that bit is set; the signature is
  * the sign vector packed into a long. Input: LongType token hashes.
  * Output: LongType signature.
  */
case class SimHashAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    var i = 0
    while (i < 64) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Shared Count-Min row hashing: murmur-style finalizer over
  * (h ^ row-constant), folded to a non-negative slot. The aggregate
  * and the probe expression MUST agree on this mapping. */
private[expr] object CmsHash {
  @inline def slot(h: Long, row: Int, width: Int): Int = {
    var x = h ^ (row.toLong * -7046029254386353131L + 1442695040888963407L)
    x ^= x >>> 33; x *= -49064778989728563L
    x ^= x >>> 33; x *= -4265267296055464877L
    x ^= x >>> 33
    ((x & Long.MaxValue) % width).toInt
  }
}

/** Count-Min sketch aggregate: `depth` hash rows × `width` counters,
  * one increment per row per input. Fixed-size (depth×width longs)
  * and merge-by-vector-add, so partial aggregation applies map-side
  * and the shuffle moves one sketch per partition instead of one row
  * per item — the 100 TB shape for frequency estimation, completing
  * the sketch family (HLL cardinality / KLL-style quantiles / CMS
  * frequency). Estimates are deterministic regardless of merge order
  * (counter addition commutes). Input: LongType item hashes. Output:
  * array<long> of depth×width counters, probed by [[CmsEstimate]].
  */
case class CmsAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + CmsHash.slot(h, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    val n = depth * width
    while (i < n) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Bloom filter aggregate: `numBits` bit array (must be a multiple of
  * 64), `k` bit positions per item via the shared [[CmsHash]] row
  * hashing. Fixed-size and merge-by-OR — map-side partials, one
  * filter per partition crosses the wire. The membership side of the
  * sketch family: at 100 TB a benchmark/eval set compresses to a
  * fixed-size broadcast filter probed in-row, so the corpus is never
  * shuffled at all for a decontamination pass. No false negatives;
  * false positives at the classic (1−e^(−kn/m))^k rate. Input:
  * LongType item hashes. Output: array<long> of numBits/64 words,
  * probed by [[BloomContainsAny]].
  */
case class BloomAgg(child: Expression, numBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val p = CmsHash.slot(h, i, numBits)
        buf(p >>> 6) |= 1L << (p & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numBits / 64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** True iff ANY hash in the right-side array<long> is (possibly)
  * contained in the left-side [[BloomAgg]] filter — the whole
  * membership probe for one document evaluated in-row as one tight
  * loop (numBits derives from the filter's word count; `k` must match
  * the aggregate's). Off the corpus shuffle path entirely: the filter
  * arrives broadcast, the answer is a boolean per row.
  */
case class BloomContainsAny(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_contains_any"

  override protected def nullSafeEval(bloom: Any, hashes: Any): Any = {
    val bits = bloom.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val hs = hashes.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val numBits = bits.numElements() * 64
    var j = 0
    val n = hs.numElements()
    while (j < n) {
      // a null element is an unknown hash, not hash 0 (getLong on a
      // null slot reads 0) — skip it rather than probe a wrong slot
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        var all = true
        while (all && i < k) {
          val p = CmsHash.slot(h, i, numBits)
          all = (bits.getLong(p >>> 6) & (1L << (p & 63))) != 0L
          i += 1
        }
        if (all) return true
      }
      j += 1
    }
    false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Point estimate from a [[CmsAgg]] sketch: min over the depth rows of
  * the item's counter — the classic CMS upper-bound estimate (never
  * under-counts; over-counts by ≤ εN with prob 1−δ for width=e/ε,
  * depth=ln(1/δ)). Evaluated per candidate row against a broadcast
  * 1-row sketch; off the hot path (candidates ≪ corpus), so
  * CodegenFallback is fine here.
  */
case class CmsEstimate(left: Expression, right: Expression, depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(sketch: Any, item: Any): Any = {
    val arr = sketch.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // SQL-exposed: a depth/width mismatch vs the sketch must fail with
    // the cause, not index out of bounds / silently misaligned reads
    require(arr.numElements() == depth * width,
      s"cms_estimate: sketch has ${arr.numElements()} counters, " +
        s"depth=$depth width=$width expects ${depth * width}")
    val h = item.asInstanceOf[Long]
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = arr.getLong(r * width + CmsHash.slot(h, r, width))
      if (c < est) est = c
      r += 1
    }
    est
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SketchAggregates {
  /** Aggregate Column: minhash signature of a long hash column. */
  def minhash_agg(hashes: Column, perms: Int): Column =
    ColumnBridge.toColumn(
      MinHashAgg(ColumnBridge.toExpr(hashes), perms).toAggregateExpression())

  /** Aggregate Column: simhash-64 signature of a long hash column. */
  def simhash_agg(hashes: Column): Column =
    ColumnBridge.toColumn(
      SimHashAgg(ColumnBridge.toExpr(hashes)).toAggregateExpression())

  /** Aggregate Column: Count-Min sketch (depth×width flat counters)
    * of a long hash column. */
  def cms_agg(hashes: Column, depth: Int, width: Int): Column =
    ColumnBridge.toColumn(
      CmsAgg(ColumnBridge.toExpr(hashes), depth, width).toAggregateExpression())

  /** Scalar Column: CMS point estimate for an item hash. `depth` and
    * `width` must match the sketch's. */
  def cms_estimate(sketch: Column, itemHash: Column, depth: Int, width: Int): Column =
    ColumnBridge.toColumn(
      CmsEstimate(ColumnBridge.toExpr(sketch), ColumnBridge.toExpr(itemHash), depth, width))

  /** Aggregate Column: Bloom filter (numBits bits, k probes/item) of a
    * long hash column. */
  def bloom_agg(hashes: Column, numBits: Int, k: Int): Column =
    ColumnBridge.toColumn(
      BloomAgg(ColumnBridge.toExpr(hashes), numBits, k).toAggregateExpression())

  /** Scalar Column: true iff any hash in the array may be in the
    * filter. `k` must match the aggregate's. */
  def bloom_contains_any(bloom: Column, hashes: Column, k: Int): Column =
    ColumnBridge.toColumn(
      BloomContainsAny(ColumnBridge.toExpr(bloom), ColumnBridge.toExpr(hashes), k))
}
