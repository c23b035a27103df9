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

object SketchAggregates {
  /** Aggregate Column: minhash signature of a long hash column. */
  def minhash_agg(hashes: Column, perms: Int): Column =
    ColumnBridge.toColumn(
      MinHashAgg(ColumnBridge.toExpr(hashes), perms).toAggregateExpression())

  /** Aggregate Column: simhash-64 signature of a long hash column. */
  def simhash_agg(hashes: Column): Column =
    ColumnBridge.toColumn(
      SimHashAgg(ColumnBridge.toExpr(hashes)).toAggregateExpression())
}
