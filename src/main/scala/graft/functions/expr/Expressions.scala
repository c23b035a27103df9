package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
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

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes
  * (h = h * 31 + byte, seeded) — an order-sensitive content
  * fingerprint cheaper than md5 (no allocation, no digest object),
  * used for shard-local duplicate pre-screens. */
case class RollingHash(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = seed
    var i = 0
    while (i < bytes.length) { h = h * 31L + bytes(i); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |byte[] ${ev.value}_b = $c.getBytes();
         |long ${ev.value}_h = ${seed}L;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_b.length; ${ev.value}_i++) {
         |  ${ev.value}_h = ${ev.value}_h * 31L + ${ev.value}_b[${ev.value}_i];
         |}
         |${ev.value} = ${ev.value}_h;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NativeFunctions {
  /** Column API for HammingDistance. */
  def hamming_distance(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      HammingDistance(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))

  /** Column API for RollingHash. */
  def rolling_hash(c: Column, seed: Long = 1125899906842597L): Column =
    ColumnBridge.toColumn(RollingHash(ColumnBridge.toExpr(c), seed))
}
