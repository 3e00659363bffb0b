package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 2-D Morton (Z-order) interleave: spreads the low 32 bits of each
  * operand and interleaves them into one 64-bit z-value. Sorting a table
  * by z-value clusters rows that are close in BOTH dimensions, so
  * file/row-group min-max stats can prune range filters on either
  * column — the standard multi-dimensional layout technique for scan
  * pruning at lake scale (linear sort serves only its leading key).
  * Fully code-generated via the static `compute`. */
object MortonInterleave {
  /** Spread the low 32 bits of v into the even bit positions. */
  @inline def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }
  def compute(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(
      MortonInterleave.compute(a.asInstanceOf[Long], b.asInstanceOf[Long]))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MortonInterleave.compute($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MortonInterleave =
    copy(left = l, right = r)
}

object zorder {
  def morton(a: Column, b: Column): Column =
    ColumnBridge.column(MortonInterleave(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
