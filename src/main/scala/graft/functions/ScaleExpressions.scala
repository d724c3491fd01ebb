package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Static kernels for the scale-primitive expressions (referenced from
  * generated code, so they must be plain static-call-able methods).
  */
object ScaleOps {

  /** Spread the low 31 bits of `x` to the even bit positions (classic
    * Morton magic-number spread — 5 shift/mask steps, no loop).
    */
  private def spread(x: Long): Long = {
    var v = x & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton (Z-order) interleave of the low 31 bits of two non-negative
    * longs: bit i of `a` → position 2i, bit i of `b` → 2i+1. The result
    * stays in the positive BIGINT range, so it sorts correctly.
    */
  def interleaveBits(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Z-order sort key from two non-negative dimension values (each must
  * fit in 31 bits — bucketize wider domains first). Sorting by this key
  * clusters BOTH dimensions at once, giving parquet min/max row-group
  * pruning on either column — what a 1-D range-cluster can only give
  * one of them.
  */
case class ZOrder2Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  // typed input check makes non-long children an ANALYSIS error — without
  // it, the interpreted path ClassCastExceptions on ints while codegen
  // silently widens them (same query, two behaviors)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires BIGINT inputs, got ${left.dataType.sql} and ${right.dataType.sql}")
  override def nullSafeEval(a: Any, b: Any): Any =
    ScaleOps.interleaveBits(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ScaleOps.interleaveBits($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ScaleExpressions {
  def zorder2(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder2Expr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
