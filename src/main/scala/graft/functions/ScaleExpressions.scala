package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  /** K-way Morton interleave: bit `i` of dimension `d` lands at output
    * position `i*k + d`, using `bitsPer` low bits of each value. With
    * `bitsPer = 62 / k` the result stays in the positive BIGINT range
    * (sorts correctly); for k = 2 it produces exactly [[interleaveBits]].
    * Plain nested loop (≤ 62 iterations) — still branch-predictable and
    * codegen-inlined via a static call.
    */
  def interleaveK(vals: Array[Long], bitsPer: Int): Long = {
    val k = vals.length
    var out = 0L
    var bit = 0
    while (bit < bitsPer) {
      var d = 0
      while (d < k) {
        out |= ((vals(d) >>> bit) & 1L) << (bit * k + d)
        d += 1
      }
      bit += 1
    }
    out
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 52 bits of the md5 digest of a string's UTF-8 bytes — the
    * value `conv(substring(md5(s), 1, 13), 16, 10)` produces, computed
    * straight from the digest bytes. The SQL formulation materializes a
    * 32-char hex string per row and radix-parses 13 characters of it
    * back; this path allocates nothing but the digest. 13 hex digits =
    * bytes 0–5 in full plus the high nibble of byte 6.
    */
  def md5Prefix52(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) | ((d(2) & 0xffL) << 28) |
      ((d(3) & 0xffL) << 20) | ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
      ((d(6) & 0xf0L) >>> 4)
  }
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

/** N-dimension Z-order sort key: the k-way Morton interleave of
  * `62 / k` low bits of each non-negative dimension (bucketize wider
  * domains first). Generalizes [[ZOrder2Expr]] — for k = 2 the bit
  * layout is identical — so multi-column clustered writes get parquet
  * min/max pruning on ANY of the k columns.
  */
case class ZOrderNExpr(children: Seq[Expression]) extends Expression {
  private val k = children.size
  /** low bits kept per dimension; k * bitsPer ≤ 62 keeps the key in the
    * positive BIGINT range so it sorts correctly
    */
  val bitsPerDim: Int = 62 / math.max(1, k)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2 || k > 8)
      TypeCheckResult.TypeCheckFailure(s"zorderN requires 2 to 8 columns, got $k")
    else if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"zorderN requires BIGINT inputs, got ${children.map(_.dataType.sql).mkString(", ")}")
  override def foldable: Boolean = children.forall(_.foldable)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](k)
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Long]
      i += 1
    }
    ScaleOps.interleaveK(vals, bitsPerDim)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val anyNull =
      if (nullable) evals.map(_.isNull).mkString(" || ") else "false"
    val code =
      s"""
         |${evals.map(_.code).mkString("\n")}
         |boolean ${ev.isNull} = $anyNull;
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |  long[] $arr = new long[]{${evals.map(_.value).mkString(", ")}};
         |  ${ev.value} = graft.functions.ScaleOps.interleaveK($arr, $bitsPerDim);
         |}
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code())
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** The 52-bit md5-prefix hash every exact-integer sampling/sketching
  * face shares (KMV distinct, group/weighted sampling, training
  * shuffle), as ONE codegen'd expression: value-identical to
  * `conv(substring(md5(x), 1, 13), 16, 10)` — the oracle replays that
  * SQL — but computed digest-to-long with no hex-string round-trip.
  * The sketch queries are hash-throughput bound (row-local md5 over
  * every shingle occurrence), so the per-row constant here is the
  * whole cost model.
  */
case class Md5Prefix52Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"md5_prefix52 requires a STRING input, got ${child.dataType.sql}")
  override def nullSafeEval(s: Any): Any =
    ScaleOps.md5Prefix52(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.ScaleOps.md5Prefix52($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScaleExpressions {
  def zorder2(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder2Expr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def zorderN(cols: Seq[Column]): Column =
    ColumnBridge.column(ZOrderNExpr(cols.map(ColumnBridge.expression)))

  def md5Prefix52(s: Column): Column =
    ColumnBridge.column(Md5Prefix52Expr(ColumnBridge.expression(s)))
}
