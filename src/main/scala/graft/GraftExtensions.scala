package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CharPairsExpr, DotProductExpr, MinHashMd5SigExpr, MinHashSigExpr, Norm2Expr, ShinglesAllExpr, ShinglesExpr, SimHash64Expr, SimHashMd5Expr, ZOrder2Expr, ZOrderNExpr}

/** SparkSessionExtensions registering graft's custom Catalyst expressions
  * as SQL functions, so `spark.sql("SELECT vec_dot(a, b) ...")` works the
  * same as the Column API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit =
    registrations.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_dot"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))),
    ("vec_norm2",
      new ExpressionInfo(classOf[Norm2Expr].getName, "vec_norm2"),
      (args: Seq[Expression]) => Norm2Expr(args(0))),
    ("word_shingles",
      new ExpressionInfo(classOf[ShinglesExpr].getName, "word_shingles"),
      (args: Seq[Expression]) => ShinglesExpr(args(0), intArg(args(1), "n"))),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_signature"),
      (args: Seq[Expression]) => MinHashSigExpr(args(0), intArg(args(1), "numHashes"))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64Expr(args(0))),
    ("minhash_md5_signature",
      new ExpressionInfo(classOf[MinHashMd5SigExpr].getName, "minhash_md5_signature"),
      (args: Seq[Expression]) => MinHashMd5SigExpr(args(0), intArg(args(1), "numHashes"))),
    ("simhash_md5_60",
      new ExpressionInfo(classOf[SimHashMd5Expr].getName, "simhash_md5_60"),
      (args: Seq[Expression]) => SimHashMd5Expr(args(0))),
    ("word_shingles_all",
      new ExpressionInfo(classOf[ShinglesAllExpr].getName, "word_shingles_all"),
      (args: Seq[Expression]) => ShinglesAllExpr(args(0), intArg(args(1), "n"))),
    ("zorder2",
      new ExpressionInfo(classOf[ZOrder2Expr].getName, "zorder2"),
      (args: Seq[Expression]) => ZOrder2Expr(args(0), args(1))),
    ("zorder_n",
      new ExpressionInfo(classOf[ZOrderNExpr].getName, "zorder_n"),
      (args: Seq[Expression]) => ZOrderNExpr(args)),
    ("char_pairs",
      new ExpressionInfo(classOf[CharPairsExpr].getName, "char_pairs"),
      (args: Seq[Expression]) => CharPairsExpr(args(0)))
  )

  /** Register on an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
