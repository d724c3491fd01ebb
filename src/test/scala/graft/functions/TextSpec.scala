package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("token counting collapses whitespace and trims") {
    val df = one("  the quick   brown\tfox ")
    assert(df.select(Text.tokenCount(col("text"))).head().getLong(0) == 4)
    assert(df.select(Text.distinctTokenCount(col("text"))).head().getLong(0) == 4)
  }

  test("subword count splits on alnum/non-alnum boundaries (BPE-ish)") {
    val n = one("don't stop-me now123").select(Text.subwordCount(col("text"))).head().getLong(0)
    // don | ' | t | stop | - | me | now123  → 7
    assert(n == 7)
  }

  test("stopword stats and langid heuristic") {
    val en = one("the cat and the dog of the house")
    assert(en.select(Text.stopwordCount(col("text"))).head().getLong(0) == 5)
    assert(en.select(Text.langIdHeuristic(col("text"))).head().getString(0) == "en_like")
    assert(one("uno dos").select(Text.langIdHeuristic(col("text"))).head().getString(0) == "short")
    assert(one("uno dos tres quatro cinco seis").select(Text.langIdHeuristic(col("text")))
      .head().getString(0) == "other")
  }

  test("quality score is in [0,1] and favors diverse text") {
    val diverse = one((1 to 100).map("w" + _).mkString(" "))
      .select(Text.qualityScore(col("text"))).head().getDouble(0)
    val repetitive = one(Seq.fill(100)("w").mkString(" "))
      .select(Text.qualityScore(col("text"))).head().getDouble(0)
    assert(diverse > repetitive && diverse <= 1.0 && repetitive >= 0.0)
  }

  test("bag fingerprint is order-invariant, distinct for different bags") {
    val fp = (s: String) => one(s).select(Text.bagFingerprint(col("text"))).head().getString(0)
    assert(fp("a b c") == fp("c b a"))
    assert(fp("a b c") != fp("a b d"))
  }

  test("punct ratio") {
    val r = one("ab,c!").select(Text.punctRatio(col("text"))).head().getDouble(0)
    assert(math.abs(r - 0.4) < 1e-9)
  }
}
