package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LinkageSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Reference DP — the plain textbook Levenshtein, used to brute-force
    * the expected answer the filtered join must reproduce exactly.
    */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteSelf(names: Seq[String], k: Int): Set[(String, String, Long)] =
    (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d >= 1 && d <= k
    } yield (a, b, d.toLong)).toSet

  test("fuzzyNamePairs: exact answer incl. shorts, transposed and edited names") {
    // mixes: long near-pairs (1 sub / 1 del / 1 ins / distance 2), a
    // distance-3 pair that must NOT appear, short strings (len <= 5 at
    // q=2,k=2 — below the count filter's bite), and an exact duplicate
    // value in the input (distance 0 — excluded by contract)
    val names = Seq(
      "small ring", "small rings", "smal ring", "smell ring", "small wing",
      "large bolt", "large belt", "huge bolts",
      "cat", "cap", "bat", "c", "", "ca",
      "zzzzzzzzzz", "small ring")
    val df = names.toDF("n")
    val got = Linkage.fuzzyNamePairs(df, "n", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == bruteSelf(names.distinct, 2))
    // sanity: the fixture actually exercises both paths
    assert(got.exists { case (a, b, _) => a.length <= 5 && b.length <= 5 })
    assert(got.exists { case (a, b, _) => a.length > 5 && b.length > 5 })
    assert(got.contains(("cap", "cat", 1L)))
    assert(got.contains(("small ring", "small rings", 1L)))
    assert(!got.exists { case (a, b, _) => a == b })
  }

  test("fuzzyNamePairs: property — filtered join equals brute force on random vocab") {
    // small alphabet forces dense near-collisions; lengths straddle the
    // short/long boundary so both candidate paths carry real load
    val rnd = new scala.util.Random(42)
    val vocab = Seq.fill(60)(
      (0 until rnd.nextInt(9)).map(_ => "abc" (rnd.nextInt(3))).mkString).distinct
    for (k <- Seq(1, 2)) {
      val got = Linkage.fuzzyNamePairs(vocab.toDF("n"), "n", maxDist = k)
        .as[(String, String, Long)].collect().toSet
      assert(got == bruteSelf(vocab, k), s"mismatch at k=$k")
    }
  }

  test("fuzzyJoin: two-table linkage keeps sides and includes exact matches") {
    val left = Seq("red widget", "blue bolt", "hot gear", "xx").toDF("l")
    val right = Seq("red widgets", "blue belt", "hot gear", "xy", "unrelated thing").toDF("r")
    val got = Linkage.fuzzyJoin(left, "l", right, "r", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    val want = (for {
      a <- Seq("red widget", "blue bolt", "hot gear", "xx")
      b <- Seq("red widgets", "blue belt", "hot gear", "xy", "unrelated thing")
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
    assert(got.contains(("hot gear", "hot gear", 0L))) // dist-0 link kept
    assert(got.contains(("xx", "xy", 1L))) // short-short across tables
  }

  test("fuzzyNamePairs: candidate generation never builds a cartesian product") {
    val df = Seq("small ring", "large bolt", "tiny gear", "red widget").toDF("n")
    val plan = Linkage.fuzzyNamePairs(df, "n", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    intercept[IllegalArgumentException](
      Linkage.fuzzyNamePairs(df, "n", maxDist = 0))
  }
}
