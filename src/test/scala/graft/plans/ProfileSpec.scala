package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ProfileSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("columnStats: one row per column, nulls counted, approx close to exact") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.5), (2L, null), (3L, 2.5), (3L, 2.5)
    ).toDF("a", "b")
    val stats = Profile.columnStats(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats("a").getAs[Long]("n") == 4 && stats("a").getAs[Long]("n_nulls") == 0)
    assert(stats("a").getAs[Long]("n_distinct") == 3)
    assert(stats("b").getAs[Long]("n") == 3 && stats("b").getAs[Long]("n_nulls") == 1)
    assert(stats("b").getAs[Double]("vmin") == 1.5 && stats("b").getAs[Double]("vmax") == 2.5)

    // non-identifier column names survive (pre-sanitize inputs)
    val weird = Seq((1, 2)).toDF("order total", "price-usd")
    val wstats = Profile.columnStats(weird, Seq("order total", "price-usd")).collect()
    assert(wstats.map(_.getString(0)).toSet == Set("order total", "price-usd"))

    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exact = Profile.columnStats(li, Seq("l_quantity")).head().getAs[Long]("n_distinct")
    val approx = Profile.columnStats(li, Seq("l_quantity"), exact = false)
      .head().getAs[Long]("n_distinct")
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"approx $approx vs exact $exact")
  }

  test("keySkewReport surfaces the hot key with its share and uniform ratio") {
    import spark.implicits._
    // key 7 carries 8 of 12 rows across 5 distinct keys
    val df = (Seq.fill(8)(7L) ++ Seq(1L, 2L, 3L, 4L)).map(k => (k, "v")).toDF("k", "v")
    val top = Profile.keySkewReport(df, "k", topK = 2).collect()
    assert(top.length == 2)
    assert(top(0).getLong(0) == 7L && top(0).getLong(1) == 8L)
    assert(math.abs(top(0).getDouble(2) - 8.0 / 12.0) < 1e-4)
    // share × n_keys: 8/12 × 5 ≈ 3.33 tasks' worth of rows on one key
    assert(math.abs(top(0).getDouble(3) - 3.333333) < 1e-9)
    assert(top(1).getLong(1) == 1L && top(1).getLong(0) == 1L) // tie → lowest key
  }
}
