package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class OutliersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("zscoreFlags: strict k-sigma flag in exact integers, stats broadcast") {
    val ev = Seq(
      // group 1: nine 10s and one 100 — the 100 is far past 2 sigma
      (1L, 1L, 0.10), (1L, 2L, 0.10), (1L, 3L, 0.10), (1L, 4L, 0.10),
      (1L, 5L, 0.10), (1L, 6L, 0.10), (1L, 7L, 0.10), (1L, 8L, 0.10),
      (1L, 9L, 0.10), (1L, 10L, 1.00),
      // group 2: symmetric pair — each sits at EXACTLY 1 sigma, and the
      // strict inequality must not flag a boundary value even at k=1
      (2L, 11L, -0.05), (2L, 12L, 0.05)
    ).toDF("g", "id", "v")
    val k3 = Outliers.zscoreFlags(ev, "g", "id", "v", k = 2)
    assert(k3.select("id", "cents").as[(Long, Long)].collect().toSeq ==
      Seq((10L, 100L)))
    val k1 = Outliers.zscoreFlags(ev.where($"g" === 2L), "g", "id", "v", k = 1)
    assert(k1.count() == 0L) // equality is not an outlier
    val plan = k3.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("zscoreFlags: exact-integer domain violations fail loudly") {
    // cents = 2e9 per row: each cents² still fits a BIGINT (ANSI mode
    // would catch those anyway), but n·max|x| cannot square inside one
    // — the guard must fire before the comparison would silently wrap
    val huge = Seq((1L, 1L, 2.0e7), (1L, 2L, 2.0e7)).toDF("g", "id", "v")
    val e = intercept[Exception] {
      Outliers.zscoreFlags(huge, "g", "id", "v").collect()
    }
    assert(e.getMessage.contains("exact-integer domain"), e.getMessage)
    intercept[IllegalArgumentException](
      Outliers.zscoreFlags(huge, "g", "id", "v", k = 0))
    intercept[IllegalArgumentException](
      Outliers.zscoreFlags(huge, "g", "id", "v", scale = 0L))
    intercept[IllegalArgumentException](
      Outliers.zscoreFlags(huge.withColumnRenamed("id", "cents"), "g", "cents", "v"))
  }
}
