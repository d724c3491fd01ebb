package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkylineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def brute(
      pts: Seq[(Long, Long, Long)], max1: Boolean, max2: Boolean): Set[Long] = {
    def o1(v: Long) = if (max1) v else -v
    def o2(v: Long) = if (max2) v else -v
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        o1(bx) >= o1(x) && o2(by) >= o2(y) && (o1(bx) > o1(x) || o2(by) > o2(y))
      }
    }.map(_._1).toSet
  }

  test("skyline2D: staircase equals brute force, ties on both criteria kept") {
    val pts = Seq[(Long, Long, Long)](
      (1L, 10L, 1L), (2L, 8L, 5L), (3L, 8L, 5L), // 2/3 tie on both: both kept
      (4L, 8L, 4L), // dominated by the (8,5) ties
      (5L, 5L, 9L), (6L, 1L, 10L),
      (7L, 4L, 8L), // dominated by (5,9)
      (8L, 10L, 0L) // dominated by (10,1)
    )
    val df = pts.toDF("id", "x", "y")
    val got = Skyline.skyline2D(df, "x", "y").select("id").as[Long].collect().toSet
    assert(got == brute(pts, max1 = true, max2 = true))
    assert(got == Set(1L, 2L, 3L, 5L, 6L))
  }

  test("skyline2D: property — all four orientations match brute force") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = pts.toDF("id", "x", "y").repartition(11)
    for (m1 <- Seq(true, false); m2 <- Seq(true, false)) {
      val got = Skyline.skyline2D(df, "x", "y", m1, m2)
        .select("id").as[Long].collect().toSet
      assert(got == brute(pts, m1, m2), s"orientation ($m1,$m2)")
    }
  }

  test("skyline2D: null criteria excluded, schema preserved, no single-task window") {
    val df = Seq(
      (1L, Some(5L), Some(5L)), (2L, None, Some(9L)), (3L, Some(9L), None)
    ).toDF("id", "x", "y")
    val out = Skyline.skyline2D(df, "x", "y")
    assert(out.columns.toSeq == Seq("id", "x", "y"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("globalRunningMax: inclusive vs exclusive, nulls never update") {
    val df = Seq(
      (1L, Some(3L)), (2L, None), (3L, Some(1L)), (4L, Some(7L)), (5L, Some(2L))
    ).toDF("k", "v").repartition(4)
    val inc = Scale
      .globalRunningMax(df, Seq(col("k").asc), col("v"), "rm")
      .orderBy("k").select("k", "rm").as[(Long, Option[Long])].collect().toSeq
    assert(inc == Seq(1L -> Some(3L), 2L -> Some(3L), 3L -> Some(3L),
      4L -> Some(7L), 5L -> Some(7L)))
    val exc = Scale
      .globalRunningMax(df, Seq(col("k").asc), col("v"), "rm", exclusive = true)
      .orderBy("k").select("k", "rm").as[(Long, Option[Long])].collect().toSeq
    assert(exc == Seq(1L -> None, 2L -> Some(3L), 3L -> Some(3L),
      4L -> Some(3L), 5L -> Some(7L)))
  }
}
