package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed interval join equals the naive range join, without duplicates") {
    val points = Seq(
      (1L, ts("2024-01-01 10:30:00"), "a"),
      (1L, ts("2024-01-01 13:00:00"), "b"), // exactly at an interval end
      (1L, ts("2024-01-01 15:00:00"), "c"), // outside
      (2L, ts("2024-01-01 10:30:00"), "d") // right key, different interval
    ).toDF("k", "t", "tag")
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:00:00"), "w1"),
      (1L, ts("2024-01-01 12:30:00"), ts("2024-01-01 14:00:00"), "w2"), // overlapping
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 09:00:00"), "w3")
    ).toDF("k", "s", "e", "win")

    val bucketed = RangeJoin
      .bucketedIntervalJoin(points, intervals, "k", "t", "s", "e", bucketSeconds = 1800L)
      .select("tag", "win").as[(String, String)].collect().sorted.toSeq
    val naive = points.as("p")
      .join(intervals.as("i"),
        $"p.k" === $"i.k" && $"p.t" >= $"i.s" && $"p.t" <= $"i.e")
      .select("tag", "win").as[(String, String)].collect().sorted.toSeq
    assert(bucketed == naive)
    // overlapping intervals both match; each pair appears exactly once
    assert(bucketed == Seq(("a", "w1"), ("b", "w1"), ("b", "w2")))
  }
}
