package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleForwardFill manufactures missing slots and carries values forward") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:15:00"), 5.0),
      (1L, ts("2024-01-01 13:40:00"), 7.0), // 11:00 and 12:00 are gaps
      (2L, ts("2024-01-01 00:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries
      .resampleForwardFill(ev, "user_id", "ts", sum("value").as("v"))
      .orderBy("user_id", "slot")
      .select("user_id", "v", "v_ff")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2)))
    // user 1: 4 slots (10:00-13:00), two manufactured, fill carries 5.0
    assert(out.count(_._1 == 1L) == 4)
    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq(5.0, 5.0, 5.0, 7.0))
    assert(out.filter(_._1 == 1L).count(_._2.isEmpty) == 2)
    // user 2: a single-slot span has nothing to fill
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq(1.0))
  }
}
