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

  test("rollingAggregate: trailing range frame, exact quantized sums, peers included") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 10L, ts(0), 1.5),   // (id, key=10, sec 0)
      (2L, 10L, ts(100), 2.0),
      (3L, 10L, ts(700), 4.0), // window [100, 700]: sec 0 falls out
      (4L, 10L, ts(700), 8.0), // same-second peer: shares the frame
      (5L, 20L, ts(50), 1.0)   // other key: isolated
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries
      .rollingAggregate(ev, "user_id", "ts", "event_id", "value", windowSeconds = 600)
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // event 1: only itself; event 2: events at sec 0 and 100
    assert(got(0) == ((1L, 1L, 1500000L, 1500000L, 1500000L)))
    assert(got(1) == ((2L, 2L, 3500000L, 1500000L, 2000000L)))
    // events 3 and 4 are PEERS at sec 700: both frames cover
    // {100, 700, 700} — count 3, sum 2.0+4.0+8.0
    assert(got(2) == ((3L, 3L, 14000000L, 2000000L, 8000000L)))
    assert(got(3) == got(2).copy(_1 = 4L))
    assert(got(4) == ((5L, 1L, 1000000L, 1000000L, 1000000L)))
  }

  test("rollingAggregate: a key/id column named like a working column fails fast") {
    val ev = Seq((1L, 10L, new Timestamp(0L), 1.0)).toDF("sec", "user_id", "ts", "value")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.rollingAggregate(ev, "user_id", "ts", "sec", "value", windowSeconds = 10)
    }
    assert(e.getMessage.contains("reserved output name"), e.getMessage)
  }

  test("intervalConcurrency: change-point timeline counts overlapping spans") {
    // [0,10], [5,20], [15,30], [100,100] — overlaps at 5..10 and 15..20
    val spans = Seq((0L, 10L), (5L, 20L), (15L, 30L), (100L, 100L))
      .toDF("s", "e")
    val got = TimeSeries.intervalConcurrency(spans, "s", "e")
      .orderBy("sec")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 1L, 1L),    // [0,10] opens
      (5L, 1L, 2L),    // [5,20] opens → two active
      (11L, -1L, 1L),  // [0,10] closes AFTER its inclusive end
      (15L, 1L, 2L),   // [15,30] opens while [5,20] still active
      (21L, -1L, 1L),
      (31L, -1L, 0L),  // timeline returns to zero between bursts
      (100L, 1L, 1L),
      (101L, -1L, 0L)
    ))
    // same-second open+close collapses to one net row
    val touch = Seq((0L, 5L), (6L, 9L)).toDF("s", "e") // close at 6, open at 6
    val net = TimeSeries.intervalConcurrency(touch, "s", "e")
      .where($"sec" === 6L).collect()
    assert(net.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((0L, 1L)))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.intervalConcurrency(spans.withColumnRenamed("s", "sec"), "sec", "e")
    }
    assert(e.getMessage.contains("reserved output name"), e.getMessage)
  }
}
