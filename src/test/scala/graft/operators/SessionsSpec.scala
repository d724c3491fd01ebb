package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SessionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap-based sessions: boundaries at gaps > threshold, per key") {
    val ev = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 100L, ts("2024-01-01 10:10:00"), 2.0), // same session (10 min)
      (3L, 100L, ts("2024-01-01 12:00:00"), 4.0), // gap 110 min → new session
      (4L, 200L, ts("2024-01-01 10:00:00"), 8.0)  // other key
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Sessions.byGap(ev, "user_id", "ts", "event_id", "value", gapSeconds = 3600)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (100L, 1L, 2L, 600L, 3.0), // user 100, session 1: events 1+2, 10 min span
      (100L, 2L, 1L, 0L, 4.0),
      (200L, 1L, 1L, 0L, 8.0)
    ))
  }

  test("exact-gap events stay in one session (> not >=)") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, ts("2024-01-01 11:00:00"), 1.0) // exactly 3600 s later
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Sessions.byGap(ev, "user_id", "ts", "event_id", "value", 3600)
    assert(out.count() == 1)
  }
}
