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

  test("eventSequences: time-ordered chunks, trailing chunk by minLen") {
    // user 1: 5 events arriving out of row order — sequence order must
    // come from (ts, event_id), not input order; seqLen 2 → chunks
    // [a,b] [c,d] [e]; the 1-event trailer survives only at minLen 1
    val ev = Seq(
      (3L, 1L, ts("2024-01-01 10:02:00"), "c"),
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (5L, 1L, ts("2024-01-01 10:04:00"), "e"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (4L, 1L, ts("2024-01-01 10:03:00"), "d"),
      (6L, 2L, ts("2024-01-01 10:00:00"), "x")
    ).toDF("event_id", "user_id", "ts", "event_type")
    def run(minLen: Int) = Sessions
      .eventSequences(ev, "user_id", "ts", "event_id", "event_type", seqLen = 2, minLen = minLen)
      .orderBy("user_id", "seq_index")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2).toList, r.getLong(3)))
      .toSeq
    assert(run(1) == Seq(
      (1L, 0L, List("a", "b"), 2L),
      (1L, 1L, List("c", "d"), 2L),
      (1L, 2L, List("e"), 1L),
      (2L, 0L, List("x"), 1L)
    ))
    // minLen 2 drops both 1-event trailers, full chunks keep their index
    assert(run(2) == Seq(
      (1L, 0L, List("a", "b"), 2L),
      (1L, 1L, List("c", "d"), 2L)
    ))
  }

  test("eventSequences: one grouped aggregation, never a per-key window") {
    val ev = Seq((1L, 1L, ts("2024-01-01 10:00:00"), "a"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val plan = Sessions
      .eventSequences(ev, "user_id", "ts", "event_id", "event_type", 32, 4)
      .queryExecution.executedPlan.toString
    // a window partitioned by the key would put a hot key's whole
    // history into one unsplittable task (the lineDedup lesson); the
    // collect_list groupBy stays AQE-splittable at the partition level
    assert(!plan.contains("Window"), plan.take(500))
  }

  test("eventSequences: same-second ties break by the tie column") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq(
      (9L, 1L, t0, "late"), (2L, 1L, t0, "early"), (5L, 1L, t0, "mid")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Sessions
      .eventSequences(ev, "user_id", "ts", "event_id", "event_type", seqLen = 8, minLen = 1)
      .collect()
    assert(out.length == 1)
    assert(out.head.getSeq[String](2).toList == List("early", "mid", "late"))
  }

  test("funnel: ordered min-chain, horizon filter, same-second chaining") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1 converts: A@10, B@20 (the B@5 BEFORE A must not count), C@30
      (1L, ts(5), "B"), (1L, ts(10), "A"), (1L, ts(20), "B"), (1L, ts(30), "C"),
      // user 2: no C — never completes
      (2L, ts(10), "A"), (2L, ts(20), "B"),
      // user 3: completes but outside the horizon (C at 10 + 5000)
      (3L, ts(10), "A"), (3L, ts(20), "B"), (3L, ts(5010), "C"),
      // user 4: all three steps in the SAME second — >= chains them
      (4L, ts(100), "A"), (4L, ts(100), "B"), (4L, ts(100), "C")
    ).toDF("user_id", "ts", "event_type")
    val got = Sessions
      .funnel(ev, "user_id", "ts", "event_type", Seq("A", "B", "C"), withinSeconds = 1000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1L, 10L, 20L, 30L), (4L, 100L, 100L, 100L)))
    // greedy-earliest is deterministic under repartitioning
    val rep = Sessions
      .funnel(ev.repartition(5), "user_id", "ts", "event_type", Seq("A", "B", "C"), 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rep == got)
  }

  test("funnel: a key column named like a step-time output fails fast") {
    val ev = Seq(("u", new Timestamp(0L), "A")).toDF("t1", "ts", "event_type")
    val e = intercept[IllegalArgumentException] {
      Sessions.funnel(ev, "t1", "ts", "event_type", Seq("A", "B"), withinSeconds = 10)
    }
    assert(e.getMessage.contains("step-time output column"), e.getMessage)
  }
}
