package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 102.0),
    (2L, ts("2024-01-01 10:07:00"), 200.0)
  ).toDF("q_key", "q_ts", "price")

  private val trades = Seq(
    (10L, 1L, ts("2024-01-01 10:06:00")), // → 101.0
    (11L, 1L, ts("2024-01-01 10:10:00")), // same ts as quote → 102.0 (<=)
    (12L, 2L, ts("2024-01-01 10:00:00")), // before any quote → no match
    (13L, 3L, ts("2024-01-01 12:00:00"))  // key with no quotes → no match
  ).toDF("trade_id", "t_key", "t_ts")

  test("backward as-of: latest right row at or before left time, per key") {
    val out = AsOf
      .joinBackward(trades, quotes, "t_key", "q_key", "t_ts", "q_ts", Seq("price"))
      .select("trade_id", "price")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(10L).contains(101.0))
    assert(out(11L).contains(102.0)) // <= semantics: same-instant quote visible
    assert(out(12L).isEmpty && out(13L).isEmpty)
  }

  test("forward as-of: earliest right row at or after left time, per key") {
    val out = AsOf
      .joinForward(trades, quotes, "t_key", "q_key", "t_ts", "q_ts", Seq("price"))
      .select("trade_id", "price")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(10L).contains(102.0)) // next quote after 10:06 is 10:10
    assert(out(11L).contains(102.0)) // >= semantics: same-instant quote visible
    assert(out(12L).contains(200.0)) // before any quote → first one
    assert(out(13L).isEmpty) // key with no quotes
  }

  test("NULL times match nothing (neither as fallback rows nor as probes)") {
    val dirtyQuotes = Seq(
      (1L, Option.empty[Timestamp], 666.0), // unknown-time quote: must never match
      (1L, Some(ts("2024-01-01 10:05:00")), 101.0)
    ).toDF("q_key", "q_ts", "price")
    val dirtyTrades = Seq(
      (20L, 1L, Some(ts("2024-01-01 10:00:00"))), // before any timed quote
      (21L, 1L, Option.empty[Timestamp]) // unknown-time trade: no match
    ).toDF("trade_id", "t_key", "t_ts")
    val out = AsOf
      .joinBackward(dirtyTrades, dirtyQuotes, "t_key", "q_key", "t_ts", "q_ts", Seq("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("price"))) None else Some(r.getDouble(r.fieldIndex("price")))))
      .toMap
    assert(out(20L).isEmpty, "null-time quote must not act as universal fallback")
    assert(out(21L).isEmpty, "null-time trade must match nothing")
  }

  test("inner variant drops unmatched left rows") {
    val out = AsOf.joinBackward(
      trades, quotes, "t_key", "q_key", "t_ts", "q_ts", Seq("price"), inner = true)
    assert(out.select("trade_id").as[Long].collect().sorted.toSeq == Seq(10L, 11L))
  }

  test("tie-break pins the winner among equal timestamps") {
    val dup = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, 50.0),
      (1L, ts("2024-01-01 10:00:00"), 9L, 90.0)
    ).toDF("q_key", "q_ts", "q_id", "price")
    val one = Seq((1L, 1L, ts("2024-01-01 11:00:00"))).toDF("trade_id", "t_key", "t_ts")
    val out = AsOf.joinBackward(
      one, dup, "t_key", "q_key", "t_ts", "q_ts",
      payloadCols = Seq("price"), tieBreakCols = Seq("q_id"))
    assert(out.head().getAs[Double]("price") == 90.0) // max q_id wins
  }
}
