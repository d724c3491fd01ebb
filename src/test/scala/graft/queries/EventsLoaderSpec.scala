package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The events loader must accept every physical `ts` precision the corpus
  * generator has shipped — TIMESTAMP(NANOS) (which Spark's reader only
  * surfaces as a long under `nanosAsLong`), TIMESTAMP(MICROS) without a
  * zone (NTZ), and a plain session-tz timestamp — and always hand
  * downstream queries one uniform type: a session-tz TIMESTAMP with the
  * same wall-clock instant. q35/q102 cast `ts` to epoch seconds, which
  * NTZ refuses, so normalization here is what keeps the corpus
  * generator-agnostic.
  */
class EventsLoaderSpec extends AnyFunSuite with SparkSpec {

  private val epochMicros = 1700000000000000L // 2023-11-14T22:13:20Z

  private def load(dir: String) = RelationalQueries.events(spark, dir)

  private def writeEvents(tsField: StructField, tsValue: Any): String = {
    val dir = Files.createTempDirectory("events_loader").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField, StructField("value", DoubleType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, tsValue, 2.5)), schema)
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("nanos-as-long ts is rebuilt into a micros timestamp") {
    // what the nanos corpus looks like to Spark once nanosAsLong is set:
    // the column arrives as LongType epoch-nanos
    val dir = writeEvents(StructField("ts", LongType), epochMicros * 1000L)
    val out = load(dir)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(unix_timestamp(col("ts"))).head.getLong(0)
    assert(got === epochMicros / 1000000L)
  }

  test("NTZ micros ts is re-tagged as a session-tz timestamp, value unchanged") {
    val dir = writeEvents(
      StructField("ts", TimestampNTZType),
      java.time.LocalDateTime.ofEpochSecond(epochMicros / 1000000L, 0, java.time.ZoneOffset.UTC))
    val out = load(dir)
    assert(out.schema("ts").dataType === TimestampType)
    // the session runs UTC, so the NTZ wall-clock and the instant agree
    val got = out.select(unix_timestamp(col("ts"))).head.getLong(0)
    assert(got === epochMicros / 1000000L)
    // the downstream contract that motivated normalization: epoch cast works
    assert(out.select(col("ts").cast("long")).head.getLong(0) === epochMicros / 1000000L)
  }

  test("plain timestamp ts passes through untouched") {
    val dir = writeEvents(
      StructField("ts", TimestampType), Timestamp.from(java.time.Instant.ofEpochSecond(epochMicros / 1000000L)))
    val out = load(dir)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(col("ts").cast("long")).head.getLong(0) === epochMicros / 1000000L)
  }
}
