package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class StreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("streaming upsert: two micro-batches merge into the target by PK") {
    val base = Files.createTempDirectory("stream").toString
    val in = s"$base/in"
    val target = s"$base/target"
    val ckpt = s"$base/ckpt"

    // batch files land one at a time (maxFilesPerTrigger=1)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.mode("append").parquet(in)
    Seq((2L, "b2"), (3L, "c")).toDF("id", "v").coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = Streams.fileStream(spark, in, schema)
    val q = Streams.upsertStream(spark, stream, "id", target, ckpt)
    q.awaitTermination(60000)

    val out = spark.read.parquet(target).as[(Long, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.find(_._1 == 3L).map(_._2).contains("c"))
    // id=2 resolved to exactly one of its two versions (file order is not
    // guaranteed; PK-uniqueness is the invariant)
    assert(Set("b", "b2").contains(out.find(_._1 == 2L).get._2))
  }

  test("watermarked windowed aggregate over a replayed stream") {
    val base = Files.createTempDirectory("stream2").toString
    val in = s"$base/in"
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 01:05:00"), "view", 3.0)
    ).toDF("ts", "event_type", "value").write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val agg = Streams.windowedCounts(
      Streams.fileStream(spark, in, schema), "ts", "event_type", "value")
    val q = agg.writeStream
      .format("memory")
      .queryName("win_out")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT event_type, n, value_sum FROM win_out ORDER BY event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }
}
