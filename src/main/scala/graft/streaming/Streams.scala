package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Incremental

/** Structured-Streaming face of the reference's incremental path
  * (SURVEY.md §7 step 9): the batch CDC-lite of `utils.py:212-246`
  * becomes a file-source stream with a `foreachBatch` upsert, and the
  * time-bucketed analytics get a watermarked windowed aggregate.
  *
  * Scale notes: the foreachBatch merge is the same single shuffle-on-key
  * join as the batch path; watermarks bound the windowed aggregate's
  * state store on a real cluster.
  */
object Streams {

  /** File-source replay of a parquet directory as a stream. */
  def fileStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 1
  ): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(inputDir)

  /** Streaming incremental upsert: each micro-batch is PK-merged into the
    * parquet table at `targetPath` (created on first batch) — the
    * streaming analogue of `utils.py:222-230`'s Delta MERGE. Since the
    * target is both input and output of the merge, each batch writes to a
    * staging directory and atomically swaps it in (what a table format's
    * transaction log would do for us).
    */
  def upsertStream(
      spark: SparkSession,
      source: DataFrame,
      pk: String,
      targetPath: String,
      checkpoint: String
  ): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(spark, batch, pk, targetPath, batchId)
      }
      .start()

  /** One micro-batch of the upsert; also usable directly in tests. */
  def upsertBatch(
      spark: SparkSession,
      batch: DataFrame,
      pk: String,
      targetPath: String,
      batchId: Long
  ): Unit = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(target) && fs.listStatus(target).nonEmpty) {
      val merged = Incremental.merge(spark.read.parquet(targetPath), batch, pk)
      val staging = targetPath + s"_staging_$batchId"
      merged.write.mode("overwrite").parquet(staging)
      Incremental.swapInStaging(spark, targetPath, staging)
    } else {
      Incremental.dedupByKey(batch, pk).write.mode("overwrite").parquet(targetPath)
    }
  }

  /** Watermarked windowed aggregate over an event-time column — bounded
    * state, append-safe at scale.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      window_ : String = "1 hour",
      watermark: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("value_sum"))
}
