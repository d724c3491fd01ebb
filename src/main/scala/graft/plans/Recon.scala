package graft.plans

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reconciliation report, re-expressing `reporting_utils.py:31-89`:
  * per-table (source row count, lake row count, last-success ingestion
  * time, byte size), joined on `TableName` (J3) into one stakeholder
  * sign-off table. Local filesystem stands in for S3 prefix walks.
  */
object Recon {

  /** Source-vs-lake row counts (`reporting_utils.py:63-74`). */
  def countReport(
      spark: SparkSession,
      tables: Map[String, (DataFrame, DataFrame)] // name -> (source, lake)
  ): DataFrame = {
    import spark.implicits._
    tables.toSeq
      .map { case (name, (src, lake)) => (name, src.count(), name, lake.count()) }
      .sortBy(_._1)
      .toDF("OnpremTableName", "OnpremRowCounts", "TableName", "TableRowCounts")
  }

  /** Per-table byte size: sum of file sizes under the table's directory
    * (`reporting_utils.py:31-42`'s S3 prefix sum, locally).
    */
  def sizeReport(spark: SparkSession, tableDirs: Map[String, String]): DataFrame = {
    import spark.implicits._
    tableDirs.toSeq
      .map { case (name, dir) => (name, directoryBytes(Paths.get(dir))) }
      .sortBy(_._1)
      .toDF("TableName", "TableSize")
  }

  def directoryBytes(dir: Path): Long =
    if (!Files.exists(dir)) 0L
    else
      Files.walk(dir).iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(Files.size)
        .sum

  /** Last-success execution time per table from the operational metastore
    * (`reporting_utils.py:45-60`): duration of the most recent SUCCESS run
    * of each table's job.
    */
  def ingestionTimeReport(meta: DataFrame, jobToTable: String => String): DataFrame = {
    val toTable = udfSafeJobToTable(meta.sparkSession, jobToTable)
    meta
      .where(col("job_status") === "SUCCESS")
      .groupBy(col("job_name"))
      .agg(max(struct(col("job_start_time"), col("job_duration"))).as("last"))
      .select(toTable(col("job_name")).as("TableName"), col("last.job_duration").as("IngestionTime"))
  }

  private def udfSafeJobToTable(spark: SparkSession, f: String => String) =
    org.apache.spark.sql.functions.udf(f)

  /** Full recon: counts ⋈ times ⋈ sizes on `TableName`
    * (`reporting_utils.py:77-89`), written parquet-overwrite by callers.
    */
  def reconReport(counts: DataFrame, times: DataFrame, sizes: DataFrame): DataFrame =
    counts.join(times, Seq("TableName"), "left").join(sizes, Seq("TableName"), "left")
}
