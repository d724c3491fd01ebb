package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.plans.{Dag, Recon, Runner}
import graft.plans.Runner.{Job, JobRunRecord}
import graft.sources.Lake

/** Full-lake ingestion driver, re-expressing E1
  * (`driver_ingestions.py` / `README.md:130-203`) in one process:
  *
  *   1. infra bootstrap — local dirs + session catalog stand in for the
  *      bucket / Glue database / crawler (O9, `infra_utils.py:15-128`);
  *   2. job registry — named in-JVM `SparkSession => DataFrame` functions
  *      instead of one Glue application per script;
  *   3. dependency layering from the dependency CSV (O1);
  *   4. layered execution, each layer in ≤`maxBatchSize` parallel batches
  *      (O2/O3), metadata appended per batch (O6);
  *   5. reconciliation report written to the lake (O7).
  *
  * The Glue-API polling layer collapses into `Future` completion; the
  * crawler collapses into session-catalog registration on write.
  */
object LakeDriver {

  final case class Config(
      root: String, // stands in for s3://bucket
      dependencyCsv: Option[String] = None,
      jobPrefix: String = "",
      maxBatchSize: Int = 25, // driver_ingestions.py:28
      metaSubdir: String = "operational_metadata",
      database: Option[String] = None // catalog database to bootstrap (infra_utils.py:41-53)
  )

  final case class RunResult(
      records: Seq[JobRunRecord],
      recon: DataFrame,
      layers: Map[Int, Seq[String]]
  )

  /** Ingestion job helper: read → optional SQL filtration → lake write
    * (the E2 per-table pipeline shape of `table_jobs/nis_policies.py`).
    */
  def ingestJob(
      read: SparkSession => DataFrame,
      tablePath: String,
      root: String,
      filterSql: Option[String] = None,
      viewName: Option[String] = None,
      database: Option[String] = None
  ): Job = { spark =>
    val df = read(spark)
    val filtered = filterSql match {
      case Some(q) =>
        // serialized: this job may run beside 24 others on one session
        val v = viewName.getOrElse(Lake.tableNameFromPath(tablePath))
        Lake.withScopedView(spark, v, df)(spark.sql(q))
      case None => df
    }
    Lake.writeToDatalake(spark, filtered, root, tablePath, database)
    spark.read.parquet(Lake.lakePath(root, tablePath))
  }

  def run(spark: SparkSession, config: Config, registry: Map[String, Job]): RunResult = {
    // 1. infra bootstrap: the "bucket" + the catalog database the
    //    reference's infra step creates (O9, infra_utils.py:41-53)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"${config.root}/datalake"))
    config.database.foreach(db => spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`"))

    // 3. DAG layers (single layer 0 with every job when no CSV given)
    val layers: Map[Int, Seq[String]] = config.dependencyCsv match {
      case Some(csv) => Dag.layeredJobsFromCsv(spark, csv, registry.keySet, config.jobPrefix)
      case None      => Map(0 -> registry.keys.toSeq.sorted)
    }

    // 4. layered execution + operational metadata per batch
    val metaPath = s"${config.root}/${config.metaSubdir}"
    val records = Runner.runLayers(
      spark,
      layers,
      registry,
      maxBatchSize = config.maxBatchSize,
      record = recs => plans.MetaStore.append(spark, recs, metaPath)
    )

    // 5. reconciliation over everything the run produced
    val recon = reconReport(spark, config)
    recon.write.mode("overwrite").parquet(s"${config.root}/recon_report")
    RunResult(records, recon, layers)
  }

  /** Recon for all tables under the lake root: lake counts, sizes, and
    * last-success ingestion times joined on TableName. (Source counts
    * equal lake counts when sources are the lake inputs themselves; the
    * JDBC-source variant plugs its own source frames into
    * `Recon.countReport`.)
    *
    * Table discovery: a table is the nearest non-partition (`k=v`)
    * ancestor directory of a parquet file; swap leftovers
    * (`_old`/`_staging*`) are excluded. Names are lowercased so they join
    * the metastore's lowercased job-derived names (`Dag.jobNameFor`) —
    * mixed-case tablePaths would otherwise recon with NULL times.
    */
  private def reconReport(spark: SparkSession, config: Config): DataFrame = {
    val lakeDir = java.nio.file.Paths.get(s"${config.root}/datalake")
    def tableDirOf(file: java.nio.file.Path): Option[java.nio.file.Path] = {
      var d = file.getParent
      while (d != null && d != lakeDir && d.getFileName.toString.contains("=")) d = d.getParent
      val ok = d != null && d != lakeDir && {
        val n = d.getFileName.toString
        !n.endsWith("_old") && !n.contains("_staging")
      }
      if (ok) Some(d) else None
    }
    val tables: Seq[(String, String)] =
      if (!java.nio.file.Files.exists(lakeDir)) Nil
      else {
        val stream = java.nio.file.Files.walk(lakeDir)
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala
            .filter(p => java.nio.file.Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
            .flatMap(tableDirOf(_))
            .toSet
            .map((d: java.nio.file.Path) => d.getFileName.toString.toLowerCase -> d.toString)
            .toSeq
            .sortBy(_._1)
        } finally stream.close()
      }
    val counts = Recon.countReport(
      spark,
      tables.map { case (n, d) => n -> (spark.read.parquet(d), spark.read.parquet(d)) }.toMap
    )
    val sizes = Recon.sizeReport(spark, tables.toMap.view.mapValues(identity).toMap)
    val metaPath = s"${config.root}/${config.metaSubdir}"
    val times =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(metaPath)))
        Recon.ingestionTimeReport(plans.MetaStore.read(spark, metaPath), config.jobPrefix)
      else {
        import spark.implicits._
        Seq.empty[(String, Int)].toDF("TableName", "IngestionTime")
      }
    Recon.reconReport(counts, times, sizes)
  }
}
