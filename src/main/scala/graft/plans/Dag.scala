package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dependency-layered job DAG, re-expressing `dependency_utils.py:19-34`:
  * a dependency CSV (`Table, Parent Table, Layer`) becomes a map of layer
  * number → job names, run lowest layer first. Only rows whose job exists
  * in the registry survive (the reference's membership filter — with its
  * `utils.py:405` tautology bug fixed: we test against the registry).
  */
object Dag {

  final case class Dependency(table: String, parent: Option[String], layer: Int)

  /** Job name = prefix + lowercased table name (`dependency_utils.py:26-28`). */
  def jobNameFor(table: String, prefix: String): String =
    prefix + table.toLowerCase

  def dependenciesFrom(df: DataFrame): Seq[Dependency] =
    df.collect().toSeq.map { r =>
      // CSV rows with missing cells arrive as nulls — fail with a
      // row-identifying message, not an NPE deep inside the driver
      def cell(name: String): Option[String] =
        Option(r.getAs[String](name)).map(_.trim).filter(_.nonEmpty)
      val table = cell("Table").getOrElse(
        throw new IllegalArgumentException(s"dependency CSV row missing Table: $r"))
      val layer = cell("Layer").getOrElse(
        throw new IllegalArgumentException(s"dependency CSV row missing Layer: $r"))
      require(layer.forall(_.isDigit), s"dependency CSV row has non-numeric Layer '$layer': $r")
      Dependency(table, cell("Parent Table"), layer.toInt)
    }

  /** Layer → ordered distinct job names, keeping only registered jobs. */
  def layeredJobs(
      deps: Seq[Dependency],
      registeredJobs: Set[String],
      prefix: String = ""
  ): Map[Int, Seq[String]] =
    deps
      .map(d => d.layer -> jobNameFor(d.table, prefix))
      .filter { case (_, j) => registeredJobs.contains(j) }
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).distinct)
      .toMap

  def layeredJobsFromCsv(
      spark: SparkSession,
      csvPath: String,
      registeredJobs: Set[String],
      prefix: String = ""
  ): Map[Int, Seq[String]] = {
    val df = spark.read.option("header", "true").csv(csvPath)
    layeredJobs(dependenciesFrom(df), registeredJobs, prefix)
  }

  /** Parent-before-child validation: every parent's layer must be strictly
    * below its child's. Returns the violating (child, parent) pairs.
    */
  def layerViolations(deps: Seq[Dependency]): Seq[(String, String)] = {
    val layerOf = deps.map(d => d.table -> d.layer).toMap
    for {
      d <- deps
      p <- d.parent.toSeq
      pl <- layerOf.get(p).toSeq
      if pl >= d.layer
    } yield (d.table, p)
  }

  /** O2 — contiguous batches of at most `maxBatchSize` jobs
    * (`utils.py:45-53`; 25 at `driver_ingestions.py:28`).
    */
  def batches(jobs: Seq[String], maxBatchSize: Int): Seq[Seq[String]] = {
    require(maxBatchSize > 0, "maxBatchSize must be positive")
    jobs.grouped(maxBatchSize).toSeq
  }
}
