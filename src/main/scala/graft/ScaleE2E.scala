package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.Runner.Job

/** Scale end-to-end driver run (the r11 verdict's E1-at-scale ask): the
  * two orchestration drivers exercised against a REAL scaled corpus as a
  * recorded artifact, not just their specs' fixtures.
  *
  *   - [[LakeDriver]]: full-lake layered ingestion of every TPC-H-ish
  *     table (layer 0) plus a SQL-filtered derived table that reads
  *     layer-0 lake output (layer 1), operational metadata per batch,
  *     reconciliation report at the end — `driver_ingestions.py`'s
  *     whole lifecycle at data volume.
  *   - [[CurationDriver]]: the training-data pipeline (validate →
  *     dedup → [decontaminate ∥ mix] → quality+redact → shuffle+pack)
  *     over the scaled `documents` table with a planted benchmark
  *     overlap and a deterministic clique-chain link graph driving the
  *     composed q169/q173 policy stage.
  *
  * Prints ONE JSON line with per-stage durations and row counts so the
  * run can be recorded beside the bench artifacts. Usage:
  * `runMain graft.ScaleE2E <sfDir> <scratchRoot>`.
  */
object ScaleE2E {
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(" ")
    catch { case _: Throwable => "unavailable" }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ScaleE2E <sfDir> <scratchRoot>")
    val (sfDir, root) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = loadavg()

    // ---- Part 1: LakeDriver over the full relational table set ----
    val tables =
      Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    val depCsv = {
      val p = java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
        .resolve("deps.csv")
      val rows = tables.map(t => s"${t.capitalize},,0") :+ "Open_orders,Orders,1"
      java.nio.file.Files.writeString(p, "Table,Parent Table,Layer\n" + rows.mkString("\n") + "\n")
      p.toString
    }
    val registry: Map[String, Job] =
      tables.map { tbl =>
        s"ing_$tbl" -> LakeDriver.ingestJob(
          s => s.read.parquet(s"$sfDir/$tbl.parquet"), tbl, root)
      }.toMap +
        ("ing_open_orders" -> LakeDriver.ingestJob(
          s => s.read.parquet(s"$root/datalake/orders"),
          "open_orders", root,
          filterSql = Some("SELECT * FROM open_orders WHERE o_orderstatus = 'O'")))
    val t0 = System.nanoTime()
    val lake = LakeDriver.run(
      spark, LakeDriver.Config(root, Some(depCsv), jobPrefix = "ing_"), registry)
    val lakeSec = (System.nanoTime() - t0) / 1e9
    val lakeOk = lake.records.count(_.job_status == "SUCCESS")
    val reconRows = lake.recon.count()

    // ---- Part 2: CurationDriver over the scaled documents corpus ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    // Planted benchmark: a SMALL verbatim sample (every 1009th doc —
    // real benchmark sets are thousands of docs, not corpus-fractions).
    // A dense sample (1/17 was the first cut) degenerates: its 3-gram
    // UNION covers the synthetic generator's whole shingle space, so
    // every doc crosses the 50% containment threshold and the
    // decontaminate stage removes the entire corpus — stage counts of 0
    // prove nothing about the downstream stages at volume.
    val bench = docs.where(col("doc_id") % 1009 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
    // Deterministic document LINK graph (the corpus carries no real
    // citation/hyperlink edges): the q158/q169 clique-chain fixture
    // shape — hash-sized cliques of consecutive ids bridged into
    // chains — so the mix stage's k-core / community / PPR signals see
    // realistic structure at volume.
    val ids = docs.select(col("doc_id")).where(col("doc_id").isNotNull).distinct()
    val mem = ids
      .select(col("doc_id"), expr("doc_id div 6").as("_g"), (col("doc_id") % 6).as("_j"))
      .withColumn("_s",
        lit(3L) + graft.functions.Text.md5PrefixLong(
          concat(lit("kc:"), col("_g").cast("string")), 13) % 4)
      .where(col("_j") < col("_s"))
    val links = mem.select(col("_g"), col("doc_id").as("src"))
      .join(mem.select(col("_g"), col("doc_id").as("dst")), "_g")
      .where(col("src") < col("dst"))
      .select("src", "dst")
      .unionByName(
        mem.where(col("_j") === col("_s") - 1)
          .select(col("doc_id").as("src"), ((col("_g") + 1) * 6).as("dst"))
          .join(ids.select(col("doc_id").as("dst")), "dst")
          .select("src", "dst"))
    val t1 = System.nanoTime()
    val cur = CurationDriver.run(
      spark, docs, bench, CurationDriver.Config(root = s"$root/curation"),
      links = Some(links))
    val curSec = (System.nanoTime() - t1) / 1e9
    val curOk = cur.records.count(_.job_status == "SUCCESS")

    // ---- Part 3: the "day 2" INCREMENTAL curation run — a new batch
    // against yesterday's stage_dedup as the existing corpus. Half the
    // batch repeats corpus texts verbatim (the novelty filter should
    // drop them without the corpus self-joining), half is genuinely new
    // (token order reversed → disjoint shingles), so the increment that
    // flows through decontaminate/quality/pack has real volume.
    val day2 = docs.where(col("doc_id") % 13 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000000L)
      .withColumn(
        "text",
        when(pmod(col("doc_id"), lit(2)) === 0, col("text"))
          .otherwise(concat_ws(" ", reverse(split(col("text"), " ")))))
    val t2 = System.nanoTime()
    val inc = CurationDriver.run(
      spark, day2, bench,
      CurationDriver.Config(
        root = s"$root/curation_day2",
        existingCorpusPath = Some(s"$root/curation/stage_dedup")))
    val incSec = (System.nanoTime() - t2) / 1e9
    val incOk = inc.records.count(_.job_status == "SUCCESS")

    def r3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def countsJson(cs: Seq[(String, Long)]) =
      cs.map { case (k, v) => JsonUtil.quote(k) + ":" + v }.mkString("{", ",", "}")
    val jobsJson = (lake.records ++ cur.records ++ inc.records)
      .map(r => JsonUtil.quote(r.job_name) + ":" + r.job_duration)
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"e2e","lake_sec":${r3(lakeSec)},"lake_jobs_ok":$lakeOk,"lake_jobs":${lake.records.size},"recon_rows":$reconRows,"curation_sec":${r3(curSec)},"curation_jobs_ok":$curOk,"curation_jobs":${cur.records.size},"stage_counts":${countsJson(cur.stageCounts)},"incremental_sec":${r3(incSec)},"incremental_jobs_ok":$incOk,"incremental_stage_counts":${countsJson(inc.stageCounts)},"job_durations_sec":$jobsJson,"loadavg_start":${JsonUtil.quote(loadStart)},"loadavg_end":${JsonUtil.quote(loadavg())},"sf":"$sfDir"}""")
    spark.stop()
  }
}
