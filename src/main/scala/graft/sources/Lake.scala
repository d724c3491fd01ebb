package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.functions.Sanitize

/** Lake + source I/O, re-expressing the reference's reader/writer surface
  * (`utils.py:83-209`) Spark-first. Local `file:/` paths stand in for
  * `s3://bucket/datalake/...`; the Spark session catalog stands in for the
  * Glue crawler (every lake write registers/refreshes a catalog view —
  * `utils.py:206`, `utils.py:319-328`).
  */
object Lake {

  /** Logical table name = last path segment (`utils.py:123`, `utils.py:201`). */
  def tableNameFromPath(tablePath: String): String =
    tablePath.split('/').last

  def lakePath(root: String, tablePath: String): String =
    s"$root/datalake/$tablePath"

  /** Temp views are SESSION-scoped, and the parallel runner shares one
    * session across up to 25 concurrent jobs — two jobs using the same
    * view name would interleave create/sql/drop and silently query each
    * other's data. All scoped view-create → analyze → drop sequences in
    * this library serialize on this lock (analysis happens eagerly inside
    * `spark.sql`, so the critical section is short; execution stays
    * parallel).
    */
  private val viewLock = new Object

  def withScopedView[T](spark: SparkSession, name: String, df: DataFrame)(
      body: => T): T =
    viewLock.synchronized {
      df.createOrReplaceTempView(name)
      try body
      finally spark.catalog.dropTempView(name)
    }

  // ----------------------------------------------------------------- sources

  /** Range-partitioned parallel JDBC extraction: Spark issues one query
    * per stride of `[lowerBound, upperBound)` over `column`, so the scan
    * runs `numPartitions` concurrent connections instead of one — how a
    * multi-worker job actually drains a big source table (the reference's
    * 12-DPU ingest jobs implicitly depend on this; a single-connection
    * read caps at one core no matter the cluster). Bounds only steer the
    * stride split; rows OUTSIDE them still land (first/last partition
    * predicates are open-ended), so a stale bound skews balance, never
    * correctness.
    */
  final case class JdbcPartitioning(
      column: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int
  )

  /** S1 — JDBC scan with optional source-side pushdown query
    * (`utils.py:83-104`). The pushdown query rides the same derived-table
    * trick the reference uses: `"(query) as pushdown_query"` as `dbtable`.
    * Pass `partitioning` to split the scan into parallel range queries
    * ([[JdbcPartitioning]]) — mandatory at real extraction sizes.
    */
  def jdbcReader(
      spark: SparkSession,
      url: String,
      schemaTable: String,
      user: String,
      password: String,
      driver: String = "com.microsoft.sqlserver.jdbc.SQLServerDriver",
      pushdownQuery: Option[String] = None,
      partitioning: Option[JdbcPartitioning] = None
  ): org.apache.spark.sql.DataFrameReader = {
    val dbtable = pushdownQuery match {
      case Some(q) => s"($q) as pushdown_query"
      case None    => schemaTable
    }
    val base = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .option("user", user)
      .option("password", password)
      .option("driver", driver)
      // pushdown of filters Catalyst derives, on top of the manual query:
      .option("pushDownPredicate", "true")
    partitioning.fold(base) { p =>
      require(p.numPartitions > 0 && p.upperBound > p.lowerBound,
        s"jdbcReader: invalid partitioning $p")
      base
        .option("partitionColumn", p.column)
        .option("lowerBound", p.lowerBound.toString)
        .option("upperBound", p.upperBound.toString)
        .option("numPartitions", p.numPartitions.toString)
    }
  }

  /** S3 — parquet lake scan with optional SQL filtration over a temp view
    * named after the table (`utils.py:121-138`). The view is dropped after
    * planning; the returned DataFrame is self-contained.
    */
  def readParquet(
      spark: SparkSession,
      path: String,
      query: Option[String] = None
  ): DataFrame = {
    val df = spark.read.parquet(path)
    query match {
      case None => df
      case Some(q) =>
        val view = tableNameFromPath(path.stripSuffix(".parquet"))
        withScopedView(spark, view, df)(spark.sql(q))
    }
  }

  /** S3 variant — parquet scan with schema merging across files: an
    * appended batch that gained columns still reads as one table (the
    * union schema; old files surface NULLs for new columns). Schema
    * merging costs a footer read per file, so it is opt-in here rather
    * than a global conf — the schema-evolution story an append-only lake
    * needs without a table format.
    */
  def readParquetMergedSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** S4 — CSV scan, inferred schema (`utils.py:170-174`). */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("multiLine", "true")
      .csv(path)

  /** S5 — CSV scan with a declared `CREATE TABLE` DDL schema
    * (`utils.py:141-167`). We keep the DDL-string API for parity but
    * implement it cleanly: parse the column list out of the DDL, build a
    * `StructType`, and hand it to the CSV reader — no catalog round-trip
    * (the reference executes CREATE TABLE / SELECT star / DROP TABLE).
    */
  def readCsvDdl(spark: SparkSession, ddl: String, path: String): DataFrame = {
    val colsDdl = columnListFromDdl(ddl)
    spark.read
      .schema(StructType.fromDDL(colsDdl))
      .option("header", "true")
      .option("multiLine", "true")
      .csv(path)
  }

  /** Parse `CREATE TABLE <name> (...)` → table name (`utils.py:144-145`). */
  def tableNameFromDdl(ddl: String): String =
    ddl.trim
      .replaceAll("(?is)^create\\s+table\\s+(if\\s+not\\s+exists\\s+)?", "")
      .takeWhile(c => !c.isWhitespace && c != '(')

  /** The parenthesized column list of a CREATE TABLE DDL, as a
    * `StructType.fromDDL`-compatible string.
    */
  def columnListFromDdl(ddl: String): String = {
    val start = ddl.indexOf('(')
    val end = ddl.lastIndexOf(')')
    require(start >= 0 && end > start, s"no column list in DDL: $ddl")
    ddl.substring(start + 1, end)
  }

  /** S6 — Delta lake scan with the same optional-SQL shape as S3
    * (`utils.py:177-192`). No Delta jar ships in this environment — and
    * none can: `io.delta` is absent from /opt/spark/jars and from the
    * offline coursier/ivy caches (re-verified; the build has zero
    * egress), so `format("delta")` can never bind here. The reader
    * therefore tries Delta and falls back; deployments WITH
    * delta-spark on the classpath get the real transaction-log read,
    * and the staging-swap upsert below covers merge semantics. The
    * reader tries `format("delta")` and falls back to the parquet files
    * of the table directory (same rows for an append-only table; merge
    * history is handled by our own staging-swap upsert, see
    * graft.streaming.Streams). Errors surface as None — the reference's
    * `-1` sentinel (`utils.py:192`) made typed.
    */
  def readDeltaOrParquet(
      spark: SparkSession,
      path: String,
      query: Option[String] = None
  ): Option[DataFrame] = {
    val df =
      try Some(spark.read.format("delta").load(path))
      catch {
        case _: Throwable =>
          try Some(spark.read.parquet(path))
          catch { case _: Throwable => None }
      }
    df.map { d =>
      query match {
        case None => d
        case Some(q) =>
          withScopedView(spark, tableNameFromPath(path), d)(spark.sql(q))
      }
    }
  }

  /** JSON-lines scan (one object per line — the usual raw-ingest landing
    * format). Schema inferred unless declared; with `corruptCol` set, the
    * reader runs PERMISSIVE and rows that fail to parse land whole in
    * that column instead of failing the 100 TB batch (triage the column,
    * don't re-run the job; note Spark disallows queries referencing ONLY
    * the corrupt column on the raw scan — cache or write the parsed
    * result first). Schema inference costs a full extra pass over the
    * data — declare the schema for anything big.
    */
  def readJsonLines(
      spark: SparkSession,
      path: String,
      schemaDdl: Option[String] = None,
      corruptCol: Option[String] = None
  ): DataFrame = {
    val base = spark.read
    val withSchema = (schemaDdl, corruptCol) match {
      case (Some(ddl), Some(cc)) =>
        // the corrupt-record column must exist in the declared schema or
        // PERMISSIVE has nowhere to put the bad line
        base
          .schema(StructType.fromDDL(ddl).add(cc, org.apache.spark.sql.types.StringType))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", cc)
      case (Some(ddl), None) => base.schema(StructType.fromDDL(ddl))
      case (None, Some(cc)) =>
        base.option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", cc)
      case (None, None) => base
    }
    withSchema.json(path)
  }

  /** ORC scan/write — the columnar alternative where a lake standardizes
    * on ORC instead of parquet; same pushdown/pruning story.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** S7 — dependency-metadata CSV (`Table, Parent Table, Layer`),
    * `dependency_utils.py:22`.
    */
  def readDependencyCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  // ------------------------------------------------------------------- sinks

  /** K1 — parquet overwrite write + catalog sync (`utils.py:200-209`).
    * Overwrite keeps jobs idempotent/re-runnable. The post-write crawler
    * registers a session temp view by default; pass `database` to also
    * register a durable external-catalog table ([[syncCatalogTable]]),
    * matching the crawler's "queryable by name after the job dies"
    * semantics. `partitionBy` lays the table out Hive-partitioned
    * (`path/col=value/...`) and routes through the same registration —
    * [[syncCatalogTable]] recovers the partition list, which is the Glue
    * crawler's real job on partitioned tables (`utils.py:319-328`).
    */
  def writeToDatalake(
      spark: SparkSession,
      df: DataFrame,
      root: String,
      tablePath: String,
      database: Option[String] = None,
      partitionBy: Seq[String] = Nil
  ): String = {
    val path = lakePath(root, tablePath)
    // A zero-row PARTITIONED write emits no data files at all (dynamic
    // partitioning writes one file per partition VALUE), leaving an
    // unreadable _SUCCESS-only directory that the catalog sync below
    // would crash on — fail loudly up front instead. Flat writes are
    // fine: they emit a schema-bearing empty part file.
    require(partitionBy.isEmpty || !df.isEmpty,
      s"writeToDatalake: zero-row partitioned write of $tablePath would produce no " +
        "readable files (plain parquet cannot represent an empty partitioned table); " +
        "write at least one row or use the flat layout")
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    syncCatalog(spark, path)
    database.foreach(db => syncCatalogTable(spark, path, db))
    path
  }

  /** K2 — parquet append (operational metadata, `utils.py:474-477`). */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** O8 — catalog sync standing in for the Glue crawler
    * (`utils.py:250-328`): register the files as a queryable view named
    * after the table and refresh any cached metadata for the path.
    */
  def syncCatalog(spark: SparkSession, path: String): Unit = {
    spark.catalog.refreshByPath(path)
    val name = tableNameFromPath(path)
    spark.read.parquet(path).createOrReplaceTempView(name)
  }

  /** O8, durable variant — register the parquet directory as an EXTERNAL
    * table in the catalog, the crawler's real semantics
    * (`utils.py:319-328`: the Glue entry outlives the job). Unlike
    * [[syncCatalog]]'s session-scoped temp view, this entry lives in the
    * application's shared external catalog: visible to every session
    * (`spark.newSession`) and, backed by a persistent metastore
    * (Hive/Glue), to future applications. Returns the qualified name.
    */
  def syncCatalogTable(
      spark: SparkSession,
      path: String,
      database: String = "default"
  ): String = {
    val name = tableNameFromPath(path)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    val fq = s"`$database`.`$name`"
    // The catalog entry's STORED SCHEMA must track the files after an
    // overwrite that evolved columns (refreshTable only invalidates
    // cached listings). Recreate ONLY on schema change — dropping an
    // external LOCATION entry never touches data, but it does open a
    // brief not-found window for concurrent sessions, so the steady-state
    // re-sync stays a pure refresh.
    val exists = spark.catalog.tableExists(fq)
    // Structural compare (names + dataTypes), NOT StructType equality:
    // catalog schemas routinely differ from file-inferred ones in
    // nullability/metadata only, and full equality would DROP+CREATE on
    // every sync — churning the catalog and opening the not-found window
    // this branch exists to avoid.
    val schemaChanged =
      exists && !sameStructure(spark.table(fq).schema, spark.read.parquet(path).schema)
    if (schemaChanged) spark.sql(s"DROP TABLE IF EXISTS $fq")
    if (!exists || schemaChanged)
      spark.sql(s"CREATE TABLE $fq USING parquet LOCATION '$path'")
    spark.catalog.refreshTable(fq)
    // Partitioned LOCATIONs: the catalog tracks the partition LIST, so a
    // `col=value` directory appended after registration stays invisible
    // to name-based reads until recovered — discovering it is the Glue
    // crawler's actual job on partitioned tables (`utils.py:319-328`).
    // Partition-count-bounded metadata work; a no-op for flat tables.
    if (spark.catalog.listColumns(fq).collect().exists(_.isPartition))
      spark.sql(s"ALTER TABLE $fq RECOVER PARTITIONS")
    fq
  }

  /** Nullability/metadata-insensitive structural equality of two types:
    * same field names and data types, recursively. The schema-change
    * signal for catalog re-sync.
    */
  private[graft] def sameStructure(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType
  ): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    (a, b) match {
      case (x: StructType, y: StructType) =>
        x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
          f.name == g.name && sameStructure(f.dataType, g.dataType)
        }
      case (x: ArrayType, y: ArrayType) => sameStructure(x.elementType, y.elementType)
      case (x: MapType, y: MapType) =>
        sameStructure(x.keyType, y.keyType) && sameStructure(x.valueType, y.valueType)
      case _ => a == b
    }
  }

  /** Small-file compaction (the OPTIMIZE of table formats, for a plain
    * parquet lake): incremental appends accumulate files far smaller than
    * a scan-efficient split, inflating task counts and file-listing cost.
    * Rewrites the table into `ceil(bytes / targetFileBytes)` files via the
    * crash-safe staging swap, returns the new file count. Readers never
    * observe a missing table (see `Incremental.swapInStaging`).
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil,
      clusterBy: Option[String] = None
  ): Int = {
    require(targetFileBytes > 0)
    // EVERY writer's interrupted state must be repaired first, not just
    // the whole-table swap's: a torn file-granular or partition-pruned
    // merge leaves rows only in hidden asides/staging that the read below
    // skips — compacting over that bakes in the missing rows and the
    // leftover staging would later roll forward ONTO the compacted table,
    // resurrecting stale rows as duplicate keys.
    graft.operators.Incremental.recoverAll(spark, path)
    // size via the Hadoop FS of the path itself — a local-filesystem walk
    // would read 0 bytes for hdfs://, s3a://, ... and compact to ONE file
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val staging = path + "_staging_compact"
    // the ON-DISK layout decides, not the arguments: compacting a
    // Hive-partitioned table without partitionCols would silently flatten
    // its directories (and partition-type inference corrupts
    // non-canonical values like '01' → 1 on the way)
    require(
      partitionCols.nonEmpty || !fs.listStatus(p).exists(st =>
        st.isDirectory && st.getPath.getName.contains("=")),
      s"compact: $path has a Hive-partitioned layout — pass partitionCols to preserve it")
    // a deduped-ingest corpus carries time-travel state IN ITS FILE
    // NAMES (ingest_<batch>_ tags): a name-blind rewrite would make
    // every corpusAsOf snapshot silently return the full corpus. Refuse
    // and point at the batch-aware compaction instead of destroying it.
    require(
      !fs.listStatus(p).exists(st =>
        st.isFile && st.getPath.getName.startsWith("ingest_") &&
          st.getPath.getName.stripPrefix("ingest_").headOption.exists(_.isDigit)),
      s"compact: $path is a deduped-ingest corpus (ingest_<batch>_ tagged files) — " +
        "its batch tags carry corpusAsOf time travel; use Streams.compactIngestCorpus")
    val df = spark.read.parquet(path)
    // a Hive-partitioned table must be rewritten with the same layout or
    // the directory structure (and pruning) is silently lost; likewise a
    // range-clustered table (FileMerge's layout) must be re-clustered or
    // compaction destroys the disjoint per-file key ranges that footer
    // min/max pruning — and every later file-granular merge — depends on
    val writer = clusterBy match {
      case Some(c) =>
        require(partitionCols.isEmpty,
          "compact: clusterBy applies to unpartitioned range-clustered tables")
        df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(c).write
      case None if partitionCols.isEmpty => df.repartition(nFiles).write
      case None =>
        df.repartition(nFiles, partitionCols.map(col): _*)
          .write.partitionBy(partitionCols: _*)
    }
    writer.mode("overwrite").parquet(staging)
    // a streaming-upsert target keeps its exactly-once ledger inside the
    // table directory; the whole-dir swap below would drop it and every
    // redelivered batch would re-merge (idempotent, but degraded) —
    // carry it across
    val ledger = new org.apache.hadoop.fs.Path(p, "_commits")
    if (fs.exists(ledger)) {
      val dest = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(staging), "_commits")
      if (!org.apache.hadoop.fs.FileUtil
          .copy(fs, ledger, fs, dest, false, spark.sparkContext.hadoopConfiguration))
        throw new java.io.IOException(s"compact: could not carry ledger $ledger into $dest")
    }
    graft.operators.Incremental.swapInStaging(spark, path, staging)
    nFiles
  }

  /** K6 — CSV-to-lake ingestion pipeline (`utils.py:194-197`):
    * read (inferred or DDL-declared) → sanitize column names → overwrite.
    */
  /** METADATA-ONLY table statistics: row count and an integral column's
    * min/max computed purely from parquet footers — no data pages are
    * read. At 100 TB a `count(*)` that schedules tasks over every data
    * split pays a full listing-and-scan plan; the footers alone (a few
    * KB per file) carry exact row counts and column chunk min/max, the
    * same metadata a table format serves from its manifest. The footer
    * sweep is DISTRIBUTED (one task per slice of the file list, the
    * [[graft.operators.FileMerge.fileRanges]] pattern) so a
    * million-file table does not bottleneck on the driver.
    *
    * Exactness contract: row count is always exact (every footer states
    * its block row counts). min/max are exact only when every non-empty
    * block carries statistics for `statsCol`; a stats-less or non-
    * numeric chunk fails fast with the file name rather than returning
    * silently-wrong bounds. NULLs don't count toward min/max (parquet
    * stats are over non-null values), matching SQL aggregate semantics;
    * an all-null or empty table reports NULL bounds.
    *
    * Accepts a single parquet file or a directory of data files.
    */
  def footerStats(spark: SparkSession, path: String, statsCol: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isFile) Seq(p.toString)
      else
        fs.listStatus(p)
          .toSeq
          .filter { st =>
            val n = st.getPath.getName
            st.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          .map(_.getPath.toString)
    require(files.nonEmpty, s"footerStats: no data files under $path")
    val confBc = org.apache.spark.sql.graftbridge.ConfBridge.broadcast(spark.sparkContext)
    val slices = math.min(files.size, math.max(1, spark.sparkContext.defaultParallelism))
    // (rows, lo, hi, sawValue) per file; reduced associatively
    val (rows, lo, hi, saw) = spark.sparkContext
      .parallelize(files, slices)
      .map { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new Path(f), org.apache.spark.sql.graftbridge.ConfBridge.value(confBc)))
        try {
          var rows = 0L
          var lo = Long.MaxValue
          var hi = Long.MinValue
          var saw = false
          reader.getFooter.getBlocks.asScala.foreach { b =>
            rows += b.getRowCount
            if (b.getRowCount > 0) {
              val c = b.getColumns.asScala
                .find(_.getPath.toDotString == statsCol)
                .getOrElse(throw new IllegalArgumentException(
                  s"footerStats: column $statsCol absent from $f"))
              val st = c.getStatistics
              require(
                st != null,
                s"footerStats: $f carries no statistics for $statsCol — " +
                  "metadata-only bounds would be a guess, not an answer")
              if (st.hasNonNullValue) (st.genericGetMin, st.genericGetMax) match {
                case (mn: Number, mx: Number) =>
                  lo = math.min(lo, mn.longValue)
                  hi = math.max(hi, mx.longValue)
                  saw = true
                case other =>
                  throw new IllegalArgumentException(
                    s"footerStats: non-integral statistics for $statsCol in $f: $other")
              }
            }
          }
          (rows, lo, hi, saw)
        } finally reader.close()
      }
      .reduce { (a, b) =>
        (a._1 + b._1, math.min(a._2, b._2), math.max(a._3, b._3), a._4 || b._4)
      }
    import spark.implicits._
    Seq((rows, if (saw) Some(lo) else None, if (saw) Some(hi) else None))
      .toDF("n_rows", "min_" + statsCol, "max_" + statsCol)
  }

  def ingestCsvToDatalake(
      spark: SparkSession,
      csvPath: String,
      root: String,
      tablePath: String,
      ddl: Option[String] = None
  ): String = {
    val raw = ddl match {
      case Some(d) => readCsvDdl(spark, d, csvPath)
      case None    => readCsvInferred(spark, csvPath)
    }
    writeToDatalake(spark, Sanitize.sanitizeColumns(raw), root, tablePath)
  }
}
