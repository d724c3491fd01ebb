package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental load semantics of the reference (`utils.py:212-246`), minus
  * its bugs: monotonic-PK high-watermark scan avoidance, append, and
  * PK-keyed upsert (MERGE).
  *
  * The reference merges via Delta Lake (`utils.py:222-230`). No Delta jar
  * ships in this environment, so `merge` is the documented Spark-native
  * fallback: full-outer join on the key with source-wins column coalescing —
  * the same observable semantics as `whenMatchedUpdateAll /
  * whenNotMatchedInsertAll` for a unique-keyed source. It is a single
  * shuffle-on-key join (no driver-side loops), so it scales with the data.
  */
object Incremental {

  /** Run EVERY writer's crash recovery on `path`, in dependency order:
    * the whole-table swap first (it restores an absent live directory,
    * which the other recoveries rename INTO), then the partition-scoped
    * and file-scoped merge repairs. Each is a cheap no-op when its writer
    * left no residue, and each ignores the others' artifacts — so any
    * read-then-rewrite of a table with an unknown writer history MUST
    * call this, not its own writer's recovery alone: a real table's
    * lifecycle mixes writers (merge variants + compaction), and a repair
    * that only knows its own crash states bakes another writer's torn
    * commit into the rewrite. Returns true if anything was repaired.
    */
  def recoverAll(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val swap = recoverInterruptedSwap(spark, path)
    val part = recoverPartitionedMerge(spark, path)
    val file = FileMerge.recoverFileMerge(spark, path)
    swap || part || file
  }

  /** A1 — global max of the primary key (`utils.py:219`). None on empty. */
  def highWatermark(existing: DataFrame, pk: String): Option[Long] = {
    val row = existing.agg(max(col(pk)).cast("long")).head()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  /** P5 — rows strictly above the lake's high watermark (`utils.py:220`). */
  def newRowsAboveWatermark(
      source: DataFrame,
      existing: DataFrame,
      pk: String
  ): DataFrame =
    highWatermark(existing, pk) match {
      case Some(w) => source.where(col(pk) > lit(w))
      case None    => source
    }

  /** K3 — incremental append: watermark-filter then append
    * (`utils.py:233-235`). Returns the appended slice for inspection.
    */
  def appendIncrement(
      source: DataFrame,
      existing: DataFrame,
      pk: String,
      writePath: String
  ): DataFrame = {
    val fresh = newRowsAboveWatermark(source, existing, pk)
    fresh.write.mode("append").parquet(writePath)
    fresh
  }

  /** K4 — PK-keyed upsert with source-wins semantics (`utils.py:222-230`).
    *
    * Requires `source` unique on `pk` (the reference's Delta MERGE throws on
    * duplicate matches; we keep last-write-wins deterministic by reducing the
    * source to one row per key first — max-struct pick, shuffle-free beyond
    * the one aggregation).
    *
    * Matched rows take the source's values WHOLESALE — including explicit
    * NULLs — via a matched-row flag, matching Delta's
    * `whenMatchedUpdateAll` (a per-column coalesce would silently keep the
    * target value wherever the source carries NULL).
    *
    * Output column order/types follow `target`; columns only present on one
    * side are preserved (nulls on the other).
    */
  def merge(target: DataFrame, source: DataFrame, pk: String): DataFrame =
    mergeUnique(target, dedupByKey(source, pk), pk)

  /** [[merge]] for a source ALREADY unique on `pk` — skips the dedup
    * aggregation (callers that just produced a one-row-per-key set, like
    * [[mergeWithDeletes]] and [[FileMerge]], must not pay it twice).
    */
  private[operators] def mergeUnique(target: DataFrame, sourceUnique: DataFrame, pk: String): DataFrame = {
    val srcCols = sourceUnique.columns.toSet
    val tgtCols = target.columns.toSet
    require(srcCols.contains(pk) && tgtCols.contains(pk), s"merge key $pk missing")

    val t = target.alias("t")
    // non-nullable marker: NULL after the full-outer join ⇔ no source row.
    // The marker name must not shadow real data — fail fast on collision
    // rather than silently overwriting a user column with `true`.
    val marker = "__graft_matched"
    require(!srcCols.contains(marker) && !tgtCols.contains(marker),
      s"merge: reserved marker column '$marker' already exists in the input")
    val s = sourceUnique.withColumn(marker, lit(true)).alias("s")
    val joined = t.join(s, col(s"t.$pk") === col(s"s.$pk"), "full_outer")

    val takeSource = col(s"s.$marker") // NULL → otherwise-branch (target row kept)
    val outCols = (target.columns ++ sourceUnique.columns.filterNot(tgtCols)).map {
      case c if srcCols.contains(c) && tgtCols.contains(c) =>
        when(takeSource, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      case c if srcCols.contains(c) => col(s"s.$c").as(c)
      case c                        => col(s"t.$c").as(c)
    }
    joined.select(outCols.toIndexedSeq: _*)
  }

  /** K4 extension — CDC merge with DELETES (`whenMatchedDelete` parity,
    * the third leg of a full MERGE alongside update/insert): source rows
    * whose `deleteFlagCol` is true remove the matching target key; the
    * rest upsert with [[merge]]'s source-wins semantics. The flag column
    * itself never lands in the output. Requires the source unique per
    * key after [[dedupByKey]] (a key both deleted and re-inserted in ONE
    * batch is ambiguous without an ordering column — split such batches
    * upstream).
    *
    * Same scale shape as [[merge]]: one shuffle-on-key join plus a
    * left-anti join against the (typically tiny) delete set.
    */
  def mergeWithDeletes(
      target: DataFrame,
      source: DataFrame,
      pk: String,
      deleteFlagCol: String
  ): DataFrame = {
    require(source.columns.contains(deleteFlagCol),
      s"mergeWithDeletes: flag column '$deleteFlagCol' missing from source")
    val oneRowPerKey = dedupByKey(source, pk)
    val flagged = coalesce(col(deleteFlagCol).cast("boolean"), lit(false))
    val deletes = oneRowPerKey.where(flagged).select(col(pk))
    val upserts = oneRowPerKey.where(!flagged).drop(deleteFlagCol)
    // upserts are already unique per key — skip merge()'s re-dedup pass
    mergeUnique(target, upserts, pk).join(deletes, Seq(pk), "left_anti")
  }

  /** Schema-merging read of a possibly schema-EVOLVED table: a
    * file-granular or partition-scoped merge that introduced a column
    * rewrites only the files it touched, leaving the table's footers
    * heterogeneous — and a plain `spark.read.parquet` infers the schema
    * from ONE footer, silently dropping the new column whenever it picks
    * an old file (the round-3 heterogeneous-footer trap). `mergeSchema`
    * unions all footers (a distributed metadata-scale job) so evolved
    * columns always surface, with NULLs for rows from pre-evolution
    * files. Evolution is ADDITIVE only: a column present with two
    * incompatible types fails the read, by design.
    */
  def readEvolved(spark: org.apache.spark.sql.SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** E4 — the reference's whole incremental entry point
    * (`utils.py:212-246`): read the existing lake table, keep only source
    * rows above its PK high watermark, then either append them or
    * PK-merge the full source batch (`updates = true` ⇒ merge path,
    * matching the reference's flag), and overwrite-write the result.
    * Returns the new lake state.
    */
  def ingestIncremental(
      spark: org.apache.spark.sql.SparkSession,
      source: DataFrame,
      lakePath: String,
      pk: String,
      updates: Boolean
  ): DataFrame = {
    recoverAll(spark, lakePath)
    val exists = {
      val p = new org.apache.hadoop.fs.Path(lakePath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.listStatus(p).nonEmpty
    }
    if (!exists) {
      dedupByKey(source, pk).write.mode("overwrite").parquet(lakePath)
    } else if (updates) {
      // schema-merging reads throughout: the table may be heterogeneous
      // after an evolved file-granular/partition-scoped merge, and the
      // batch itself may add columns (mergeUnique unions them)
      val merged = merge(readEvolved(spark, lakePath), source, pk)
      val staging = lakePath + "_staging"
      merged.write.mode("overwrite").parquet(staging)
      swapInStaging(spark, lakePath, staging)
    } else {
      appendIncrement(source, readEvolved(spark, lakePath), pk, lakePath)
    }
    readEvolved(spark, lakePath)
  }

  /** K4 at 100 TB — partition-pruned MERGE into a Hive-partitioned lake
    * (`utils.py:222-230`; what Delta's MERGE with a partition predicate
    * does at file granularity, here at partition granularity). The plain
    * [[ingestIncremental]] merge path reads and rewrites the WHOLE table
    * per batch — correct, but a 1 GB batch against a 100 TB table does
    * 100 TB of IO. This variant:
    *
    *   1. derives the touched-partition set from the source batch
    *      (driver-side DISTINCT of partition values — metadata-scale,
    *      bounded by the batch, never by the table),
    *   2. reads ONLY those partitions (partition pruning: the scan lists
    *      just the matching `col=value` directories),
    *   3. merges the batch into them (same [[merge]] semantics as q20),
    *   4. writes the merged partitions to a staging root and swaps each
    *      partition directory in via rename-aside.
    *
    * IO per batch is proportional to the touched partitions, not the
    * table. Crash-safety is per-partition: every crash point leaves each
    * partition either fully old or fully new (see
    * [[recoverPartitionedMerge]]); a torn batch (some partitions swapped,
    * some not) is repaired by replaying the batch — the merge is
    * idempotent.
    *
    * REQUIREMENT: `partitionCol` must be stable per `pk` (a key never
    * moves between partitions). That is the standard contract for
    * partition-pruned merges — Delta users encode the same assumption
    * when they add a partition predicate to the merge condition. A moved
    * key would insert into its new partition and leave the stale row in
    * the old one.
    */
  def mergePartitionPruned(
      spark: org.apache.spark.sql.SparkSession,
      source: DataFrame,
      lakePath: String,
      pk: String,
      partitionCol: String
  ): DataFrame = {
    import org.apache.hadoop.fs.Path
    val live = new Path(lakePath)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ALL writers' recoveries: a crashed whole-table swap (compaction)
    // leaves the live dir absent — without repairing it first, the
    // hasData probe below would initial-load one batch as the table
    recoverAll(spark, lakePath)

    // The NULL guard runs BEFORE any branch: a null partition value
    // admitted at initial load would land in __HIVE_DEFAULT_PARTITION__
    // and (by the stable-partition contract) be un-upsertable forever.
    val touched = source.select(col(partitionCol)).distinct().collect().map(_.get(0))
    require(
      touched.forall(_ != null),
      s"mergePartitionPruned: NULL $partitionCol values in the batch (Hive layout cannot " +
        "address a null partition safely; route nulls to a sentinel value first)")

    // Spark's partition discovery ignores '_'/'.'-prefixed paths, so a
    // partition column producing such directory names can never be read
    // back — reject it up front rather than misclassify its data below.
    require(!partitionCol.startsWith("_") && !partitionCol.startsWith("."),
      s"mergePartitionPruned: partition column '$partitionCol' would produce " +
        "directories Spark's partition discovery ignores")

    // "Table exists" = has at least one partition directory (`col=value`,
    // excluding the `_old_` swap asides). A bare _SUCCESS marker (what a
    // zero-row partitioned write leaves — dynamic partitioning emits one
    // file per partition VALUE, so zero rows emit zero data files) must
    // not count: reading it back throws, and treating it as a live table
    // would wedge every later batch.
    def partitionDirs: Seq[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(live)) Nil
      else fs.listStatus(live).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isDirectory && n.contains("=") && !n.startsWith("_old_")
      }
    def hasData: Boolean = partitionDirs.nonEmpty
    // the ONLY directory state that may be silently cleared before an
    // initial load: writer residue invisible to Spark reads — '_'/'.'
    // prefixed entries, files OR directories (_SUCCESS markers, and the
    // _temporary dir a crashed initial write leaves; replaying that crash
    // must recover, not wedge). Anything Spark could actually read must
    // surface an error, never be deleted.
    def bareMarkerOnly: Boolean =
      fs.exists(live) && fs.listStatus(live).forall { st =>
        val n = st.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }

    // Read-back schema with the partition column PINNED to the source's
    // type. Bare partition-type inference corrupts non-canonical string
    // values ('01' infers as int 1, and the rewrite would emit a NEW p=1
    // directory alongside the replaced p=01); pinning makes the dir
    // string cast to the declared type instead. Built from a known schema
    // where one is available — footer inference re-lists the whole table,
    // which a metadata-scale merge must not do more than once per batch.
    def pinOf(sch: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
      val others = sch.fields.filterNot(_.name == partitionCol)
      val p = sch.fields.find(_.name == partitionCol)
        .getOrElse(source.schema(partitionCol))
      org.apache.spark.sql.types.StructType(
        others :+ p.copy(dataType = source.schema(partitionCol).dataType))
    }

    if (touched.isEmpty) {
      // empty batch: nothing to merge, and an initial load must NOT
      // create the unreadable zero-data-file directory described above
      return if (hasData)
        spark.read.schema(pinOf(spark.read.parquet(lakePath).schema)).parquet(lakePath)
      else dedupByKey(source, pk)
    }
    if (!hasData) {
      if (fs.exists(live)) {
        // the only state cleared silently is marker files alone; anything
        // else unrecognized is surfaced, never deleted
        require(bareMarkerOnly,
          s"mergePartitionPruned: $lakePath exists but contains no 'col=value' partition " +
            "directories and is not a bare marker dir — refusing to overwrite it")
        fs.delete(live, true)
      }
      dedupByKey(source, pk).write.mode("overwrite").partitionBy(partitionCol).parquet(lakePath)
      // the just-written table's schema is the (deduped) source's — no
      // footer inference needed
      return spark.read.schema(pinOf(source.schema)).parquet(lakePath)
    }

    // the scan prunes to the touched `col=value` directories — the only
    // table DATA IO this batch pays. ONE schema inference per batch, and
    // it must MERGE footers: partitions rewritten by earlier batches can
    // carry evolved columns, and a single arbitrary footer could miss one
    // — the subsequent pinned read would then silently drop that column
    // from the partitions this batch rewrites. (Footer reads are
    // distributed and tiny; the data scan below stays pruned.)
    val inferred = spark.read.option("mergeSchema", "true").parquet(lakePath).schema
    val existingTouched = spark.read.schema(pinOf(inferred)).parquet(lakePath)
      .where(col(partitionCol).isin(touched.toIndexedSeq: _*))
    val merged = merge(existingTouched, source, pk)

    val stagingRoot = new Path(lakePath + "_pstaging")
    merged.write.mode("overwrite").partitionBy(partitionCol).parquet(stagingRoot.toString)

    // Swap each staged partition dir into the live table. Dir names come
    // from the staging listing, so Hive value escaping is already done by
    // the writer; the rename-aside dirs get a '_' prefix, which partition
    // discovery ignores (same convention as _SUCCESS/_temporary).
    fs.listStatus(stagingRoot)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .foreach(st => swapPartitionDir(fs, live, st.getPath))
    fs.delete(stagingRoot, true)
    // post-swap files carry the merged schema — reuse it, don't re-infer
    spark.read.schema(pinOf(merged.schema)).parquet(lakePath)
  }

  /** Rename-aside swap of ONE staged partition directory into the live
    * table: live/p=v → live/_old_p=v, staging/p=v → live/p=v, delete the
    * aside. Same crash contract as [[swapInStaging]], at partition scope.
    */
  private def swapPartitionDir(
      fs: org.apache.hadoop.fs.FileSystem,
      liveTable: org.apache.hadoop.fs.Path,
      stagedPart: org.apache.hadoop.fs.Path
  ): Unit = {
    val name = stagedPart.getName
    val livePart = new org.apache.hadoop.fs.Path(liveTable, name)
    val aside = new org.apache.hadoop.fs.Path(liveTable, "_old_" + name)
    if (fs.exists(aside) && !fs.delete(aside, true))
      throw new java.io.IOException(s"swapPartitionDir: could not clear stale aside $aside")
    val hadLive = fs.exists(livePart)
    if (hadLive && !fs.rename(livePart, aside)) {
      // partition intact; the batch will replay and recompute staging —
      // drop the superseded staged copy so recovery can never restore it
      fs.delete(stagedPart, true)
      throw new java.io.IOException(
        s"swapPartitionDir: rename $livePart -> $aside failed; partition untouched")
    }
    if (!fs.rename(stagedPart, livePart)) {
      val rolledBack = hadLive && fs.rename(aside, livePart)
      if (rolledBack) fs.delete(stagedPart, true)
      throw new java.io.IOException(
        s"swapPartitionDir: rename $stagedPart -> $livePart failed; " +
          (if (rolledBack) "previous partition restored"
           else if (hadLive) s"MANUAL RECOVERY NEEDED: previous data at $aside, new at $stagedPart"
           else s"no previous partition existed; new data remains at $stagedPart"))
    }
    fs.delete(aside, true) // best effort; recovery deletes a leftover aside
  }

  /** Repair a [[mergePartitionPruned]] interrupted mid-swap. Per
    * partition, in preference order: a staged copy with no live dir is
    * the fully-written replacement (staging is complete before any swap
    * starts) — rename it in; an `_old_` aside with no live dir is the
    * pre-merge table stranded between the two renames — restore it; an
    * aside WITH a live dir is a completed swap's leftover — delete it.
    * Remaining staged dirs duplicate already-swapped partitions or belong
    * to a batch the caller will replay; the staging root is dropped.
    * Returns true if anything was repaired.
    */
  def recoverPartitionedMerge(
      spark: org.apache.spark.sql.SparkSession,
      lakePath: String
  ): Boolean = {
    import org.apache.hadoop.fs.Path
    val live = new Path(lakePath)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var acted = false
    val stagingRoot = new Path(lakePath + "_pstaging")
    if (fs.exists(stagingRoot)) {
      fs.listStatus(stagingRoot)
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .foreach { st =>
          val target = new Path(live, st.getPath.getName)
          if (!fs.exists(target)) {
            if (!fs.rename(st.getPath, target))
              throw new java.io.IOException(
                s"recoverPartitionedMerge: rename ${st.getPath} -> $target failed")
            acted = true
          }
        }
      fs.delete(stagingRoot, true)
    }
    if (fs.exists(live)) {
      fs.listStatus(live)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("_old_"))
        .foreach { st =>
          val target = new Path(live, st.getPath.getName.stripPrefix("_old_"))
          if (!fs.exists(target)) {
            if (!fs.rename(st.getPath, target))
              throw new java.io.IOException(
                s"recoverPartitionedMerge: rename ${st.getPath} -> $target failed")
            acted = true
          } else {
            fs.delete(st.getPath, true) // completed swap's leftover aside
            acted = true
          }
        }
    }
    acted
  }

  /** Swap a fully-written staging directory into the live table path via
    * rename-aside: live → live`_old`, staging → live, delete `_old`. A
    * plain delete-then-rename leaves NO copy of the table if the process
    * dies between the two steps; here every crash point leaves either the
    * old table in place (before step 2) or the new one live, and a
    * leftover `_old`/`_staging` directory is always a complete table, so
    * recovery is a rename. (A table format's transaction log would make
    * the flip truly atomic; this is the best a plain filesystem offers.)
    */
  def swapInStaging(
      spark: org.apache.spark.sql.SparkSession,
      livePath: String,
      stagingPath: String
  ): Unit = {
    val live = new org.apache.hadoop.fs.Path(livePath)
    val staging = new org.apache.hadoop.fs.Path(stagingPath)
    val old = new org.apache.hadoop.fs.Path(livePath + "_old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Hadoop rename signals most failures by RETURNING FALSE, not
    // throwing — an unchecked rename would either bury staging inside a
    // still-present live dir or delete the only surviving copy below.
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"swapInStaging: could not clear stale backup $old")
    val hadLive = fs.exists(live)
    if (hadLive && !fs.rename(live, old)) {
      // the live table is intact and the caller will retry (recomputing
      // staging), so the staging dir is superseded data — leaving it
      // behind would let a LATER crash recovery restore this stale copy
      // over a newer table (recoverInterruptedSwap globs _staging*)
      fs.delete(staging, true)
      throw new java.io.IOException(
        s"swapInStaging: rename $live -> $old failed; table untouched at $live")
    }
    if (!fs.rename(staging, live)) {
      // roll the old table back into place so readers never see a gap
      val rolledBack = hadLive && fs.rename(old, live)
      // same reasoning as above: once the previous table is restored the
      // staging copy is superseded (the failed batch replays) — but if
      // rollback ALSO failed, staging may be the only complete copy; keep it
      if (rolledBack) fs.delete(staging, true)
      throw new java.io.IOException(
        s"swapInStaging: rename $staging -> $live failed; " +
          (if (rolledBack) s"previous table restored at $live"
           else if (hadLive) s"MANUAL RECOVERY NEEDED: previous table at $old, new data at $staging"
           else s"no previous table existed; new data remains at $staging"))
    }
    fs.delete(old, true) // best effort; a leftover _old is a complete old copy
  }

  /** Recover from a crash that interrupted [[swapInStaging]]: if the live
    * path is missing but a complete `_old` (pre-swap table) or `_staging`
    * (fully-written replacement) directory survives, rename it back into
    * place. Callers that treat "live path absent" as "table empty" MUST
    * run this first — otherwise a replayed batch silently re-initializes
    * the table from one micro-batch and strands the full history in the
    * leftover directory. Returns true if a recovery rename happened.
    */
  def recoverInterruptedSwap(
      spark: org.apache.spark.sql.SparkSession,
      livePath: String
  ): Boolean = {
    val live = new org.apache.hadoop.fs.Path(livePath)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(live)) return false
    // Prefer the NEWEST surviving copy. A lexicographic "first staging
    // match" is wrong twice over: leftover staging dirs from older
    // rolled-back batches would win over the batch that actually crashed
    // mid-swap, and "_staging_10" sorts before "_staging_9". Rank all
    // candidates by modification time (directory mtimes survive rename on
    // every Hadoop FS we target), breaking ties in favor of staging —
    // staging holds post-merge data, _old the pre-merge table.
    val stagings = Option(fs.globStatus(new org.apache.hadoop.fs.Path(livePath + "_staging*")))
      .map(_.toSeq).getOrElse(Nil)
    val olds = Option(fs.globStatus(new org.apache.hadoop.fs.Path(livePath + "_old")))
      .map(_.toSeq).getOrElse(Nil)
    val ranked = (stagings.map(st => (st, 1)) ++ olds.map(st => (st, 0)))
      .sortBy { case (st, isStaging) => (-st.getModificationTime, -isStaging) }
    ranked.headOption match {
      case Some((src, _)) =>
        if (!fs.rename(src.getPath, live))
          throw new java.io.IOException(
            s"recoverInterruptedSwap: rename ${src.getPath} -> $live failed")
        true
      case None => false
    }
  }

  /** One row per key, deterministically (greatest full-row struct wins). */
  def dedupByKey(df: DataFrame, pk: String): DataFrame = {
    val others = df.columns.filterNot(_ == pk)
    if (others.isEmpty) df.distinct()
    else {
      val packed = df
        .groupBy(col(pk))
        .agg(max(struct(others.map(col).toIndexedSeq: _*)).as("_row"))
      packed.select(col(pk) +: others.map(c => col(s"_row.$c").as(c)): _*)
    }
  }

  /** SNAPSHOT DIFF: the audit face of [[merge]] — which unique-keyed
    * rows were `added`, `removed`, or `changed` between two versions of
    * a table ("what did last night's MERGE actually do?" /
    * "reconcile the lake copy against the source extract"). Unchanged
    * rows are dropped: the output is the delta, metadata-scale when the
    * change rate is.
    *
    * Change detection is an md5 digest of the compared columns
    * (joined on the 0x01 control byte, nulls as a 0x00 sentinel —
    * bytes that never occur in printable column text, so adjacent
    * columns cannot collude to fake a match; values cast to string the
    * way both engines print them) — so the full-outer join carries
    * ONE 32-char digest per side instead of every compared column
    * twice, and the comparison is row-local.
    *
    * Scale shape: digest projection is row-local; the full-outer join
    * shuffles both sides on the key ONCE (co-partitioned, AQE-sized) —
    * the same plan [[merge]] uses, so a lake that bucketed its tables
    * for merging diffs shuffle-free too. Keys must be unique per side
    * (the merge precondition); duplicate keys make "changed" ambiguous.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      compareCols: Seq[String]
  ): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff: no columns to compare")
    require(!compareCols.contains(keyCol),
      s"snapshotDiff: key column $keyCol cannot also be compared")
    val reserved = Seq("_od", "_nd", "change_type")
    require(reserved.forall(c => !oldDf.columns.contains(c) && !newDf.columns.contains(c)),
      s"snapshotDiff: reserved working column already exists (${reserved.mkString(", ")})")
    def digest(df: DataFrame, as: String): DataFrame =
      df.select(
        col(keyCol),
        md5(concat_ws("\u0001",
          compareCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(as))
    digest(oldDf, "_od")
      .join(digest(newDf, "_nd"), Seq(keyCol), "full_outer")
      .where(col("_od").isNull || col("_nd").isNull || col("_od") =!= col("_nd"))
      .select(
        col(keyCol),
        when(col("_od").isNull, "added")
          .when(col("_nd").isNull, "removed")
          .otherwise("changed")
          .as("change_type"))
  }
}
