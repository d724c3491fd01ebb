package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
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

  /** Collision-resistant commitId namespace for a checkpoint path: md5
    * hex of the path (stable across JVMs, so a restarted stream
    * regenerates the same prefix and replay detection holds). A 32-bit
    * `String.hashCode` here could collide two DIFFERENT checkpoints
    * maintaining the same index — their batch ids both restart at 0, so
    * a collision makes one stream's batches silently skip as
    * already-committed under the other's markers.
    */
  private def ckNamespace(checkpoint: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
    "s" + d.map("%02x".format(_)).mkString
  }

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
        upsertBatch(spark, batch, pk, targetPath, batchId): Unit
      }
      .start()

  /** [[upsertStream]] for a Hive-partitioned target: each micro-batch is
    * merged through `Incremental.mergePartitionPruned`, so per-batch IO is
    * proportional to the partitions the batch touches, not the table —
    * the shape that survives a 100 TB target. Same per-partition
    * crash-safety as the batch path (recovery runs inside the merge).
    */
  def upsertStreamPartitioned(
      spark: SparkSession,
      source: DataFrame,
      pk: String,
      partitionCol: String,
      targetPath: String,
      checkpoint: String
  ): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Incremental.mergePartitionPruned(spark, batch, targetPath, pk, partitionCol): Unit
      }
      .start()

  /** [[upsertStream]] for an UNPARTITIONED, PK-range-clustered target:
    * each micro-batch merges through `FileMerge.mergeFileGranular`, so
    * per-batch IO is proportional to the FILES whose key range the batch
    * intersects — the finest granularity available without a table
    * format, and the right shape when the target has no natural
    * partition column. Replay-safe twice over: a batch recorded in the
    * `_commits` ledger is skipped outright ([[upsertBatchFileGranular]]),
    * and an unrecorded replay re-merges idempotently.
    */
  def upsertStreamFileGranular(
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
        upsertBatchFileGranular(spark, batch, pk, targetPath, batchId): Unit
      }
      .start()

  /** Streaming maintenance of a persisted IVF index
    * ([[graft.operators.Similarity.ivfBuild]] layout): each micro-batch
    * of NEW vectors is assigned under the index's STORED centroids and
    * appended exactly-once — the micro-batch id becomes the append's
    * `commitId`, so a redelivered batch (restart between the append
    * commit and the checkpoint write, or even a LOST checkpoint
    * replaying the whole stream) is detected by its replay marker and
    * writes nothing. The id is namespaced by a checkpoint-derived
    * prefix: batch ids restart at 0 per checkpoint, and two sequential
    * streams with different checkpoints must not shadow each other's
    * markers. Single writer per index, like every staged commit here;
    * run [[graft.operators.Similarity.ivfCompact]] only between streams
    * — it is a whole-table rewrite and drops the replay markers.
    */
  def appendStreamIvf(
      spark: SparkSession,
      source: DataFrame,
      idCol: String,
      vecCol: String,
      indexPath: String,
      checkpoint: String,
      filesPerBatch: Int = 0
  ): StreamingQuery = {
    val prefix = ckNamespace(checkpoint)
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity.ivfAppend(
          spark, batch, idCol, vecCol, indexPath,
          files = filesPerBatch, commitId = Some(s"${prefix}_b$batchId")): Unit
      }
      .start()
  }

  /** Streaming maintenance of a persisted IVF-PQ index
    * ([[graft.operators.Similarity.ivfPqBuild]] layout): each
    * micro-batch of NEW vectors is coarse-assigned under the STORED
    * centroids, coded under the STORED codebook, and appended
    * exactly-once — the identical checkpoint-namespaced commitId
    * protocol as [[appendStreamIvf]] (replayed batches, or a whole
    * stream replayed after a LOST checkpoint, hit their markers and
    * write nothing). Single writer per index; run
    * [[graft.operators.Similarity.ivfCompact]] only between streams.
    */
  def appendStreamIvfPq(
      spark: SparkSession,
      source: DataFrame,
      idCol: String,
      vecCol: String,
      indexPath: String,
      checkpoint: String,
      filesPerBatch: Int = 0
  ): StreamingQuery = {
    val prefix = ckNamespace(checkpoint)
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity.ivfPqAppend(
          spark, batch, idCol, vecCol, indexPath,
          files = filesPerBatch, commitId = Some(s"${prefix}_b$batchId")): Unit
      }
      .start()
  }

  /** Streaming maintenance of a persisted INVERTED INDEX
    * ([[graft.operators.Invert.writeIndex]] layout): each micro-batch of
    * newly ingested documents is tokenized into posting rows and
    * appended exactly-once via [[graft.operators.Invert.appendToIndex]]
    * — the same checkpoint-namespaced micro-batch commitId protocol as
    * [[appendStreamIvf]], so a redelivered batch (restart between the
    * append commit and the checkpoint write) hits its replay marker and
    * writes nothing. Lost-checkpoint recovery is exact ONLY while the
    * input file set is unchanged: batch ids restart at 0 and each
    * rebatched batch hits its marker. If NEW input arrived after the
    * checkpoint was lost, the restarted batches mix already-indexed and
    * new documents under already-committed batch ids — the marker probe
    * then skips the new documents too. After checkpoint loss with new
    * input, rebuild via [[graft.operators.Invert.writeIndex]] (or
    * resume from a fresh checkpoint whose prefix namespaces new ids).
    * The index's doc-range sharding makes each append PURE new files
    * (strictly increasing doc ids per the ingest contract, checked
    * against the footer-level `max_doc` watermark before any write);
    * searches stay live throughout — appends never rewrite existing
    * postings. Rebuild with `writeIndex` between streams to restore
    * disjoint per-file term ranges.
    */
  def appendStreamIndex(
      spark: SparkSession,
      source: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      checkpoint: String,
      blockDocs: Long = 4096L,
      filesPerBatch: Int = 0
  ): StreamingQuery = {
    val prefix = ckNamespace(checkpoint)
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.Invert.appendToIndex(
            spark, batch, idCol, textCol, indexPath, blockDocs,
            files = filesPerBatch, commitId = Some(s"${prefix}_b$batchId")): Unit
      }
      .start()
  }

  /** Streaming corpus ingestion with dedup AT THE DOOR: each micro-batch
    * of documents is reduced to its novel survivors — exact duplicates
    * and near-duplicates dropped both WITHIN the batch and AGAINST the
    * already-ingested corpus — and only the survivors are appended to the
    * parquet corpus at `targetPath`. This is the production shape of
    * "continuously crawl → dedup against the lake → keep what's new":
    * the corpus never self-joins (its bands stream past the BROADCAST
    * batch bands, [[graft.operators.Dedup.incrementalNearDupMd5]]), so
    * per-batch cost is a corpus digest scan plus one corpus shingle
    * scan (cached for the banding/rescore passes within the batch, then
    * RELEASED — every cache this loop creates is unpersisted at the end
    * of its micro-batch, so the loop runs indefinitely without
    * accumulating executor storage) plus batch-scale shuffles,
    * regardless of corpus size. Exactly-once via the `_commits` ledger;
    * single writer per corpus, like every staged commit here. Ids must
    * be globally unique across the stream AND disjoint from ingested
    * ids (the banding join relies on it).
    */
  def ingestStreamDeduped(
      spark: SparkSession,
      source: DataFrame,
      idCol: String,
      textCol: String,
      targetPath: String,
      checkpoint: String,
      n: Int = 3,
      threshold: Double = 0.8
  ): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchDeduped(spark, batch, idCol, textCol, targetPath, batchId, n, threshold): Unit
      }
      .start()

  /** One micro-batch of [[ingestStreamDeduped]]; also usable directly as
    * a batch "ingest if novel" operator.
    *
    * Survivor semantics (C4-style greedy, deterministic): exact dups keep
    * the min id; within-batch near-dup clusters keep the min-id member
    * ([[graft.operators.Dedup.dedupByPairs]]); any batch doc whose text
    * exactly matches the corpus or near-dups it (word-`n`-gram Jaccard >=
    * `threshold` via md5 MinHash banding) is dropped. A doc whose only
    * within-batch match was itself dropped against the corpus still
    * drops — it is transitively a dup of corpus content. Docs too short
    * to shingle (< `n` tokens) skip the banding but are still covered by
    * the exact-digest guard, so they ingest once and never twice.
    *
    * Commit protocol: survivors are staged beside the corpus, data files
    * are MOVED in under batch-tagged names (Spark part names carry a task
    * UUID, so a replayed attempt cannot collide with files an earlier
    * crashed attempt already moved), and the ledger commits last. A
    * replayed id in the ledger returns false having written nothing. A
    * crash mid-move is healed by the replay itself: the docs already
    * moved in ARE corpus now, so the deterministic recompute drops
    * exactly them (digest + banding guards) and appends only the docs the
    * crash lost — per-document exactly-once without a swap of the
    * (append-only, arbitrarily large) corpus directory.
    */
  def ingestBatchDeduped(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      targetPath: String,
      batchId: Long,
      n: Int = 3,
      threshold: Double = 0.8,
      bands: Int = 8,
      rowsPerBand: Int = 2
  ): Boolean = {
    import graft.operators.Dedup
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Incremental.recoverAll(spark, targetPath)
    val committed = readLedger(fs, target)
    if (committed.contains(batchId)) return false

    // within-batch: exact survivors, then near-dup cluster survivors.
    // `inner` is cached HERE and every cache this batch creates —
    // including the novelty filter's internal shingle tables, via its
    // release handle — is unpersisted in the finally below, so this
    // long-lived loop gets the cached-reuse plan per micro-batch
    // WITHOUT accumulating corpus-scale blocks in executor storage.
    val exact = Dedup.exactDedup(batch, idCol, textCol)
    val innerPairs =
      Dedup.minhashLshPairsMd5(exact, idCol, textCol, n, threshold, bands, rowsPerBand)
    val inner = Dedup.dedupByPairs(exact, idCol, innerPairs).persist()

    val hasData = fs.exists(target) &&
      fs.listStatus(target).exists(!_.getPath.getName.startsWith("_"))
    val (survivors, release) =
      if (!hasData) (inner, () => ())
      else
        // the novelty filter's digest-before-banding ordering is the
        // crash-replay keystone: docs an earlier crashed attempt already
        // MOVED into the corpus are dropped from the batch before the
        // banding join, so the replay re-enters the incremental join
        // with disjoint id spaces (see Dedup.noveltyFilter)
        Dedup.noveltyFilterManaged(
          spark.read.parquet(targetPath), inner, idCol, textCol,
          n, threshold, bands, rowsPerBand)

    val staged = survivors.persist()
    try {
      if (staged.count() > 0) {
        val staging = new Path(targetPath + s"_ingest_staging_$batchId")
        fs.delete(staging, true) // orphan of a crashed earlier attempt
        staged.write.mode("overwrite").parquet(staging.toString)
        if (!fs.exists(target)) fs.mkdirs(target)
        fs.listStatus(staging)
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
          .foreach { st =>
            val dest = new Path(target, s"ingest_${batchId}_${st.getPath.getName}")
            if (!fs.rename(st.getPath, dest))
              throw new java.io.IOException(s"ingest commit: could not move ${st.getPath} to $dest")
          }
        fs.delete(staging, true)
      } else if (!fs.exists(target)) fs.mkdirs(target)
    } finally {
      staged.unpersist()
      inner.unpersist()
      release()
    }
    writeLedger(fs, target, committed.add(batchId))
    true
  }

  /** Snapshot (time-travel) read of a deduped-ingest corpus AS OF a
    * batch id: [[ingestBatchDeduped]]'s commit protocol names every data
    * file `ingest_<batchId>_<uuid>`, so "the corpus as batch N left it"
    * is a file-name filter — time travel from the append-only layout
    * alone, no table format or manifest required (what a Delta
    * `versionAsOf` read provides, recovered here from the naming
    * convention because files are only ever ADDED under a
    * monotonically-committed batch id). Files not written by the ingest
    * protocol (a pre-existing corpus the stream appended onto) carry no
    * batch tag and belong to every snapshot. Metadata-scale: one
    * directory listing; the read plans only the selected files.
    */
  def corpusAsOf(spark: SparkSession, targetPath: String, maxBatchId: Long): DataFrame = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Incremental.recoverAll(spark, targetPath)
    // refuse, never fabricate: below the squash floor the per-batch
    // files no longer exist, so a filter there would silently return a
    // WRONG snapshot (the squashed base aggregates every batch <= floor)
    val floor = readAsOfFloor(fs, target)
    require(
      maxBatchId >= floor,
      s"corpusAsOf: history below batch $floor of $targetPath was squashed by " +
        s"compactIngestCorpus — snapshot $maxBatchId is no longer reconstructible")
    val selected = fs.listStatus(target)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .map(_.getPath)
      .filter(p => batchTagOf(p.getName).forall(_ <= maxBatchId))
    if (selected.isEmpty) spark.read.parquet(targetPath).where(lit(false))
    else spark.read.parquet(selected.map(_.toString).toIndexedSeq: _*)
  }

  /** Batch id carried by an ingest-protocol file name
    * (`ingest_<batchId>_<uuid>`), None for files written by any other
    * writer (they belong to every snapshot).
    */
  private def batchTagOf(name: String): Option[Long] =
    if (!name.startsWith("ingest_")) None
    else name.stripPrefix("ingest_").takeWhile(_.isDigit) match {
      case "" => None
      case d => Some(d.toLong)
    }

  /** Time-travel floor marker: after [[compactIngestCorpus]] squashes
    * batches <= B into the base, snapshots below B are gone; this
    * `_`-prefixed file records B so [[corpusAsOf]] refuses them instead
    * of silently returning the squashed base as if it were history.
    */
  private val AsOfFloor = "_asof_floor"

  private def readAsOfFloor(fs: org.apache.hadoop.fs.FileSystem, table: Path): Long = {
    val p = new Path(table, AsOfFloor)
    if (!fs.exists(p)) Long.MinValue
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** Small-file compaction for a DEDUPED-INGEST corpus — the ingest
    * analogue of [[graft.sources.Lake.compact]], which refuses these
    * tables because a name-blind rewrite would strip the
    * `ingest_<batch>_` tags [[corpusAsOf]] filters on (every snapshot
    * would silently become the full corpus) and drop the `_commits`
    * ledger (every batch would replay).
    *
    * This one is batch-aware: files of batches <= `upToBatchId` (plus
    * any untagged pre-ingest base, which belongs to every snapshot)
    * are squashed into `ceil(bytes / targetFileBytes)` files tagged
    * `ingest_<upToBatchId>_` — so every snapshot AT or ABOVE the squash
    * point reads exactly what it read before — while newer batches keep
    * their per-batch files and stay individually time-travelable. The
    * squash point is recorded in the `_asof_floor` marker and
    * [[corpusAsOf]] refuses snapshots below it: squashed history is
    * DECLARED gone, never silently wrong (the same trade a table
    * format's checkpoint-plus-vacuum makes). The `_commits` ledger
    * rides along, so redelivered batch ids still skip.
    *
    * Crash-safe via the same staging swap as every whole-table writer
    * here ([[graft.operators.Incremental.swapInStaging]]): kept batch
    * files are COPIED into staging (the live table stays intact until
    * the atomic flip), so size `upToBatchId` near the head of the
    * stream — the copy cost is the unsquashed tail, the rewrite cost
    * the squashed base. Single writer per corpus, as everywhere.
    *
    * Returns the number of squashed base files written.
    */
  def compactIngestCorpus(
      spark: SparkSession,
      targetPath: String,
      upToBatchId: Long,
      targetFileBytes: Long = 128L * 1024 * 1024
  ): Int = {
    require(upToBatchId >= 0, s"upToBatchId must be a committed batch id, got $upToBatchId")
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val target = new Path(targetPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = target.getFileSystem(conf)
    Incremental.recoverAll(spark, targetPath)
    val files = fs.listStatus(target)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
    val (squash, keep) =
      files.partition(st => batchTagOf(st.getPath.getName).forall(_ <= upToBatchId))
    if (squash.isEmpty) return 0
    val newFloor = math.max(upToBatchId, readAsOfFloor(fs, target))
    val staging = new Path(targetPath + "_staging_compactingest")
    fs.delete(staging, true) // orphan of a crashed earlier attempt
    val bytes = squash.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(squash.map(_.getPath.toString).toIndexedSeq: _*)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(staging.toString)
    // tag the squashed base with the squash-point id: member of every
    // snapshot >= upToBatchId, and snapshots below are floor-refused
    fs.listStatus(staging)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .foreach { st =>
        val dest = new Path(staging, s"ingest_${upToBatchId}_${st.getPath.getName}")
        if (!fs.rename(st.getPath, dest))
          throw new java.io.IOException(s"compactIngestCorpus: rename ${st.getPath} -> $dest failed")
      }
    // COPY (not move) newer batches and the ledger: live must stay
    // complete until the swap flips
    keep.foreach { st =>
      val dest = new Path(staging, st.getPath.getName)
      if (!org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs, dest, false, conf))
        throw new java.io.IOException(s"compactIngestCorpus: copy ${st.getPath} -> $dest failed")
    }
    val ledger = new Path(target, CommitsLedger)
    if (fs.exists(ledger)) {
      val dest = new Path(staging, CommitsLedger)
      if (!org.apache.hadoop.fs.FileUtil.copy(fs, ledger, fs, dest, false, conf))
        throw new java.io.IOException(s"compactIngestCorpus: copy $ledger -> $dest failed")
    }
    val out = fs.create(new Path(staging, AsOfFloor), true)
    try out.write(s"$newFloor\n".getBytes("UTF-8"))
    finally out.close()
    Incremental.swapInStaging(spark, targetPath, staging.toString)
    nFiles
  }

  /** Name of the committed-batch ledger inside the table directory.
    * `_`-prefixed, so Spark parquet reads never see it as data.
    */
  private val CommitsLedger = "_commits"

  /** Committed-batch set with a FLOOR: every id <= `floor` is committed,
    * plus the explicit ids above it. Streaming batch ids are contiguous
    * (0, 1, 2, ...), so [[compacted]] folds them into the floor and the
    * ledger file stays O(1) over a stream's lifetime instead of growing
    * (and being reparsed) per batch forever. The floor only ever
    * advances through a CONTIGUOUS run — skipping a gap would mark a
    * never-applied id as committed and silently drop its batch, so
    * non-contiguous (manual) id schemes degrade to explicit ids, never
    * to wrong skips.
    */
  private[streaming] final case class CommitLedger(floor: Long, ids: Set[Long]) {
    def contains(id: Long): Boolean = id <= floor || ids(id)
    def add(id: Long): CommitLedger = copy(ids = ids + id)
    def compacted: CommitLedger = {
      var f = floor
      while (ids.contains(f + 1)) f += 1
      CommitLedger(f, ids.filter(_ > f))
    }
  }

  private def readLedger(fs: org.apache.hadoop.fs.FileSystem, table: Path): CommitLedger = {
    val ledger = new Path(table, CommitsLedger)
    if (!fs.exists(ledger)) CommitLedger(-1L, Set.empty)
    else {
      val in = fs.open(ledger)
      val lines =
        try new String(in.readAllBytes(), "UTF-8").split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
        finally in.close()
      val floor = lines.collectFirst { case l if l.startsWith("floor:") => l.stripPrefix("floor:").toLong }
      CommitLedger(floor.getOrElse(-1L), lines.filterNot(_.startsWith("floor:")).map(_.toLong).toSet)
    }
  }

  private def writeLedger(
      fs: org.apache.hadoop.fs.FileSystem,
      table: Path,
      ledger: CommitLedger
  ): Unit = {
    val c = ledger.compacted
    val tmp = new Path(table, CommitsLedger + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(
      (s"floor:${c.floor}" +: c.ids.toSeq.sorted.map(_.toString))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val target = new Path(table, CommitsLedger)
    // rename-over-existing returns false on most Hadoop FSs: clear first.
    // A crash between delete and rename loses the ledger — replayed
    // batches then re-merge, which is idempotent (degraded, not wrong).
    if (fs.exists(target) && !fs.delete(target, false))
      throw new java.io.IOException(s"writeLedger: could not clear $target")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"writeLedger: could not publish $target")
  }

  /** One micro-batch of the upsert; also usable directly in tests.
    *
    * EXACTLY-ONCE, not just replay-idempotent: committed batch ids live
    * in a `_commits` ledger file INSIDE the table directory, and each
    * batch writes the updated ledger (including its own id) into the
    * staging copy BEFORE the swap — the swap rename is the single commit
    * point covering data and ledger together. A redelivered batch whose
    * id is already in the ledger returns false having written NOTHING
    * (the merge-recompute-and-swap of the pre-ledger design is skipped
    * entirely). A crash before the swap leaves the old table + old
    * ledger, so the replay re-executes; a crash after the swap leaves
    * the id committed, so the replay is a no-op. Writers that rebuild
    * the directory wholesale without carrying `_`-files forward (e.g. a
    * compaction) drop the ledger — replayed batches then fall back to
    * the idempotent re-merge, degraded but never wrong.
    */
  def upsertBatch(
      spark: SparkSession,
      batch: DataFrame,
      pk: String,
      targetPath: String,
      batchId: Long
  ): Boolean = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // EVERY writer's recovery, not just the swap's: a crash between swap
    // renames leaves the table only in _old/_staging (one replayed batch
    // would silently become the whole table), and a torn file-granular
    // merge hides rows in _-prefixed asides this read would skip
    Incremental.recoverAll(spark, targetPath)
    val committed = readLedger(fs, target)
    if (committed.contains(batchId)) return false
    val hasData = fs.exists(target) && fs.listStatus(target).nonEmpty
    val merged =
      // schema-merging read: the target may carry heterogeneous footers
      // (an evolved file-granular merge ran on it earlier), and this
      // path rewrites the WHOLE table — a single-footer read here would
      // make the dropped column permanent
      if (hasData) Incremental.merge(Incremental.readEvolved(spark, targetPath), batch, pk)
      else Incremental.dedupByKey(batch, pk)
    val staging = targetPath + s"_staging_$batchId"
    merged.write.mode("overwrite").parquet(staging)
    writeLedger(fs, new Path(staging), committed.add(batchId))
    Incremental.swapInStaging(spark, targetPath, staging)
    true
  }

  /** [[upsertBatch]]'s exactly-once skip for the FILE-granular merge
    * path ([[upsertStreamFileGranular]]): same `_commits` ledger, but
    * the merge commits file-by-file in place (no whole-directory swap to
    * piggyback on), so the ledger is updated AFTER the merge's own
    * manifest commit. A crash in between re-executes the merge on replay
    * — idempotent, so the effect is still exactly-once; a recorded id
    * skips the batch with zero file writes.
    */
  def upsertBatchFileGranular(
      spark: SparkSession,
      batch: DataFrame,
      pk: String,
      targetPath: String,
      batchId: Long
  ): Boolean = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // EVERY writer's recovery BEFORE the ledger read: after a crashed
    // whole-table swap (compaction) the table — ledger included — sits
    // in _staging/_old; a file-merge-only repair would read an absent
    // ledger here and the final writeLedger would then overwrite the
    // recovered one with a single id, discarding committed history
    Incremental.recoverAll(spark, targetPath)
    val committed = readLedger(fs, target)
    if (committed.contains(batchId)) return false
    graft.operators.FileMerge.mergeFileGranular(spark, batch, targetPath, pk)
    writeLedger(fs, target, committed.add(batchId))
    true
  }

  /** Streaming exact dedup on key columns: a row is dropped if its key
    * was already seen. With an event-time column + watermark the dedup
    * state is BOUNDED (`dropDuplicatesWithinWatermark` — keys expire once
    * the watermark passes them, the only shape that survives an unbounded
    * stream); without one it falls back to unbounded-state
    * `dropDuplicates` (exact-forever semantics, only for finite replays).
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: Option[String] = None,
      watermark: String = "10 minutes"
  ): DataFrame =
    eventTimeCol match {
      case Some(tc) =>
        events.withWatermark(tc, watermark).dropDuplicatesWithinWatermark(keyCols)
      case None => events.dropDuplicates(keyCols)
    }

  /** Streaming input row for [[sessionizeStream]]. */
  final case class SessionEvent(user_id: Long, sec: Long, value: Double)

  /** Open-session state carried between micro-batches, one per key. */
  final case class SessionState(startSec: Long, lastSec: Long, nEvents: Long, valueSum: Double)

  /** A closed session (same shape as the batch `Sessions.byGap` output). */
  final case class SessionOut(
      user_id: Long,
      session_start_sec: Long,
      n_events: Long,
      duration_sec: Long,
      value_sum: Double
  )

  /** Gap-based sessionization with CUSTOM state —
    * `flatMapGroupsWithState` keeps one open session per user across
    * micro-batches and emits a session row as soon as a later event
    * proves the gap elapsed, or when the event-time timeout fires (state
    * expires `gapSec` past the watermark). This is the streaming
    * counterpart of the batch `operators.Sessions.byGap` (q35): identical
    * session boundaries, but incremental, with state bounded by the
    * number of concurrently-open sessions — the 100 TB stream shape.
    */
  def sessionizeStream(
      events: Dataset[SessionEvent],
      gapSec: Long
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def close(uid: Long, s: SessionState): SessionOut =
      SessionOut(uid, s.startSec, s.nEvents, s.lastSec - s.startSec, s.valueSum)

    def fold(
        uid: Long,
        rows: Iterator[(Long, Long, Double, java.sql.Timestamp)],
        state: GroupState[SessionState]
    ): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(uid, _)).iterator
        state.remove()
        return out
      }
      val closed = Seq.newBuilder[SessionOut]
      var cur = state.getOption
      rows.map(t => SessionEvent(t._1, t._2, t._3)).toSeq.sortBy(e => (e.sec, e.value)).foreach {
        e =>
          cur match {
            case Some(s) if e.sec - s.lastSec <= gapSec =>
              // a cross-batch LATE event (e.sec < state's lastSec) must
              // extend the session's bounds, never move them backwards —
              // a regressed lastSec would shrink the timeout and emit
              // negative durations
              cur = Some(SessionState(
                math.min(s.startSec, e.sec), math.max(s.lastSec, e.sec),
                s.nEvents + 1, s.valueSum + e.value))
            case Some(s) =>
              closed += close(uid, s)
              cur = Some(SessionState(e.sec, e.sec, 1, e.value))
            case None =>
              cur = Some(SessionState(e.sec, e.sec, 1, e.value))
          }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          // expire once no in-gap event can still arrive (event-time
          // clock); clamped above the current watermark — a session that
          // is already expired by this batch's watermark fires next batch
          state.setTimeoutTimestamp(
            math.max((s.lastSec + gapSec) * 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
        case None => state.remove()
      }
      closed.result().iterator
    }

    // the watermarked event_ts column must survive up to the stateful
    // operator (a map that drops it would disable event-time timeouts)
    events
      .withColumn("event_ts", timestamp_seconds(col("sec")))
      .withWatermark("event_ts", "0 seconds")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Run [[sessionizeStream]] over a FINITE streaming input end-to-end
    * and hand back the closed sessions as a batch DataFrame — the
    * harness that lets the driver's SQL oracle gate the STREAMING
    * engine against the batch `Sessions.byGap` semantics (q124).
    *
    * `events` must be a streaming DataFrame with exactly
    * `(user_id LONG, sec LONG, value DOUBLE)`. Because the stream is
    * finite, the last open session per user would otherwise sit in
    * state forever (event-time timeouts only fire once the watermark
    * passes them, and the watermark only moves when data arrives): a
    * single far-future sentinel event for the reserved `user_id = -1`
    * is unioned in, the final no-data micro-batch fires every real
    * session's timeout, and the sentinel's own — still open — session
    * is the one row never emitted. Output goes through a parquet SINK,
    * not the driver (memory-sink would collect every session row onto
    * the driver — at 100 TB that is the job's output, not a result
    * set), and is read back as the returned DataFrame.
    */
  def replaySessionize(
      events: DataFrame,
      gapSec: Long,
      sentinelSec: Long,
      statePartitions: Option[Int] = None
  ): DataFrame = {
    require(events.isStreaming, "replaySessionize: events must be a streaming DataFrame")
    val spark = events.sparkSession
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sess_replay").toString
    val sentDir = s"$base/sentinel"
    val outDir = s"$base/out"
    val ckptDir = s"$base/ckpt"
    Seq((-1L, sentinelSec, 0.0)).toDF("user_id", "sec", "value")
      .coalesce(1).write.parquet(sentDir)
    val sentinel = spark.readStream
      .schema(spark.read.parquet(sentDir).schema)
      .parquet(sentDir)
    val sessions = sessionizeStream(
      events.unionByName(sentinel).as[SessionEvent], gapSec)
    drainToParquet(sessions.toDF(), outDir, ckptDir, statePartitions)
      .where(col("user_id") >= 0)
  }

  /** Scale-adaptive STATE-partition count for a finite replay (guide
    * §2: derive partitioning from input size, never a constant): one
    * state partition per `targetBytes` of source input, clamped to
    * [1, session shuffle partitions]. A stateful streaming operator
    * creates one state-store instance per shuffle partition per
    * operator per micro-batch — commits, delta files, maintenance —
    * so a kilobyte-scale replay under the session's cluster-shaped
    * shuffle partitioning pays hundreds of store commits to move
    * almost no rows (measured: q131's single join micro-batch spent
    * 2.9 s moving 0.8 MB through 32 partitions × 4 join state stores).
    * The clamp keeps scale-up replays at the configured cluster shape:
    * at 100 TB the input-bytes rule saturates the clamp and the
    * partitioning is exactly what it was before this knob existed.
    */
  def adaptiveStatePartitions(
      spark: SparkSession,
      paths: Seq[String],
      targetBytes: Long = 32L << 20
  ): Int = {
    require(targetBytes > 0, "adaptiveStatePartitions: targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val bytes = paths.map { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
    }.sum
    val configured = spark.sessionState.conf.numShufflePartitions
    math.max(1L, math.min(configured.toLong, (bytes + targetBytes - 1) / targetBytes)).toInt
  }

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set —
    * the conf a stateful streaming query reads ONCE at first-batch
    * planning to fix its state partitioning for the checkpoint's life.
    * Restored in finally; replays are synchronous (start → drain →
    * stop), so the override never leaks into the caller's batch plan.
    */
  private def withStatePartitions[T](spark: SparkSession, n: Option[Int])(body: => T): T =
    n match {
      case None => body
      case Some(v) =>
        require(v >= 1, s"statePartitions must be at least 1, got $v")
        val key = "spark.sql.shuffle.partitions"
        val old = spark.conf.get(key)
        spark.conf.set(key, v.toString)
        try body
        finally spark.conf.set(key, old)
    }

  /** Drain a FINITE streaming DataFrame through a parquet SINK and read
    * the result back as a batch DataFrame. The sink is a real file sink
    * (exactly the 100 TB output path) — a memory sink would collect the
    * job's entire output onto the driver. `statePartitions`
    * (see [[adaptiveStatePartitions]]) sizes the stateful operators'
    * store count to the replay's input volume; None keeps the session
    * default. The emitted ROWS are identical either way — state
    * partitioning only decides where a key's state lives.
    */
  private def drainToParquet(
      out: DataFrame,
      outDir: String,
      ckptDir: String,
      statePartitions: Option[Int] = None
  ): DataFrame = {
    val spark = out.sparkSession
    withStatePartitions(spark, statePartitions) {
      val q = out.writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    spark.read.parquet(outDir)
  }

  /** Run [[windowedCounts]] over a FINITE streaming input end-to-end
    * and hand back the flushed windows as a batch DataFrame — the
    * replay harness that lets a batch SQL oracle gate the WATERMARKED
    * WINDOWED-AGGREGATION face of the streaming engine (q127), the
    * [[replaySessionize]] pattern applied to the built-in stateful
    * operator instead of custom state.
    *
    * `events` must be a streaming DataFrame carrying `tsCol` TIMESTAMP,
    * `keyCol` STRING and `valueCol` DOUBLE. Append mode only emits a
    * window once the watermark passes its end, and the watermark only
    * moves when data arrives — so on a finite stream the trailing
    * windows would never flush: one far-future sentinel event for the
    * reserved `sentinelKey` advances the watermark and the final
    * no-data micro-batch flushes every real window. The sentinel's own
    * window (still open: its end exceeds the watermark it set) is
    * filtered back out by its reserved key. Output is
    * `(window_start_sec, keyCol, n, value_sum)` with the window start
    * as epoch seconds — engine-portable, no raw timestamps.
    */
  def replayWindowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowSec: Long,
      sentinelSec: Long,
      sentinelKey: String = "__graft_sentinel__",
      statePartitions: Option[Int] = None
  ): DataFrame = {
    require(events.isStreaming, "replayWindowedCounts: events must be a streaming DataFrame")
    require(windowSec > 0, s"replayWindowedCounts: windowSec must be positive, got $windowSec")
    val spark = events.sparkSession
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_win_replay").toString
    val sentDir = s"$base/sentinel"
    Seq((sentinelSec, sentinelKey, 0.0)).toDF("sec", keyCol, valueCol)
      .select(timestamp_seconds(col("sec")).as(tsCol), col(keyCol), col(valueCol))
      .coalesce(1).write.parquet(sentDir)
    val sentinel = spark.readStream
      .schema(spark.read.parquet(sentDir).schema)
      .parquet(sentDir)
    val agg = windowedCounts(
      events.select(col(tsCol), col(keyCol), col(valueCol)).unionByName(sentinel),
      tsCol, keyCol, valueCol,
      window_ = s"$windowSec seconds", watermark = "0 seconds")
    drainToParquet(agg, s"$base/out", s"$base/ckpt", statePartitions)
      .where(col(keyCol) =!= sentinelKey)
      .select(
        col("window.start").cast("long").as("window_start_sec"),
        col(keyCol),
        col("n"),
        round(col("value_sum"), 2).as("value_sum"))
  }

  /** Watermarked stream-stream join: right rows within ±`within` of the
    * left row's event time, equi-matched on `keyCol`. Both sides carry
    * watermarks and the join condition is time-bounded in both
    * directions — the two requirements that let Spark expire join state
    * instead of buffering either stream forever. `joinType` admits the
    * outer variants (an outer result row only emits once the watermark
    * proves no match can still arrive). Output columns keep their
    * `l`/`r` qualifiers; callers select what they need.
    */
  def joinStreamsWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String,
      within: String = "1 hour",
      joinType: String = "inner"
  ): DataFrame = {
    val l = left.withWatermark(leftTime, within).alias("l")
    val r = right.withWatermark(rightTime, within).alias("r")
    l.join(
      r,
      expr(
        s"""l.$keyCol = r.$keyCol
           |AND r.$rightTime >= l.$leftTime - interval $within
           |AND r.$rightTime <= l.$leftTime + interval $within""".stripMargin),
      joinType)
  }

  /** Run [[joinStreamsWithin]] over two FINITE streaming inputs
    * end-to-end and hand back the matched rows as a batch DataFrame —
    * the replay harness that lets a batch SQL oracle gate the
    * STREAM-STREAM JOIN face of the streaming engine (q131), completing
    * the set after custom state (q124) and windowed aggregation (q127).
    *
    * Unlike those two, an APPEND-mode inner join emits each match in
    * the micro-batch where it completes — no watermark has to pass
    * anything before output appears — so this replay needs no sentinel:
    * the watermarks here exist purely to bound join STATE (rows older
    * than `withinSec` behind the watermark are dropped from the state
    * store), which is the property that keeps the operator alive on an
    * unbounded 100 TB/day stream. On a finite replay the file source
    * delivers every available file before the first watermark update,
    * so no match can be lost to state expiry and the result is exactly
    * the batch join — which is what the oracle checks.
    *
    * Both inputs must carry `keyCol` plus their own time column; all
    * other column names must be disjoint across the two sides, since
    * the joined row carries both sides' columns side by side.
    */
  def replayJoinWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String,
      withinSec: Long,
      statePartitions: Option[Int] = None
  ): DataFrame = {
    require(left.isStreaming && right.isStreaming,
      "replayJoinWithin: both inputs must be streaming DataFrames")
    require(withinSec > 0, s"replayJoinWithin: withinSec must be positive, got $withinSec")
    val overlap = (left.columns.toSet - keyCol).intersect(right.columns.toSet - keyCol)
    require(overlap.isEmpty,
      s"replayJoinWithin: non-key columns must be disjoint, both sides have ${overlap.mkString(", ")}")
    val base = java.nio.file.Files.createTempDirectory("graft_join_replay").toString
    val joined = joinStreamsWithin(
      left, right, keyCol, leftTime, rightTime, within = s"$withinSec seconds")
    val out = joined.select(
      col(s"l.$keyCol").as(keyCol) +:
        (left.columns.filterNot(_ == keyCol).map(c => col(s"l.$c")) ++
          right.columns.filterNot(_ == keyCol).map(c => col(s"r.$c"))).toSeq: _*)
    drainToParquet(out, s"$base/out", s"$base/ckpt", statePartitions)
  }

  /** [[replayJoinWithin]] for the LEFT OUTER variant — the face where
    * the watermark is load-bearing for CORRECTNESS, not just state
    * size: an unmatched left row only emits (right columns null) once
    * the watermark proves no matching right row can still arrive, so a
    * finite replay needs the q124 sentinel pattern — one far-future row
    * per SIDE (the eviction watermark is the minimum across both
    * streams) under a reserved `keyCol` value, unioned in before the
    * join and filtered back out of the result. The final no-data
    * micro-batch then flushes every real unmatched left. `keyCol` must
    * be LONG on both sides; the sentinels carry nulls in every other
    * non-time column.
    */
  def replayJoinWithinOuter(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String,
      withinSec: Long,
      sentinelKey: Long,
      sentinelSec: Long,
      statePartitions: Option[Int] = None
  ): DataFrame = {
    require(left.isStreaming && right.isStreaming,
      "replayJoinWithinOuter: both inputs must be streaming DataFrames")
    require(withinSec > 0, s"replayJoinWithinOuter: withinSec must be positive, got $withinSec")
    val overlap = (left.columns.toSet - keyCol).intersect(right.columns.toSet - keyCol)
    require(overlap.isEmpty,
      s"replayJoinWithinOuter: non-key columns must be disjoint, both sides have ${overlap.mkString(", ")}")
    val spark = left.sparkSession
    val base = java.nio.file.Files.createTempDirectory("graft_ojoin_replay").toString
    def withSentinel(side: DataFrame, timeCol: String, dir: String): DataFrame = {
      val row = org.apache.spark.sql.Row.fromSeq(side.schema.fields.map { f =>
        if (f.name == keyCol) sentinelKey
        else if (f.name == timeCol) new java.sql.Timestamp(sentinelSec * 1000L)
        else null
      }.toSeq)
      spark.createDataFrame(java.util.Arrays.asList(row), side.schema)
        .coalesce(1).write.parquet(dir)
      side.unionByName(spark.readStream.schema(side.schema).parquet(dir))
    }
    val joined = joinStreamsWithin(
      withSentinel(left, leftTime, s"$base/sl"),
      withSentinel(right, rightTime, s"$base/sr"),
      keyCol, leftTime, rightTime, s"$withinSec seconds", "left_outer")
    val out = joined.select(
      col(s"l.$keyCol").as(keyCol) +:
        (left.columns.filterNot(_ == keyCol).map(c => col(s"l.$c")) ++
          right.columns.filterNot(_ == keyCol).map(c => col(s"r.$c"))).toSeq: _*)
    drainToParquet(out, s"$base/out", s"$base/ckpt", statePartitions)
      .where(col(keyCol) =!= sentinelKey)
  }

  /** Run [[dedupStream]] over a FINITE streaming input end-to-end and
    * hand back the admitted KEYS as a batch DataFrame — the replay
    * harness that lets a `SELECT DISTINCT` oracle gate the STREAMING
    * DEDUP face (q134). Only the key columns are returned: WHICH
    * duplicate row survives is arrival-order-dependent on any engine
    * (the first one wins), but the SET of admitted keys is not — that
    * set is the operator's contract, and the thing the oracle checks.
    *
    * The event-time path exercises `dropDuplicatesWithinWatermark`
    * (bounded state — the only dedup that survives an unbounded
    * stream). A key could legitimately be re-admitted once the
    * watermark passes its first occurrence; watermarks only advance
    * BETWEEN micro-batches, so on a finite replay the admitted set is
    * exactly the distinct-key set, while an unbounded deployment
    * degrades gracefully to "exact within the watermark horizon".
    */
  def replayDedupKeys(
      events: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: Option[String] = None,
      watermark: String = "10 minutes",
      statePartitions: Option[Int] = None
  ): DataFrame = {
    require(events.isStreaming, "replayDedupKeys: events must be a streaming DataFrame")
    require(keyCols.nonEmpty, "replayDedupKeys: no key columns")
    val base = java.nio.file.Files.createTempDirectory("graft_dedup_replay").toString
    val keep = (keyCols ++ eventTimeCol).distinct.map(col)
    val deduped = dedupStream(events.select(keep: _*), keyCols, eventTimeCol, watermark)
    drainToParquet(deduped, s"$base/out", s"$base/ckpt", statePartitions)
      .select(keyCols.map(col): _*)
  }

  /** Streaming maintenance of a persisted KMV SKETCH TABLE — the
    * incremental face of [[graft.operators.Scale.kmvSketch]]: each
    * micro-batch is reduced to one sketch row per group (k longs) and
    * APPENDED to `sketchDir`; per-group estimates at any moment are
    * [[graft.operators.Scale.kmvMerge]] over the stored rows. By the
    * KMV union property the merged answer is IDENTICAL to sketching
    * all data seen so far directly — so a 100 TB/day "distinct per
    * domain" job pays one sketch-build per batch plus a metadata-scale
    * merge, never a re-scan (the [[appendStreamIvf]] /
    * [[appendStreamIndex]] lifecycle applied to a summary instead of
    * an index). The replay drives a FINITE stream end-to-end and hands
    * back the merged estimates, which a batch SQL oracle gates (q140):
    * correctness is independent of how the stream was micro-batched.
    */
  def replayKmvMaintenance(
      rows: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int
  ): DataFrame = {
    require(rows.isStreaming, "replayKmvMaintenance: rows must be a streaming DataFrame")
    drainAndRollup(rows, "graft_kmv_stream",
      batch => graft.operators.Scale.kmvSketch(batch, Seq(groupCol), col(valueCol), k),
      shards => graft.operators.Scale.kmvMerge(shards, groupCol, "kmv_sketch", k))
  }

  /** Drain-then-rollup epilogue shared by the four mergeable-sketch
    * maintenance replays (KMV/Bloom/count-min/HLL): run the finite
    * stream to completion with each micro-batch reduced by
    * `buildShard` and appended as a parquet shard, then hand the
    * stacked shards to `rollup`. Two failure modes of the naive tail
    * are closed here once:
    *
    *   - an EMPTY stream never fires foreachBatch, so the shard dir is
    *     never created and a blind `read.parquet` throws path-not-
    *     found — instead the rollup runs over `buildShard` applied to
    *     an empty STATIC frame of the stream's schema, producing the
    *     empty sketch with the exact shard schema;
    *   - the temp base (shards + stream checkpoint) leaked one dir per
    *     replay — the rollup is MATERIALIZED (eager localCheckpoint,
    *     so the returned frame no longer references the files) and the
    *     base deleted before returning.
    *
    * SINGLE-HOST assumption, stated explicitly: localCheckpoint stores
    * UNREPLICATED executor blocks with truncated lineage, and the
    * source parquet is deleted right after — on a multi-executor
    * cluster, losing an executor after this returns makes the frame
    * unrecoverable. That trade is deliberate here: the materialized
    * rows are SKETCH-sized (≤ shards·cells, metadata scale), this
    * replay harness exists for the oracle/bench lifecycle on one JVM,
    * and a production deployment would keep the shard table as the
    * durable artifact (persist `shardDir` somewhere real and skip the
    * delete) rather than relying on the returned frame's blocks — the
    * rollup is a cheap re-read away by the merge property.
    */
  private def drainAndRollup(
      rows: DataFrame,
      tmpPrefix: String,
      buildShard: DataFrame => DataFrame,
      rollup: DataFrame => DataFrame): DataFrame = {
    val spark = rows.sparkSession
    val base = java.nio.file.Files.createTempDirectory(tmpPrefix).toString
    val shardDir = s"$base/shards"
    val q = rows.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        buildShard(batch)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(shardDir): Unit
      }
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards =
      if (fs.exists(new org.apache.hadoop.fs.Path(shardDir)))
        spark.read.parquet(shardDir)
      else
        buildShard(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rows.schema))
          .withColumn("batch_id", lit(0L))
    val out = rollup(shards).localCheckpoint()
    if (!fs.delete(basePath, true))
      System.err.println(s"[streams] could not clean replay scratch $base")
    out
  }

  /** INCREMENTAL Bloom-filter maintenance from a stream: each
    * micro-batch's keys become a word-table shard
    * ([[graft.operators.Bloom.bloomWords]]) appended to a persisted
    * sketch table; the live filter is the [[graft.operators.Bloom
    * .mergeWords]] rollup — exact by the bit_or union property, so the
    * maintained filter is row-identical to a from-scratch build over
    * everything streamed so far regardless of batching (the
    * [[replayKmvMaintenance]] pattern; Bloom is the second mergeable
    * sketch maintained this way). Per batch: one bounded aggregation +
    * one ≤ mBits/32-row append — the corpus is never rescanned.
    */
  def replayBloomMaintenance(
      rows: DataFrame,
      keyCol: String,
      mBits: Int,
      salt: String
  ): DataFrame = {
    require(rows.isStreaming, "replayBloomMaintenance: rows must be a streaming DataFrame")
    drainAndRollup(rows, "graft_bloom_stream",
      batch => graft.operators.Bloom.bloomWords(batch, keyCol, mBits, salt),
      shards => graft.operators.Bloom.mergeWords(shards))
  }

  /** INCREMENTAL count-min maintenance from a stream — the third
    * mergeable sketch under the [[replayKmvMaintenance]] /
    * [[replayBloomMaintenance]] lifecycle: each micro-batch is reduced
    * to a ≤ depth·width-row sketch shard
    * ([[graft.operators.Scale.countMinBuild]]) and appended; the live
    * sketch is the cell-wise-sum rollup
    * ([[graft.operators.Scale.countMinRollup]]), which equals the
    * sketch of everything streamed so far EXACTLY (counters are plain
    * sums), so point-frequency estimates are batching-independent and
    * the batch SQL oracle gates the streamed face verbatim. Per batch:
    * one partial-aggregable groupBy + one sketch-sized append — the
    * token stream is never rescanned.
    */
  def replayCountMinMaintenance(
      rows: DataFrame,
      keyCol: String,
      depth: Int,
      width: Long,
      salt: String = "cm"
  ): DataFrame = {
    require(rows.isStreaming, "replayCountMinMaintenance: rows must be a streaming DataFrame")
    drainAndRollup(rows, "graft_cm_stream",
      batch => graft.operators.Scale.countMinBuild(batch, col(keyCol), depth, width, salt),
      shards => graft.operators.Scale.countMinRollup(
        shards.select("row_idx", "bucket", "cnt")))
  }

  /** TIME-SHARDED count-min maintenance from a stream — the
    * [[replayCountMinMaintenance]] lifecycle with the shard key (a day
    * string, an ingest batch id) preserved: each micro-batch reduces
    * to per-(shard, cell) counter rows
    * ([[graft.operators.Scale.countMinSharded]]) and appends; the live
    * table is the per-shard rollup
    * ([[graft.operators.Scale.countMinRollupBy]]), identical to
    * sharding the batch corpus directly no matter the batching (cell
    * sums are associative), so a sliding window
    * ([[graft.operators.Scale.countMinWindow]]) over the streamed
    * shards equals the window over a from-scratch build and ONE batch
    * oracle gates the whole windowed-freshness lifecycle.
    */
  def replayCountMinSharded(
      rows: DataFrame,
      shardCol: String,
      keyCol: String,
      depth: Int,
      width: Long,
      salt: String = "cm"
  ): DataFrame = {
    require(rows.isStreaming, "replayCountMinSharded: rows must be a streaming DataFrame")
    drainAndRollup(rows, "graft_cmshard_stream",
      batch => graft.operators.Scale
        .countMinSharded(batch, col(shardCol), shardCol, col(keyCol), depth, width, salt),
      shards => graft.operators.Scale.countMinRollupBy(
        shards.select(shardCol, "row_idx", "bucket", "cnt"), Seq(shardCol)))
  }

  /** INCREMENTAL HyperLogLog maintenance from a stream — the fourth
    * mergeable sketch under this lifecycle (KMV, Bloom, count-min,
    * now HLL): each micro-batch reduces to a ≤ groups·m-row register
    * shard ([[graft.operators.Scale.hllSketch]]) and appends; the live
    * sketch is the register-wise MAX rollup
    * ([[graft.operators.Scale.hllRollup]]), which equals sketching
    * everything streamed so far EXACTLY (max is idempotent/
    * commutative/associative), so estimates are batching-independent
    * and the batch oracle gates the streamed face verbatim.
    */
  def replayHllMaintenance(
      rows: DataFrame,
      groupCol: String,
      valueCol: String,
      m: Int,
      salt: String = "hll"
  ): DataFrame = {
    require(rows.isStreaming, "replayHllMaintenance: rows must be a streaming DataFrame")
    drainAndRollup(rows, "graft_hll_stream",
      batch => graft.operators.Scale.hllSketch(batch, Seq(groupCol), col(valueCol), m, salt),
      shards => graft.operators.Scale.hllRollup(
        shards.select(groupCol, "bucket", "register"), Seq(groupCol)))
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
