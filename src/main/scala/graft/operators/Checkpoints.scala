package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared `localCheckpoint` lifecycle for iterative operators
  * ([[Dedup.connectedComponents]], [[Graph.connectedComponentsStar]] and
  * any future fixed-point loop): `localCheckpoint` persists its internal
  * RDD OUTSIDE the CacheManager, so `Dataset.unpersist()` cannot free
  * it — without explicit tracking every round leaks one full
  * vertex-scale copy into executor storage for the life of the
  * application.
  *
  * Tracking is scoped to the checkpointed Dataset's OWN RDD: the
  * Dataset returned by `localCheckpoint` is a [[org.apache.spark.sql.execution.LogicalRDD]]
  * leaf over exactly the RDD that was persisted, so collecting those
  * leaves identifies what this call registered without diffing the
  * global persistent-RDD registry — a diff could capture a CONCURRENT
  * query's checkpoint RDD and later unpersist it (a truncated-lineage
  * RDD is unrecomputable once dropped). A plan shape with no visible
  * `LogicalRDD` leaf therefore FAILS CLOSED: no handles, a bounded
  * one-round leak, never a foreign unpersist.
  */
private[graft] object Checkpoints {

  /** Checkpoint `df` (eager) and return the checkpointed frame plus the
    * persisted RDD handles this call registered — pass them to
    * [[release]] when the round they back is superseded. The LAST
    * round's handles must stay persisted as long as the returned plan
    * may still be read: a truncated-lineage RDD cannot be recomputed
    * after unpersist.
    */
  def tracked(df: DataFrame): (DataFrame, Seq[RDD[_]]) = {
    val ck = df.localCheckpoint()
    val scoped = ck.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if lr.rdd.getStorageLevel != StorageLevel.NONE =>
        lr.rdd
    }
    // Fail closed when no LogicalRDD leaf is visible: a registry diff
    // here could capture a CONCURRENT query's localCheckpoint RDD and
    // later unpersist it — unrecoverable for that query. Accept a
    // bounded one-round storage leak instead.
    if (scoped.isEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "graft.Checkpoints: no LogicalRDD leaf on a localCheckpoint plan; " +
          "returning no handles (one checkpoint round will stay persisted)")
    (ck, scoped)
  }

  /** Unpersist handles returned by [[tracked]] once their round is
    * superseded (async — the blocking flag only gates the driver).
    */
  def release(rdds: Seq[RDD[_]]): Unit =
    rdds.foreach(_.unpersist(blocking = false))
}
