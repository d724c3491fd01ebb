package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join without the |points|×|intervals| explosion.
  *
  * Spark plans a naive `p.ts BETWEEN i.start AND i.end` join (with or
  * without an equi-key) as a join whose range predicate only filters
  * AFTER pairing — per key, every point meets every interval. The
  * standard fix is bucketing: quantize time into `bucketSeconds`-wide
  * buckets, explode each interval into the buckets it covers, and
  * equi-join on (key, bucket) before applying the exact range predicate.
  * Candidate pairs are then bounded by bucket co-residency, not key
  * cardinality — the shape that survives 100 TB. Pick `bucketSeconds`
  * near the typical interval length (shorter → more replicas per
  * interval; longer → more candidates per bucket).
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` rows whose
    * `[startCol, endCol]` (inclusive) contains the point's `timeCol`,
    * matching on `keyCol` equality. A point lands in exactly one bucket,
    * so candidates are already duplicate-free.
    */
  def bucketedIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      timeCol: String,
      startCol: String,
      endCol: String,
      bucketSeconds: Long = 3600L
  ): DataFrame = {
    require(bucketSeconds > 0)
    val pb = points.withColumn(
      "_bucket",
      floor(unix_timestamp(col(timeCol)) / bucketSeconds).cast("long"))
    val ib = intervals
      .withColumn("_b0", floor(unix_timestamp(col(startCol)) / bucketSeconds).cast("long"))
      .withColumn("_b1", floor(unix_timestamp(col(endCol)) / bucketSeconds).cast("long"))
      .withColumn("_bucket", explode(sequence(col("_b0"), col("_b1"))))
      .drop("_b0", "_b1")
    pb.join(ib, Seq(keyCol, "_bucket"))
      .where(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("_bucket")
  }
}
