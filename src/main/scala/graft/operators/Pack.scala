package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data batch assembly operators.
  *
  * [[byTokenBudget]] assigns documents to fixed-token-budget bins in a
  * deterministic order (greedy by running token count — the standard
  * sequence-packing approximation). The assignment is a running sum over
  * one window; at 100 TB the order column must embed a shard prefix
  * (`partitionBy` that shard) so no single ordered partition holds the
  * whole corpus — pass `shardCol` for that.
  *
  * [[hashSplit]] labels each row train/val/test by an md5-derived bucket
  * of a stable key — reproducible across engines and runs (no RNG state),
  * which is how large pipelines keep split membership stable under
  * re-runs and backfills. Scan-only, no shuffle.
  */
object Pack {

  /** `shardCol` has NO default on purpose: `None` means a GLOBAL ordered
    * window — every row flows through one task, which is only acceptable
    * for small/driver-side corpora. Callers must opt into that shape
    * explicitly; at scale pass the shard column so each shard packs
    * independently in its own partition.
    */
  def byTokenBudget(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      budget: Long,
      shardCol: Option[String]
  ): DataFrame = {
    val w = shardCol
      .map(sc => Window.partitionBy(col(sc)))
      .getOrElse(Window.partitionBy())
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokensCol)).over(w))
      .withColumn("bin", ((col("_cum") - col(tokensCol)) / budget).cast("long"))
      .drop("_cum")
  }

  /** md5-bucket in [0, 100): first 4 hex chars of md5(key) mod 100. */
  def hashBucket(key: Column): Column =
    graft.functions.Text.md5PrefixLong(key, 4) % 100

  def hashSplit(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(key)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }
}
