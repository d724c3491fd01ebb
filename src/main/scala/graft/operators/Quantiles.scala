package graft.operators

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Grouped quantiles, two ways.
  *
  * [[exact]] is the interpolated percentile (q37's oracle definition,
  * DuckDB `quantile_cont`) — it buffers and sorts every group's values,
  * which is fine for a small report but wrong as the default at 100 TB.
  *
  * [[approx]] is the documented scale path: Spark's `approx_percentile`
  * sketch is single-pass, bounded-memory and mergeable, so a grouped
  * quantile costs one partially-aggregated shuffle like any other agg.
  * Its guarantee: the returned value's rank is within `n / accuracy` of
  * the requested rank (an actual element of the data, not interpolated).
  */
object Quantiles {

  def exact(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      percentiles: Seq[Double]
  ): DataFrame = {
    val aggs = percentiles.map(p => expr(s"percentile($valueCol, $p)").as(name(p)))
    grouped(df, groupCols).agg(aggs.head, aggs.tail: _*)
  }

  def approx(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      percentiles: Seq[Double],
      accuracy: Int = 10000
  ): DataFrame = {
    val aggs =
      percentiles.map(p => percentile_approx(col(valueCol), lit(p), lit(accuracy)).as(name(p)))
    grouped(df, groupCols).agg(aggs.head, aggs.tail: _*)
  }

  private def grouped(df: DataFrame, groupCols: Seq[String]): RelationalGroupedDataset =
    if (groupCols.isEmpty) df.groupBy() else df.groupBy(groupCols.map(col): _*)

  /** 0.5 → "p50", 0.999 → "p99_9" */
  private def name(p: Double): String =
    "p" + BigDecimal(p * 100).bigDecimal.stripTrailingZeros.toPlainString.replace(".", "_")
}
