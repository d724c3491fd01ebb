package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * grid and forward-fill the gaps.
  *
  * Shape: one aggregation to the grid step, a per-key `sequence` +
  * `explode` to manufacture the missing slots (no driver-side loop, no
  * cross join — each key generates only its own span), a left join back,
  * and one window (`last` ignoreNulls) to carry observations forward.
  * Two shuffles total (grid agg + window on the same key — the join
  * reuses the key partitioning).
  */
object TimeSeries {

  /** Per (key, step-truncated slot): filled value column `v_ff` = last
    * observed aggregated value at or before the slot, plus `v` (the
    * observation itself, null on manufactured slots). `agg` aggregates
    * the value column within a slot (default sum).
    */
  def resampleForwardFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueExpr: Column,
      step: String = "hour"
  ): DataFrame = {
    val grid = events
      .groupBy(col(keyCol), date_trunc(step, col(tsCol)).as("slot"))
      .agg(valueExpr.as("v"))
    val spans = grid.groupBy(col(keyCol)).agg(min("slot").as("s0"), max("slot").as("s1"))
    val slots = spans.select(
      col(keyCol),
      explode(sequence(col("s0"), col("s1"), expr(s"interval 1 $step"))).as("slot"))
    val joined = slots.join(grid, Seq(keyCol, "slot"), "left")
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.withColumn("v_ff", last(col("v"), ignoreNulls = true).over(w))
  }
}
