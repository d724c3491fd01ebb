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

  /** Per-key SLIDING time-window aggregates: for every event, the
    * count/sum/min/max of the key's events in the trailing
    * `[t − windowSeconds, t]` interval — the "rate over the last N
    * minutes" primitive behind alerting, rate limiting, and feature
    * engineering. One RANGE-framed window per key over the event-time
    * second.
    *
    * Cross-engine determinism (house style): the value is quantized to
    * a scaled BIGINT BEFORE any aggregation, so the sliding sum is
    * exact integer arithmetic — a double sum would differ between
    * Spark's running accumulation and DuckDB's segment-tree window
    * implementation at the ulp level. Comparisons are on whole-second
    * epoch (the engine-portable granularity; see
    * [[Sessions.byGap]]).
    *
    * Scale shape: ONE window partitioned by the entity key — per-key
    * state is the key's own trailing interval, bounded by per-entity
    * activity, never by corpus size (the [[Sessions]] argument: the
    * output row itself depends on the key's neighborhood, so the
    * grouping is irreducible). No self-join: a range self-join
    * materializes |events|×|window| pairs; the window frame aggregates
    * them in one pass.
    */
  def rollingAggregate(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      windowSeconds: Long,
      scale: Long = 1000000L
  ): DataFrame = {
    require(windowSeconds > 0, s"rollingAggregate: windowSeconds must be positive")
    require(scale > 0, s"rollingAggregate: scale must be positive")
    // working/output names introduced below — the capPerGroup /
    // globalDenseRank reserved-column discipline: a caller whose key/id
    // column is literally named "sec" would otherwise get an ambiguous
    // -column failure (or a silently misbound select)
    val reserved = Seq("sec", "_v", "n_window", "sum_scaled", "min_scaled", "max_scaled")
    require(
      !Seq(keyCol, idCol).exists(reserved.contains),
      s"rollingAggregate: key/id column collides with a reserved output name " +
        s"(${reserved.mkString(", ")})")
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col("sec"))
      .rangeBetween(-windowSeconds, 0)
    events
      .select(
        col(keyCol),
        col(idCol),
        col(tsCol).cast("long").as("sec"),
        round(col(valueCol) * scale).cast("long").as("_v"))
      .select(
        col(keyCol),
        col(idCol),
        col("sec"),
        count(lit(1)).over(w).as("n_window"),
        sum(col("_v")).over(w).as("sum_scaled"),
        min(col("_v")).over(w).as("min_scaled"),
        max(col("_v")).over(w).as("max_scaled"))
  }

  /** Interval-overlap SWEEP LINE: how many intervals are active at each
    * moment. Each input row is an inclusive `[startCol, endCol]` span
    * (whole-second epochs, any integral or castable type); the output
    * is the CHANGE-POINT timeline — one row per second where the count
    * changes, `(sec, net, active)` with `net` the concurrency delta at
    * that second and `active` the number of spans covering it (valid
    * until the next change point). Classic uses: peak concurrent
    * sessions, datacenter job overlap, license seats in use.
    *
    * Scale shape: the corpus of intervals is first reduced to net
    * deltas per second — a partial-aggregable groupBy whose result is
    * bounded by the number of DISTINCT change seconds (at most
    * 2·|intervals|, usually far less), so the only corpus-scale
    * shuffle carries two +/-1 rows per interval with map-side combine.
    * The running count then rides [[Scale.globalRunningSum]]'s
    * zipWithIndex shape over the already-small change table: one range
    * shuffle, no single-task window, no per-key skew (there is no
    * key — the timeline is global by definition, which is exactly why
    * the naive `sum() OVER (ORDER BY sec)` serializes on one task).
    */
  def intervalConcurrency(
      intervals: DataFrame,
      startCol: String,
      endCol: String
  ): DataFrame = {
    val reserved = Seq("sec", "net", "active", "_ic_d")
    require(
      !Seq(startCol, endCol).exists(reserved.contains),
      s"intervalConcurrency: start/end column collides with a reserved output name " +
        s"(${reserved.mkString(", ")})")
    val deltas = intervals
      .select(col(startCol).cast("long").as("sec"), lit(1L).as("_ic_d"))
      .unionAll(intervals.select(
        (col(endCol).cast("long") + 1L).as("sec"), lit(-1L).as("_ic_d")))
      .groupBy(col("sec"))
      .agg(sum(col("_ic_d")).as("net"))
    Scale.globalRunningSum(deltas, Seq(col("sec")), col("net"), "active")
  }
}
