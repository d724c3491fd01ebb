package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: events of a key belong to the same session
  * while consecutive gaps stay within `gapSeconds`.
  *
  * Classic two-window formulation (lag → new-session flag → running sum
  * as session sequence number): one shuffle on the key, state bounded by
  * the window sort — the same computation `session_window` does for
  * streaming, kept as explicit windows so the session ids are stable,
  * oracle-checkable values. Timestamps are floored to whole seconds
  * before gap arithmetic so results are engine-portable.
  */
object Sessions {

  def byGap(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      gapSeconds: Long
  ): DataFrame = {
    val sec = col(tsCol).cast("long")
    // order by the floored second (not the raw timestamp) so session
    // assignment is identical across engines with different sub-second
    // precision; tieCol pins same-second ordering
    val w = Window.partitionBy(col(keyCol)).orderBy(sec, col(tieCol))
    val flagged = events
      .withColumn("_prev_sec", lag(sec, 1).over(w))
      .withColumn(
        "_new_s",
        when(col("_prev_sec").isNull || sec - col("_prev_sec") > gapSeconds, 1).otherwise(0)
      )
    val sessioned = flagged.withColumn(
      "session_seq",
      sum(col("_new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    sessioned
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(sec) - min(sec)).as("duration_sec"),
        round(sum(col(valueCol)), 2).as("value_sum")
      )
      .orderBy(col(keyCol), col("session_seq"))
  }
}
