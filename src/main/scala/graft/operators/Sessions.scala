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

  /** Fixed-length training-sequence construction: each key's events,
    * ordered by time, chunked into consecutive windows of `seqLen` —
    * the "build next-event-prediction examples from interaction logs"
    * stage of a sequence-model data pipeline (recommender / agent-
    * trajectory corpora), where the raw log becomes rows of
    * `(key, seq_index, [event, event, …])`.
    *
    * Shape at scale: ONE shuffle on the key (a partial-aggregable
    * `collect_list` groupBy — no per-key window, so AQE handles
    * partition-level skew); all chunking after that is row-local
    * array arithmetic inside the aggregated row. Per-key state is the
    * key's own event list — bounded by per-entity activity, never by
    * corpus size, and irreducible: the output row itself contains the
    * sequence. Ordering is engine-portable by the [[byGap]] rule:
    * whole-second floor of the timestamp, ties pinned by `tieCol`.
    *
    * Chunks are non-overlapping and cover every event; the trailing
    * partial chunk survives only if it has at least `minLen` events.
    */
  def eventSequences(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      seqLen: Int,
      minLen: Int
  ): DataFrame = {
    require(seqLen > 0, s"eventSequences: seqLen must be positive, got $seqLen")
    require(
      minLen >= 1 && minLen <= seqLen,
      s"eventSequences: minLen must be in [1, seqLen], got $minLen")
    val sec = col(tsCol).cast("long")
    val ordered = events
      .groupBy(col(keyCol))
      // struct sort order = field order: (second, tie, event) — the
      // same total order the sessionizer uses, as ONE aggregation
      .agg(sort_array(collect_list(struct(sec.as("s"), col(tieCol).as("t"),
        col(typeCol).as("e")))).as("ev"))
    val nChunks = ceil(size(col("ev")).cast("double") / seqLen).cast("int")
    ordered
      .withColumn(
        "chunk",
        transform(
          sequence(lit(0), nChunks - 1),
          i => slice(col("ev"), i * seqLen + 1, lit(seqLen))))
      .select(col(keyCol), posexplode(col("chunk")).as(Seq("seq_index", "c")))
      .withColumn("events", transform(col("c"), x => x("e")))
      .withColumn("n_events", size(col("events")).cast("long"))
      .where(col("n_events") >= minLen)
      .select(col(keyCol), col("seq_index").cast("long").as("seq_index"),
        col("events"), col("n_events"))
  }
}
