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
    sessioned(events, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(sec) - min(sec)).as("duration_sec"),
        round(sum(col(valueCol)), 2).as("value_sum")
      )
      .orderBy(col(keyCol), col("session_seq"))
  }

  /** Session INTERVALS: the same gap-based grouping as [[byGap]], but
    * reduced to each session's time span — `(keyCol, session_seq,
    * start_sec, end_sec)` with both bounds inclusive whole-second
    * epochs. The interval form is what overlap analytics consume (e.g.
    * [[TimeSeries.intervalConcurrency]]'s sweep line).
    */
  def intervals(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long
  ): DataFrame = {
    val sec = col(tsCol).cast("long")
    sessioned(events, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(min(sec).as("start_sec"), max(sec).as("end_sec"))
      .orderBy(col(keyCol), col("session_seq"))
  }

  /** Shared core of [[byGap]]/[[intervals]]: events with their
    * per-key `session_seq` (1-based) attached. One shuffle on the key;
    * ordering is by the floored second (not the raw timestamp) so
    * session assignment is identical across engines with different
    * sub-second precision, with `tieCol` pinning same-second order.
    */
  private def sessioned(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long
  ): DataFrame = {
    val sec = col(tsCol).cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(sec, col(tieCol))
    events
      .withColumn("_prev_sec", lag(sec, 1).over(w))
      .withColumn(
        "_new_s",
        when(col("_prev_sec").isNull || sec - col("_prev_sec") > gapSeconds, 1).otherwise(0)
      )
      .withColumn(
        "session_seq",
        sum(col("_new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
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
  /** Ordered-step FUNNEL: per entity, the earliest completion of
    * `steps` in order — step 1's time is the entity's first `steps(0)`
    * event, step i's is its first `steps(i−1)` event AT OR AFTER step
    * i−1 — kept when the whole chain spans at most `withinSeconds`.
    * The "view → click → purchase within a week" conversion primitive.
    * Times are whole-second epochs (the engine-portable granularity,
    * [[byGap]]'s rule); `>=` means same-second steps chain regardless
    * of sub-second order — a defined, deterministic semantic on both
    * engines.
    *
    * Greedy-earliest semantics, the standard funnel definition: each
    * step takes the MINIMUM qualifying time. A later step-1 event that
    * would start a tighter chain is not explored — the horizon filters
    * the earliest chain, it does not search over chains.
    *
    * Scale shape: one partial-aggregable min-aggregation per step
    * (|steps| is small and fixed), each joined back on the entity key —
    * the step tables are one row per entity, so every join is
    * key-partitioned and broadcast-eligible under AQE. No windows, no
    * per-key event materialization: an entity with a million events
    * still reduces map-side to one row per step.
    */
  def funnel(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      withinSeconds: Long
  ): DataFrame = {
    require(steps.nonEmpty, "funnel: empty steps")
    require(withinSeconds >= 0, s"funnel: negative horizon $withinSeconds")
    // the step-time outputs t1..tN share the result schema with keyCol —
    // the capPerGroup reserved-column discipline, so a key literally
    // named "t1" fails fast instead of yielding an ambiguous select
    val reserved = (1 to steps.length).map(j => s"t$j")
    require(!reserved.contains(keyCol),
      s"funnel: key column $keyCol collides with a step-time output column " +
        s"(${reserved.mkString(", ")})")
    val base = events.select(
      col(keyCol).as("k"),
      col(tsCol).cast("long").as("s"),
      col(typeCol).as("t"))
    var cur = base.where(col("t") === steps.head).groupBy("k").agg(min("s").as("t1"))
    steps.tail.zipWithIndex.foreach { case (st, idx) =>
      val i = idx + 2
      val carried = "k" +: (1 until i).map(j => s"t$j")
      cur = base
        .where(col("t") === st)
        .join(cur, "k")
        .where(col("s") >= col(s"t${i - 1}"))
        .groupBy(carried.map(col): _*)
        .agg(min("s").as(s"t$i"))
    }
    cur
      .where(col(s"t${steps.length}") - col("t1") <= withinSeconds)
      .select(col("k").as(keyCol) +: (1 to steps.length).map(j => col(s"t$j")): _*)
      .orderBy(keyCol)
  }

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

  /** COHORT RETENTION grid: users bucketed by their first active
    * period (the cohort), counted in every later period they return —
    * `(cohort_bucket, bucket_offset) → n_users`, plus the cohort's
    * size so a retention ratio is one division away. The standard
    * product / corpus-freshness analytics primitive ("of the users who
    * arrived in week W, how many were still active k weeks later?").
    *
    * Buckets are absolute indexes `epoch_seconds DIV bucketSeconds`
    * (86400 for daily cohorts, 604800 for weekly) — integer division
    * on the whole-second floor (the [[byGap]] engine-portability
    * rule), not calendar `date_trunc`, so the bucket boundary is a
    * pure arithmetic fact both engines compute identically (no
    * week-start / locale semantics involved).
    *
    * Scale shape: ONE corpus shuffle — `collect_set` of the user's
    * distinct active weeks is partial-aggregable (map-side dedup before
    * the exchange), and per-user state is the user's distinct-week set,
    * bounded by the time range rather than the event count. The cohort
    * is `array_min` of that set (row-local), the explode emits one row
    * per (user, active week) — at most weeks-per-range per user — and
    * the final grid aggregation shuffles only those. `count(*)` IS
    * distinct users by construction (one row per user per week), so no
    * `countDistinct` re-shuffle; cohort sizes are the grid's own
    * offset-0 rows joined back broadcast (the grid is
    * |cohorts| × |offsets|, metadata-scale).
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      bucketSeconds: Long = 604800L
  ): DataFrame = {
    require(bucketSeconds > 0,
      s"retentionCohorts: bucketSeconds must be positive, got $bucketSeconds")
    val reserved = Seq("_sec", "_wk", "_wks", "cohort_bucket", "bucket_offset", "n_users", "cohort_size")
    require(reserved.forall(c => !events.columns.contains(c)),
      s"retentionCohorts: reserved working column already exists (${reserved.mkString(", ")})")
    val perUser = events
      .select(col(userCol), col(tsCol).cast("long").as("_sec"))
      .withColumn("_wk", expr(s"_sec DIV $bucketSeconds"))
      .groupBy(col(userCol))
      .agg(collect_set(col("_wk")).as("_wks"))
    val grid = perUser
      .select(array_min(col("_wks")).as("cohort_bucket"), explode(col("_wks")).as("_wk"))
      .groupBy(col("cohort_bucket"), (col("_wk") - col("cohort_bucket")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = grid
      .where(col("bucket_offset") === 0)
      .select(col("cohort_bucket"), col("n_users").as("cohort_size"))
    grid
      .join(broadcast(sizes), Seq("cohort_bucket"))
      .select("cohort_bucket", "bucket_offset", "n_users", "cohort_size")
  }

  /** NEXT-EVENT TRANSITION MATRIX: counts of consecutive
    * `(from_type → to_type)` pairs per entity, with the conditional
    * transition probability as exact integer micro-units
    * (`n · 1e6 DIV row_total` — one BIGINT division, no doubles) —
    * the first-order Markov summary of the event stream, i.e. the
    * label/statistics stage of next-event-prediction data work that
    * [[eventSequences]] builds training rows for.
    *
    * Ordering is [[byGap]]'s engine-portable total order: whole-second
    * floor of the timestamp, same-second ties pinned by `tieCol`.
    * Consecutive means adjacent in that per-entity order; transitions
    * never cross entities.
    *
    * Scale shape: ONE corpus shuffle — the per-entity ordered event
    * list is a partial-aggregable `collect_list` groupBy
    * ([[eventSequences]]'s shape; per-entity state is the entity's own
    * events, irreducible for adjacency), pairing is row-local array
    * arithmetic, and everything after aggregates the
    * |types|² transition space: metadata-scale. The row-total join is
    * |types| rows — broadcast.
    */
  def transitionCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String
  ): DataFrame = {
    val reserved = Seq("_ev", "_p", "from_type", "to_type", "n", "row_total", "p_micro")
    require(reserved.forall(c => !events.columns.contains(c)),
      s"transitionCounts: reserved working column already exists (${reserved.mkString(", ")})")
    val sec = col(tsCol).cast("long")
    val ordered = events
      .groupBy(col(keyCol))
      // struct sort order = field order: (second, tie, event) — the
      // [[byGap]] total order, as ONE aggregation
      .agg(sort_array(collect_list(struct(sec.as("s"), col(tieCol).as("t"),
        col(typeCol).as("e")))).as("_ev"))
    val pairs = ordered
      .where(size(col("_ev")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("_ev")) - 1),
        i => struct(
          element_at(col("_ev"), i)("e").as("from_type"),
          element_at(col("_ev"), i + 1)("e").as("to_type")))).as("_p"))
      .select(col("_p.from_type"), col("_p.to_type"))
    val counts = pairs.groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("row_total"))
    counts
      .join(broadcast(totals), Seq("from_type"))
      // exact micro-probability; n ≤ ~9.2e12 before the scale-up
      // overflows int64 — far beyond any per-(type,type) count here
      .withColumn("p_micro", expr("(n * 1000000L) DIV row_total"))
      .select("from_type", "to_type", "n", "row_total", "p_micro")
  }
}
