package graft.operators

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped quantiles, three ways.
  *
  * [[exact]] is the interpolated percentile (q37's oracle definition,
  * DuckDB `quantile_cont`) — it buffers and sorts every group's values,
  * which is fine for a small report but wrong as the default at 100 TB.
  *
  * [[approx]] is the built-in scale path: Spark's `approx_percentile`
  * sketch is single-pass, bounded-memory and mergeable, so a grouped
  * quantile costs one partially-aggregated shuffle like any other agg.
  * Its guarantee: the returned value's rank is within `n / accuracy` of
  * the requested rank (an actual element of the data, not interpolated).
  * What it cannot be is cross-engine DETERMINISTIC — the GK summary's
  * answer depends on merge order, so no SQL oracle can replay it.
  *
  * [[histogram]] is the deterministic bounded sketch: fixed-width
  * integer bins, so the quantile comes out as the bin holding the
  * target rank (error ≤ the bin width by construction, independent of
  * data order, merge order, partitioning, or engine). Every step is
  * exact-integer arithmetic, which is what lets a plain SQL oracle
  * replay it bit-for-bit (q133).
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

  /** Fixed-width HISTOGRAM quantiles per group: for each whole percent
    * `p` in `percentiles`, the inclusive lower bound of the bin holding
    * the group's `ceil(p·n/100)`-th smallest value (1-based rank over
    * non-null values) — i.e. the true p-th percentile rounded down to a
    * `binWidth` boundary, an under-estimate by less than `binWidth`.
    * Output: `(groupCol, n, p{p}_lo…)`, all BIGINT.
    *
    * Scale shape: ONE corpus-scale shuffle — the partial-aggregable
    * `groupBy(group, bin).count()` whose result is bounded by
    * |groups| × |bins|, never by row count. The cumulative walk and the
    * rank probes run on that bounded bin table (windows partitioned by
    * group over ≤ |bins| rows — sketch-scale state, not the corpus-
    * window-skew shape this codebase audits against). Bin counts are
    * trivially mergeable (integer addition), so shard-and-rollup works
    * the same way as the KMV sketch's union (q130).
    *
    * Contract: `valueCol` must be integral-valued and NON-NEGATIVE
    * (`value DIV binWidth` must floor identically on every engine;
    * negative inputs fail loudly rather than bin off-by-one). Nulls are
    * excluded, matching aggregate semantics. Groups with no non-null
    * value produce no row.
    */
  def histogram(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      binWidth: Long,
      percentiles: Seq[Int]
  ): DataFrame = {
    require(binWidth > 0, s"histogram: binWidth must be positive, got $binWidth")
    require(percentiles.nonEmpty, "histogram: no percentiles requested")
    require(percentiles.forall(p => p >= 1 && p <= 100),
      s"histogram: percentiles must be whole percents in [1, 100], got $percentiles")
    require(percentiles.distinct == percentiles,
      s"histogram: duplicate percentiles in $percentiles")
    val reserved = Seq("_hq_bin", "_hq_cnt", "_hq_cum", "_hq_n")
    require(!reserved.contains(groupCol),
      s"histogram: group column collides with a reserved working name " +
        s"(${reserved.mkString(", ")})")
    quantileTail(
      binCounts(df, valueCol, Seq(groupCol), binWidth)
        .withColumnRenamed("bin", "_hq_bin").withColumnRenamed("cnt", "_hq_cnt"),
      groupCol, binWidth, percentiles)
  }

  /** The persistable HISTOGRAM SKETCH: per-`groupCols` bin counts —
    * `(groupCols…, bin, cnt)` with `bin = value DIV binWidth`. Bin
    * counts merge by plain addition, so a multi-shard/multi-day rollup
    * stores one sketch per `(group…, shard)` and feeds the stored rows
    * to [[histogramMerge]] without revisiting the data — the
    * [[graft.operators.Scale.kmvSketch]] lifecycle for quantiles.
    * Same non-negative integral contract as [[histogram]].
    */
  def histogramSketch(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      binWidth: Long
  ): DataFrame = {
    require(groupCols.nonEmpty, "histogramSketch: need at least one group column")
    binCounts(df, valueCol, groupCols, binWidth)
  }

  /** MERGE per-shard histogram sketches up to per-group quantiles: sum
    * the bin counts (the histogram union — exact, not approximate) and
    * run the same estimator tail, so the output is IDENTICAL to
    * [[histogram]] over the combined input, row for row. Input cost is
    * the sketch rows — metadata-scale — regardless of the corpus they
    * summarize. `binWidth` must be the width the sketches were built
    * with (a different width would relabel bins, not rebucket values).
    * `sketches` must carry `(groupCol, bin, cnt)`.
    */
  def histogramMerge(
      sketches: DataFrame,
      groupCol: String,
      binWidth: Long,
      percentiles: Seq[Int]
  ): DataFrame = {
    require(Seq("bin", "cnt").forall(sketches.columns.contains),
      s"histogramMerge: sketch input must carry bin/cnt, got ${sketches.columns.mkString(", ")}")
    quantileTail(
      sketches
        .groupBy(col(groupCol), col("bin").as("_hq_bin"))
        .agg(sum(col("cnt")).as("_hq_cnt")),
      groupCol, binWidth, percentiles)
  }

  /** Shared corpus pass of the histogram family: one partial-aggregable
    * `groupBy(group…, bin).count()`, result bounded by
    * |groups| × |bins|. Fails loudly on negative values (the engines
    * would floor-divide them differently).
    */
  private def binCounts(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"histogram: binWidth must be positive, got $binWidth")
    val reserved = Seq("_hq_bin", "_hq_cnt", "_hq_cum", "_hq_n", "_hq_v", "bin", "cnt")
    require(!groupCols.exists(reserved.contains),
      s"histogram: group column collides with a reserved working name " +
        s"(${reserved.mkString(", ")})")
    val v = col(valueCol).cast("long")
    val guarded = when(v < 0L,
      raise_error(concat(lit(s"histogram: negative $valueCol value "), v.cast("string"),
        lit(" — non-negative contract")))).otherwise(v)
    df.where(v.isNotNull)
      .select(groupCols.map(col) :+ guarded.as("_hq_v"): _*)
      .groupBy(groupCols.map(col) :+ expr(s"_hq_v DIV $binWidth").as("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Shared estimator tail over `(groupCol, _hq_bin, _hq_cnt)`: the
    * cumulative walk and ceil-rank probes on the bounded bin table.
    */
  private def quantileTail(
      bins: DataFrame,
      groupCol: String,
      binWidth: Long,
      percentiles: Seq[Int]
  ): DataFrame = {
    require(percentiles.nonEmpty, "histogram: no percentiles requested")
    require(percentiles.forall(p => p >= 1 && p <= 100),
      s"histogram: percentiles must be whole percents in [1, 100], got $percentiles")
    require(percentiles.distinct == percentiles,
      s"histogram: duplicate percentiles in $percentiles")
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("_hq_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("_hq_cum", sum(col("_hq_cnt")).over(wCum))
      .withColumn("_hq_n", sum(col("_hq_cnt")).over(Window.partitionBy(col(groupCol))))
    val probes = percentiles.map { p =>
      (min(when(col("_hq_cum") >= expr(s"(_hq_n * $p + 99) DIV 100"), col("_hq_bin")))
        * binWidth).as(s"p${p}_lo")
    }
    cum
      .groupBy(col(groupCol))
      .agg(max(col("_hq_n")).as("n"), probes: _*)
  }

  /** Per-ROW percentile rank from the [[histogram]] sketch — the
    * QUANTILE TRANSFORM of feature engineering: each row gains
    * `outCol` = `100 · (#values in strictly lower bins) DIV n`, a
    * deterministic lower bound on its true percentile rank within its
    * group (tight to one bin: every value in the row's own bin reports
    * the same rank).
    *
    * Scale shape: the corpus is touched exactly TWICE and shuffled
    * ZERO times — one partial-aggregable pass builds the bin table
    * (bounded by |groups| × |bins|), which then comes back as a
    * BROADCAST join on `(group, bin)`. The per-group-window
    * formulation (`percent_rank() OVER (PARTITION BY group ORDER BY
    * v)`) shuffles and sorts the whole corpus and serializes hot
    * groups on single tasks; this one never moves the corpus at all.
    * Same non-negative integral contract as [[histogram]].
    */
  def cdfRank(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      binWidth: Long,
      outCol: String = "pct_lo"
  ): DataFrame = {
    require(binWidth > 0, s"cdfRank: binWidth must be positive, got $binWidth")
    val reserved = Seq("_hq_bin", "_hq_cnt", "_hq_cum", "_hq_n", "_hq_v", outCol)
    require(!df.columns.exists(reserved.contains),
      s"cdfRank: input column collides with a reserved working/output name " +
        s"(${reserved.mkString(", ")})")
    val v = col(valueCol).cast("long")
    val guarded = when(v < 0L,
      raise_error(concat(lit(s"cdfRank: negative $valueCol value "), v.cast("string"),
        lit(" — non-negative contract")))).otherwise(v)
    val bins = df
      .where(v.isNotNull)
      .select(col(groupCol), guarded.as("_hq_v"))
      .groupBy(col(groupCol), expr(s"_hq_v DIV $binWidth").as("_hq_bin"))
      .agg(count(lit(1)).as("_hq_cnt"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("_hq_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val table = bins
      .withColumn("_hq_cum", sum(col("_hq_cnt")).over(wCum))
      .withColumn("_hq_n", sum(col("_hq_cnt")).over(Window.partitionBy(col(groupCol))))
      .select(col(groupCol).as("_hq_g"), col("_hq_bin").as("_hq_tbin"),
        ((col("_hq_cum") - col("_hq_cnt")) * 100L).as("_hq_below100"), col("_hq_n"))
    df.where(v.isNotNull)
      .withColumn("_hq_bin", expr(s"CAST($valueCol AS BIGINT) DIV $binWidth"))
      .join(broadcast(table),
        col(groupCol) === col("_hq_g") && col("_hq_bin") === col("_hq_tbin"))
      .withColumn(outCol, expr("_hq_below100 DIV _hq_n"))
      .drop("_hq_g", "_hq_bin", "_hq_tbin", "_hq_below100", "_hq_n")
  }

  private def grouped(df: DataFrame, groupCols: Seq[String]): RelationalGroupedDataset =
    if (groupCols.isEmpty) df.groupBy() else df.groupBy(groupCols.map(col): _*)

  /** 0.5 → "p50", 0.999 → "p99_9" */
  private def name(p: Double): String =
    "p" + BigDecimal(p * 100).bigDecimal.stripTrailingZeros.toPlainString.replace(".", "_")
}
