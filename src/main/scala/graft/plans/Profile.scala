package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the column-statistics report a lake
  * operator runs after ingestion (one step past `Recon`'s table-level
  * counts): per numeric column min / max / sum / distinct / null count.
  *
  * ONE aggregation job over a single scan computes every column's stats
  * (partial-aggregated, no per-column passes); `stack` unpivots the wide
  * result into one row per column. `exact = false` swaps the exact
  * distinct (a shuffle per column) for `approx_count_distinct`'s
  * HyperLogLog sketch — the 100 TB default.
  */
object Profile {

  def columnStats(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    def distinctAgg(c: String) =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    // generated identifiers are positional (c0, c1, ...) so arbitrary
    // input column names (spaces, dashes, quotes) never reach the
    // stack() SQL string as identifiers; the display label is escaped
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"n_$i"),
        (count(lit(1)) - count(col(c))).as(s"nulls_$i"),
        distinctAgg(c).as(s"d_$i"),
        round(min(col(c)).cast("double"), 6).as(s"mn_$i"),
        round(max(col(c)).cast("double"), 6).as(s"mx_$i"),
        round(sum(col(c).cast("double")), 2).as(s"s_$i")
      )
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) =>
        val label = c.replace("\\", "\\\\").replace("'", "\\'")
        s"'$label', n_$i, nulls_$i, d_$i, mn_$i, mx_$i, s_$i"
      }
      .mkString(", ")
    wide
      .selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n, n_nulls, n_distinct, vmin, vmax, vsum)")
      .orderBy("col_name")
  }

  /** KEY-SKEW report for a prospective join/aggregation key: the top-k
    * heaviest keys with their row counts, share of the table, and the
    * ratio to a perfectly uniform key (share × distinct-key count — the
    * "how many tasks' worth of rows does this one key carry" number that
    * decides between AQE skew handling and explicit salting, see
    * `operators.Scale.saltedEquiJoin`). Two aggregations over one scan;
    * the per-key counts shuffle once on the key itself.
    */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK > 0)
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(
      sum("n_rows").as("_total"),
      count(lit(1)).as("_n_keys"))
    counts
      .crossJoin(broadcast(totals))
      .withColumn("share", round(col("n_rows") / col("_total"), 6))
      .withColumn(
        "skew_vs_uniform",
        // double BEFORE multiplying: n_rows × n_keys as long×long overflows
        // on exactly the huge skewed tables this diagnostic exists for
        // (ANSI mode turns that into a query-killing exception)
        round(col("n_rows").cast("double") * col("_n_keys") / col("_total"), 6))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(topK)
      .select(col(keyCol), col("n_rows"), col("share"), col("skew_vs_uniform"))
  }
}
