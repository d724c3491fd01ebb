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
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"n_$c"),
        (count(lit(1)) - count(col(c))).as(s"nulls_$c"),
        distinctAgg(c).as(s"d_$c"),
        round(min(col(c)).cast("double"), 6).as(s"mn_$c"),
        round(max(col(c)).cast("double"), 6).as(s"mx_$c"),
        round(sum(col(c).cast("double")), 2).as(s"s_$c")
      )
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', n_$c, nulls_$c, d_$c, mn_$c, mx_$c, s_$c")
      .mkString(", ")
    wide
      .selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n, n_nulls, n_distinct, vmin, vmax, vsum)")
      .orderBy("col_name")
  }
}
