package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) selection: the rows no other row beats on
  * every criterion at once — the multi-criteria shortlist query
  * (Börzsönyi et al., "The Skyline Operator", ICDE 2001). In a curation
  * pipeline this is "documents with the best quality-for-length
  * trade-off" without collapsing the criteria into one weighted score.
  *
  * The naive formulation is a quadratic NOT EXISTS self-join (the
  * oracle replays exactly that); the engine instead uses the 2-D
  * staircase property: sort by the first criterion descending and a row
  * is dominated iff some row with a STRICTLY better first criterion has
  * an at-least-equal second one, or a row TIED on the first has a
  * strictly better second. Both tests come from per-value maxima of the
  * second criterion — a table bounded by |distinct c1|, not by the
  * corpus — and the "best among strictly better" column is
  * [[Scale.globalRunningMax]] in exclusive mode over that grouped
  * table: range-partitioned, no single-task window, no quadratic
  * anything. The corpus itself is touched by one aggregation and one
  * key join.
  *
  * Ties on BOTH criteria are all kept (neither dominates — the standard
  * skyline convention), which also makes the operator idempotent.
  */
object Skyline {

  /** Rows of `df` on the 2-D Pareto frontier of `(c1, c2)`. Each
    * criterion is maximized by default; pass `maximize1 = false` /
    * `maximize2 = false` to minimize (internally negated, so criteria
    * must be integral and comfortably inside BIGINT). Rows with a NULL
    * criterion are excluded — NULL is not comparable, and a frontier
    * membership decided by NULL semantics would be an accident.
    */
  def skyline2D(
      df: DataFrame,
      c1: String,
      c2: String,
      maximize1: Boolean = true,
      maximize2: Boolean = true
  ): DataFrame = {
    val reserved = Seq("_sk_x", "_sk_y", "_sk_gy", "_sk_rmax")
    require(reserved.forall(c => !df.columns.contains(c)),
      s"skyline2D: input collides with a reserved working column (${reserved.mkString(", ")})")
    def oriented(c: String, maximize: Boolean) = {
      val v = col(c).cast("long")
      if (maximize) v else -v
    }
    val work = df
      .withColumn("_sk_x", oriented(c1, maximize1))
      .withColumn("_sk_y", oriented(c2, maximize2))
      .where(col("_sk_x").isNotNull && col("_sk_y").isNotNull)
    // |distinct c1| rows: the per-value best second criterion
    val grouped = work.groupBy("_sk_x").agg(max(col("_sk_y")).as("_sk_gy"))
    val staircase = Scale.globalRunningMax(
      grouped, Seq(col("_sk_x").desc), col("_sk_gy"), "_sk_rmax",
      exclusive = true)
    work
      .join(staircase, Seq("_sk_x"))
      .where(
        // dominated by a strictly-better c1 with at-least-equal c2?
        !coalesce(col("_sk_rmax") >= col("_sk_y"), lit(false)) &&
          // dominated by a c1-tie with strictly better c2?
          !(col("_sk_gy") > col("_sk_y")))
      .drop(reserved: _*)
  }
}
