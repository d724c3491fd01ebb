package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based data-quality validation — the expectation checks an ETL
  * pipeline runs before publishing a load (the reference validates its
  * extracts by reconciling counts, `utils.py:447-459`; this is the
  * row-level generalization: "every row must satisfy these predicates,
  * tell me which rules failed, how often, and where to start looking").
  *
  * ONE aggregation job over a single scan evaluates every rule
  * (partial-aggregated map-side, so the shuffle carries `2 × #rules`
  * numbers per partition regardless of table size); `stack` unpivots the
  * wide result into one row per rule. NULL rule results count as
  * violations — an expectation that cannot be evaluated is not met,
  * which is the fail-closed direction a quality gate wants.
  */
object Validate {

  /** Per-rule violation report: `(rule, n_violations, first_violation)`
    * ordered by rule name, where `first_violation` is the minimum
    * `idCol` among violating rows (NULL when the rule holds everywhere)
    * — a deterministic "go look at this row" pointer.
    */
  def report(df: DataFrame, idCol: String, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "Validate.report: no rules given")
    require(
      rules.map(_._1).distinct.size == rules.size,
      "Validate.report: duplicate rule names")
    // positional identifiers (v0, v1, ...) so arbitrary rule names never
    // reach the stack() SQL string as identifiers; labels are escaped
    val violates = rules.map { case (_, pred) => !coalesce(pred, lit(false)) }
    val aggs = violates.zipWithIndex.flatMap { case (v, i) =>
      Seq(
        // coalesce: sum() over ZERO rows is NULL — an empty load is a
        // realistic pre-publish input and must report 0 violations per
        // rule (and pass enforce()), not NULL counts / an NPE
        coalesce(sum(when(v, 1L).otherwise(0L)), lit(0L)).as(s"v_$i"),
        min(when(v, col(idCol))).as(s"id_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) =>
        val label = name.replace("\\", "\\\\").replace("'", "\\'")
        s"'$label', v_$i, id_$i"
      }
      .mkString(", ")
    wide
      .selectExpr(
        s"stack(${rules.size}, $stackArgs) AS (rule, n_violations, first_violation)")
      .orderBy("rule")
  }

  /** Gate form of [[report]]: throws if any rule is violated, returning
    * the (materialized, small — one row per rule) report otherwise. The
    * "fail the pipeline before the bad load publishes" shape.
    */
  def enforce(df: DataFrame, idCol: String, rules: Seq[(String, Column)]): Array[org.apache.spark.sql.Row] = {
    val rep = report(df, idCol, rules).collect()
    val bad = rep.filter(_.getLong(1) > 0L)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "data-quality gate failed: " +
          bad.map(r => s"${r.getString(0)} (${r.getLong(1)} rows, first=${r.get(2)})").mkString("; "))
    rep
  }
}
