package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward-looking point-in-time) join: for each left row, the
  * latest right row with the same key and `rightTime <= leftTime`.
  *
  * Implementation is the union + windowed last-ignoreNulls trick rather
  * than a range join: tag right rows 0 and left rows 1, union, and take
  * `last(payload, ignoreNulls)` over (key) ordered by (time, tag,
  * tie-break). One shuffle on the key, no per-key pair explosion — a
  * key×time range join materializes |L|×|R| rows per key before
  * filtering, which is exactly what dies at 100 TB. Tag ordering makes
  * same-timestamp right rows visible to left rows (<= semantics);
  * `tieBreakCols` pins which right row wins among equal timestamps.
  */
object AsOf {

  /** Latest right row with `rightTime <= leftTime` per left row. */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tieBreakCols: Seq[String] = Nil,
      inner: Boolean = false
  ): DataFrame =
    joinDirected(left, right, leftKey, rightKey, leftTime, rightTime,
      payloadCols, tieBreakCols, inner, forward = false)

  /** Earliest right row with `rightTime >= leftTime` per left row — the
    * mirror of [[joinBackward]] (window scanned in descending time).
    * Same single-shuffle shape; same tie-break rule (max tie-break struct
    * among rows at the nearest timestamp).
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tieBreakCols: Seq[String] = Nil,
      inner: Boolean = false
  ): DataFrame =
    joinDirected(left, right, leftKey, rightKey, leftTime, rightTime,
      payloadCols, tieBreakCols, inner, forward = true)

  private def joinDirected(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tieBreakCols: Seq[String],
      inner: Boolean,
      forward: Boolean
  ): DataFrame = {
    val ties = if (tieBreakCols.nonEmpty) tieBreakCols else payloadCols.take(1)
    val payload = struct((ties ++ payloadCols.filterNot(ties.contains)).map(col): _*)

    // a NULL right time sorts FIRST under ascending order, which would
    // make that row a universal fallback match; as-of semantics for an
    // unknown time are "matches nothing" — drop such rows up front
    val r = right
      .where(col(rightTime).isNotNull)
      .select(
        col(rightKey).as("_k"),
        col(rightTime).as("_t"),
        payload.as("_p"),
        lit(0).as("_tag")
      )
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))

    val u = r.unionByName(l, allowMissingColumns = true)
    val timeOrder = if (forward) col("_t").desc else col("_t").asc
    val w = Window
      .partitionBy(col("_k"))
      .orderBy(timeOrder, col("_tag"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a NULL LEFT time also matches nothing (it would sort to one end of
    // the window and pick up an arbitrary neighbor otherwise)
    val filled = u.withColumn(
      "_match",
      when(col("_t").isNotNull, last(col("_p"), ignoreNulls = true).over(w)))

    val base = filled.where(col("_tag") === 1)
    val kept = if (inner) base.where(col("_match").isNotNull) else base
    kept.select(
      left.columns.map(col).toIndexedSeq ++
        payloadCols.map(c => col(s"_match.$c").as(c)): _*
    )
  }
}
