package graft.functions

import org.apache.spark.sql.DataFrame

/** Column-name hygiene for parquet, re-expressing the reference's sanitizer
  * (`utils.py:55-66`): trim, spaces to `_`, delete `,;{}()\n\t=`.
  *
  * Single-pass `toDF(renamed: _*)` instead of N chained `withColumnRenamed`
  * calls — one projection node in the plan regardless of column count.
  */
object Sanitize {

  private val Forbidden: Set[Char] = ",;{}()\n\t=".toSet

  def cleanName(name: String): String =
    name.trim.replace(' ', '_').filterNot(Forbidden)

  /** Idempotent: sanitize(sanitize(df)) == sanitize(df). */
  def sanitizeColumns(df: DataFrame): DataFrame = {
    val cleaned = df.columns.map(cleanName)
    if (cleaned.sameElements(df.columns)) df else df.toDF(cleaned.toIndexedSeq: _*)
  }
}
