package graft

import org.apache.spark.sql.SparkSession

/** Explicit SparkSession factory (no import-time side effects, unlike the
  * reference's `utils.py:20-28` module-level session creation).
  *
  * Pins the parquet datetime rebase modes the reference pins at session start
  * (`utils.py:23-27`) so legacy timestamps round-trip deterministically, plus
  * UTC session time zone and AQE for runtime re-planning at scale.
  */
object Engine {

  /** Default shuffle parallelism: match local core count, not Spark's 200.
    * On a real cluster this would be ~2-3x total executor cores.
    */
  val DefaultShufflePartitions = 32

  def session(
      appName: String = "graft",
      master: String = s"local[$DefaultShufflePartitions]",
      shufflePartitions: Int = DefaultShufflePartitions
  ): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      // Rebase pinning, mirroring the reference (`utils.py:23-27`):
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // make the custom expressions first-class SQL functions in every
    // engine session (vec_dot, word_shingles, simhash64, ...)
    GraftExtensions.register(spark)
    spark
  }
}
