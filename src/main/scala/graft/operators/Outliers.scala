package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group z-score outlier detection in EXACT INTEGER arithmetic.
  *
  * The textbook flag `|x − μ| > k·σ` is double arithmetic whose result
  * can flip with summation order — a row on the boundary may be an
  * outlier on one partitioning and not on another, and no SQL oracle
  * can replay it bit-for-bit. Clearing both denominators makes it an
  * integer comparison with the same truth table:
  *
  *   (n·x − S)²  >  k² · (n·Q − S²)
  *
  * where `S = Σx`, `Q = Σx²` over the group's scaled values (population
  * variance, ties excluded by the strict inequality). Every quantity is
  * a BIGINT, so the answer is independent of partitioning, merge order,
  * and engine — the [[graft.operators.TimeSeries.rollingAggregate]]
  * scaled-integer discipline applied to second moments.
  */
object Outliers {

  /** Events whose scaled value deviates from their group's mean by more
    * than `k` population standard deviations. Values are scaled to
    * integers by `round(value · scale)` (the engine-portable
    * quantization); output keeps `(keyCol, idCol, cents)` for the
    * flagged rows, where `cents` is the scaled value.
    *
    * Scale shape: ONE partial-aggregable pass builds per-group moments
    * `(n, S, Q)` — group-scale, never corpus-scale — which come back as
    * a BROADCAST join; the flag itself is row-local codegen. The corpus
    * is never shuffled (the window formulation `avg/stddev OVER
    * (PARTITION BY key)` shuffles and buffers every row twice).
    *
    * Exactness has a domain: the comparison needs `(n·max|x|)²` and
    * `k²·n·Q` inside 64 bits. Both bounds are checked on the
    * group-scale moments table and FAIL LOUDLY when exceeded (the
    * bounded-aggregate family's lossy-input discipline) — at the
    * default scale=100 that admits ~3·10⁹ value-units per group·row
    * product, far beyond any per-entity event volume in this corpus,
    * and a 100 TB deployment with hotter groups lowers `scale`.
    */
  def zscoreFlags(
      events: DataFrame,
      keyCol: String,
      idCol: String,
      valueCol: String,
      k: Int = 3,
      scale: Long = 100L
  ): DataFrame = {
    require(k >= 1, s"zscoreFlags: k must be at least 1, got $k")
    require(scale > 0, s"zscoreFlags: scale must be positive, got $scale")
    val reserved = Seq("cents", "_zs_n", "_zs_s", "_zs_q", "_zs_m", "_zs_g")
    require(!Seq(keyCol, idCol).exists(reserved.contains),
      s"zscoreFlags: key/id column collides with a reserved name (${reserved.mkString(", ")})")
    val base = events
      .select(col(keyCol), col(idCol),
        round(col(valueCol) * scale).cast("long").as("cents"))
      .where(col("cents").isNotNull)
    val kk = k.toLong * k.toLong
    // n·max|x| must square inside a BIGINT, and k²·n·Q must not wrap:
    // both checked per group on the moments table (group-scale rows)
    val sqrtMax = 3037000499L // floor(sqrt(Long.MaxValue))
    val stats = base
      .groupBy(col(keyCol).as("_zs_g"))
      .agg(
        count(lit(1)).as("_zs_n"),
        sum(col("cents")).as("_zs_s"),
        sum(expr("cents * cents")).as("_zs_q"),
        greatest(abs(max(col("cents"))), abs(min(col("cents")))).as("_zs_m"))
      .withColumn("_zs_n",
        when(col("_zs_n") * col("_zs_m") > sqrtMax ||
          col("_zs_q") > lit(Long.MaxValue / kk) / col("_zs_n"),
          raise_error(concat(lit("zscoreFlags: group "), col("_zs_g").cast("string"),
            lit(" exceeds the exact-integer domain — lower scale"))))
          .otherwise(col("_zs_n")))
      .drop("_zs_m")
    val dev = col("_zs_n") * col("cents") - col("_zs_s")
    base
      .join(broadcast(stats), col(keyCol) === col("_zs_g"))
      .where(dev * dev >
        lit(kk) * (col("_zs_n") * col("_zs_q") - col("_zs_s") * col("_zs_s")))
      .select(col(keyCol), col(idCol), col("cents"))
  }
}
