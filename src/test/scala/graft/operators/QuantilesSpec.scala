package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QuantilesSpec extends AnyFunSuite with SparkSpec {

  test("approx percentile stays within the exact ±1% rank envelope") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ps = Seq(0.5, 0.9)
    def byFlag(df: org.apache.spark.sql.DataFrame): Map[String, (Double, Double)] =
      df.collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
    val exact = byFlag(Quantiles.exact(li, "l_extendedprice", Seq("l_returnflag"), ps))
    val approx = byFlag(Quantiles.approx(li, "l_extendedprice", Seq("l_returnflag"), ps))
    // envelope: exact interpolated percentile at p ± 0.01 — approx's rank
    // error at accuracy=10000 on sf0.001 group sizes is far inside it
    val lo = byFlag(Quantiles.exact(li, "l_extendedprice", Seq("l_returnflag"), Seq(0.49, 0.89)))
    val hi = byFlag(Quantiles.exact(li, "l_extendedprice", Seq("l_returnflag"), Seq(0.51, 0.91)))
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    approx.foreach { case (flag, (a50, a90)) =>
      assert(a50 >= lo(flag)._1 && a50 <= hi(flag)._1, s"$flag p50=$a50 outside envelope")
      assert(a90 >= lo(flag)._2 && a90 <= hi(flag)._2, s"$flag p90=$a90 outside envelope")
    }
  }

  test("global (ungrouped) quantiles and percentile column naming") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = Quantiles.approx(li, "l_quantity", Nil, Seq(0.5, 0.999))
    assert(out.columns.toSeq == Seq("p50", "p99_9"))
    assert(out.count() == 1)
  }

  test("histogram: bin lower bounds bracket the ceil-rank order statistic") {
    import spark.implicits._
    // group a: 1..100; group b: ten copies of 7
    val df = ((1 to 100).map(v => ("a", v.toLong)) ++
      Seq.fill(10)(("b", 7L))).toDF("g", "v")
    val got = Quantiles.histogram(df, "v", "g", binWidth = 8L, percentiles = Seq(50, 90, 99))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // a: rank(50) = 50 → bin 50/8 = 6 → lo 48; rank(90) = 90 → bin 11 → 88;
    //    rank(99) = 99 → bin 12 → 96
    // b: every rank hits value 7 → bin 0 → lo 0
    assert(got.toSeq == Seq(("a", 100L, 48L, 88L, 96L), ("b", 10L, 0L, 0L, 0L)))
    // binWidth = 1: the lower bound IS the exact order statistic
    val exact1 = Quantiles.histogram(df, "v", "g", binWidth = 1L, percentiles = Seq(50, 99))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(exact1.toSeq == Seq(("a", 50L, 99L), ("b", 7L, 7L)))
    // error bound: lo <= true percentile < lo + binWidth
    assert(48L <= 50L && 50L < 48L + 8L)
  }

  test("histogramSketch + histogramMerge: sharded rollup equals the direct histogram") {
    import spark.implicits._
    val df = (1 to 500)
      .map(i => ("g" + (i % 3), i % 4, (i * 13 % 300).toLong))
      .toDF("g", "shard", "v")
    val direct = Quantiles.histogram(df, "v", "g", 16L, Seq(50, 90, 99))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val sk = Quantiles.histogramSketch(df, "v", Seq("g", "shard"), 16L)
    assert(sk.columns.toSeq == Seq("g", "shard", "bin", "cnt"))
    val merged = Quantiles.histogramMerge(sk, "g", 16L, Seq(50, 90, 99))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(merged == direct)
    val e = intercept[IllegalArgumentException] {
      Quantiles.histogramMerge(sk.withColumnRenamed("cnt", "count"), "g", 16L, Seq(50))
    }
    assert(e.getMessage.contains("bin/cnt"), e.getMessage)
  }

  test("cdfRank: percent of strictly-lower bins, corpus never shuffled") {
    import spark.implicits._
    val df = ((1 to 100).map(v => ("a", v.toLong, v.toLong)) ++
      Seq((400L, 7L)).map { case (id, v) => ("b", id, v) }).toDF("g", "id", "v")
    val got = Quantiles.cdfRank(df, "v", "g", binWidth = 10L)
    val byId = got.collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // group a, bin of v=5 is bin 0 (values 1..9): 0 values below → 0
    assert(byId(5L) == 0L)
    // v=15 → bin 1; below = 9 values (1..9) → 900 DIV 100 = 9
    assert(byId(15L) == 9L)
    // v=95 → bin 9; below = 89 values (1..89) → 89
    assert(byId(95L) == 89L)
    // singleton group: its only bin has nothing below it
    assert(byId(400L) == 0L)
    // the corpus side rides a broadcast join — no corpus shuffle
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    val e = intercept[IllegalArgumentException] {
      Quantiles.cdfRank(df.withColumnRenamed("id", "pct_lo"), "v", "g", 10L)
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("histogram: nulls excluded, negative values and bad args fail fast") {
    import spark.implicits._
    val withNull = Seq(("a", Some(3L)), ("a", None), ("a", Some(5L)))
      .toDF("g", "v")
    val row = Quantiles.histogram(withNull, "v", "g", 1L, Seq(100)).collect().head
    assert(row.getLong(1) == 2L && row.getLong(2) == 5L) // n counts non-null only
    val neg = Seq(("a", -1L)).toDF("g", "v")
    val e = intercept[Exception] {
      Quantiles.histogram(neg, "v", "g", 8L, Seq(50)).collect()
    }
    assert(e.getMessage.contains("non-negative"), e.getMessage)
    intercept[IllegalArgumentException](
      Quantiles.histogram(withNull, "v", "g", 0L, Seq(50)))
    intercept[IllegalArgumentException](
      Quantiles.histogram(withNull, "v", "g", 8L, Seq(0)))
    intercept[IllegalArgumentException](
      Quantiles.histogram(withNull, "v", "g", 8L, Seq(50, 50)))
  }
}
