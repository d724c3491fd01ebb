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
}
