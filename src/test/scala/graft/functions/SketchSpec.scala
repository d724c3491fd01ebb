package graft.functions

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.LongType

/** Direct unit coverage of [[KmvSketchAgg]]'s buffer algebra — the
  * DataFrame-level behaviour (plan shape, oracle equality, estimator)
  * is pinned in ScaleSpec's kmvDistinct tests; here the aggregate
  * itself is exercised as the sketch it claims to be: order-invariant,
  * duplicate-blind, merge-associative, serde-stable.
  */
class SketchSpec extends AnyFunSuite {

  private def agg(k: Int) = KmvSketchAgg(BoundReference(0, LongType, nullable = true), k)

  private def sketchOf(k: Int, values: Seq[Long]): Seq[Long] = {
    val a = agg(k)
    val buf = values.foldLeft(a.createAggregationBuffer()) { (b, v) =>
      a.update(b, org.apache.spark.sql.catalyst.InternalRow(v))
    }
    a.eval(buf).asInstanceOf[ArrayData].toLongArray().toSeq
  }

  test("keeps the k smallest distinct values, ascending") {
    assert(sketchOf(3, Seq(9L, 4L, 7L, 4L, 1L, 8L, 1L)) == Seq(1L, 4L, 7L))
    // fewer than k distinct → all of them
    assert(sketchOf(5, Seq(2L, 2L, 3L)) == Seq(2L, 3L))
    assert(sketchOf(2, Seq.empty) == Seq.empty)
  }

  test("order-invariant and duplicate-blind (property)") {
    val prop = Prop.forAll { (xs: List[Long], seed: Long) =>
      val shuffled = new scala.util.Random(seed).shuffle(xs ++ xs)
      sketchOf(4, xs) == sketchOf(4, shuffled)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("merge is the sketch union: merge(sketch(a), sketch(b)) == sketch(a ++ b)") {
    val prop = Prop.forAll { (a: List[Long], b: List[Long]) =>
      val ag = agg(4)
      def bufOf(xs: List[Long]) = xs.foldLeft(ag.createAggregationBuffer()) { (s, v) =>
        ag.update(s, org.apache.spark.sql.catalyst.InternalRow(v))
      }
      val merged = ag.eval(ag.merge(bufOf(a), bufOf(b)))
        .asInstanceOf[ArrayData].toLongArray().toSeq
      merged == sketchOf(4, a ++ b)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val a = agg(8)
    val buf = Seq(5L, -3L, 11L, 0L, Long.MaxValue, Long.MinValue)
      .foldLeft(a.createAggregationBuffer()) { (b, v) =>
        a.update(b, org.apache.spark.sql.catalyst.InternalRow(v))
      }
    val back = a.deserialize(a.serialize(buf))
    assert(a.eval(back).asInstanceOf[ArrayData].toLongArray().toSeq ==
      a.eval(buf).asInstanceOf[ArrayData].toLongArray().toSeq)
  }

  test("null inputs carry no identity") {
    val a = agg(3)
    val buf = a.createAggregationBuffer()
    a.update(buf, org.apache.spark.sql.catalyst.InternalRow(null))
    a.update(buf, org.apache.spark.sql.catalyst.InternalRow(7L))
    assert(a.eval(buf).asInstanceOf[ArrayData].toLongArray().toSeq == Seq(7L))
  }

  test("k must exceed 1") {
    assert(intercept[IllegalArgumentException](agg(1)).getMessage.contains("k must be > 1"))
  }
}
