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

  // ---- TopKPairsAgg: the bounded row-top-k buffer ----

  private def tkAgg(k: Int) = TopKPairsAgg(
    BoundReference(0, LongType, nullable = true),
    BoundReference(1, LongType, nullable = true), k)

  private def topkOf(k: Int, pairs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val a = tkAgg(k)
    val buf = pairs.foldLeft(a.createAggregationBuffer()) { (b, p) =>
      a.update(b, org.apache.spark.sql.catalyst.InternalRow(p._1, p._2))
    }
    val arr = a.eval(buf).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2); (r.getLong(0), r.getLong(1))
    }
  }

  /** The `row_number() <= k` reference answer: ord DESC, tag ASC, distinct pairs. */
  private def windowRef(k: Int, pairs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    pairs.distinct
      .sorted(Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long))
      .take(k)

  test("topk: keeps the k best (ord DESC, tag ASC) pairs, best-first") {
    val in = Seq((5L, 10L), (9L, 3L), (5L, 2L), (9L, 7L), (1L, 1L))
    assert(topkOf(3, in) == Seq((9L, 3L), (9L, 7L), (5L, 2L)))
    // fewer than k pairs → all of them, still ranked
    assert(topkOf(10, in) == windowRef(10, in))
    assert(topkOf(2, Seq.empty) == Seq.empty)
  }

  test("topk: order-invariant, duplicate-blind, equals the window answer (property)") {
    val prop = Prop.forAll { (xs: List[(Long, Long)], seed: Long) =>
      val shuffled = new scala.util.Random(seed).shuffle(xs ++ xs)
      topkOf(4, shuffled) == windowRef(4, xs)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("topk: merge is associative with the same capped answer") {
    val prop = Prop.forAll { (a: List[(Long, Long)], b: List[(Long, Long)]) =>
      val ag = tkAgg(4)
      def bufOf(xs: List[(Long, Long)]) = xs.foldLeft(ag.createAggregationBuffer()) {
        (s, p) => ag.update(s, org.apache.spark.sql.catalyst.InternalRow(p._1, p._2))
      }
      val merged = ag.eval(ag.merge(bufOf(a), bufOf(b)))
        .asInstanceOf[ArrayData]
      val got = (0 until merged.numElements()).map { i =>
        val r = merged.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      got == windowRef(4, a ++ b)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("topk: serialize/deserialize round-trips the buffer exactly") {
    val a = tkAgg(8)
    val buf = Seq((5L, 1L), (-3L, 2L), (Long.MaxValue, Long.MinValue), (0L, 0L))
      .foldLeft(a.createAggregationBuffer()) { (b, p) =>
        a.update(b, org.apache.spark.sql.catalyst.InternalRow(p._1, p._2))
      }
    val back = a.deserialize(a.serialize(buf))
    assert(back.size == buf.size)
    val (bi, fi) = (back.iterator(), buf.iterator())
    while (fi.hasNext) assert(bi.next() == fi.next())
  }

  // ---- FreqItemsAgg: the SpaceSaving counter map ----

  private def fiAgg(cap: Int) = FreqItemsAgg(
    BoundReference(0, org.apache.spark.sql.types.StringType, nullable = true), cap)

  private def feed(a: FreqItemsAgg, items: Seq[String]) =
    items.foldLeft(a.createAggregationBuffer()) { (b, s) =>
      a.update(b, org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    }

  private def entriesOf(a: FreqItemsAgg, buf: java.util.HashMap[String, Array[Long]]) = {
    val arr = a.eval(buf).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
  }

  test("freq: exact counts below capacity, cnt DESC / item ASC, err 0") {
    val a = fiAgg(8)
    val got = entriesOf(a, feed(a, Seq("b", "a", "b", "c", "a", "b")))
    assert(got == Seq(("b", 3L, 0L), ("a", 2L, 0L), ("c", 1L, 0L)))
  }

  test("freq: exact regime is order-invariant and merge is count addition (property)") {
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf("a", "b", "c", "d", "e"))
    val prop = Prop.forAll(gen, gen, org.scalacheck.Gen.long) { (xs, ys, seed) =>
      val a = fiAgg(8) // capacity 8 > 5 possible items: always exact
      val shuffled = new scala.util.Random(seed).shuffle(xs ++ ys)
      val merged = entriesOf(a, a.merge(feed(a, xs), feed(a, ys)))
      merged == entriesOf(a, feed(a, shuffled))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("freq: above capacity the new item inherits the evicted minimum's count as err") {
    val a = fiAgg(2)
    // a:3, b:1 — then c evicts b (the min), entering with cnt 2, err 1
    val got = entriesOf(a, feed(a, Seq("a", "a", "a", "b", "c")))
    assert(got == Seq(("a", 3L, 0L), ("c", 2L, 1L)))
    // SpaceSaving guarantee on the survivor: cnt − err <= true <= cnt
    assert(got.forall { case (_, c, e) => c - e >= 0 })
  }

  test("freq: serde round-trips; nulls carry no identity; capacity bounds enforced") {
    val a = fiAgg(8)
    val buf = feed(a, Seq("x", "y", "x", ""))
    a.update(buf, org.apache.spark.sql.catalyst.InternalRow(null))
    val back = a.deserialize(a.serialize(buf))
    assert(entriesOf(a, back) == entriesOf(a, buf))
    assert(entriesOf(a, buf) == Seq(("x", 2L, 0L), ("", 1L, 0L), ("y", 1L, 0L)))
    assert(intercept[IllegalArgumentException](fiAgg(0)).getMessage.contains("[1, 65536]"))
  }

  test("topk: null on either side carries no identity; k bounds enforced") {
    val a = tkAgg(3)
    val buf = a.createAggregationBuffer()
    a.update(buf, org.apache.spark.sql.catalyst.InternalRow(null, 1L))
    a.update(buf, org.apache.spark.sql.catalyst.InternalRow(1L, null))
    a.update(buf, org.apache.spark.sql.catalyst.InternalRow(7L, 7L))
    assert(a.eval(buf).asInstanceOf[ArrayData].numElements() == 1)
    assert(intercept[IllegalArgumentException](tkAgg(0)).getMessage.contains("[1, 65536]"))
    assert(intercept[IllegalArgumentException](tkAgg(65537)).getMessage.contains("[1, 65536]"))
  }

  private def bsAgg(cap: Int) =
    BoundedSetAgg(BoundReference(0, LongType, nullable = true), cap)

  private def bsOf(cap: Int, values: Seq[Long]): Set[Long] = {
    val a = bsAgg(cap)
    val buf = values.foldLeft(a.createAggregationBuffer()) { (b, v) =>
      a.update(b, org.apache.spark.sql.catalyst.InternalRow(v))
    }
    a.eval(buf).asInstanceOf[ArrayData].toLongArray().toSet
  }

  test("bounded_set: exact set at or under the cap, saturates at cap+1 above it") {
    assert(bsOf(4, Seq(3L, 1L, 3L, 2L)) == Set(1L, 2L, 3L))
    assert(bsOf(3, Seq(5L, 6L, 7L, 5L, 6L)) == Set(5L, 6L, 7L)) // exactly cap: exact
    // over-cap: size is cap+1 (the witness), never more — regardless of order
    val over = (1L to 10L)
    for (seed <- 1 to 20) {
      val shuffled = new scala.util.Random(seed).shuffle(over ++ over)
      assert(bsOf(4, shuffled).size == 5)
    }
    assert(intercept[IllegalArgumentException](bsAgg(0)).getMessage.contains("[1, 16777216]"))
  }

  test("bounded_set: merge keeps the kept/dropped verdict partition-invariant") {
    val a = bsAgg(4)
    def feedBs(values: Seq[Long]) =
      values.foldLeft(a.createAggregationBuffer()) { (b, v) =>
        a.update(b, org.apache.spark.sql.catalyst.InternalRow(v))
      }
    val prop = Prop.forAll { (xs: List[Long], cut0: Int) =>
      val vals = xs.map(v => math.floorMod(v, 9L)) // small domain: both regimes hit
      val cut = if (vals.isEmpty) 0 else math.floorMod(cut0, vals.size)
      val (l, r) = vals.splitAt(cut)
      val merged = a.deserialize(a.serialize(a.merge(feedBs(l), feedBs(r))))
      val got = a.eval(merged).asInstanceOf[ArrayData].toLongArray().toSet
      val truth = vals.toSet
      if (truth.size <= 4) got == truth // exact below the cap
      else got.size == 5 && got.subsetOf(truth) // saturated witness above it
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
