package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Custom Catalyst AGGREGATE for the KMV distinct-count sketch: per
  * group, the `k` smallest DISTINCT values of a LONG child — evaluated
  * as a bounded mutable buffer inside Spark's ObjectHashAggregate, so
  * the map side reduces every partition to at most `k` longs per group
  * BEFORE the exchange. That is the shape that makes a sketch a sketch:
  * the shuffle carries `|groups| × k × 8` bytes per partition, never the
  * corpus's distinct-value set (a `distinct().groupBy()` formulation
  * shuffles ALL distinct values — billions of rows at 100 TB — just to
  * throw away everything but `k` of them per group).
  *
  * The buffer is a red-black tree (`java.util.TreeSet`) capped at `k`:
  * insert is a no-op for duplicates and for values above the current
  * k-th once full, so update cost is O(log k) worst-case and O(1) for
  * the common above-threshold reject. `merge` folds one buffer into the
  * other under the same cap — the associative/commutative sketch union,
  * which also makes the result provably independent of partitioning and
  * arrival order. `eval` emits the ascending `ARRAY<BIGINT>` of kept
  * hashes (the serializable sketch itself, so callers can persist or
  * re-merge it); the estimator stays in plain SQL on top.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 1, s"kmv_sketch: k must be > 1, got $k")

  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      // add() returns false for a duplicate — only then is nothing evicted
      if (buf.add(v)) { buf.pollLast(); () }
    }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator() // TreeSet iterates ascending — kth = last slot
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** Custom Catalyst AGGREGATE for a SIZE-SATURATING distinct set of a
  * LONG child: per group, the exact distinct-value set while it holds
  * at most `cap` values, with insertion STOPPING once the buffer holds
  * `cap + 1` values. Growth is monotone and values are only refused at
  * size `cap + 1`, so the final size is `min(true distinct count,
  * cap + 1)`: `size > cap` is a sound, memory-bounded witness that the
  * group exceeds the cap, and every non-saturated result is the exact
  * set. That is what lets [[graft.operators.Graph]] build CAPPED
  * co-occurrence item sets in ONE aggregation exchange — a plain
  * `collect_set` materializes even a bot-scale group (10⁹ items) in a
  * single task's buffer BEFORE any size filter can drop it (the
  * single-giant-key anti-shape AQE cannot split), while the
  * count-filter-then-join shape that avoids that pays two extra
  * data-scale exchanges. `merge` inserts under the same bound, so the
  * kept/dropped verdict and every kept group's set are independent of
  * partitioning and arrival order.
  */
case class BoundedSetAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(cap >= 1 && cap <= 16777216,
    s"bounded_set: cap must be in [1, 16777216], got $cap")

  override def prettyName: String = "bounded_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashSet[java.lang.Long] =
    new java.util.HashSet[java.lang.Long]()

  // grow to at most cap + 1 values; at cap + 1 the buffer IS the
  // saturation witness and stops absorbing
  private def insert(buf: java.util.HashSet[java.lang.Long], v: java.lang.Long): Unit =
    if (buf.size <= cap) { buf.add(v); () }

  override def update(
      buf: java.util.HashSet[java.lang.Long],
      input: InternalRow): java.util.HashSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.HashSet[java.lang.Long],
      other: java.util.HashSet[java.lang.Long]): java.util.HashSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext && buf.size <= cap) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.HashSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedSetAgg =
    copy(child = newChild)
}

/** Custom Catalyst AGGREGATE for bounded TOP-K-ROWS-PER-GROUP: per
  * group, the `k` best `(ord, tag)` pairs under the total order
  * "`ord` DESC, `tag` ASC" — the `row_number() OVER (PARTITION BY g
  * ORDER BY ord DESC, tag) <= k` answer, WITHOUT the window. The
  * window formulation shuffles EVERY row of the corpus to its group's
  * partition and sorts it there just to discard all but `k` rows —
  * the canonical 100 TB anti-shape (and a skew magnet: one hot group
  * serializes on one task). Here the bounded buffer runs inside
  * ObjectHashAggregate's map side, so each partition forwards at most
  * `k` pairs per group into the one exchange and the reduce side
  * merges buffers under the same cap — shuffle volume is
  * `|groups| × k × 16` bytes per partition regardless of row count,
  * and a hot group costs exactly what a cold one does.
  *
  * Pairs are DISTINCT under the buffer (a `TreeSet`), so callers must
  * pass a tie-break `tag` that is unique per row (an id) — the same
  * precondition that makes the `row_number` formulation deterministic
  * at all. `eval` emits the pairs best-first as
  * `ARRAY<STRUCT<ord, tag>>`; `merge` is associative/commutative, so
  * the result is independent of partitioning and arrival order.
  */
case class TopKPairsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"topk_pairs: k must be in [1, 65536], got $k")

  override def prettyName: String = "topk_pairs"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("tag", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  // best-first: highest ord wins, lowest tag breaks ties — so `last`
  // is always the weakest kept pair and eviction is O(log k); a
  // serializable singleton because the expression ships in the task
  // closure (an anonymous Comparator fails closure serialization)
  private def cmp: Comparator[(Long, Long)] = TopKPairsAgg.BestFirst

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](cmp)

  private def insert(buf: java.util.TreeSet[(Long, Long)], p: (Long, Long)): Unit =
    if (buf.size < k) { buf.add(p); () }
    else if (cmp.compare(p, buf.last) < 0) {
      // add() returns false for a duplicate — only then is nothing evicted
      if (buf.add(p)) { buf.pollLast(); () }
    }

  override def update(
      buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val o = left.eval(input)
    val t = right.eval(input)
    if (o != null && t != null) insert(buf, (o.asInstanceOf[Long], t.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator() // iterates best-first per cmp — rank order
    while (it.hasNext) {
      val p = it.next()
      out(i) = InternalRow(p._1, p._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add((bb.getLong, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)
}

object TopKPairsAgg {
  /** "`ord` DESC, `tag` ASC" as a serializable singleton. */
  private[functions] object BestFirst
    extends Comparator[(Long, Long)] with Serializable {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val byOrd = java.lang.Long.compare(b._1, a._1)
      if (byOrd != 0) byOrd else java.lang.Long.compare(a._2, b._2)
    }
  }
}

/** Custom Catalyst AGGREGATE for per-group FREQUENT ITEMS: the
  * SpaceSaving sketch (Metwally, Agrawal & El Abbadi, "Efficient
  * computation of frequent and top-k elements in data streams") over a
  * STRING child, one bounded counter map per group. While a group's
  * distinct-item count stays within `capacity` the counts are EXACT
  * (`err` = 0 for every item — the sketch's own below-capacity rule);
  * past it, an unseen item replaces a current minimum, inheriting its
  * count as the overestimation bound (`cnt − err ≤ true ≤ cnt`), and
  * WHICH tail items survive becomes arrival/merge-order dependent —
  * the standard sketch trade, documented here because Spark does not
  * fix partition arrival order. Eviction picks the minimum by
  * `(count, err DESC, item)` so the choice is at least deterministic
  * per buffer state.
  *
  * The 100 TB shape: the map lives inside ObjectHashAggregate's map
  * side, so each partition forwards at most `capacity` counters per
  * group into the one exchange — "top terms per domain" in one pass
  * without shuffling the (group, term) pair corpus. `eval` emits all
  * kept items as `ARRAY<STRUCT<item, cnt, err>>` sorted by
  * `cnt` DESC, `item` ASC (the `row_number` tie order, so an exact
  * below-capacity sketch slices straight into a ranked top-k).
  *
  * Merge sums counts and errs for shared items, then evicts back down
  * to `capacity` — the Agarwal et al. mergeable-summaries rule,
  * associative in the exact regime.
  *
  * Eviction scans the map for its minimum (O(capacity) per evicting
  * insert): fine while evictions are rare (capacity sized to the
  * vocabulary, the intended regime); a stream whose per-group
  * cardinality dwarfs the capacity would want SpaceSaving's
  * stream-summary structure (O(1) eviction) instead.
  */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]]
  with UnaryLike[Expression] {

  require(capacity >= 1 && capacity <= 65536,
    s"freq_items: capacity must be in [1, 65536], got $capacity")

  override def prettyName: String = "freq_items"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", org.apache.spark.sql.types.StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  // (count asc, err desc, item asc): the least-valuable kept counter —
  // fewest observations, loosest bound, latest name
  private def evictionKey(buf: java.util.HashMap[String, Array[Long]]): String = {
    var best: String = null
    var bc = Long.MaxValue
    var be = -1L
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0); val er = e.getValue()(1)
      if (c < bc || (c == bc && (er > be || (er == be &&
          (best == null || e.getKey.compareTo(best) < 0))))) {
        best = e.getKey; bc = c; be = er
      }
    }
    best
  }

  private def observe(
      buf: java.util.HashMap[String, Array[Long]],
      item: String, cnt: Long, err: Long): Unit = {
    val cur = buf.get(item)
    if (cur != null) { cur(0) += cnt; cur(1) += err }
    else if (buf.size < capacity) buf.put(item, Array(cnt, err))
    else {
      // SpaceSaving replacement: the new item inherits the evicted
      // minimum's count as its overestimation bound
      val victim = evictionKey(buf)
      val vc = buf.remove(victim)(0)
      buf.put(item, Array(vc + cnt, vc + err))
    }
  }

  override def update(
      buf: java.util.HashMap[String, Array[Long]],
      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      observe(buf, v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString, 1L, 0L)
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, Array[Long]],
      other: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      observe(buf, e.getKey, e.getValue()(0), e.getValue()(1))
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    val entries = new Array[(String, Long, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0), e.getValue()(1))
      i += 1
    }
    java.util.Arrays.sort(entries.asInstanceOf[Array[AnyRef]], FreqItemsAgg.ByCountDesc)
    new GenericArrayData(entries.map { case (item, c, er) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(item), c, er)
    }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    var bytes = 4
    val sizes = new java.util.HashMap[String, Array[Byte]](buf.size)
    val it0 = buf.keySet().iterator()
    while (it0.hasNext) {
      val k = it0.next()
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      sizes.put(k, b)
      bytes += 4 + b.length + 16
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = sizes.get(e.getKey)
      bb.putInt(kb.length); bb.put(kb)
      bb.putLong(e.getValue()(0)); bb.putLong(e.getValue()(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[String, Array[Long]](n)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        Array(bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}

object FreqItemsAgg {
  /** `cnt` DESC, `item` ASC — the ranked-output order. */
  private[functions] object ByCountDesc extends Comparator[AnyRef] with Serializable {
    override def compare(xa: AnyRef, xb: AnyRef): Int = {
      val a = xa.asInstanceOf[(String, Long, Long)]
      val b = xb.asInstanceOf[(String, Long, Long)]
      val byCnt = java.lang.Long.compare(b._2, a._2)
      if (byCnt != 0) byCnt else a._1.compareTo(b._1)
    }
  }
}

object SketchExpressions {

  /** `k` smallest distinct values of a LONG column per group, ascending
    * (see [[KmvSketchAgg]]). Usable anywhere a built-in aggregate is.
    */
  def kmv_sketch(values: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(values), k).toAggregateExpression())

  /** Size-saturating distinct set of a LONG column per group: the
    * exact distinct set while ≤ `cap` values, `cap + 1` values once the
    * group exceeds the cap (see [[BoundedSetAgg]] — `size(...) > cap`
    * is the memory-bounded over-cap witness).
    */
  def bounded_set(values: Column, cap: Int): Column =
    ColumnBridge.column(
      BoundedSetAgg(ColumnBridge.expression(values), cap).toAggregateExpression())

  /** `k` best `(ord, tag)` pairs per group under "`ord` DESC, `tag`
    * ASC", best-first (see [[TopKPairsAgg]]). Both columns must be
    * LONG; `tag` should be unique per row for row-top-k semantics.
    */
  def topk_pairs(ord: Column, tag: Column, k: Int): Column =
    ColumnBridge.column(
      TopKPairsAgg(
        ColumnBridge.expression(ord), ColumnBridge.expression(tag), k)
        .toAggregateExpression())

  /** SpaceSaving frequent-items sketch of a STRING column per group:
    * up to `capacity` `(item, cnt, err)` counters, `cnt` DESC / `item`
    * ASC (see [[FreqItemsAgg]]; exact with `err` = 0 while the group's
    * distinct-item count fits the capacity).
    */
  def freq_items(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      FreqItemsAgg(ColumnBridge.expression(item), capacity).toAggregateExpression())
}
