package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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

object SketchExpressions {

  /** `k` smallest distinct values of a LONG column per group, ascending
    * (see [[KmvSketchAgg]]). Usable anywhere a built-in aggregate is.
    */
  def kmv_sketch(values: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(values), k).toAggregateExpression())
}
