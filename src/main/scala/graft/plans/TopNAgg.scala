package graft.plans

import java.nio.ByteBuffer
import java.util.PriorityQueue
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The n smallest values of a long column, as one bounded aggregation
  * buffer — the "keep the first N per key" primitive for per-key caps
  * (domain caps, per-source quotas) that does NOT sort the hot key.
  *
  * The naive formulations both serialize a hot key through one task:
  * `row_number() over (partition by key order by id) <= n` sorts EVERY
  * row of the key in a single window partition (the exact hot-domain
  * wall the per-key cap exists to contain — same failure shape as the
  * segment-dedup window VERDICT r8 flagged), and
  * `slice(sort_array(collect_list(id)), 1, n)` buffers the key's entire
  * id list before truncating. This aggregate's buffer is a bounded
  * max-heap of at most `n` entries, so map-side partial aggregation
  * applies: each input partition contributes at most `n` candidates, the
  * exchange carries `O(partitions · n)` longs per key instead of the
  * key's row count, and no task ever sorts more than `n` elements.
  *
  * Semantics: the `n` smallest non-null values, duplicates kept (a value
  * appearing twice can occupy two slots) — over unique ids this equals
  * `row_number() <= n` ordered ascending, which is the oracle twin.
  * Output is sorted ascending for deterministic comparison.
  */
case class TopNMinAggregate(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[java.lang.Long]] {

  require(n > 0, s"topn_min_agg n must be positive, got $n")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topn_min_agg"

  // max-heap: the root is the LARGEST of the n smallest seen so far, so
  // admission is one O(1) peek and replacement one O(log n) sift
  override def createAggregationBuffer(): PriorityQueue[java.lang.Long] =
    new PriorityQueue[java.lang.Long](
      java.util.Comparator.reverseOrder[java.lang.Long]())

  private def offer(heap: PriorityQueue[java.lang.Long], v: Long): Unit =
    if (heap.size < n) heap.add(v)
    else if (v < heap.peek()) { heap.poll(); heap.add(v) }

  override def update(heap: PriorityQueue[java.lang.Long],
      input: InternalRow): PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(a: PriorityQueue[java.lang.Long],
      b: PriorityQueue[java.lang.Long]): PriorityQueue[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(heap: PriorityQueue[java.lang.Long]): Any = {
    val out = new Array[Long](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(heap: PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * heap.size)
    bb.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val sz = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < sz) { heap.add(bb.getLong); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNMinAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNMinAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopNMinAggregate =
    copy(child = newChildren.head)
}

object TopNAgg {
  /** Aggregate column: the `n` smallest values of `c` (cast to long),
    * sorted ascending. Bounded buffer, map-side partials — see the class
    * scaladoc for why this beats `row_number()` on hot keys.
    */
  def topnMinAgg(c: Column, n: Int): Column =
    GraftSqlBridge.column(
      TopNMinAggregate(GraftSqlBridge.expression(c.cast("long")), n)
        .toAggregateExpression())
}
