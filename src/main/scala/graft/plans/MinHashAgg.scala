package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All-permutations MinHash in a single aggregation buffer.
  *
  * `Dedup.minhashSignatures` computes the signature as `perms` separate
  * `min(xxhash64(sh, i))` aggregates — that's `perms` buffer slots managed
  * individually and `perms` column expressions per input row. This
  * `TypedImperativeAggregate` keeps one `Array[Long]` buffer and updates
  * all permutations per input in a tight loop; partial aggregation
  * (map-side combine) still applies, so the shuffle carries `perms` longs
  * per group either way — only the per-row CPU and buffer bookkeeping
  * shrink. The charter's §7.3 "possible future custom" sketch aggregate,
  * realized.
  *
  * Hash identity: the child MUST be the pre-hashed long column
  * (`xxhash64(shingle)`), matching the first level of
  * [[graft.operators.Dedup.minhashSignatures]]'s two-level family; the
  * aggregate applies the second-level permutation
  * `XxHash64Function.hash(h, LongType, seed = i)` — exactly what
  * `GraftSqlBridge.xxhash64Seeded(col, i)` computes — so signatures are
  * interchangeable with Dedup's. Feeding raw shingle STRINGS here would
  * produce a different (incompatible) family.
  */
case class MinHashAggregate(
    child: Expression,
    perms: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(perms)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val dt = child.dataType
      var i = 0
      while (i < perms) {
        val h = XxHash64Function.hash(v, dt, i.toLong)
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * perms)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(perms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAggregate =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Aggregate column: MinHash signature (array<long> of length `perms`)
    * over the PRE-HASHED long column (`xxhash64` of the shingle string) —
    * see the class scaladoc for the two-level family contract.
    */
  def minhashAgg(hashedShingle: Column, perms: Int): Column =
    GraftSqlBridge.column(
      MinHashAggregate(GraftSqlBridge.expression(hashedShingle), perms)
        .toAggregateExpression())
}
