package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch plumbing Spark doesn't ship: the built-in
  * `count_min_sketch(col, eps, conf, seed)` aggregate produces a serialized
  * [[org.apache.spark.util.sketch.CountMinSketch]] binary, but there is no
  * SQL-level union or estimate — so per-batch sketches can't be merged
  * without driver-side deserialization. These expressions close the loop
  * (the HLL family has `hll_union`/`hll_sketch_estimate` built in; this is
  * the same mergeable-increments contract for FREQUENCY):
  *
  *  - [[CmsUnionAggregate]] (`cms_union_agg`): merge serialized sketches.
  *    CMS merge is cell-wise ADDITION, so a union of per-batch sketches is
  *    bit-identical to one sketch over the full data — order-independent,
  *    exactly mergeable (stronger than HLL's approximate union).
  *  - [[CmsEstimate]] (`cms_estimate`): point estimate for a pre-hashed
  *    LONG key. A one-entry per-thread cache keyed on the serialized
  *    bytes ([[CachedSketchEval]]) makes probing ONE sketch per row of a
  *    frame deserialize once per thread, not once per row; still, the
  *    scan side of a 100 TB job belongs in the codegen'd built-in
  *    aggregate, with these probes on the reduced frame.
  *  - [[CmsTotal]] (`cms_total`): the sketch's total ingested count — a
  *    cheap completeness cross-check against `count(*)`.
  *
  * Hash identity: keys must be PRE-HASHED longs (`xxhash64(key)`), the
  * [[MinHashAggregate]] convention — the sketch's long path is then used
  * on both add and estimate, so the built-in aggregate and these
  * expressions agree byte-for-byte.
  */
case class CmsUnionAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_union_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_union_agg needs a BINARY serialized sketch, got ${child.dataType}")

  // null buffer = "no sketch seen yet"; the first input adopts its sketch
  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val sk = CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]])
      if (buffer == null) sk else buffer.mergeInPlace(sk)
    }
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch =
    if (a == null) b else if (b == null) a else a.mergeInPlace(b)

  override def eval(buffer: CountMinSketch): Any =
    if (buffer == null) null else buffer.toByteArray

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null else CountMinSketch.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnionAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnionAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsUnionAggregate =
    copy(child = newChildren.head)
}

/** One-entry per-thread cache of the last deserialized sketch, keyed on
  * the serialized bytes. A row-sourced BINARY column hands each call a
  * FRESH array copy (UnsafeRow.getBinary), so reference equality alone
  * never hits; content equality (a vectorized memcmp) is an order of
  * magnitude cheaper than `CountMinSketch.readFrom`'s parse+allocate, and
  * the dominant usage — ONE unioned sketch probed per row of a frame —
  * then deserializes once per thread instead of once per row. ThreadLocal
  * because one Expression instance is shared across local-mode tasks.
  */
private[plans] trait CachedSketchEval {
  @transient private lazy val cache =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  protected final def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    val c = cache.get()
    if (c != null && ((c._1 eq bytes) || java.util.Arrays.equals(c._1, bytes))) c._2
    else {
      val sk = CountMinSketch.readFrom(bytes)
      cache.set((bytes, sk))
      sk
    }
  }
}

/** Point estimate from a serialized sketch for a pre-hashed long key.
  * Per-row probes against one sketch deserialize once per thread, not
  * once per row (see [[CachedSketchEval]]).
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with CachedSketchEval {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate needs (BINARY sketch, BIGINT pre-hashed key), got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    sketchFor(sketch.asInstanceOf[Array[Byte]])
      .estimateCount(java.lang.Long.valueOf(key.asInstanceOf[Long]))

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Total ingested count of a serialized sketch (`totalCount`). */
case class CmsTotal(child: Expression)
  extends UnaryExpression with CodegenFallback with CachedSketchEval {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_total"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_total needs a BINARY serialized sketch, got ${child.dataType}")

  override protected def nullSafeEval(sketch: Any): Any =
    sketchFor(sketch.asInstanceOf[Array[Byte]]).totalCount()

  override protected def withNewChildInternal(newChild: Expression): CmsTotal =
    copy(child = newChild)
}

object Cms {
  /** Union of serialized count-min sketches (all must share eps/conf/seed;
    * `mergeInPlace` throws on incompatible shapes).
    */
  def cmsUnionAgg(sketch: Column): Column =
    GraftSqlBridge.column(
      CmsUnionAggregate(GraftSqlBridge.expression(sketch)).toAggregateExpression())

  /** Estimate for a pre-hashed long key (`xxhash64(key)`). */
  def cmsEstimate(sketch: Column, hashedKey: Column): Column =
    GraftSqlBridge.column(
      CmsEstimate(GraftSqlBridge.expression(sketch), GraftSqlBridge.expression(hashedKey)))

  /** Total ingested count of the sketch. */
  def cmsTotal(sketch: Column): Column =
    GraftSqlBridge.column(CmsTotal(GraftSqlBridge.expression(sketch)))
}
