package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter plumbing completing the engine's mergeable-sketch family
  * (HLL = cardinality, CMS = frequency — [[CmsExpressions]] —, Bloom =
  * MEMBERSHIP). Spark ships `DataFrame.stat.bloomFilter`, but that is a
  * driver-side action returning a JVM object: it can't run inside a
  * `groupBy`, can't be stored in a column, and can't merge per-batch
  * filters without driver round-trips. These expressions make the filter
  * a first-class column value, same contract as `cms_union_agg`:
  *
  *  - [[BloomBuildAggregate]] (`bloom_agg`): build a serialized filter
  *    over pre-hashed long keys. Bloom union is bitwise OR, so building
  *    per-partition partials and merging is BIT-IDENTICAL to one pass
  *    over the full data — exactly mergeable, order-independent
  *    (stronger than HLL's approximate union, same as CMS's additive
  *    one). Map-side partial aggregation therefore applies: the exchange
  *    carries one fixed-size bitset per partition, never the keys.
  *  - [[BloomMightContainLong]] (`bloom_might_contain`): membership
  *    probe. No false negatives ever; false positives at the configured
  *    `fpp`. The per-thread deserialized-filter cache
  *    ([[CachedBloomEval]], the [[CachedSketchEval]] pattern) makes
  *    probing ONE filter per scan row deserialize once per thread — the
  *    map-side-prefilter usage this exists for (broadcast a small set's
  *    filter, drop non-members at the scan, exact-join only survivors;
  *    see `Decontamination.benchmarkContainmentBloom`).
  *
  * Hash identity: keys are PRE-HASHED longs (`xxhash64(key)`), the
  * [[MinHashAggregate]]/[[CmsEstimate]] convention — build and probe
  * then use the same long path and agree across plans and engines.
  *
  * Sizing note for 100 TB: `expectedItems` fixes the bitset size
  * (~ -n·ln(fpp)/ln²2 bits); overfilling degrades fpp but never
  * correctness (no false negatives regardless). Filters built with
  * different (expectedItems, fpp) don't merge — `mergeInPlace` throws,
  * surfacing the misconfiguration instead of silently corrupting.
  */
case class BloomBuildAggregate(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, s"bloom_agg expectedItems must be positive, got $expectedItems")
  require(fpp > 0 && fpp < 1, s"bloom_agg fpp must be in (0,1), got $fpp")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg needs a BIGINT pre-hashed key, got ${child.dataType}")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAggregate =
    copy(child = newChildren.head)
}

/** One-entry per-thread cache of the last deserialized Bloom filter,
  * keyed on the serialized bytes — same shape as [[CachedSketchEval]],
  * with one sharp edge the CMS probes don't have: Bloom filters are
  * orders of magnitude larger (≈ 1.2 MB per 10⁶ keys at 1% fpp), so the
  * content-equality fallback — a full memcmp of the filter — is only
  * acceptable as a SAFETY NET, never the steady state. Callers probing
  * per scan row MUST hand the filter as a stable reference (a `lit` of
  * the collected bytes — `Decontamination.BenchBloomIndex.bloomBytes`),
  * where the `eq` fast path hits every row; a row-sourced BINARY column
  * copies the bytes per access and pays the memcmp per row (measured
  * 34× on the decontamination screen).
  */
private[plans] trait CachedBloomEval {
  @transient private lazy val cache =
    new ThreadLocal[(Array[Byte], BloomFilter)]

  protected final def filterFor(bytes: Array[Byte]): BloomFilter = {
    val c = cache.get()
    if (c != null && ((c._1 eq bytes) || java.util.Arrays.equals(c._1, bytes))) c._2
    else {
      val f = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      cache.set((bytes, f))
      f
    }
  }
}

/** Membership probe of a serialized Bloom filter for a pre-hashed long
  * key: false ⇒ definitely absent, true ⇒ present at confidence 1-fpp.
  * Per-row probes against one broadcast filter deserialize once per
  * thread, not once per row (see [[CachedBloomEval]]).
  */
case class BloomMightContainLong(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with CachedBloomEval {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs (BINARY filter, BIGINT pre-hashed key), got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(filter: Any, key: Any): Any =
    filterFor(filter.asInstanceOf[Array[Byte]])
      .mightContainLong(key.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainLong =
    copy(left = newLeft, right = newRight)
}

object Bloom {
  /** Serialized Bloom filter over pre-hashed long keys (`xxhash64(key)`).
    * Partials merge by bitwise OR — bit-identical to a single-pass build.
    */
  def bloomAgg(hashedKey: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    GraftSqlBridge.column(
      BloomBuildAggregate(GraftSqlBridge.expression(hashedKey), expectedItems, fpp)
        .toAggregateExpression())

  /** Membership probe for a pre-hashed long key. */
  def bloomMightContain(filter: Column, hashedKey: Column): Column =
    GraftSqlBridge.column(
      BloomMightContainLong(GraftSqlBridge.expression(filter),
        GraftSqlBridge.expression(hashedKey)))
}
