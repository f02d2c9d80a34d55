package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Everything keys on a hash of the record id, never an RNG: assignments
  * are reproducible across engines, reruns, cluster sizes, and
  * repartitioning (Spark's `sample`/`randomSplit` are none of those —
  * seed + partition layout dependent). The bucket function is the
  * md5-prefix form any engine can recompute, so splits and mixes are
  * oracle-checkable.
  */
object Sampling {

  /** Engine-portable deterministic bucket in [0, buckets): first 8 md5
    * hex chars of the id as a long.
    */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Reproducible train/val/test assignment by id hash. */
  def splitLabel(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic source mixing toward target weights: every source's
    * keep-fraction is scaled so the binding (most over-weighted relative
    * to its volume) source keeps 100% and the kept mix matches `weights`
    * in expectation. Membership is the id hash against a per-source
    * threshold — one tiny count aggregate, then a narrow filter pass, no
    * sampling shuffle. All sources in `weights` must be present.
    */
  def mixBySource(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double]): DataFrame = {
    // a zero weight would silently discard its source (threshold 0) and an
    // all-zero map would keep nothing (floor(NaN) → 0) — fail fast instead
    requirePositive(weights)
    val inScope = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
    val counts = inScope.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mixWithCounts(inScope, sourceCol, idCol, weights, counts)
  }

  /** Precomputed-counts overload: pipelines that already track per-source
    * volumes (catalog stats, a prior aggregation) pass them here and skip
    * the counting scan — the counting variant reads a 100 TB input twice
    * (once to count, once to filter); this one reads it once.
    */
  def mixBySource(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double], counts: Map[String, Long]): DataFrame = {
    requirePositive(weights)
    val inScope = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
    mixWithCounts(inScope, sourceCol, idCol, weights, counts)
  }

  private def requirePositive(weights: Map[String, Double]): Unit =
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must all be positive, got $weights")

  private def mixWithCounts(inScope: DataFrame, sourceCol: String,
      idCol: String, weights: Map[String, Double],
      counts: Map[String, Long]): DataFrame = {
    require(weights.keySet.subsetOf(counts.keySet),
      s"missing sources: ${weights.keySet -- counts.keySet}")
    require(weights.keySet.forall(counts(_) > 0),
      s"zero-count sources: ${weights.keySet.filter(counts(_) == 0)}")
    val c = weights.map { case (s, w) => counts(s) / w }.min
    val thresholds = weights.map { case (s, w) =>
      s -> math.floor(c * w / counts(s) * 1000000).toLong
    }
    val thrCol = weights.keys.foldLeft(lit(-1L)) { (acc, s) =>
      when(col(sourceCol) === s, lit(thresholds(s))).otherwise(acc)
    }
    inScope.filter(hashBucket(col(idCol), 1000000) < thrCol)
  }
}
