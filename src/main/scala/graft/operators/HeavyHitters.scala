package graft.operators

import graft.plans.Cms
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate heavy hitters over a key stream with a mergeable
  * count-min sketch, certified against exact counts (the q60/q64
  * certificate pattern: engine-specific sketch bytes never cross the
  * oracle boundary — the GUARANTEES do, as booleans).
  *
  * The production shape at 100 TB: each ingest batch aggregates its own
  * `count_min_sketch` (codegen'd built-in, map-side combined), the tiny
  * per-batch sketches are `cms_union_agg`-merged — cell-wise addition, so
  * the merged sketch is BIT-IDENTICAL to one sketch over all data, and
  * history is never rescanned. Estimates are read on a bounded candidate
  * frame (here: the exact top-k join), never per row of the corpus.
  *
  * Keys are pre-hashed with `xxhash64` (the [[graft.plans.MinHashAggregate]]
  * convention) so add and estimate use the sketch's long path identically;
  * a 64-bit key collision would conflate two keys' counts (probability
  * ~n²·2⁻⁶⁴ — accepted, same trade as the dedup posting indexes).
  */
object HeavyHitters {

  /** Top-`k` keys by exact count (total order: count desc, key asc) with
    * four sketch certificates:
    *
    *  - `est_lower_ok`: estimate >= exact (CMS never undercounts)
    *  - `est_upper_ok`: estimate <= exact + 2·eps·N (the Markov bound
    *    with the q60-style 2× headroom; N = total key occurrences)
    *  - `merge_exact`: the batch-merged estimate EQUALS the single-pass
    *    estimate — exact mergeability, bit-for-bit
    *  - `total_ok`: the merged sketch's totalCount == count(*) — no
    *    occurrence was dropped between batching and merging
    */
  def cmsTopKCertificate(df: DataFrame, keyCol: String, batchCol: String,
      k: Int, eps: Double, confidence: Double, seed: Int): DataFrame = {
    require(k > 0 && eps > 0 && confidence > 0 && confidence < 1,
      s"bad cmsTopKCertificate params: k=$k eps=$eps confidence=$confidence")
    val keyed = df.select(col(keyCol).as("key"), col(batchCol).as("__b"),
      xxhash64(col(keyCol)).as("__kh"))
    val perBatch = keyed.groupBy("__b")
      .agg(count_min_sketch(col("__kh"), lit(eps), lit(confidence), lit(seed))
        .as("sk"))
    val merged = perBatch.agg(Cms.cmsUnionAgg(col("sk")).as("sk_m"))
    val full = keyed.agg(
      count_min_sketch(col("__kh"), lit(eps), lit(confidence), lit(seed))
        .as("sk_f"),
      count(lit(1)).as("n_total"))
    val topK = keyed.groupBy("key")
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("key").asc)
      .limit(k)
    topK
      .crossJoin(broadcast(merged))   // both 1-row frames: the join is a
      .crossJoin(broadcast(full))     // broadcast of sketch bytes, not data
      .select(col("key"), col("n_exact"),
        (Cms.cmsEstimate(col("sk_m"), xxhash64(col("key"))) >= col("n_exact"))
          .as("est_lower_ok"),
        (Cms.cmsEstimate(col("sk_m"), xxhash64(col("key"))) <=
          col("n_exact") + ceil(lit(2.0 * eps) * col("n_total")).cast("long"))
          .as("est_upper_ok"),
        (Cms.cmsEstimate(col("sk_m"), xxhash64(col("key"))) ===
          Cms.cmsEstimate(col("sk_f"), xxhash64(col("key"))))
          .as("merge_exact"),
        (Cms.cmsTotal(col("sk_m")) === col("n_total")).as("total_ok"))
  }
}
