package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting — Data Selection via Importance
  * Resampling (Xie et al., arXiv:2302.03169): score every raw document
  * by how much more likely its hashed n-gram features are under a small
  * TARGET distribution than under the RAW pool, then keep the
  * highest-weight documents. This is the standard "make web data look
  * like Wikipedia" selection signal; no counterpart in the reference
  * (its selection is engagement-based), added per the 100 TB
  * training-data charter.
  *
  * Feature space: bigrams hashed into `buckets` buckets with the
  * engine-portable md5 prefix (the [[Sampling]] convention — first 8 hex
  * chars, mod buckets). Both unigram models are bucket-count vectors
  * with add-one smoothing; a document's log importance weight is the sum
  * over its bigram OCCURRENCES of
  * `ln p_tgt(bucket) − ln p_raw(bucket)`.
  *
  * Relational shape: bigram postings (one corpus scan via
  * [[LanguageModel.bigramPostings]]) → bucket per posting → two
  * hash-aggregated count vectors (≤ `buckets` rows each — always
  * broadcastable, regardless of corpus size) → one broadcast join back
  * onto the postings → per-doc sum. The only corpus-sized shuffle is the
  * per-doc aggregate, keyed on doc id. At 100 TB the target side is the
  * small curated corpus; its count vector is ≤ `buckets` rows however
  * big the target is.
  *
  * Portability: each log-probability is quantized to integer micro-nats
  * SEPARATELY (`floor(ln((c+1)/(tot+B))·10⁶ + 0.5)`) before the
  * subtraction and the per-doc sum, so every downstream step is exact
  * BIGINT arithmetic — order-free, bit-identical on any engine (the q85
  * micro-nat convention).
  */
object Dsir {

  /** Engine-portable feature bucket for a bigram (w1, w2). */
  def bigramBucket(w1: Column, w2: Column, buckets: Int): Column =
    conv(substring(md5(concat(w1, lit(" "), w2)), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Per-document log importance weight over hashed-bigram features:
    * (id, n_bigrams, weight_u) — `weight_u` the exact micro-nat sum of
    * per-occurrence log-ratios. Documents with < 2 tokens have no
    * bigrams and are absent. `isTarget` marks the target rows INSIDE
    * `docs` (target ⊆ raw, as in the paper's raw-pool formulation).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 256): DataFrame = {
    // one corpus scan: the [[LanguageModel.bigramPostings]] shape with the
    // target flag carried through the per-doc lead window (constant per
    // doc, so no extra corpus join to re-attach it)
    val toks = docs.select(col(idCol).as("id"), isTarget.as("is_tgt"),
      posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "t")))
    val byDoc = Window.partitionBy("id").orderBy("pos")
    val posting = toks
      .withColumn("w2", lead(col("t"), 1).over(byDoc))
      .filter(col("w2").isNotNull)
      .withColumn("bucket", bigramBucket(col("t"), col("w2"), buckets))
      .select("id", "bucket", "is_tgt")
    val rawCounts = posting.groupBy("bucket")
      .agg(count(lit(1)).as("raw_c"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_c"))
    // totals as an unpartitioned window over the ≤`buckets`-row counts
    // frame (the q99 pattern) — an agg+crossJoin would re-derive the
    // whole postings subtree a third time for a 1-row total
    val everything = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lr = rawCounts
      .withColumn("raw_tot", sum("raw_c").over(everything))
      .withColumn("tgt_tot", sum("tgt_c").over(everything))
      .select(col("bucket"),
        (floor(log((col("tgt_c") + 1).cast("double") / (col("tgt_tot") + buckets))
            * 1000000.0 + 0.5).cast("long") -
          floor(log((col("raw_c") + 1).cast("double") / (col("raw_tot") + buckets))
            * 1000000.0 + 0.5).cast("long")).as("lr_u"))
    posting
      .join(broadcast(lr), "bucket")
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lr_u").as("weight_u"))
  }
}
