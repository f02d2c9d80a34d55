package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming near-duplicate detection: band an incoming document stream
  * with the one-pass MinHash kernel and join it against a STORED corpus
  * index — duplicate screening at ingest time, the streaming face of
  * [[graft.operators.Dedup.minhashCandidatesIncremental]].
  *
  * This became expressible in round 7: signatures used to be an
  * explode + groupBy aggregation, which on a stream is a stateful
  * watermark-bound aggregate (results only after the watermark closes,
  * unbounded state for open keys). The codegen'd
  * [[graft.plans.MinHashSig]] kernel is a per-row projection — STATELESS
  * — so banding a stream needs no watermark, no state store, and emits
  * in the same micro-batch the document arrives in. The only stream-side
  * operator is a stream-static equi-join on (band, bucket), which Spark
  * executes by broadcasting/scanning the static side per micro-batch.
  *
  * At 100 TB the corpus side is the persisted [[Dedup.minhashIndex]]
  * (bucketed by (band, bucket) on storage): history is never re-signed,
  * the stream only ever touches the index partitions its bands hash to.
  *
  * No counterpart exists in the reference (its streams dedupe by exact
  * business key only — `streaming/spark_jobs/trending_stream.py`
  * dropDuplicates); this is the LLM-training-data ingest path.
  */
object StreamingDedup {

  /** (id, band, bucket) rows for a STREAMING document frame — the same
    * family/banding as [[Dedup.minhashIndex]], so output is directly
    * joinable against a stored index built with the same parameters.
    * Stateless: safe in append mode with no watermark.
    */
  def bandedStream(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, shingleW: Int = 3,
      family: Dedup.MinHashFamily = Dedup.XxHashFamily): DataFrame =
    Dedup.minhashIndex(docs, idCol, textCol, bands, rowsPerBand, shingleW, family)

  /** Candidate duplicate hits of a new-doc stream against a stored corpus
    * index: one row per (new_id, existing_id, band, bucket) band
    * collision, emitted in the arriving micro-batch. Callers aggregate
    * per pair (e.g. in foreachBatch) when they need band-hit counts, and
    * verify candidates against the real text — same contract as the batch
    * candidate generators.
    *
    * `index` MUST come from [[Dedup.minhashIndex]] with the same
    * (bands, rowsPerBand, shingleW, family); mixed parameters silently
    * produce disjoint buckets — the spec pins the matched-parameter path.
    */
  def candidatesAgainstIndex(newDocs: DataFrame, idCol: String,
      textCol: String, index: DataFrame,
      bands: Int = 4, rowsPerBand: Int = 4, shingleW: Int = 3,
      family: Dedup.MinHashFamily = Dedup.XxHashFamily): DataFrame = {
    val stream = bandedStream(newDocs, idCol, textCol, bands, rowsPerBand,
      shingleW, family)
      .withColumnRenamed("id", "new_id")
    val idx = index.select(col("id").as("existing_id"),
      col("band"), col("bucket"))
    stream.join(idx, Seq("band", "bucket"))
      .filter(col("new_id") =!= col("existing_id"))
      .select("new_id", "existing_id", "band", "bucket")
  }
}
