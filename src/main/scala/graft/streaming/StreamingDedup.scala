package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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

  // -------------------------------------------------------------------
  // The CLOSED ingest loop: screen, then grow the index, per micro-batch
  // -------------------------------------------------------------------

  /** One micro-batch of the self-maintaining ingest loop: screen `batch`
    * against every EARLIER micro-batch's bands in the persisted index at
    * `indexDir`, then append this batch's bands — so batch N+1 sees
    * batch N's documents, which the static-index join above by design
    * does not.
    *
    * Returns the (id_a, id_b, n_bands_shared) candidates involving this
    * batch's docs — both batch-vs-history and within-batch pairs
    * ([[Dedup.minhashCandidatesIncremental]] semantics).
    *
    * Exactly-once: the index is laid out one partition directory per
    * micro-batch (`batch_id=N`). A recovery re-run of batch N reads only
    * `batch_id < N` (its own earlier partial append is invisible to the
    * screen) and OVERWRITES `batch_id=N` — both halves idempotent, which
    * is what foreachBatch's at-least-once contract requires. The
    * partition filter also guarantees the lazily-returned candidate frame
    * can be evaluated after the append without double-counting this
    * batch's own bands from the storage side.
    *
    * At 100 TB: history is touched only through the (band, bucket) join
    * — nothing is ever re-signed — and compacting old `batch_id`
    * partitions into (band, bucket)-bucketed files is a storage-layout
    * concern, invisible to this reader.
    */
  def screenAndIndexBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, indexDir: String,
      bands: Int = 4, rowsPerBand: Int = 4, shingleW: Int = 3,
      family: Dedup.MinHashFamily = Dedup.XxHashFamily,
      maxBucketSize: Long = 100000): DataFrame = {
    val spark = batch.sparkSession
    val newBands = Dedup.minhashIndex(batch, idCol, textCol, bands,
      rowsPerBand, shingleW, family)
    val indexedIds = guardedIndexedBatchIds(batch, batchId, indexDir)
    val existing =
      if (indexedIds.isEmpty) newBands.limit(0)
      else IndexMaintenance.dropTombstoned(
        spark.read.parquet(indexDir).filter(col("batch_id") < batchId),
        "id", spark, indexDir)
        .select("id", "band", "bucket")
    val cands = Dedup.minhashCandidatesIncremental(batch, idCol, textCol,
      existing, bands, rowsPerBand, shingleW, family, maxBucketSize)
    newBands.write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
    cands
  }

  /** Compact the CLOSED batch partitions (`batch_id < upToBatch`, which
    * must be ≤ the stream checkpoint's committed id) of a
    * [[screenAndIndexBatch]] LSH index into the reserved `batch_id=-1`
    * partition, repartitioned on (band, bucket) — the storage layout the
    * screen's equi-join probes. The screen's `batch_id < current` filter
    * keeps every compacted row visible (−1 < any live id), the
    * renumbered-restart guard keeps holding (−1 ≤ current), and replays
    * of still-open batches keep overwriting only their own partitions.
    * Returns the number of batch partitions folded in.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatch: Long, targetPartitions: Int = 8): Long =
    IndexMaintenance.compactBatchStore(spark, indexDir, "batch_id=",
      upToBatch, Seq("band", "bucket"), targetPartitions,
      IndexMaintenance.dropTombstoned(_, "id", spark, indexDir))

  /** [[compactIndex]] for a [[screenSegmentsBatch]] seen-digest index:
    * closed batch partitions fold into `batch_id=-1` repartitioned on
    * the digest — the anti-join's probe key.
    */
  def compactSegmentIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatch: Long, targetPartitions: Int = 8): Long =
    IndexMaintenance.compactBatchStore(spark, indexDir, "batch_id=",
      upToBatch, Seq("__h"), targetPartitions,
      IndexMaintenance.dropTombstoned(_, "id", spark, indexDir))

  /** Batch ids already present in the partition-per-batch index at
    * `indexDir`, with the renumbered-restart guard applied.
    *
    * Explicit existence check, not a caught AnalysisException: a real
    * read failure (schema drift, corrupt footer) must PROPAGATE, not
    * silently screen against an empty index. The guard: a stream
    * restarted WITHOUT a durable checkpoint renumbers micro-batches from
    * 0 — batch 0 would screen against `batch_id < 0` (nothing) and
    * overwrite real history. Equal ids are fine (idempotent replay of
    * the same batch).
    */
  private[streaming] def guardedIndexedBatchIds(batch: DataFrame, batchId: Long,
      indexDir: String): Seq[Long] = {
    // compacted stores carry their fold bound in a marker: a replay of
    // a folded batch id (lost/renumbered checkpoint) must stop loudly —
    // the numbered directories that would have tripped the guard below
    // no longer exist after compaction
    IndexMaintenance.requireReplayable(batch.sparkSession, indexDir, batchId)
    val idxPath = new org.apache.hadoop.fs.Path(indexDir)
    val fs = idxPath.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    val indexedIds: Seq[Long] =
      if (!fs.exists(idxPath)) Seq.empty
      else fs.listStatus(idxPath).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch_id=")).map(_.stripPrefix("batch_id=").toLong)
    require(indexedIds.forall(_ <= batchId),
      s"index at $indexDir already holds batch ids " +
        s"${indexedIds.filter(_ > batchId).sorted.mkString(",")} > current " +
        s"$batchId — stream restarted with renumbered batch ids (run " +
        "the ingest with a durable checkpointDir); refusing to " +
        "overwrite history")
    indexedIds
  }

  /** One micro-batch of C4-style EXACT segment dedup at ingest — the
    * segment-digest analogue of [[screenAndIndexBatch]]: drop every
    * segment of `batch` whose digest was seen in ANY earlier micro-batch
    * (or earlier in this batch, keep-first by (id, idx)), reassemble the
    * surviving text, and append this batch's distinct digests to the
    * persisted seen-index at `indexDir`.
    *
    * Returns [[graft.operators.Dedup.segmentDedup]]'s
    * (id, n_segs, n_kept, kept_text) contract for the batch's docs.
    * First-occurrence is ARRIVAL order across batches: an earlier batch's
    * copy wins regardless of id; within a batch, (id, idx) order — so
    * with batch-monotone ids the stream output equals the batch operator
    * on the concatenated corpus, restricted to this batch (spec-pinned).
    *
    * Exactly-once follows [[screenAndIndexBatch]]: one partition
    * directory per micro-batch; a recovery re-run reads only
    * `batch_id < N` and overwrites `batch_id=N` — both halves
    * idempotent. At 100 TB the history is touched only through the
    * digest anti-join (32-byte rows), never re-segmented.
    */
  def screenSegmentsBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, indexDir: String, width: Int = 16): DataFrame = {
    val spark = batch.sparkSession
    val indexedIds = guardedIndexedBatchIds(batch, batchId, indexDir)
    // the seen-index rows are ATTRIBUTED (id, __h) since r13 so that a
    // tombstoned document's digests become unseen again — unless a
    // surviving document also contributed them (its row keeps the
    // digest seen), exactly a rebuild on the surviving corpus
    val seen =
      if (indexedIds.isEmpty)
        Dedup.segmentDigestsAttributed(batch.limit(0), idCol, textCol, width)
          .select("__h")
      else IndexMaintenance.dropTombstoned(
        spark.read.parquet(indexDir).filter(col("batch_id") < batchId),
        "id", spark, indexDir)
        .select("__h")
    val screened = Dedup.segmentDedupAgainst(batch, idCol, textCol, width, seen)
    Dedup.segmentDigestsAttributed(batch, idCol, textCol, width)
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
    screened
  }

  /** Delete documents from a screening index at `indexDir` (either the
    * LSH band store or the attributed segment-digest store — both key
    * their rows by the contributing `id`): record tombstones under the
    * [[IndexMaintenance.writeTombstones]] convention. Every subsequent
    * screen masks the ids (a deleted document can never again be
    * emitted as the `existing` side of a candidate pair, and its
    * segments count as unseen), and the next compaction drops the rows
    * physically. Idempotent per (ids, batchId).
    */
  def deleteDocs(ids: DataFrame, idCol: String, indexDir: String,
      batchId: Long): Unit =
    IndexMaintenance.writeTombstones(ids, idCol, indexDir, batchId)

  /** The streaming deletion face ([[deleteDocs]] per micro-batch of a
    * tombstone id stream) — replay-idempotent by the
    * partition-per-batch convention.
    */
  def deletionIngest(ids: DataFrame, idCol: String, indexDir: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = ids.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        deleteDocs(batch, idCol, indexDir, batchId)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** The streaming face of [[screenSegmentsBatch]]: a `foreachBatch`
    * query that segment-screens each arriving micro-batch against the
    * growing seen-index and hands the screened (reassembled) docs to
    * `onScreened`. Same checkpoint contract as [[screeningIngest]]:
    * PRODUCTION MUST pass `checkpointDir` or a restart renumbers batch
    * ids and the guard fails the query loudly.
    */
  def segmentScreeningIngest(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, checkpointDir: Option[String] = None,
      width: Int = 16)(
      onScreened: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onScreened(screenSegmentsBatch(batch, batchId, idCol, textCol,
          indexDir, width), batchId)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** The streaming face of [[screenAndIndexBatch]]: a `foreachBatch`
    * query over a document stream that screens each micro-batch against
    * the growing index and hands the candidate pairs to `onCandidates`
    * (push to a dup-review topic, quarantine table, metrics — caller's
    * choice; the frame is bounded by the micro-batch and the caps).
    *
    * PRODUCTION MUST pass `checkpointDir`: the index's integrity hangs
    * on durable, monotone batch ids. With the `None` default (test
    * convenience only) a restart renumbers batches from 0 —
    * [[screenAndIndexBatch]]'s renumbered-restart guard then fails the
    * query loudly instead of letting batch 0 screen against nothing and
    * overwrite history.
    */
  def screeningIngest(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, checkpointDir: Option[String] = None,
      bands: Int = 4, rowsPerBand: Int = 4, shingleW: Int = 3,
      family: Dedup.MinHashFamily = Dedup.XxHashFamily,
      maxBucketSize: Long = 100000)(
      onCandidates: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onCandidates(screenAndIndexBatch(batch, batchId, idCol, textCol,
          indexDir, bands, rowsPerBand, shingleW, family, maxBucketSize),
          batchId)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
