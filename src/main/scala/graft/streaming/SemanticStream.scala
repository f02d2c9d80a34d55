package graft.streaming

import graft.operators.Similarity
import graft.plans.VectorExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Embedding near-duplicate screening at INGEST — the SEMANTIC cousin of
  * [[StreamingDedup]]'s lexical screen: arriving vectors are assigned to
  * a FROZEN coarse quantizer's cells (a pure literal-centroid
  * projection, [[Similarity.assignCellsLiteral]] — stateless, so legal
  * on a stream with no watermark and no state store), screened against
  * every EARLIER micro-batch's vectors in the SAME cell at
  * cosine ≥ tau, and appended to the persisted cell index.
  *
  * The quantizer is frozen by the same contract as
  * [[CurationStream]]'s thresholds and the classifier weights:
  * refitting centroids mid-stream would MOVE cell boundaries, silently
  * changing which historical pairs are comparable (and making results
  * batch-size-dependent). Fit it offline on a corpus snapshot
  * ([[Similarity.sampleCentroidsPortable]] / kmeansRefine), size it
  * k ≈ √n of the expected corpus; re-fitting is an offline reindex.
  * Degenerate cells (one mega-cluster the quantizer cannot separate)
  * grow the per-batch screen join linearly with that cell's history —
  * the batch operator's cellCap sub-split needs GLOBAL cell sizes and
  * so lives offline too: monitor cell growth via the index and re-fit.
  *
  * Durability follows the house convention ([[StreamingDedup]]): one
  * parquet partition per micro-batch id, a replayed batch overwrites
  * only itself, renumbered restarts are refused loudly (shared guard +
  * the compaction marker), and [[compactIndex]] folds closed batches
  * into a CELL-partitioned `batch_id=-1` store — the layout the screen
  * join probes.
  *
  * At 100 TB: history is touched only through the (cell) equi-join —
  * vectors are never re-embedded or re-assigned — and the arriving
  * batch is the broadcast-sized side.
  */
object SemanticStream {

  /** One micro-batch of the self-maintaining loop: screen `batch`
    * against all earlier batches' same-cell vectors, then append this
    * batch's (id, cell, embedding) rows — so batch N+1 sees batch N.
    *
    * Returns (id_a, id_b, cosine) candidate pairs at cosine ≥ tau
    * involving this batch's vectors: batch-vs-history (id_a = the
    * historical vector) AND within-batch (id_a < id_b), the
    * [[StreamingDedup.screenAndIndexBatch]] contract. Candidates are
    * evidence for a downstream keep/drop policy (quarantine, review,
    * [[graft.operators.Dedup.dedupByPairs]]) — the screen itself drops
    * nothing.
    */
  def screenAndIndexBatch(batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String, indexDir: String,
      centroids: Seq[(Long, Array[Float])], tau: Double): DataFrame = {
    val spark = batch.sparkSession
    val assigned = Similarity.assignCellsLiteral(
      batch.select(col(idCol).as("id"), col(vecCol).as("embedding")), centroids)
    val indexedIds = StreamingDedup.guardedIndexedBatchIds(batch, batchId, indexDir)
    val existing =
      if (indexedIds.isEmpty) assigned.limit(0)
      else IndexMaintenance.dropTombstoned(
        spark.read.parquet(indexDir).filter(col("batch_id") < batchId),
        "id", spark, indexDir)
        .select("id", "embedding", "cell")
    val cos = VectorExpressions.cosineNative(col("a.embedding"), col("b.embedding"))
    val histPairs = existing.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") =!= col("b.id") &&
          cos >= tau)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), cos.as("cosine"))
    val selfPairs = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id") &&
          cos >= tau)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), cos.as("cosine"))
    assigned.select("id", "embedding", "cell")
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
    histPairs.unionByName(selfPairs)
  }

  /** The streaming face: a `foreachBatch` query that screens and
    * indexes every arriving micro-batch, handing the candidate pairs to
    * `onCandidates`. PRODUCTION MUST pass `checkpointDir` — the
    * [[StreamingDedup.screeningIngest]] contract (renumbered batch ids
    * are refused by the guard rather than overwriting history).
    */
  def screeningIngest(docs: DataFrame, idCol: String, vecCol: String,
      indexDir: String, centroids: Seq[(Long, Array[Float])], tau: Double,
      checkpointDir: Option[String] = None)(
      onCandidates: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onCandidates(screenAndIndexBatch(batch, batchId, idCol, vecCol,
          indexDir, centroids, tau), batchId)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** Fold closed batch partitions (< the checkpoint's committed id)
    * into the cell-partitioned `batch_id=-1` store — the join key the
    * screen probes. Same semantics and guards as
    * [[StreamingDedup.compactIndex]].
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatch: Long, targetPartitions: Int = 8): Long =
    IndexMaintenance.compactBatchStore(spark, indexDir, "batch_id=",
      upToBatch, Seq("cell"), targetPartitions,
      IndexMaintenance.dropTombstoned(_, "id", spark, indexDir))

  /** Delete vectors from the semantic cell index — the
    * [[StreamingDedup.deleteDocs]] convention: tombstones mask every
    * screen read (a deleted vector can never again surface as the
    * historical side of a candidate pair) and the next [[compactIndex]]
    * drops its rows physically. Idempotent per (ids, batchId).
    */
  def deleteDocs(ids: DataFrame, idCol: String, indexDir: String,
      batchId: Long): Unit =
    IndexMaintenance.writeTombstones(ids, idCol, indexDir, batchId)
}
