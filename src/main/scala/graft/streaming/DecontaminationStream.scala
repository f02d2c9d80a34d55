package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import graft.operators.Decontamination

/** Decontamination at INGEST: every arriving micro-batch of documents is
  * checked against the (static) benchmark/eval set before it can land in
  * the corpus — the streaming face of
  * [[graft.operators.Decontamination.benchmarkContainmentBloom]], the
  * same batch-vs-stream symmetry the dedup legs have
  * ([[StreamingDedup.screeningIngest]] / `segmentScreeningIngest`).
  *
  * Unlike the dedup screens there is NO growing index here: eval sets
  * are fixed while the corpus flows, so the benchmark side (hashed
  * grams, per-item sizes, the serialized Bloom filter) is built ONCE,
  * cached for the life of the query, and broadcast into each
  * micro-batch's scan — per batch the only work proportional to the
  * batch is the map-side gram screen, and only might-be-benchmark grams
  * reach an exchange. Restart needs no guard for the same reason:
  * re-screening a replayed batch against a static index is naturally
  * idempotent.
  *
  * Semantics note, pinned by the spec: the df cap is computed within
  * each micro-batch (the stream has no full-corpus view), so per-batch
  * output equals the batch operator applied to that batch alone. With
  * the default cap of 1000 a micro-batch virtually never trips it —
  * the cap exists for full-corpus scans.
  */
object DecontaminationStream {

  /** Start a `foreachBatch` query handing each micro-batch's flagged
    * (id, bench_id, n_shared, n_bench_grams, containment) frame to
    * `onFlagged` (quarantine table, reject topic, metrics — caller's
    * choice). PRODUCTION should pass `checkpointDir` for exactly-once
    * delivery of the flags; the screen itself is stateless-idempotent.
    */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      checkpointDir: Option[String] = None, n: Int = 5,
      maxGramDf: Long = 1000, minContainment: Double = 0.5,
      expectedBenchGrams: Long = 1 << 20, fpp: Double = 0.01)(
      onFlagged: (DataFrame, Long) => Unit): StreamingQuery = {
    val idx = Decontamination.benchBloomIndex(bench, benchIdCol,
      benchTextCol, n, expectedBenchGrams, fpp).cached()
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onFlagged(Decontamination.bloomScreenedContainment(batch, idCol,
          textCol, idx, n, maxGramDf, minContainment), batchId)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    val query = writer.start()
    // release the cached benchmark frames when THIS query terminates —
    // without the hook, repeated start/stop cycles in one session leak a
    // cached gram+size frame pair per cycle (ADVICE r9). The listener
    // removes itself so stopped queries don't accumulate listeners either.
    val streams = docs.sparkSession.streams
    streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == query.id) {
          idx.unpersist()
          streams.removeListener(this)
        }
    })
    query
  }
}
