package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Concat-and-chunk placement at INGEST — the streaming face of
  * [[graft.operators.Packing.concatChunkPlacement]]: every arriving
  * document is assigned its exclusive token offset in its SOURCE's
  * ingest stream and the first/last `capacity`-token chunk ids its
  * tokens land in, so shard writers downstream can cut fixed-size
  * training chunks without ever re-scanning history.
  *
  * The ordering contract is [[MixtureStream]]'s: arrival order BETWEEN
  * micro-batches, doc-id order WITHIN one — both engine-independent, so
  * stream placement equals the batch prefix sum over any replayed
  * prefix ([[PackingStreamSpec]] pins the parity row-for-row).
  *
  * State is ONE long per source (the running token offset) in the
  * checkpointed store — the same O(|sources|) posture as the mixture
  * admission face; per batch each group touches only its own batch
  * slice. Zero-token documents advance nothing and get a null chunk
  * span (the batch operator's convention).
  */
object PackingStream {

  case class PackDoc(doc_id: Long, source: String, nt: Long)
  case class Placed(doc_id: Long, source: String, nt: Long, offset: Long,
      first_chunk: Option[Long], last_chunk: Option[Long])

  /** Place `docs` (batch OR stream; needs doc_id/source/nt columns)
    * into each source's running concat-and-chunk stream.
    */
  def chunkPlacement(docs: DataFrame, capacity: Long): Dataset[Placed] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("source"),
        col("nt").cast("long"))
      .as[PackDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, Placed](OutputMode.Append,
          GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[PackDoc], state: GroupState[Long]) =>
          var seen = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val off = seen
            seen += d.nt
            val span = if (d.nt > 0)
              (Some(off / capacity), Some((off + d.nt - 1) / capacity))
            else (None, None)
            Placed(d.doc_id, source, d.nt, off, span._1, span._2)
          }
          state.update(seen)
          out.iterator
      }
  }
}
