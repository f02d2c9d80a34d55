package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Mixture-budget admission at INGEST — the streaming face of the
  * mixing family's EXECUTION side ([[graft.operators.Sampling.mixtureTake]]
  * selects quality-first over a full corpus; an ingest stream cannot
  * rank documents it has not seen yet, so the streaming contract is the
  * ARRIVAL-ORDER one: admit each source's documents until its token
  * budget fills, exactly [[graft.operators.Packing.takeTokenBudget]]'s
  * convention replayed incrementally).
  *
  * State is ONE long per source — the tokens SEEN so far (admitted or
  * not: like the batch operator, a document that straddles the boundary
  * is dropped but still advances the offset, so stream and batch agree
  * row-for-row on any replayed prefix; [[MixtureStreamSpec]] pins that
  * parity). The budget plan ships as a driver-side map, vocab-sized by
  * the same contract as IVF centroids and BPE merge lists (≤|sources|
  * entries — [[graft.operators.Sampling.mixtureSolve]]'s output is the
  * natural producer).
  *
  * Scale shape: state is O(|sources|) longs in the checkpointed store,
  * partitioned by source; per batch each group sorts only its OWN batch
  * slice (deterministic doc_id order within a micro-batch — arrival
  * order BETWEEN batches, id order WITHIN one, both engine-independent).
  * No driver involvement on the hot path.
  */
object MixtureStream {

  case class BudgetDoc(doc_id: Long, source: String, nt: Long)
  case class Admitted(doc_id: Long, source: String, nt: Long, offset: Long)

  /** Admit `docs` (batch OR stream; needs doc_id/source/nt columns)
    * against per-source token budgets. Emits admitted rows with their
    * token `offset` in the source's ingest stream; a source absent from
    * `budgets` admits nothing (budget 0 — the caller decides what an
    * unplanned source means, same as mixtureSolve's drop rule).
    */
  def budgetAdmission(docs: DataFrame,
      budgets: Map[String, Long]): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("source"),
        col("nt").cast("long"))
      .as[BudgetDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, Admitted](OutputMode.Append,
          GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[BudgetDoc], state: GroupState[Long]) =>
          val budget = budgets.getOrElse(source, 0L)
          var seen = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
            val off = seen
            seen += d.nt
            if (off + d.nt <= budget)
              Some(Admitted(d.doc_id, source, d.nt, off))
            else None
          }
          state.update(seen)
          out.iterator
      }
  }
}
