package graft.streaming

import graft.operators.{Classifier, Sampling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality gating at INGEST — the streaming face of the curation policy
  * layer (q97 classifier + q111 winsorized normalization), so documents
  * failing the cheap gates never land in bronze at all (the reference
  * gates at ingest too, on nulls/shape — `kafka_to_bronze_tiktok.py`'s
  * cleaning; this is the quality-model version of the same idea).
  *
  * Everything here is STATELESS per document by design: the classifier
  * is a frozen-weight integer dot product (pure projection — q97's
  * portability contract) and the normalization clips against
  * OFFLINE-computed per-source thresholds shipped as a static broadcast
  * frame ([[Sampling.winsorThresholds]] — a percentile cannot be
  * aggregated mid-stream, and recomputing it per micro-batch would make
  * scores batch-size-dependent; the split is the same
  * train-offline/score-in-engine architecture as the reference's trust
  * models). So batch and stream produce IDENTICAL rows for identical
  * documents — [[CurationStreamSpec]] pins that parity — and the
  * operator composes with any sink or with
  * [[StreamingDedup.screeningIngest]] downstream.
  */
object CurationStream {

  /** Score + gate a document frame (batch OR stream): adds the q97
    * feature/score/keep columns, plus `norm_u` when per-group
    * thresholds are provided, and drops rows failing the classifier.
    * Returns only gate survivors — the frame a bronze writer or dedup
    * screen consumes.
    */
  def gate(docs: DataFrame, textCol: String,
      thresholds: Option[DataFrame] = None,
      groupCol: String = "source"): DataFrame = {
    val scored = Classifier.qualityClassify(docs, textCol)
    val normed = thresholds match {
      case Some(thr) =>
        Sampling.winsorizedNormalizeWith(scored, groupCol, "score_micro", thr)
      case None => scored
    }
    normed.filter(col("keep"))
  }
}
