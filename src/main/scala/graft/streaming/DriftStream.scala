package graft.streaming

import graft.functions.TextFunctions
import graft.operators.Iterate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Vocabulary-drift monitoring at INGEST — the streaming face of
  * [[graft.operators.Profile.vocabDrift]] (q182): every micro-batch
  * emits one total-variation tick of the batch's token distribution
  * against a FROZEN reference vocabulary, so a crawler source flipping
  * language, template, or spam regime is visible in the tick trend
  * batches after it happens — the lexical sibling of
  * [[SemanticStream]]'s embedding screen and [[RetrievalStream]]'s
  * quality probe.
  *
  * The reference (top-k token shares + the OOV bucket, exact integer
  * micro-units) is frozen by the same contract as the other faces'
  * thresholds/centroids/classifier weights: re-fitting it mid-stream
  * would move the measuring stick under the trend. Fit it offline on a
  * corpus snapshot ([[fitReference]]); re-fitting is an offline event
  * that starts a new trend.
  *
  * Scale shape: the per-batch tick is ONE map-side aggregate — k
  * conditional sums + a total over the exploded batch tokens (the
  * reference is a plan-time literal, never joined) — producing a
  * single row; nothing is stateful, so the stream needs no watermark
  * and no state store. Ticks persist partition-per-batch (the house
  * idempotent-replay convention): a replayed batch overwrites only its
  * own tick.
  */
object DriftStream {

  /** Frozen reference: `shares` = the top-k tokens with their corpus
    * share in micro-units (`cnt·10⁶ div total`, the q182 arithmetic),
    * `oovMu` = the share of everything else.
    */
  final case class VocabRef(shares: Seq[(String, Long)], oovMu: Long) {
    require(shares.nonEmpty, "VocabRef needs at least one token")
  }

  /** Fit the frozen reference from a corpus snapshot: exact top-`topK`
    * tokens by count ((count DESC, token ASC) — the q182 rule), shares
    * in micro-units. One count aggregate, materialized once for its
    * two consumers (total + top-k), released before returning; driver
    * traffic is the k-row top frame + one total.
    */
  def fitReference(df: DataFrame, textCol: String, topK: Int): VocabRef = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    Iterate.loop(df.sparkSession) { l =>
      val counts = l.pin(df.select(explode(TextFunctions.tokens(
          coalesce(col(textCol), lit("")))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt")))
      val tot = counts.agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
      require(tot > 0, "fitReference: snapshot has no tokens")
      val top = counts.orderBy(col("cnt").desc, col("tok").asc)
        .limit(topK).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      l.releaseAll()
      val shares = top.map { case (t, c) => (t, c * 1000000L / tot) }.toSeq
      VocabRef(shares, (tot - top.map(_._2).sum) * 1000000L / tot)
    }
  }

  /** One drift measurement of a (micro-)batch against the reference:
    * `tv_mu = Σ_top |share_batch − share_ref| + |oov_batch − oov_ref|`
    * — exact integers, the q182 form. Returns (n_tokens, tv_mu), or
    * None for a batch with no tokens (no 0/0 share is ever formed; an
    * empty batch carries no distributional evidence either way).
    *
    * ONE aggregate row per batch: the reference tokens are plan-time
    * literals (k conditional sums — no join, no shuffle past the 1-row
    * partial-agg combine), so the tick costs one pass over the batch.
    */
  def batchTv(batch: DataFrame, textCol: String,
      ref: VocabRef): Option[(Long, Long)] = {
    val toks = batch.select(explode(TextFunctions.tokens(
      coalesce(col(textCol), lit("")))).as("tok"))
    val aggs = count(lit(1)).as("tot") +:
      ref.shares.zipWithIndex.map { case ((t, _), i) =>
        sum(when(col("tok") === lit(t), 1L).otherwise(0L)).as(s"c$i")
      }
    val row = toks.agg(aggs.head, aggs.tail: _*).head()
    val tot = row.getLong(0)
    if (tot == 0L) None
    else {
      val cnts = ref.shares.indices.map(i => row.getLong(i + 1))
      val tvTop = ref.shares.zip(cnts).map { case ((_, shareMu), c) =>
        math.abs(c * 1000000L / tot - shareMu)
      }.sum
      val oov = (tot - cnts.sum) * 1000000L / tot
      Some((tot, tvTop + math.abs(oov - ref.oovMu)))
    }
  }

  /** The monitoring face: one tick row (n_tokens, tv_mu) per non-empty
    * micro-batch, persisted to `metricsDir/batch=<id>` under the
    * partition-overwrite replay convention. The tick trend across batch
    * ids IS the drift story; each tick equals [[batchTv]] of that batch
    * alone ([[DriftStreamSpec]] pins stream ≡ batch per batch).
    */
  def driftTicks(docs: DataFrame, textCol: String, ref: VocabRef,
      metricsDir: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batchTv(batch, textCol, ref).foreach { case (n, tv) =>
          val spark = batch.sparkSession
          import spark.implicits._
          Seq((n, tv)).toDF("n_tokens", "tv_mu")
            .write.mode("overwrite").parquet(s"$metricsDir/batch=$batchId")
        }
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
