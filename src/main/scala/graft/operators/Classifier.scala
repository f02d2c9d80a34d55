package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: apply a LINEAR classifier (frozen
  * offline-trained weights) to per-document features, at corpus scale.
  * This is the model-scoring half of the classic quality-classifier
  * split — train a small linear model offline (sklearn / fastText /
  * logistic regression on curated-vs-crawl labels, as in the GPT-3 and
  * CCNet pipelines), then ship its weights into the engine as literals
  * and score every document map-side. Same architecture split as the
  * reference's ML layer: models train in sklearn offline, the Spark
  * side evaluates closed-form column expressions
  * (`batch/feature_store/feature_engineering.py`,
  * `models/trust/predict_trust.py` — scoring reduced to arithmetic).
  *
  * Portability contract: features are INTEGER counts and weights are
  * integer micro-units, so the score is one exact BIGINT dot product —
  * bit-identical on any engine, no sigmoid in the decision path (a
  * monotone map: thresholding the linear score IS thresholding the
  * probability).
  *
  * Scale shape: pure per-row projection — no shuffle, no UDF, fully
  * codegen'd; the weight vector travels inside the task binary as
  * literals. At 100 TB this is a pure scan-rate operator.
  */
object Classifier {

  /** The standard integer feature vector, in fixed order:
    * (n_tokens, n_distinct, n_chars_nospace, stop_hits). All exact
    * counts; tokenization is the whitespace convention of
    * [[TextFunctions.tokens]].
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = Seq(
    "n_tok" -> TextFunctions.tokenCount(text),
    "n_dis" -> size(array_distinct(TextFunctions.tokens(text))),
    "n_ch" -> length(regexp_replace(text, "\\s", "")),
    "stop_hits" -> TextFunctions.wordHits(text, TextFunctions.EnglishStopwords))

  /** Exact integer dot product: `bias + Σ wᵢ·xᵢ` as BIGINT. Weights in
    * micro-units by convention (1e6 = 1.0 of trained weight).
    */
  def linearScoreMicro(bias: Long, terms: Seq[(Column, Long)]): Column =
    terms.foldLeft(lit(bias).cast("long")) {
      case (acc, (x, w)) => acc + x.cast("long") * lit(w)
    }

  /** Frozen demo model: rewards lexical diversity and stopword-bearing
    * prose, penalizes raw length (repetition shows up as many tokens
    * with few distinct types — the linear proxy of a type-token-ratio
    * gate). Chosen to split the synthetic corpus ~5:1 keep:drop at
    * every scale factor.
    */
  val QualityBiasMicro: Long = -3000000L
  val QualityWeightsMicro: Seq[(String, Long)] = Seq(
    "n_tok" -> -40000L, "n_dis" -> 200000L, "n_ch" -> 2000L,
    "stop_hits" -> 300000L)

  /** Score `textCol` with the frozen demo model: adds the four feature
    * columns, `score_micro`, and `keep` (score ≥ 0). Pass a trained
    * model's weights via [[linearScoreMicro]] directly for anything
    * real.
    */
  def qualityClassify(df: DataFrame, textCol: String): DataFrame = {
    val feats = qualityFeatures(col(textCol))
    val byName = feats.toMap
    val score = linearScoreMicro(QualityBiasMicro,
      QualityWeightsMicro.map { case (n, w) => byName(n) -> w })
    feats.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c.cast("long")) }
      .withColumn("score_micro", score)
      .withColumn("keep", col("score_micro") >= 0)
  }
}
