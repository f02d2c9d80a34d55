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

  /** The double-arithmetic half of [[trainLinear2]], as SQL strings the
    * Spark side (`selectExpr`) and a DuckDB oracle interpolate
    * VERBATIM — both engines then evaluate the identical IEEE-754
    * expression DAG over the identical exact-integer sums, so the
    * quantized weights match bit-for-bit (the q33/q35 precedent:
    * deterministic double arithmetic behind an integer quantizer).
    * Stage 1: centered second moments over the sums frame
    * (n, sx1, sx2, sy, sx11, sx22, sx12, sx1y, sx2y, syy);
    * stage 2: the 2×2 determinant; stage 3: Cramer slopes with a
    * det=0 degenerate guard; stage 4: micro-unit weights (intercept
    * from the means), basis-point R².
    */
  val FitMomentExprs: Seq[String] = Seq(
    "CAST(sx11 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) AS c11",
    "CAST(sx22 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE) AS c22",
    "CAST(sx12 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE) AS c12",
    "CAST(sx1y AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS b1",
    "CAST(sx2y AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS b2",
    "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS sst")
  val FitSolveExprs: Seq[String] = Seq(
    "c11 * c22 - c12 * c12 AS det")
  val FitWeightExprs: Seq[String] = Seq(
    "CASE WHEN det = 0.0 THEN 0.0 ELSE (b1 * c22 - b2 * c12) / det END AS w1",
    "CASE WHEN det = 0.0 THEN 0.0 ELSE (b2 * c11 - b1 * c12) / det END AS w2")
  val FitOutputExprs: Seq[String] = Seq(
    "n",
    "CAST(floor((CAST(sy AS DOUBLE) - w1 * CAST(sx1 AS DOUBLE) - w2 * CAST(sx2 AS DOUBLE)) / CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS w0_u",
    "CAST(floor(w1 * 1000000.0 + 0.5) AS BIGINT) AS w1_u",
    "CAST(floor(w2 * 1000000.0 + 0.5) AS BIGINT) AS w2_u",
    "CASE WHEN sst <= 0.0 OR det = 0.0 THEN 0 ELSE CAST(floor((w1 * b1 + w2 * b2) / sst * 10000.0 + 0.5) AS BIGINT) END AS r2_bp")

  /** TRAIN a 2-feature linear model at corpus scale — the training half
    * of the classifier story this object's scoring half applies
    * ([[qualityClassify]] ships frozen weights; q119 closed the same
    * train→apply loop for BPE). Ordinary least squares by exact normal
    * equations: ONE hash aggregate over the corpus produces the ten
    * sufficient statistics as exact BIGINTs (the only corpus-sized
    * work — this is the at-scale shape gradient descent converges
    * toward, without iteration), then the centered 2×2 system solves in
    * ten double expressions over that single row. A standard use: fit a
    * cheap 2-feature proxy of a richer score (model distillation), or
    * refresh weights against a rule-based label.
    *
    * Degenerate inputs stay defined: collinear/constant features give
    * det = 0 → slopes 0 and the intercept falls back to mean(y) (the
    * intercept-only model); constant y gives R² = 0 via the sst guard;
    * null feature/label rows are excluded up front. Exactness bounds:
    * the statistics are exact while each sum < 2⁶³ — the binding one is
    * Σy² (n·max(y)² < 2⁶³, e.g. 10⁹ docs at |y| ≤ 3·10⁶ micro-units);
    * past that, pre-scale y. The double solve carries ~15 significant
    * digits; both engines evaluate the SAME expression strings
    * ([[FitMomentExprs]] …), so the quantized output is
    * engine-identical even where the last bits are inexact.
    *
    * Output: one row — (n, w0_u, w1_u, w2_u [micro-units], r2_bp).
    */
  def trainLinear2(df: DataFrame, x1Col: String, x2Col: String,
      yCol: String): DataFrame = {
    val x1 = col(x1Col).cast("long")
    val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    val sums = df.filter(x1.isNotNull && x2.isNotNull && y.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(x1).as("sx1"), sum(x2).as("sx2"), sum(y).as("sy"),
        sum(x1 * x1).as("sx11"), sum(x2 * x2).as("sx22"),
        sum(x1 * x2).as("sx12"),
        sum(x1 * y).as("sx1y"), sum(x2 * y).as("sx2y"),
        sum(y * y).as("syy"))
    sums
      .selectExpr("*" +: FitMomentExprs: _*)
      .selectExpr("*" +: FitSolveExprs: _*)
      .selectExpr("*" +: FitWeightExprs: _*)
      .selectExpr(FitOutputExprs: _*)
  }

  /** The 2×2 chi-squared statistic in micro-units, as ONE SQL expression
    * string both engines interpolate VERBATIM (the [[FitMomentExprs]]
    * discipline). Contingency cells derive from four BIGINT columns:
    * a = n_pos (label-positive docs containing the token), b =
    * n_pos_docs − a, c = n_all − a, d = (n_docs − n_pos_docs) − c; then
    * `chi² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))`. The difference
    * ad − bc is computed ONCE as exact BIGINT and squared in doubles.
    * Degenerate margins (constant label, token in every doc) guard to 0
    * — in each case the numerator is 0 or the statistic undefined.
    * Exact to the micro-unit while chi²·10⁶ < 2⁵³ (chi² ≤ N, so ~9·10⁹
    * docs); past that coarsen the unit.
    */
  val ChiSqExprSql: String =
    "CAST(CASE WHEN n_pos_docs = 0 OR n_pos_docs = n_docs OR n_all = n_docs THEN 0 " +
      "ELSE floor(CAST(n_docs AS DOUBLE) " +
      "* CAST(n_pos * ((n_docs - n_pos_docs) - (n_all - n_pos)) - (n_pos_docs - n_pos) * (n_all - n_pos) AS DOUBLE) " +
      "* CAST(n_pos * ((n_docs - n_pos_docs) - (n_all - n_pos)) - (n_pos_docs - n_pos) * (n_all - n_pos) AS DOUBLE) " +
      "/ (CAST(n_pos_docs AS DOUBLE) * CAST(n_docs - n_pos_docs AS DOUBLE) " +
      "* CAST(n_all AS DOUBLE) * CAST(n_docs - n_all AS DOUBLE)) " +
      "* 1000000.0 + 0.5) END AS BIGINT) AS chi2_u"

  /** Chi-squared feature selection over document-level token presence —
    * the classic discriminative-vocabulary step before training a domain
    * or quality classifier (Manning & Schütze ch. 5; the fastText/CCNet
    * pipelines select exactly such token features): for every token, a
    * 2×2 presence-vs-label contingency table and its chi² statistic;
    * high chi² = the token's presence strongly predicts the label either
    * way. Output: top `k` tokens by (chi2_u desc, token), with the
    * positive/negative document counts.
    *
    * Shape: one map-side `array_distinct` per doc (presence, not
    * frequency — a token repeated in one doc is one observation), one
    * hash aggregate keyed by token, a 1-row label-margin broadcast, and
    * a TakeOrdered top-k. No corpus-sized join, no window; the token
    * aggregate partial-combines map-side, so the shuffle carries one row
    * per distinct (token, partition). `minCount` floors rare tokens
    * (chi² is unstable below ~5 expected observations — the standard
    * validity rule).
    */
  def chiSquaredTokens(docs: DataFrame, labelCol: String,
      textCol: String = "text", minCount: Long = 5, k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1, s"bad minCount=$minCount k=$k")
    val pres = docs.select(col(labelCol).cast("boolean").as("__pos"),
      array_distinct(TextFunctions.tokens(col(textCol))).as("__tk"))
    val margins = pres.agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos_docs"),
      count(lit(1)).as("n_docs"))
    pres.select(col("__pos"), explode(col("__tk")).as("token"))
      .groupBy("token")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        count(lit(1)).as("n_all"))
      .filter(col("n_all") >= minCount)
      .crossJoin(broadcast(margins))
      .selectExpr("token", "n_pos",
        "CAST(n_all - n_pos AS BIGINT) AS n_neg", ChiSqExprSql)
      .orderBy(col("chi2_u").desc, col("token").asc)
      .limit(k)
  }

  /** Leave-one-group-out [[trainLinear2]] — the leave-one-out data
    * valuation baseline (the LOO half of Ghorbani & Zou's "Data Shapley",
    * ICML 2019, at group granularity): for every group g, the OLS model
    * trained on EVERYTHING EXCEPT g. Because OLS is determined by ten
    * additive sufficient statistics, all |G| models come from ONE corpus
    * pass: aggregate the statistics per group, total them, and each
    * holdout's statistics are the exact BIGINT difference total − group
    * — no re-scan per model, which is what makes per-domain valuation
    * viable at 100 TB (|G| passes would not be).
    *
    * Output: one row per group — (group, n, w0_u, w1_u, w2_u, r2_bp)
    * where n and the fit describe the COMPLEMENT of the group. Groups
    * whose complement is empty or degenerate resolve by the same
    * det = 0 / sst ≤ 0 guards as [[trainLinear2]].
    */
  def trainLinear2LeaveOneOut(df: DataFrame, groupCol: String, x1Col: String,
      x2Col: String, yCol: String): DataFrame = {
    val x1 = col(x1Col).cast("long")
    val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    val perGroup = df.filter(x1.isNotNull && x2.isNotNull && y.isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("gn"),
        sum(x1).as("gsx1"), sum(x2).as("gsx2"), sum(y).as("gsy"),
        sum(x1 * x1).as("gsx11"), sum(x2 * x2).as("gsx22"),
        sum(x1 * x2).as("gsx12"),
        sum(x1 * y).as("gsx1y"), sum(x2 * y).as("gsx2y"),
        sum(y * y).as("gsyy"))
    val totals = perGroup.agg(
      sum("gn").as("tn"), sum("gsx1").as("tsx1"), sum("gsx2").as("tsx2"),
      sum("gsy").as("tsy"), sum("gsx11").as("tsx11"),
      sum("gsx22").as("tsx22"), sum("gsx12").as("tsx12"),
      sum("gsx1y").as("tsx1y"), sum("gsx2y").as("tsx2y"),
      sum("gsyy").as("tsyy"))
    perGroup.crossJoin(broadcast(totals))
      .selectExpr("grp",
        "CAST(tn - gn AS BIGINT) AS n",
        "CAST(tsx1 - gsx1 AS BIGINT) AS sx1",
        "CAST(tsx2 - gsx2 AS BIGINT) AS sx2",
        "CAST(tsy - gsy AS BIGINT) AS sy",
        "CAST(tsx11 - gsx11 AS BIGINT) AS sx11",
        "CAST(tsx22 - gsx22 AS BIGINT) AS sx22",
        "CAST(tsx12 - gsx12 AS BIGINT) AS sx12",
        "CAST(tsx1y - gsx1y AS BIGINT) AS sx1y",
        "CAST(tsx2y - gsx2y AS BIGINT) AS sx2y",
        "CAST(tsyy - gsyy AS BIGINT) AS syy")
      .selectExpr("*" +: FitMomentExprs: _*)
      .selectExpr("*" +: FitSolveExprs: _*)
      .selectExpr("*" +: FitWeightExprs: _*)
      .selectExpr("grp" +: FitOutputExprs: _*)
  }

  /** Score with a [[trainLinear2]] weight row — the apply side of the
    * trained artifact, closing train→apply the way q119 closed it for
    * BPE. The 1-row weights frame broadcasts; the fitted label comes
    * back in the label's own units via one exact integer projection,
    * `(w0_u + w1_u·x1 + w2_u·x2) div 10⁶` (w_u are micro-units of
    * label-per-feature, so the product is micro-label; the `div`
    * truncates toward zero identically on both engines). Pure
    * scan-rate work — no shuffle beyond the broadcast.
    *
    * Adds `score_fit_micro` (sic: label units — the engine's labels
    * are themselves micro-unit scores). Overflow-exact while
    * |w_u|·max(x) < 2⁶² per term.
    */
  def applyLinear2(df: DataFrame, x1Col: String, x2Col: String,
      weights: DataFrame): DataFrame =
    df.crossJoin(broadcast(weights.select("w0_u", "w1_u", "w2_u")))
      .withColumn("score_fit_micro",
        expr(s"(w0_u + w1_u * cast($x1Col as bigint) + " +
          s"w2_u * cast($x2Col as bigint)) div 1000000"))
      .drop("w0_u", "w1_u", "w2_u")
}
