package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked-retrieval quality metrics — the EVALUATION layer over the
  * engine's retrievers ([[Retrieval]] BM25, [[Similarity]] ANN,
  * [[Retrieval.rrfFuse]] hybrid): given a ranked candidate list and a
  * relevance set, score each query with the standard IR measures
  * (Manning, Raghavan & Schütze, "Introduction to Information
  * Retrieval" ch. 8). A retrieval stack without metrics cannot be
  * tuned; this closes that loop the same way q117's datasheet closes
  * the corpus-observability loop. The reference has no counterpart
  * (its serving layer returns ranked rows, never scores itself).
  *
  * Portability (the engine's integer discipline): every metric that is
  * classically a float ratio is emitted as exact BIGINT micro-units or
  * as an exact numerator/denominator PAIR —
  *  - `mrr_u` = 10⁶ div (first relevant rank), 0 when nothing relevant
  *    was retrieved (the q115 RRF convention);
  *  - per-rank DCG gain = floor(10⁶·ln 2 / ln(rank+1) + 0.5) — i.e.
  *    10⁶/log₂(rank+1) quantized BEFORE summation, so `dcg_u` sums are
  *    order-free and any engine replays them (the micro-nat idf
  *    precedent);
  *  - `idcg_u` is the same gain summed over ranks 1..min(n_rel, k), so
  *    nDCG@k = dcg_u/idcg_u is a ratio of two exact integers the
  *    caller (or an oracle) divides however it likes.
  *
  * Scale shape: the ranked frame is top-k-bounded (|queries|·k rows) by
  * construction, so every join here is broadcast-sized regardless of
  * corpus scale; the qrels join and both aggregates are hash
  * operations keyed on qid. Nothing touches a corpus.
  */
object Evaluation {

  /** floor(10⁶·ln2/ln(r+1) + 0.5) — the micro-unit DCG gain at rank r
    * (= 10⁶/log₂(r+1); rank 1 → 10⁶ exactly).
    */
  private def gainU(r: Column): Column =
    floor(lit(1000000.0) * log(lit(2.0)) / log(r + lit(1L)) + 0.5).cast("long")

  /** Per-query metrics of `ranked` (qid, nid, rank — rank 1-based,
    * rows beyond `k` ignored) against `qrels` (qid, nid — duplicates
    * collapsed): one row per DISTINCT qid of `ranked` with
    * (n_rel, n_hits, mrr_u, dcg_u, idcg_u). Queries absent from
    * `ranked` (no candidates retrieved at all) are absent here too —
    * score them as zero upstream if the query set is authoritative.
    */
  def rankingMetrics(ranked: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rk = ranked
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"))
      .filter(col("rank") <= k)
    val rel = qrels.select("qid", "nid").distinct()
    val hits = rk.join(rel, Seq("qid", "nid"))
      .groupBy("qid").agg(
        count(lit(1)).as("n_hits"),
        // MRR: 1/first-relevant-rank — smaller rank ⇒ larger reciprocal,
        // so the max over hit ranks IS the first hit's reciprocal
        max(expr("1000000 div rank")).as("mrr_u"),
        sum(gainU(col("rank"))).as("dcg_u"))
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val idcg = (n: Column) =>
      // sequence(1, 0) would generate a DESCENDING series (the q112
      // pairCounts guard), so zero-relevant queries bypass the fold
      when(n >= 1,
        aggregate(sequence(lit(1L), least(n, lit(k.toLong))), lit(0L),
          (acc, r) => acc + gainU(r)))
        .otherwise(lit(0L))
    rk.select("qid").distinct()
      .join(broadcast(nRel), Seq("qid"), "left")
      .join(broadcast(hits), Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("mrr_u"), lit(0L)).as("mrr_u"),
        coalesce(col("dcg_u"), lit(0L)).as("dcg_u"),
        idcg(coalesce(col("n_rel"), lit(0L))).as("idcg_u"))
  }

  /** Hard-negative mining (Karpukhin et al. 2020, DPR §4.2): the
    * top-ranked candidates that are NOT relevant — exactly the
    * "retriever confused these with the answer" rows contrastive
    * training wants as negatives (random negatives are too easy; the
    * retriever's own near-misses carry the gradient). Self-retrieval
    * (qid = nid, rank 1 under doc-as-query) is excluded — a document
    * is never its own negative.
    *
    * Both inputs are top-k-bounded, so the anti-join is broadcast-
    * sized at any corpus scale. Output: (qid, nid, rank), rank 1-based
    * from the ranking.
    */
  def hardNegatives(ranked: DataFrame, qrels: DataFrame): DataFrame =
    ranked
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"))
      .filter(col("qid") =!= col("nid"))
      .join(qrels.select("qid", "nid").distinct(), Seq("qid", "nid"),
        "left_anti")

  /** Recall@k self-audit: how much of the EXACT top-k an approximate
    * ranking (IVF, LSH, ADC — anything emitting (qid, nid, rank))
    * recovers, as an exact basis-point ratio per query. The in-engine
    * version of the rehearsal ladders' recall column — a production
    * index deployment runs this on a query sample after every rebuild,
    * and a recall drop is the alarm that nProbe/centroids need
    * retuning. Driven from the exact side's query set, so a query the
    * approximate index returned NOTHING for still reports recall 0.
    *
    * Both inputs are top-k-bounded: every join and aggregate here is
    * broadcast-sized regardless of corpus scale.
    *
    * Output: (qid, n_overlap, n_exact, recall_bp) with recall_bp =
    * n_overlap·10⁴ div n_exact.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = approx.select(col("qid"), col("nid"),
        col("rank").cast("long").as("rank"))
      .filter(col("rank") <= k).drop("rank")
    val e = exact.select(col("qid"), col("nid"),
        col("rank").cast("long").as("rank"))
      .filter(col("rank") <= k).drop("rank")
    val ov = a.join(e, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("n_overlap"))
    e.groupBy("qid").agg(count(lit(1)).as("n_exact"))
      .join(broadcast(ov), Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        col("n_exact"),
        expr("(coalesce(n_overlap, 0) * 10000) div n_exact").as("recall_bp"))
  }

  /** Classification operating-point sweep — the confusion matrix and
    * precision/recall/F1 of `scoreCol >= t` against a boolean
    * `labelCol`, for every threshold t in one corpus pass. This is how
    * the quality-gate threshold actually gets CHOSEN: [[Classifier]]
    * emits a score, a curation pipeline needs the cut that trades
    * precision (how clean is what we keep) against recall (how much
    * good data we throw away), and sweeping candidate cuts over a
    * labeled sample is the standard procedure (the PR curve, Manning
    * et al. ch. 8.4). The ranking metrics above score retrievers; this
    * scores the binary gates.
    *
    * Integer discipline: counts are exact BIGINTs and the ratios are
    * exact basis points (`x·10⁴ div max(d,1)` — a zero denominator,
    * e.g. a threshold above every score, reports 0, never NaN), so the
    * sweep is bit-identical on any engine.
    *
    * Scale shape: ONE aggregate over the scored frame with 4·|T|
    * conditional counters (map-side partials; the shuffle carries a
    * single row), then the per-threshold rows are exploded from that
    * one row — no row duplication, no per-threshold scan, no join.
    * Rows with a null score or label are excluded up front (a silent
    * `otherwise(0)` would misfile them as true negatives).
    *
    * Output: one row per threshold — (thr_micro, tp, fp, fn, tn,
    * precision_bp, recall_bp, f1_bp).
    */
  def thresholdSweep(scored: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    require(thresholds.distinct.size == thresholds.size,
      s"duplicate thresholds in $thresholds")
    val s = col(scoreCol).cast("long")
    val lab = col(labelCol)
    val clean = scored.filter(s.isNotNull && lab.isNotNull)
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
      sum(when(s >= lit(t) && lab, 1L).otherwise(0L)).as(s"__tp$i"),
      sum(when(s >= lit(t) && !lab, 1L).otherwise(0L)).as(s"__fp$i"),
      sum(when(s < lit(t) && lab, 1L).otherwise(0L)).as(s"__fn$i"),
      sum(when(s < lit(t) && !lab, 1L).otherwise(0L)).as(s"__tn$i"))
    }
    val one = clean.agg(aggs.head, aggs.tail: _*)
    val perThr = thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("thr_micro"),
        coalesce(col(s"__tp$i"), lit(0L)).as("tp"),
        coalesce(col(s"__fp$i"), lit(0L)).as("fp"),
        coalesce(col(s"__fn$i"), lit(0L)).as("fn"),
        coalesce(col(s"__tn$i"), lit(0L)).as("tn"))
    }
    one.select(explode(array(perThr: _*)).as("r"))
      .select(col("r.*"))
      .withColumn("precision_bp", expr("(tp * 10000) div greatest(tp + fp, 1)"))
      .withColumn("recall_bp", expr("(tp * 10000) div greatest(tp + fn, 1)"))
      .withColumn("f1_bp",
        expr("(2 * tp * 10000) div greatest(2 * tp + fp + fn, 1)"))
  }

  /** Exact ROC-AUC per group — the threshold-free companion of
    * [[thresholdSweep]]: where the sweep scores a handful of candidate
    * cuts, AUC scores the classifier's whole ranking at once, via the
    * rank-sum identity AUC = U / (n_pos·n_neg) with the Mann-Whitney
    * statistic U = #{(p,n) pairs with score_p > score_n} + ½·#{ties}
    * (Fawcett, "An introduction to ROC analysis", 2006). The ½ makes U
    * fractional, so the engine carries `u2` = 2·U — an exact BIGINT:
    * grouping rows by distinct score with (pos_s, neg_s) counts and an
    * exclusive running sum `cumneg_s` of negatives at strictly lower
    * scores, u2 = Σ_s pos_s·(2·cumneg_s + neg_s). `auc_bp` =
    * u2·10⁴ div (2·n_pos·n_neg) — 5000 bp = chance, 10000 = perfect.
    *
    * Degenerate groups (no positives or no negatives — AUC undefined)
    * report u2 = 0 and auc_bp = 0 via the div-by-greatest guard rather
    * than NaN; callers filter on n_pos/n_neg. Null score/label rows
    * are excluded up front, as in [[thresholdSweep]]. Exact while
    * 2·n_pos·n_neg < 2⁶³ — i.e. any labeled group under ~2·10⁹ rows a
    * side, far past any real labeled calibration sample (AUC is
    * computed on labeled holdouts, not the raw corpus).
    *
    * Scale shape: one hash aggregate collapses the corpus to one row
    * per (group, distinct score); the exclusive negative prefix is
    * [[Packing.runningOffset]]'s two-phase sum (phase-1 parallelism
    * from monotone million-unit score buckets, phase 2 over per-bucket
    * totals only) — no unpartitioned window over the score axis; then
    * one more hash aggregate back to one row per group.
    *
    * Output: one row per group — groupCols + (n_pos, n_neg, u2,
    * auc_bp).
    */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String,
      groupCols: Seq[String]): DataFrame = {
    val s = col(scoreCol).cast("long")
    val lab = col(labelCol)
    val gcols = groupCols.map(col)
    val byScore = scored.filter(s.isNotNull && lab.isNotNull)
      .groupBy(gcols :+ s.as("__score"): _*)
      .agg(sum(when(lab, 1L).otherwise(0L)).as("__pos"),
        sum(when(!lab, 1L).otherwise(0L)).as("__neg"))
    val withCum = Packing.runningOffset(byScore, Seq(col("__score")), "__neg",
      groupOf = expr("__score div 1000000"), partitionCols = groupCols)
    withCum.groupBy(gcols: _*)
      .agg(sum("__pos").as("n_pos"), sum("__neg").as("n_neg"),
        sum(col("__pos") * (lit(2L) * col("offset") + col("__neg"))).as("u2"))
      .withColumn("auc_bp",
        expr("(u2 * 10000) div greatest(2 * n_pos * n_neg, 1)"))
  }

  /** Reliability (calibration) table — the third leg of the
    * classifier-eval triptych: [[thresholdSweep]] picks the operating
    * point, [[rocAuc]] scores the ranking, this answers "when the
    * score says X, how often is the label actually positive?"
    * (Niculescu-Mizil & Caruana, ICML 2005). A classifier can have
    * high AUC and still be badly calibrated; a curation pipeline that
    * INTERPRETS the score (weighting documents by predicted quality
    * rather than gating) needs this table.
    *
    * Scores are bucketed by integral division `score div bucketMicro`
    * — BOTH engines truncate integer division toward zero (Spark
    * `div`, DuckDB `//`), so bucket edges are bit-identical, including
    * for negative scores (the spec pins a negative-score bucket). Per
    * bucket: doc count, positive count, and the empirical positive
    * rate in exact basis points. Null score/label rows are excluded up
    * front, as in [[thresholdSweep]].
    *
    * Scale shape: one projection + one hash aggregate on the bucket
    * key (map-side partials; result rows = #occupied buckets).
    *
    * Output: (bucket, score_lo_micro [= bucket·bucketMicro], n,
    * n_pos, pos_rate_bp).
    */
  def calibrationTable(scored: DataFrame, scoreCol: String, labelCol: String,
      bucketMicro: Long): DataFrame = {
    require(bucketMicro > 0, s"bucketMicro must be positive, got $bucketMicro")
    val s = col(scoreCol).cast("long")
    val lab = col(labelCol)
    scored.filter(s.isNotNull && lab.isNotNull)
      .select(expr(s"cast($scoreCol as bigint) div $bucketMicro").as("bucket"),
        lab.as("__lab"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__lab"), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("score_lo_micro", col("bucket") * bucketMicro)
      .withColumn("pos_rate_bp", expr("(n_pos * 10000) div greatest(n, 1)"))
      .select("bucket", "score_lo_micro", "n", "n_pos", "pos_rate_bp")
  }

  /** Cohen's kappa (Cohen 1960) between two binary raters — the
    * chance-corrected agreement statistic. The curation use: quantify
    * whether a cheap heuristic gate can stand in for a trained
    * classifier (raw agreement is inflated whenever both raters mostly
    * say "keep"; kappa subtracts the agreement two independent raters
    * with the same marginals would reach by chance).
    *
    * One aggregate over the corpus → a 1-row result:
    * (n, n11, n10, n01, n00, po_u, pe_u, kappa_u), all exact integers.
    * po_u = raw agreement in micro-units; pe_u = chance agreement from
    * the per-rater marginals, each divided by n BEFORE the product so
    * the intermediate stays ≤ 10¹² (overflow-safe to ~9·10¹² rows);
    * kappa_u = ((po_u − pe_u)·10⁶) div (10⁶ − pe_u), 0 by convention
    * when pe_u = 10⁶ (degenerate unanimous marginals). Integer division
    * truncates toward zero in BOTH engines (verified: DuckDB's `//`
    * and Spark's `div` agree on negatives), so negative kappa —
    * systematic disagreement — replays exactly.
    *
    * Null handling: rows where either rater is null are excluded (a
    * rater that abstains expresses no agreement either way).
    */
  def agreementKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol)
    val b = col(bCol)
    df.filter(a.isNotNull && b.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(a && b, 1L).otherwise(0L)).as("n11"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n10"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n01"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("n00"))
      .selectExpr("n", "n11", "n10", "n01", "n00",
        "((n11 + n00) * 1000000) div n AS po_u",
        "((((n11 + n10) * 1000000) div n) * (((n11 + n01) * 1000000) div n)) div 1000000" +
          " + ((((n01 + n00) * 1000000) div n) * (((n10 + n00) * 1000000) div n)) div 1000000 AS pe_u")
      .selectExpr("*",
        "CASE WHEN pe_u >= 1000000 THEN CAST(0 AS BIGINT) " +
          "ELSE ((po_u - pe_u) * 1000000) div (1000000 - pe_u) END AS kappa_u")
  }
}
