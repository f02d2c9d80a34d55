package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenization (Kudo 2018, "Subword Regularization";
  * the SentencePiece unigram model) — the OTHER family next to BPE
  * ([[Tokenizer]]): instead of greedy merge induction, score every
  * candidate piece with a unigram probability and segment each word by
  * VITERBI — the minimum total-cost split. This module ships the
  * frequency-seeded vocabulary (SentencePiece's EM initialization:
  * substring counts capped to a vocabulary budget) and the exact
  * Viterbi kernel (its E-step / inference); iterative EM pruning layers
  * more M-step recounts over the same two pieces.
  *
  * Everything is EXACT INTEGER after one quantization, the micro-nat
  * convention of BM25/PMI/KN: cost(piece) = floor((ln Σf − ln f)·10⁶
  * + 0.5) — the one double subtraction is the same expression text on
  * both engines. The Viterbi DP then runs entirely in BIGINTs, so any
  * partitioning replays bit-identically.
  *
  * PACKED TIE-BREAK: a DP cell carries `b = 64·(Σ cost_u) + n_pieces`
  * — min(b) is "min cost, then fewest pieces" in ONE integer min, so
  * the recurrence needs no struct ordering (portable across engines).
  * Bound: ≤ [[MaxWordLen]] pieces of ≤ ~30·10⁶ micro-nats each keeps
  * 64·cost < 2³⁵ — nowhere near the 10¹⁵ unreachable sentinel.
  *
  * Scale shape:
  *  - the corpus collapses to (word, freq) ONCE (the BPE discipline) —
  *    candidate enumeration, vocabulary choice and Viterbi all run over
  *    DISTINCT words, never occurrences;
  *  - candidate substrings explode map-side (≤ len·maxPieceLen rows per
  *    distinct word) into one hash aggregate keyed by piece;
  *  - the top-V cut uses the bounded-heap `topn_min_agg` THRESHOLD (the
  *    q154 pattern) — no window over the full piece-type table; the
  *    rank window runs over ≤ V + ties survivors;
  *  - per-word Viterbi is ONE `aggregate` higher-order fold over the
  *    word's in-vocab spans (collected per word — ≤ len·maxPieceLen
  *    structs), O(len²·pieces) arithmetic inside codegen, zero shuffle
  *    beyond the span join;
  *  - words longer than `maxWordLen` are EXCLUDED from segmentation and
  *    reported (never silently dropped): the DP depth is the oracle's
  *    unroll depth, so the cap is part of the contract. Their
  *    characters still seed the vocabulary.
  *
  * Single-character pieces are ALWAYS kept regardless of `minCount`
  * (SentencePiece's character coverage): every word then has at least
  * the all-chars split, so the DP cannot strand.
  */
object UnigramLm {

  /** Viterbi DP depth cap == the oracle's CTE unroll depth. */
  val MaxWordLen = 16

  /** Unreachable-cell sentinel: far above any real packed path cost. */
  val Inf = 1000000000000000L

  /** The micro-nat piece cost given `freq` and `total` columns — the
    * ONE double expression, interpolated verbatim into both engines.
    */
  val CostExprSql: String =
    "CAST(floor((ln(CAST(total AS DOUBLE)) - ln(CAST(freq AS DOUBLE))) " +
      "* 1000000.0 + 0.5) AS BIGINT) AS cost_u"

  /** (word, freq) — the distinct-word frame segmentation runs over. */
  def wordFrame(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Occurrence-weighted substring candidates of length 1..`maxPieceLen`
    * over the distinct-word frame: (piece, freq) where freq counts every
    * occurrence position in every word, weighted by word frequency (the
    * SentencePiece seed statistic).
    */
  def pieceCandidates(words: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1, s"bad maxPieceLen=$maxPieceLen")
    words
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(1, least($maxPieceLen, length(word) - i + 1)),
           |    l -> substring(word, i, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("freq"))
  }

  /** The frequency-seeded vocabulary with exact micro-nat costs:
    * ALL single characters + the top-`vocabSize` multi-character pieces
    * with `freq ≥ minCount` under the (freq desc, piece) total order.
    * Output: (piece, freq, cost_u) — cost normalized over the SELECTED
    * vocabulary's total mass.
    */
  def seedVocab(words: DataFrame, maxPieceLen: Int = 6,
      vocabSize: Int = 512, minCount: Long = 2L): DataFrame = {
    require(vocabSize >= 1, s"bad vocabSize=$vocabSize")
    val cands = pieceCandidates(words, maxPieceLen)
    val chars = cands.where(length(col("piece")) === 1)
    val multi = cands.where(length(col("piece")) >= 2 && col("freq") >= minCount)
    // k-th largest frequency from the bounded heap; the rank window then
    // orders only the ≤ V + ties survivors (the q154 discipline)
    val thr = multi
      .agg(graft.plans.TopNAgg.topnMinAgg(-col("freq"), vocabSize).as("negs"))
      .select(when(size(col("negs")) > 0,
        -element_at(col("negs"), size(col("negs"))))
        .otherwise(lit(Long.MinValue)).as("thr"))
    val topV = multi.crossJoin(broadcast(thr))
      .where(col("freq") >= col("thr"))
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("freq").desc, col("piece"))))
      .where(col("rnk") <= vocabSize)
      .select("piece", "freq")
    val vocab = chars.select("piece", "freq").unionByName(topV)
    val total = vocab.agg(sum("freq").as("total"))
    vocab.crossJoin(broadcast(total))
      .selectExpr("piece", "freq", CostExprSql)
  }

  /** Exact Viterbi segmentation of every distinct word of length
    * ≤ [[MaxWordLen]] against a (piece, cost_u) vocabulary:
    * (word, cost_u, n_pieces) — the packed-BIGINT DP decoded. Words
    * above the cap are absent (callers report them via the word frame
    * anti-join; see [[segmentStats]]).
    */
  def viterbiSegment(words: DataFrame, vocab: DataFrame): DataFrame = {
    // in-vocab spans per word: (s = 0-based start, e = end, cost)
    val spans = words
      .where(length(col("word")) <= MaxWordLen)
      .select(col("word"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(length(word), i + ${MaxWordLen - 1})),
           |    e -> struct(i - 1 AS s, e AS e, substring(word, i, e - i + 1) AS piece))))""".stripMargin))
        .as("sp"))
      .select(col("word"), col("sp.s").as("s"), col("sp.e").as("e"),
        col("sp.piece").as("piece"))
      .join(vocab.select(col("piece"), col("cost_u")), "piece")
      .groupBy("word")
      .agg(collect_list(struct(col("s"), col("e"), col("cost_u").as("c")))
        .as("ps"))
    spans
      .withColumn("b", expr(
        s"""aggregate(
           |  sequence(1, length(word)),
           |  concat(array(CAST(0 AS BIGINT)),
           |         array_repeat(CAST($Inf AS BIGINT), length(word))),
           |  (acc, j) -> transform(acc, (v, k) ->
           |    CASE WHEN k = j THEN coalesce(
           |      array_min(transform(filter(ps, p -> p.e = j),
           |        p -> element_at(acc, p.s + 1) + p.c * 64 + 1)),
           |      CAST($Inf AS BIGINT))
           |    ELSE v END),
           |  acc -> element_at(acc, length(word) + 1))""".stripMargin))
      .where(col("b") < Inf)
      .select(col("word"), expr("b div 64").as("cost_u"),
        expr("b % 64").as("n_pieces"))
  }

  /** The pieces ON the Viterbi best path, per distinct word:
    * (word, piece, cnt) — the statistic the hard-EM M-step recounts.
    * Two folds: the forward DP of [[viterbiSegment]] kept as the FULL
    * best array, then a backward walk from position n choosing, at each
    * position, the piece that ACHIEVES the cell value (equality against
    * the packed cell; ties broken to the smallest start = the longest
    * achieving piece — deterministic, and exactly what the oracle's
    * `min(p.s)` replays). The walk is O(len·pieces) arithmetic inside
    * codegen; nothing leaves the row until the final explode.
    */
  def viterbiPieces(words: DataFrame, vocab: DataFrame): DataFrame = {
    val spans = words
      .where(length(col("word")) <= MaxWordLen)
      .select(col("word"), col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(length(word), i + ${MaxWordLen - 1})),
           |    e -> struct(i - 1 AS s, e AS e, substring(word, i, e - i + 1) AS piece))))""".stripMargin))
        .as("sp"))
      .select(col("word"), col("freq"), col("sp.s").as("s"), col("sp.e").as("e"),
        col("sp.piece").as("piece"))
      .join(vocab.select(col("piece"), col("cost_u")), "piece")
      .groupBy("word")
      .agg(first(col("freq")).as("freq"),
        collect_list(struct(col("s"), col("e"), col("cost_u").as("c")))
          .as("ps"))
    spans
      .withColumn("best", expr(
        s"""aggregate(
           |  sequence(1, length(word)),
           |  concat(array(CAST(0 AS BIGINT)),
           |         array_repeat(CAST($Inf AS BIGINT), length(word))),
           |  (acc, j) -> transform(acc, (v, k) ->
           |    CASE WHEN k = j THEN coalesce(
           |      array_min(transform(filter(ps, p -> p.e = j),
           |        p -> element_at(acc, p.s + 1) + p.c * 64 + 1)),
           |      CAST($Inf AS BIGINT))
           |    ELSE v END))""".stripMargin))
      .where(expr(s"element_at(best, length(word) + 1) < ${Inf}L"))
      .withColumn("cuts", expr(
        s"""aggregate(
           |  sequence(1, length(word)),
           |  array(length(word)),
           |  (cuts, x) -> CASE WHEN element_at(cuts, size(cuts)) = 0 THEN cuts
           |    ELSE concat(cuts, array(array_min(transform(
           |      filter(ps, p -> p.e = element_at(cuts, size(cuts)) AND
           |        element_at(best, p.s + 1) + p.c * 64 + 1
           |          = element_at(best, element_at(cuts, size(cuts)) + 1)),
           |      p -> p.s)))) END)""".stripMargin))
      .withColumn("pieces", expr(
        """transform(sequence(1, size(cuts) - 1), i ->
          |  substring(word, element_at(cuts, i + 1) + 1,
          |    element_at(cuts, i) - element_at(cuts, i + 1)))""".stripMargin))
      .select(col("word"), col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("word", "piece").agg(count(lit(1)).as("cnt"))
  }

  /** One HARD-EM round (Viterbi-EM / segmental k-means): recount piece
    * frequencies along the current best paths (occurrence-weighted),
    * drop multi-char pieces the paths no longer use, floor the
    * single-char alphabet at 1 (character coverage must survive — the
    * one deviation from pure MLE, documented), renormalize costs over
    * the new mass. By Gibbs' inequality the corpus NLL under the new
    * costs with re-segmentation cannot exceed the old one (up to the
    * micro-nat quantization and the alphabet floor) — the spec pins the
    * decrease on real corpora.
    */
  def emRound(words: DataFrame, vocab: DataFrame): DataFrame = {
    val counts = viterbiPieces(words, vocab)
      .join(words.select(col("word"), col("freq").as("wfreq")), "word")
      .groupBy("piece").agg(sum(col("cnt") * col("wfreq")).as("c"))
    val vocab1 = vocab.select("piece")
      .join(counts, Seq("piece"), "left")
      .where(length(col("piece")) === 1 || coalesce(col("c"), lit(0L)) >= 1L)
      .select(col("piece"),
        when(length(col("piece")) === 1, greatest(coalesce(col("c"), lit(0L)), lit(1L)))
          .otherwise(col("c")).as("freq"))
    val total = vocab1.agg(sum("freq").as("total"))
    vocab1.crossJoin(broadcast(total))
      .selectExpr("piece", "freq", CostExprSql)
  }

  /** The corpus readout: train the seeded vocabulary corpus-globally,
    * Viterbi-segment the distinct words once, then roll up per
    * `groupCol` over OCCURRENCES: (group, n_words, n_excluded,
    * n_pieces, nll_micro_nats) — n_excluded counts occurrences of
    * over-cap words (reported, never silently dropped); nll is the
    * exact corpus negative log-likelihood under the unigram model in
    * micro-nats, the tokenizer-side twin of the q85/q150 perplexities.
    */
  def segmentStats(docs: DataFrame, textCol: String, groupCol: String,
      maxPieceLen: Int = 6, vocabSize: Int = 512,
      minCount: Long = 2L): DataFrame = {
    val words = wordFrame(docs, textCol)
    val vocab = seedVocab(words, maxPieceLen, vocabSize, minCount)
    val seg = viterbiSegment(words, vocab)
    val occ = docs
      .select(col(groupCol).as("group"), explode(tokens(col(textCol))).as("word"))
      .groupBy("group", "word").agg(count(lit(1)).as("n"))
    rollup(occ, seg).withColumnRenamed("group", groupCol)
  }

  private def rollup(occ: DataFrame, seg: DataFrame): DataFrame =
    occ.join(seg, Seq("word"), "left")
      .groupBy("group")
      .agg(
        sum(when(col("n_pieces").isNotNull, col("n")).otherwise(0L))
          .as("n_words"),
        sum(when(col("n_pieces").isNull, col("n")).otherwise(0L))
          .as("n_excluded"),
        sum(when(col("n_pieces").isNotNull, col("n") * col("n_pieces"))
          .otherwise(0L)).as("n_pieces"),
        sum(when(col("cost_u").isNotNull, col("n") * col("cost_u"))
          .otherwise(0L)).as("nll_micro_nats"))

  /** [[segmentStats]] across `emRounds` hard-EM refinements: one row per
    * (group, round) — round 0 is the seeded model, round r the model
    * after r [[emRound]]s, each re-segmented from scratch. The NLL
    * column is the training curve: non-increasing per round (Gibbs),
    * modulo the documented micro-nat quantization and alphabet floor.
    * Each round's vocabulary is eagerly materialized (`localCheckpoint`)
    * — the E-step references it across two folds and the M-step again,
    * the q95/q112 diamond lesson.
    */
  def segmentStatsEm(docs: DataFrame, textCol: String, groupCol: String,
      emRounds: Int, maxPieceLen: Int = 6, vocabSize: Int = 512,
      minCount: Long = 2L): DataFrame = {
    require(emRounds >= 0, s"bad emRounds=$emRounds")
    val words = wordFrame(docs, textCol).localCheckpoint(true)
    val occ = docs
      .select(col(groupCol).as("group"), explode(tokens(col(textCol))).as("word"))
      .groupBy("group", "word").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    var vocab = seedVocab(words, maxPieceLen, vocabSize, minCount)
      .localCheckpoint(true)
    var out = Vector.empty[DataFrame]
    for (r <- 0 to emRounds) {
      out = out :+ rollup(occ, viterbiSegment(words, vocab))
        .withColumn("round", lit(r.toLong))
      if (r < emRounds) vocab = emRound(words, vocab).localCheckpoint(true)
    }
    out.reduce(_ unionByName _)
      .select(col("group").as(groupCol), col("round"), col("n_words"),
        col("n_excluded"), col("n_pieces"), col("nll_micro_nats"))
  }
}
