package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus — the inverted-index
  * scoring shape (Robertson & Zaragoza, "The Probabilistic Relevance
  * Framework: BM25 and Beyond"). The reference's serving layer searches
  * by relational predicates only (the `dwh/serving` queries filter on category /
  * follower bands); content-relevance ranking over the text itself is
  * the retrieval half a training-data platform needs (eval-set mining,
  * corpus inspection, RAG indexing).
  *
  * Relational shape — everything is a hash aggregate or an equi-join on
  * (term) or (doc): postings `(doc, dl, term, tf)` from one corpus scan
  * (the doc length rides the grouping key); df/idf per QUERY term only
  * (semi-join before the stats, so the full term dictionary is never
  * materialized); scoring joins postings against the tiny query-term
  * frame (broadcast) and aggregates by (qid, doc). Top-k per query is a
  * rank-partitioned `row_number` ≤ k — Spark plans the per-partition
  * `WindowGroupLimit` so only ≤ k rows per (partition, qid) reach the
  * exchange. At 100 TB: postings partition by term (the classic
  * distributed inverted index); query frames are always the broadcast
  * side; df/idf stats are |query terms| rows.
  *
  * Portability (why integer): with k1 = 1.2 and b = 0.75 the BM25 term
  * factor is the exact rational
  * `22·tf·total / (10·tf·total + 3·total + 9·dl·N)` (multiply the
  * classic form through by `10·total`, where `total` = corpus token
  * count, `N` = doc count, `dl` = doc length, `avgdl = total/N` never
  * materializes as a float). idf is quantized to integer micro-nats
  * (`floor(ln((2N+2)/(2·df+1))·10⁶ + 0.5)` — the +0.5-smoothed
  * `ln(1 + (N−df+0.5)/(df+0.5))` rewritten over integers), and each
  * term's contribution `idf_u·22·tf·total div (…)` is exact BIGINT
  * arithmetic, so per-doc sums are order-free and any engine reproduces
  * them bit-for-bit. Magnitudes: the contribution numerator is
  * `idf_u·22·tf·total`, which crosses 2⁶³ when `idf_u·tf·total ≈ 4·10¹⁷`
  * — at a rare term's idf_u ≈ 2·10⁷ micro-nats that is
  * `tf·total ≲ 2·10¹⁰`, i.e. a ~10¹⁰-token corpus with a term repeated
  * hundreds of times in one doc, NOT a fixed 10¹² wall: the bound
  * depends on max tf and idf_u jointly. Past it, compute the rational
  * term factor first in micro-units (or switch the numerator to
  * decimal) — same plan shape, one extra division.
  */
object Retrieval {

  /** Corpus statistics pack: postings (doc, dl, term, tf) — the doc
    * length rides the grouping key (constant per doc), so scoring never
    * joins a separate lengths frame back onto the corpus — and the
    * 1-row totals (n docs, total tokens). One scan each.
    */
  def corpusPostings(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("doc"), tokens(col(textCol)).as("tk"))
    val posting = toks
      .select(col("doc"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .groupBy("doc", "dl", "term").agg(count(lit(1)).as("tf"))
    val tot = toks.agg(count(lit(1)).as("n"), sum(size(col("tk"))).as("total"))
    (posting, tot)
  }

  /** Top-k docs per query under BM25(k1=1.2, b=0.75).
    * `queryTerms`: (qid, term) — one row per query term; duplicate
    * (qid, term) rows are deduplicated before scoring, so a repeated
    * query term contributes exactly once (the set-of-terms query model
    * the classic BM25 formulation uses; a bag-of-words variant would
    * multiply the contribution by the query-side tf — callers wanting
    * that weight the fused score downstream). Returns
    * (qid, doc, score_u, rnk) with rnk ≤ k; docs sharing no term with a
    * query are absent.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: DataFrame, k: Int): DataFrame = {
    val (posting, tot) = corpusPostings(docs, idCol, textCol)
    bm25FromPostings(posting, tot, queryTerms, k)
  }

  /** The scoring half of [[bm25TopK]], over an ALREADY-MATERIALIZED
    * postings frame (doc, dl, term, tf) and 1-row totals (n, total) —
    * the entry point for a STORED inverted index
    * ([[graft.streaming.RetrievalStream]] maintains one at ingest;
    * searching then never re-tokenizes the corpus).
    */
  def bm25FromPostings(posting: DataFrame, tot: DataFrame,
      queryTerms: DataFrame, k: Int): DataFrame = {
    // dedupe (qid, term) up front: the scoring join must see each query
    // term once or a repeated term silently doubles its contribution
    // (ADVICE r10 — the docstring promised counted-once, the join didn't)
    val qt = queryTerms.select("qid", "term").distinct()
    // df over query terms only: semi-join first, then count docs per term
    val qTerms = qt.select("term").distinct()
    val dfT = posting.join(broadcast(qTerms), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idf = dfT.crossJoin(broadcast(tot))
      .select(col("term"),
        floor(log((col("n") * 2 + 2).cast("double") / (col("df") * 2 + 1))
          * 1000000.0 + 0.5).cast("long").as("idf_u"))
    val contrib = posting
      .join(broadcast(qt), "term")
      .join(broadcast(idf), "term")
      .crossJoin(broadcast(tot))
      .select(col("qid"), col("doc"),
        expr("(idf_u * 22 * tf * total) div " +
          "(10 * tf * total + 3 * total + 9 * dl * n)").as("c"))
    val scored = contrib.groupBy("qid", "doc").agg(sum("c").as("score_u"))
    scored
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("score_u").desc, col("doc").asc)).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Top-k docs per query under the Dirichlet-smoothed query-likelihood
    * model (Zhai & Lafferty, SIGIR'01) — the language-modeling
    * alternative to BM25 (same index, different scoring family; LM
    * scoring wins on short queries / verbose corpora and is the
    * standard second lexical leg under RRF fusion). Uses the
    * rank-equivalent decomposition so only MATCHED postings are
    * scored:
    *
    *   score(q,d) = Σ_{t ∈ q∩d} ln(1 + tf·total / (μ·cf_t))
    *                + |q| · ln(μ / (dl + μ))
    *
    * (the dropped Σ ln p_c(t) term is constant per query). Docs
    * sharing no term with a query are absent, like [[bm25TopK]].
    *
    * Portability: each matched contribution quantizes to micro-nats —
    * `floor(ln((μ·cf + tf·total)/(μ·cf)) · 10⁶ + 0.5)` with the
    * ratio's numerator/denominator exact BIGINTs — summed as BIGINT,
    * plus `|q| · floor(ln(μ/(dl+μ)) · 10⁶ + 0.5)`; ties break on doc.
    * Overflow: `μ·cf + tf·total < 2⁶³` — with μ=2000 that is
    * `cf ≲ 4.6·10¹⁵` and `tf·total ≲ 9.2·10¹⁸` jointly, far past any
    * real corpus before the micro-unit path needs decimals.
    *
    * Shape — identical scale posture to BM25: cf exists only for query
    * terms (broadcast semi-join), dl rides the posting grouping key
    * (never a corpus-side lengths join), the per-query term count is a
    * ≤|q|-row broadcast, top-k is WindowGroupLimit partial+final.
    */
  def queryLikelihoodTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, k: Int, mu: Int = 2000): DataFrame = {
    val (posting, tot) = corpusPostings(docs, idCol, textCol)
    qlFromPostings(posting, tot, queryTerms, k, mu)
  }

  /** The scoring half of [[queryLikelihoodTopK]] over an
    * already-materialized postings frame — the stored-index entry
    * point, mirroring [[bm25FromPostings]]. Duplicate (qid, term) rows
    * deduplicate before scoring (set-of-terms query model).
    */
  def qlFromPostings(posting: DataFrame, tot: DataFrame,
      queryTerms: DataFrame, k: Int, mu: Int): DataFrame = {
    require(mu >= 1, s"mu must be >= 1, got $mu")
    val qt = queryTerms.select("qid", "term").distinct()
    val qTerms = qt.select("term").distinct()
    // corpus frequency over query terms only
    val cf = posting.join(broadcast(qTerms), "term")
      .groupBy("term").agg(sum("tf").as("cf"))
    val nq = qt.groupBy("qid").agg(count(lit(1)).as("nq"))
    val matched = posting
      .join(broadcast(qt), "term")
      .join(broadcast(cf), "term")
      .crossJoin(broadcast(tot))
      .select(col("qid"), col("doc"), col("dl"),
        expr(s"cast(floor(ln(cast($mu * cf + tf * total as double) " +
          s"/ cast($mu * cf as double)) * 1000000.0 + 0.5) as bigint)")
          .as("m_u"))
    val scored = matched.groupBy("qid", "doc", "dl")
      .agg(sum("m_u").as("m_sum"))
      .join(broadcast(nq), "qid")
      .select(col("qid"), col("doc"),
        (col("m_sum") + col("nq") *
          expr(s"cast(floor(ln($mu / cast(dl + $mu as double)) " +
            "* 1000000.0 + 0.5) as bigint)")).as("score_u"))
    scored
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("score_u").desc, col("doc").asc)).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein,
    * SIGIR'98) — the diversity rerank RAG retrieval stacks run after
    * top-k: greedily pick `m` results where each next pick maximizes
    * `λ·rel − (1−λ)·max_{s∈selected} sim(c, s)`, so near-duplicate
    * hits (which a pure relevance ranking stacks at the top) cannot
    * crowd out coverage.
    *
    * Inputs are BOUNDED frames — the per-query shortlist
    * `rel(qid, nid, rel_u)` (≤|q|·k rows) and its candidate-pair
    * similarities `sims(qid, na, nb, sim_u)` (≤|q|·k² rows, both sides
    * from the shortlist) — so every round is a join over
    * shortlist-sized data regardless of corpus size; the expensive
    * part (retrieval) already happened upstream.
    *
    * Integer MMR with λ in tenths (default 7 = 0.7):
    * `mmr_u = (λ·rel_u − (10−λ)·maxsim_u) div 10`, empty-set maxsim 0
    * (so round 1 ranks by λ·rel alone); ties break on nid. Exactly
    * `m` rounds of window argmax per query — deterministic, unrollable
    * as CTEs by the oracle.
    *
    * `sims` may be SPARSE or single-orientation: a candidate-selected
    * pair with no sims row scores similarity 0 (maximally diverse) via
    * a left join — missing pairs never shrink the rerank pool.
    *
    * Output: (qid, mmr_rank 1..m, nid, mmr_u).
    */
  def mmrSelect(rel: DataFrame, sims: DataFrame, m: Int,
      lambdaTenths: Int = 7): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"lambdaTenths must be in [0,10], got $lambdaTenths")
    val lam = lambdaTenths.toLong
    // both inputs are bounded (|q|·k and |q|·k² rows) but DERIVED —
    // typically from a brute-force/ANN top-k whose subtree is
    // corpus-sized. Each greedy round references rel twice and sims
    // once, and round r's selected references round r−1's, so the lazy
    // composition re-derives the retrieval subtree ~2^m times (the
    // q95/BPE diamond; measured 12.7 s for m=5 over a 30-row shortlist
    // before these checkpoints, 2.3 s after). Checkpointing ≤|q|·k²
    // rows is free at any scale.
    val relC = rel.select("qid", "nid", "rel_u").localCheckpoint(true)
    val simsC = sims.select("qid", "na", "nb", "sim_u").localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("mmr_u").desc, col("nid").asc)
    def pick(scored: DataFrame, r: Int): DataFrame = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("qid"), lit(r.toLong).as("mmr_rank"), col("nid"),
        col("mmr_u"))
    var selected = pick(relC.select(col("qid"), col("nid"),
      expr(s"($lam * rel_u) div 10").as("mmr_u")), 1)
      .localCheckpoint(true)
    for (r <- 2 to m) {
      val remaining = relC.join(selected.select("qid", "nid"),
        Seq("qid", "nid"), "left_anti")
      // max-sim against the selected set rides a LEFT join coalesced to
      // 0: a candidate with no sims row against ANY selected item is
      // maximally diverse (similarity 0), not silently dropped — so
      // sparse or single-orientation similarity inputs degrade to
      // missing-pair = 0 instead of shrinking the rerank pool
      val maxsim = simsC.withColumnRenamed("na", "nid")
        .join(selected.select(col("qid"), col("nid").as("nb")),
          Seq("qid", "nb"))
        .groupBy("qid", "nid")
        .agg(max("sim_u").as("maxsim_u"))
      val scored = remaining
        .join(maxsim, Seq("qid", "nid"), "left")
        .select(col("qid"), col("nid"),
          expr(s"($lam * rel_u - ${10 - lam} * coalesce(maxsim_u, 0)) div 10")
            .as("mmr_u"))
      selected = selected.unionByName(pick(scored, r)).localCheckpoint(true)
    }
    selected.select("qid", "mmr_rank", "nid", "mmr_u")
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two ranked
    * candidate lists — the standard hybrid-retrieval combiner (BM25 ⊕
    * embedding cosine is the RAG default: lexical recall where the
    * term matches, semantic recall where it paraphrases). Inputs are
    * (qid, nid, rank) frames; a candidate absent from one list simply
    * contributes 0 from that side — no score normalization needed,
    * which is RRF's whole point (ranks are scale-free; BM25 micro-units
    * and cosine would otherwise need a learned calibration).
    *
    * Portability: the classic 1/(k₀+rank) is kept in integer
    * micro-units — `10⁶ div (k₀ + rank)` — so fused scores are exact
    * BIGINT sums with deterministic (rrf_u desc, nid) ranking on any
    * engine. Shape: one full-outer equi-join of two ≤|q|·k-row frames
    * (both already top-k-bounded — tiny next to any corpus), then a
    * per-query WindowGroupLimit.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, rrfK: Int = 60): DataFrame = {
    val ra = a.select(col("qid"), col("nid"),
      col("rank").cast("long").as("__rank_a"))
    val rb = b.select(col("qid"), col("nid"),
      col("rank").cast("long").as("__rank_b"))
    val fused = ra.join(rb, Seq("qid", "nid"), "full_outer")
      .withColumn("rrf_u",
        coalesce(expr(s"1000000 div ($rrfK + __rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($rrfK + __rank_b)"), lit(0L)))
    fused
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("rrf_u").desc, col("nid").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rrf_u", "rank")
  }
}
