package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * perplexity quality filter (Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data"): train a smoothed
  * bigram model on the corpus, score every document by its mean negative
  * log-likelihood, and let the pipeline gate on the score (high NLL =
  * unusual token transitions = boilerplate/gibberish candidates; CCNet
  * buckets head/middle/tail by exactly this signal).
  *
  * No counterpart in the reference (its quality notion is engagement
  * scores, e.g. `dwh/.../fact_kol_performance.sql`); this is a
  * training-data-curation addition per the 100 TB charter.
  *
  * Everything is relational and partial-aggregation-friendly:
  *  - postings: posexplode + one `lead` window per document (bounded by
  *    document length, never a corpus-wide sort);
  *  - model: `groupBy(w1, w2).count` — map-side combine; context counts
  *    c(w1) derive from the bigram table itself (sum over w2), and the
  *    vocabulary size from its distinct endpoints — neither re-scans the
  *    corpus;
  *  - scoring: one join of postings against the model on (w1, w2). The
  *    model groupBy and the scoring join hash-partition the SAME postings
  *    subtree on the same keys, so the exchange is reused (one shuffle of
  *    the postings serves both); the model side is tiny relative to the
  *    corpus (distinct bigrams) and broadcast-able when it fits.
  *
  * Portability: per-bigram NLL is quantized to integer micro-nats
  * (`floor(-ln(p)·10⁶ + 0.5)`) BEFORE the per-document sum, so the sum is
  * exact integer arithmetic in any order on any engine — the DuckDB
  * oracle reproduces it bit-for-bit. A raw double sum would be
  * order-dependent (parallel aggregation) and could flip the final
  * rounding.
  */
object LanguageModel {

  /** One row per adjacent token pair per document: (id, w1, w2). The
    * `lead` window partitions by document — bounded by document length.
    */
  def bigramPostings(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    val byDoc = Window.partitionBy("id").orderBy("pos")
    toks
      .withColumn("w2", lead(col("t"), 1).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col("id"), col("t").as("w1"), col("w2"))
  }

  /** Add-one-smoothed bigram model over the postings:
    * (w1, w2, c12, c1) with p(w2|w1) = (c12 + 1) / (c1 + V).
    * `c1` is the context count (bigrams starting at w1) and V the
    * vocabulary size — both derived from the bigram count table, which is
    * small (distinct bigrams), never from a second corpus scan.
    */
  def bigramModel(postings: DataFrame): DataFrame = {
    val c12 = postings.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = c12.select(col("w1").as("t"))
      .union(c12.select(col("w2").as("t")))
      .agg(countDistinct("t").as("v"))
    c12.join(c1, "w1").crossJoin(broadcast(vocab))
  }

  /** Per-document mean NLL under the corpus's own bigram model:
    * (id, n_bigrams, nll_micro_sum) — `nll_micro_sum` is the exact
    * integer sum of per-bigram micro-nat NLLs; mean NLL in nats is
    * `nll_micro_sum / n_bigrams / 1e6`. Documents with fewer than two
    * tokens have no bigrams and are absent (callers left-join).
    */
  def perplexityScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val postings = bigramPostings(df, idCol, textCol)
    val model = bigramModel(postings)
    postings
      .join(model, Seq("w1", "w2"))
      .withColumn("nll_u",
        floor(-log((col("c12") + lit(1)).cast("double") /
          (col("c1") + col("v")).cast("double")) * 1000000.0 + 0.5)
          .cast("long"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("nll_u").as("nll_micro_sum"))
  }
}
