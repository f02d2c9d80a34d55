package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deequ-style single-pass column profiler — the data-quality snapshot a
  * pipeline records before admitting a new corpus drop (row count, null
  * counts, exact distinct cardinalities, numeric ranges, string ranges).
  *
  * One aggregation over one scan produces every statistic; the profile is
  * then pivoted to one row PER COLUMN (long format) so downstream checks
  * and snapshots diff structurally. The multiple exact `count(DISTINCT)`
  * aggregates plan through Expand — still one scan, with map-side partial
  * aggregation shrinking each partition to one row before the shuffle. At
  * 100 TB swap the exact distincts for `approx_count_distinct` (the
  * q60-vs-q41 exact/approx pairing); exact is the oracle-checkable twin.
  *
  * String min/max is only offered for columns the caller vouches are
  * ASCII-ordered (cross-engine collation on arbitrary UTF-8 differs);
  * `countOnlyCols` profiles nullness/cardinality without ranges.
  */
object Profile {

  /** One row per profiled column: (col_name, n_rows, n_null, n_distinct,
    * num_min, num_max, str_min, str_max) — the range pair not applicable
    * to the column's kind is null.
    */
  def columnProfile(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String], countOnlyCols: Seq[String] = Nil): DataFrame = {
    val all = numericCols ++ stringCols ++ countOnlyCols
    require(all.nonEmpty, "no columns to profile")
    def nullsOf(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c")
    def distinctOf(c: String) = countDistinct(col(c)).as(s"__dist_$c")
    val rangeAggs = numericCols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__min_$c"),
      max(col(c)).cast("double").as(s"__max_$c"))) ++
      stringCols.flatMap(c => Seq(
        min(col(c)).cast("string").as(s"__smin_$c"),
        max(col(c)).cast("string").as(s"__smax_$c")))
    val aggs = Seq(count(lit(1)).as("__n")) ++
      all.map(nullsOf) ++ all.map(distinctOf) ++ rangeAggs
    val one = df.agg(aggs.head, aggs.tail: _*)

    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    def rowOf(c: String, numMin: Column, numMax: Column, sMin: Column,
        sMax: Column) =
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        numMin.as("num_min"), numMax.as("num_max"),
        sMin.as("str_min"), sMax.as("str_max"))
    val rows =
      numericCols.map(c => rowOf(c, col(s"__min_$c"), col(s"__max_$c"), nullS, nullS)) ++
        stringCols.map(c => rowOf(c, nullD, nullD, col(s"__smin_$c"), col(s"__smax_$c"))) ++
        countOnlyCols.map(c => rowOf(c, nullD, nullD, nullS, nullS))
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Per-source corpus datasheet — the "Datasheets for Datasets"
    * (Gebru et al.) one-stop card a corpus drop ships with: volumes
    * (docs/tokens/chars), language spread, exact-duplicate mass
    * (bag-of-words fingerprint collisions WITHIN the source — the q113
    * key), and the q97 quality-classifier keep count. All exact
    * integers, two aggregates over one scored scan: the per-source
    * rollup and the per-(source, fingerprint) duplicate count, joined
    * on the ≤|sources|-row result frames.
    */
  def corpusDatasheet(docs: DataFrame, sourceCol: String = "source"): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val scored = Classifier.qualityClassify(docs, "text")
      .withColumn("__fp", md5(array_join(array_sort(array_distinct(
        tokens(col("text")))), " ")))
    val base = scored.groupBy(sourceCol).agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").as("n_tokens"),
      sum("n_chars").as("n_chars"),
      countDistinct("lang").as("n_langs"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality_keep"))
    val dups = scored.groupBy(sourceCol, "__fp")
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1)
      .groupBy(sourceCol).agg(sum("__cnt").as("n_dup_docs"))
    base.join(dups, Seq(sourceCol), "left")
      .withColumn("n_dup_docs", coalesce(col("n_dup_docs"), lit(0L)))
  }

  /** Per-source lexical diversity — the datasheet's "is this corpus
    * slice templated or organic?" signal, the n-gram-statistics cousin
    * of [[corpusDatasheet]]'s duplicate mass: token/type counts, the
    * type-token ratio, and distinct-vs-total trigram mass. Low trigram
    * diversity with a healthy TTR is the boilerplate signature (shared
    * phrasing over a normal vocabulary); both low is machine-generated
    * spam; both high is organic text. Self-BLEU-style diversity without
    * the pairwise cost: one tokens aggregate + one trigram aggregate,
    * each a map-side-combined hash agg, ratios as exact basis-point
    * integers (`x · 10⁴ div y`, q111's discipline).
    *
    * Trigrams use the q35 shingle convention: per-doc DISTINCT grams,
    * short docs contributing their full token run as one gram — so
    * `n_trigrams` is the per-doc-distinct posting count and the
    * diversity ratio isolates CROSS-document repetition (within-doc
    * repetition is already collapsed, which is exactly the boilerplate
    * axis). Output per source: (n_docs, n_tokens, n_types, ttr_bp,
    * n_trigrams, n_distinct_trigrams, trigram_diversity_bp);
    * empty-text docs count toward n_docs only.
    */
  def lexicalDiversity(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.{shingles, tokens}
    val toks = docs.select(col(sourceCol),
      explode(tokens(col(textCol))).as("__t"))
      .groupBy(sourceCol).agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("__t")).as("n_types"))
    val grams = docs.select(col(sourceCol),
      explode(shingles(col(textCol))).as("__g"))
      .groupBy(sourceCol).agg(
        count(lit(1)).as("n_trigrams"),
        countDistinct(col("__g")).as("n_distinct_trigrams"))
    docs.groupBy(sourceCol).agg(count(lit(1)).as("n_docs"))
      .join(toks, Seq(sourceCol), "left")
      .join(grams, Seq(sourceCol), "left")
      .select(col(sourceCol),
        col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        expr("coalesce(n_types, 0) * 10000 div greatest(coalesce(n_tokens, 0), 1)")
          .as("ttr_bp"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_distinct_trigrams"), lit(0L)).as("n_distinct_trigrams"),
        expr("coalesce(n_distinct_trigrams, 0) * 10000 div " +
          "greatest(coalesce(n_trigrams, 0), 1)").as("trigram_diversity_bp"))
  }

  /** Log2-bucketed token-length histogram per source — the length
    * DISTRIBUTION behind [[corpusDatasheet]]'s totals, and the input
    * the packing-capacity decision (q139) actually needs: how much
    * document mass sits above/below a candidate sequence length, and
    * whether a source is dominated by snippets or long-form. Log2
    * buckets because document lengths are heavy-tailed — linear bins
    * put everything in two rows.
    *
    * The bucket is the exact integer ⌊log2 n⌋ computed WITHOUT floats:
    * `length(bin(n)) - 1` (binary-digit count; both Spark and DuckDB
    * render bin() without leading zeros), so bucket edges are
    * bit-exact on any engine — a float log2 would misfile exact powers
    * of two on rounding. Zero-token docs get the sentinel bucket -1
    * with bucket_lo 0 (reported, never dropped — empty-doc mass is a
    * data-quality signal in its own right).
    *
    * Scale shape: one projection + one hash aggregate on
    * (source, bucket) — ≤ |sources|·64 result rows, map-side partials
    * collapse each input partition first.
    *
    * Output: (source, bucket, bucket_lo [= 2^bucket tokens], n_docs,
    * n_tokens).
    */
  def tokenLengthHistogram(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.tokens
    // size(tokens(NULL)) is NULL, which would slip past the <= 0 guard
    // into bin(NULL) and yield a NULL bucket row — fold null text into
    // the empty-doc sentinel instead
    val n = coalesce(size(tokens(col(textCol))).cast("long"), lit(0L))
    docs.select(col(sourceCol), n.as("__n"))
      .withColumn("bucket", when(col("__n") <= 0L, lit(-1L))
        .otherwise(length(bin(col("__n"))).cast("long") - 1L))
      .groupBy(sourceCol, "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("n_tokens"))
      .withColumn("bucket_lo", when(col("bucket") < 0L, lit(0L))
        .otherwise(expr("shiftleft(cast(1 as bigint), cast(bucket as int))")))
      .select(col(sourceCol), col("bucket"), col("bucket_lo"),
        col("n_docs"), col("n_tokens"))
  }

  /** Top-k collocations by pointwise mutual information — the classic
    * corpus-linguistics view (Church & Hanks 1990; Manning & Schütze
    * ch. 5) of which adjacent word pairs co-occur far more than chance:
    * multiword terms, templated phrases, named entities. For a curation
    * pipeline this is a datasheet signal (an out-of-place top
    * collocation list flags scraped boilerplate or a domain shift) and
    * the phrase-vocabulary input for tokenizer planning.
    *
    * PMI = ln(p(x,y) / (p(x)·p(y))) with p(x,y) = c_xy/Nb over adjacent
    * bigram occurrences and p(x) = c_x/Nu over unigram occurrences.
    * Quantization follows the BM25 idf convention: the probability
    * ratio is formed from EXACT BIGINT counts, one double `ln`, then
    * `floor(·10⁶ + 0.5)` micro-nats — identical arithmetic text on both
    * engines. `minCount` floors c_xy BEFORE the unigram joins (a
    * hapax pair has unreliable PMI and would dominate the top-k), which
    * also bounds the join input. The k-row result is totally ordered
    * (pmi desc, w1, w2) so LIMIT is deterministic.
    *
    * Scale shape: two hash aggregates over one tokenized scan (bigram
    * occurrences map-side from each doc's token array — docs under two
    * tokens contribute nothing), two keyed joins of the FLOORED bigram
    * table against the vocabulary counts, and a TakeOrdered top-k.
    * Count-product bound: c_xy·Nu² < 2⁵³ keeps the double ratio exact
    * to the unit; far past that the micro-nat is still stable (ln
    * compresses), but document corpus sums past ~10¹⁵ tokens.
    *
    * Output: (w1, w2, n_pair, pmi_u).
    */
  def pmiCollocations(docs: DataFrame, textCol: String = "text",
      minCount: Long = 5, k: Int = 50): DataFrame = {
    import graft.functions.TextFunctions.tokens
    require(minCount >= 1 && k >= 1, s"bad minCount=$minCount k=$k")
    val tk = docs.select(tokens(col(textCol)).as("__tk"))
    // the unigram table feeds THREE consumers (the Nu total + both
    // sides of the PMI join) and the bigram table two (the Nb total +
    // the floor) — left lazy each re-ran the corpus explode (the q155
    // two-consumer rule); both are vocabulary/pair-sized, the cheapest
    // frames here to materialize
    Iterate.loop(docs.sparkSession) { l =>
      val uni = l.pin(tk.select(explode(col("__tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")))
      val biAll = l.pin(tk.select(explode(expr(
          "CASE WHEN size(__tk) < 2 THEN array() " +
            "ELSE transform(sequence(1, size(__tk) - 1), " +
            "i -> struct(element_at(__tk, i) AS w1, element_at(__tk, i + 1) AS w2)) END"))
          .as("b"))
        .select(col("b.w1"), col("b.w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair")))
      // Nb is the total over ALL bigram occurrences — computed BEFORE the
      // min-count floor, or p(x,y) would be biased by what the floor drops
      val nb = biAll.agg(sum("n_pair").as("nb"))
      val bi = biAll.filter(col("n_pair") >= minCount)
      val nu = uni.agg(sum("c").as("nu"))
      l.finish(bi
        .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
        .selectExpr("w1", "w2", "n_pair",
          "cast(floor(ln((cast(n_pair as double) * cast(nu as double) * cast(nu as double)) / " +
            "(cast(nb as double) * cast(c1 as double) * cast(c2 as double))) * 1000000.0 + 0.5) as bigint) as pmi_u")
        .orderBy(col("pmi_u").desc, col("w1"), col("w2"))
        .limit(k))
    }
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): run
    * [[Influence.pageRankInteger]] over the corpus's word-adjacency
    * graph — nodes are tokens, with an undirected edge wherever two
    * distinct tokens appear adjacent anywhere in the corpus — and read
    * the top-`k` ranks as the corpus keyword list. Centrality in the
    * co-occurrence graph finds the hub vocabulary the counting views
    * (tf, PMI) each miss: a keyword is a token many DIFFERENT tokens
    * attach to, not merely a frequent one.
    *
    * Graph build is [[pmiCollocations]]'s adjacency transform with
    * `distinct` instead of counts (unweighted edges — the paper's base
    * form), self-loops dropped, both directions materialized so the
    * directed PageRank kernel walks the undirected graph. Distinct
    * adjacent PAIRS are vocabulary-sized, not corpus-sized, so the
    * iteration cost is independent of document count — the corpus is
    * touched once to enumerate pairs.
    *
    * Output: (token, rank_u), top `k` by (rank_u desc, token).
    */
  def textRankKeywords(docs: DataFrame, textCol: String = "text",
      iters: Int = 3, k: Int = 30): DataFrame = {
    import graft.functions.TextFunctions.tokens
    require(k >= 1, s"bad k=$k")
    val tk = docs.select(tokens(col(textCol)).as("__tk"))
    val e0 = tk.select(explode(expr(
        "CASE WHEN size(__tk) < 2 THEN array() " +
          "ELSE transform(sequence(1, size(__tk) - 1), " +
          "i -> struct(element_at(__tk, i) AS w1, element_at(__tk, i + 1) AS w2)) END"))
        .as("b"))
      .select(col("b.w1").as("src"), col("b.w2").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    // re-distinct after mirroring: text can contain BOTH orders of a
    // pair, and a duplicate edge row would double its PageRank weight
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    Influence.pageRankInteger(edges, iters)
      .select(col("node").as("token"), col("rank_u"))
      .orderBy(col("rank_u").desc, col("token"))
      .limit(k)
  }

  /** OLS slope over (x, y) sufficient sums (n, sx, sy, sxx, sxy) in
    * micro-units, degenerate inputs → 0 — one double division whose
    * expression text is interpolated VERBATIM into both engines (the
    * q144 FitExprs convention). Shared by the Zipf (q154) and Herdan
    * (q162) law fits.
    */
  def olsSlopeMicroSql(alias: String): String =
    "CAST(CASE WHEN n < 2 OR CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0 THEN 0 " +
      "ELSE floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) " +
      "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000.0 + 0.5) " +
      s"END AS BIGINT) AS $alias"

  val ZipfSlopeExprSql: String = olsSlopeMicroSql("zipf_slope_micro")

  /** Per-source Zipf slope — the corpus-health number the datasheet
    * reads off the rank-frequency law (Zipf 1949): natural language fits
    * `ln f ≈ −s·ln r + c` with slope s ≈ 1; templated or synthetic text
    * bends the line (flat head = few repeated phrases dominating; steep
    * tail = vocabulary collapse). Fit by exact-integer OLS over the
    * top-`k` tokens per source: x = ln(rank)·10⁶, y = ln(freq)·10⁶,
    * both floored to micro-nats so the per-source sums are exact BIGINTs
    * and the one double division ([[ZipfSlopeExprSql]]) is
    * engine-identical.
    *
    * Scale shape: token counts hash-aggregate map-side; the top-k cut
    * uses a bounded-heap `topn_min_agg` THRESHOLD per source (the k-th
    * largest frequency) so no window ever sorts a full per-source
    * vocabulary — the rank window runs only over the ≤ k + ties
    * survivors. Output: (source, n_fit, zipf_slope_micro) — slope
    * ≈ −1,000,000 for Zipfian text.
    */
  def zipfSlope(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source", k: Int = 256): DataFrame = {
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"bad k=$k")
    // the per-source frequency table feeds two consumers (the
    // threshold heap + the rank join) — materialized once so the
    // corpus explode runs once (the q155 two-consumer rule); it is
    // vocabulary-sized, tiny next to the corpus
    Iterate.loop(docs.sparkSession) { l =>
      val counts = l.pin(docs
        .select(col(sourceCol).as("source"), explode(tokens(col(textCol))).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("freq")))
      // k-th largest per-source frequency from the bounded heap: the
      // negated top-k ascending ends at −(k-th largest)
      val thr = counts.groupBy("source")
        .agg(graft.plans.TopNAgg.topnMinAgg(-col("freq"), k).as("negs"))
        .select(col("source"),
          (-element_at(col("negs"), size(col("negs")))).as("thr"))
      val byRank = Window.partitionBy("source")
        .orderBy(col("freq").desc, col("t"))
      l.finish(counts.join(thr, "source")
        .where(col("freq") >= col("thr"))
        .withColumn("rnk", row_number().over(byRank))
        .where(col("rnk") <= k)
        .selectExpr("source",
          "CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x",
          "CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y")
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
        .selectExpr("source", "n AS n_fit", ZipfSlopeExprSql))
    }
  }

  /** Per-source Herdan/Heaps' law exponent — the OTHER side of the q154
    * Zipf diagnosis: vocabulary growth `V ≈ K·N^β` (Herdan 1960; Heaps
    * 1978), fit per source as exact-integer OLS over PER-DOCUMENT
    * (ln n_tokens, ln n_types) points. Natural text sits at β ≈
    * 0.5–0.8; β → 1 means every token is novel (random strings, ids,
    * hashes — tokenizer poison); β → 0 means vocabulary collapse
    * (templated spam repeating one phrase). Zipf reads the frequency
    * law of the aggregate vocabulary; Herdan reads how the vocabulary
    * SCALES — a source can fake one but rarely both.
    *
    * Shape: n_tokens/n_types are pure per-doc array projections
    * (`size(tokens)` / `size(array_distinct(tokens))` — no explode, no
    * shuffle per token), then ONE hash aggregate per source over the
    * five micro-nat sufficient sums; the slope division is
    * [[olsSlopeMicroSql]], engine-identical. Empty docs are excluded
    * (ln undefined — they carry no scaling information). Output:
    * (source, n_fit, herdan_slope_micro), slope in micro-units.
    */
  def herdanSlope(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    import graft.functions.TextFunctions.tokens
    docs
      .select(col(sourceCol).as("source"),
        size(tokens(col(textCol))).cast("long").as("nt"),
        size(array_distinct(tokens(col(textCol)))).cast("long").as("nv"))
      .where(col("nt") >= 1)
      .selectExpr("source",
        "CAST(floor(ln(CAST(nt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x",
        "CAST(floor(ln(CAST(nv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
      .selectExpr("source", "n AS n_fit", olsSlopeMicroSql("herdan_slope_micro"))
  }

  /** Per-document trigram novelty — the inverse-boilerplate signal: the
    * fraction of a document's distinct 3-word shingles that appear in NO
    * other document (corpus-unique), in basis points. Boilerplate,
    * mirrored pages and templated spam share shingles and score low;
    * organic prose scores high — the complement of what the q77/q130
    * shared-passage views count, folded to one number per document.
    *
    * Shape: shingles are [[graft.functions.TextFunctions.shingles]]'
    * distinct-per-doc arrays (so df is a plain count). The postings
    * frame carries `xxhash64(shingle)` (8 bytes), not the shingle
    * string — the q77/q126 shuffle discipline — and is materialized
    * ONCE: it feeds two consumers (the df aggregate + the per-doc
    * join), and left lazy each re-ran the corpus tokenize+explode
    * (q155 measured 16.4 s at sf0.1; the two-consumer rule,
    * non-iterative variant). One hash aggregate keyed by digest, one
    * join back keyed the same way (the exchange is reused), one
    * per-doc aggregate. Documents without shingles (empty text) report
    * 0/0/0 via the left join. The per-doc result is eagerly
    * materialized so the postings checkpoint releases before
    * returning. Output: (id, n_tri, n_unique, novelty_bp).
    */
  def trigramNovelty(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.shingles
    Iterate.loop(docs.sparkSession) { l =>
      val post = l.pin(docs.select(col(idCol).as("id"),
          explode(shingles(col(textCol))).as("s"))
        .select(col("id"), xxhash64(col("s")).as("h")))
      val dfc = post.groupBy("h").agg(count(lit(1)).as("df"))
      val per = post.join(dfc, "h")
        .groupBy("id")
        .agg(count(lit(1)).as("n_tri"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      l.finish(docs.select(col(idCol).as("id")).join(per, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          coalesce(col("n_unique"), lit(0L)).as("n_unique"),
          expr("coalesce(n_unique, 0) * 10000 div greatest(coalesce(n_tri, 0), 1)")
            .as("novelty_bp")))
    }
  }

  /** Per-group Flesch reading-ease statistics (Flesch 1948) with the
    * classic vowel-group syllable heuristic — the readability axis of
    * corpus quality next to lexical diversity (q122) and the heuristic
    * quality score (q33): training mixes are tuned by reading level,
    * and a source whose readability collapses is usually machine
    * noise, not prose.
    *
    * Per doc, all map-side: words = the house whitespace tokens;
    * sentences = runs of [.!?]+ in the raw text (≥1 guard for
    * unpunctuated docs); syllables = Σ per word of max(1, vowel-group
    * count), groups counted by the collapse trick
    * `len(replace(p,'#')) − len(replace(p,''))` (each run → one '#');
    * then the exact-integer micro-unit Flesch
    * `206835000 − (1015000·W) div S − (84600000·Syl) div W`. The
    * integer-div remainders are deterministic on both engines.
    *
    * Shape: one projection (array transform + fold, no explode) + one
    * hash aggregate on the group key.
    *
    * Output per group: (group, n_docs, avg_flesch_u, n_easy [≥ 60],
    * n_hard [< 30]).
    */
  def readabilityStats(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    def groupsOf(c: Column, pat: String): Column =
      length(regexp_replace(c, pat, "#")).cast("long") -
        length(regexp_replace(c, pat, "")).cast("long")
    // null text folds to the empty-doc sentinel (w=1, s=1, syl=0) — the
    // q141 convention, and it keeps both engines' null algebra out of
    // the arithmetic entirely
    val txt = coalesce(col(textCol), lit(""))
    val tk = graft.functions.TextFunctions.tokens(txt)
    val per = df.select(col(groupCol),
        greatest(size(tk).cast("long"), lit(1L)).as("w"),
        greatest(groupsOf(txt, "[.!?]+"), lit(1L)).as("s"),
        aggregate(
          transform(tk, wd => greatest(groupsOf(lower(wd), "[aeiouy]+"),
            lit(1L))),
          lit(0L), (acc, x) => acc + x).as("syl"))
      .select(col(groupCol),
        expr("206835000 - (1015000 * w) div s - (84600000 * syl) div w")
          .as("flesch_u"))
    per.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(flesch_u) div count(1)").as("avg_flesch_u"),
        sum(when(col("flesch_u") >= 60000000L, 1L).otherwise(0L))
          .as("n_easy"),
        sum(when(col("flesch_u") < 30000000L, 1L).otherwise(0L))
          .as("n_hard"))
  }

  /** Per-group robust outlier statistics via the median absolute
    * deviation (Hampel's rule, the 3-MAD flag) — the data-quality
    * anomaly detector mean/stddev cannot be: one planted 10⁹-token doc
    * drags a source's mean past half its corpus, while the median and
    * MAD ignore it. Over an integer value column (token counts, byte
    * sizes, timestamps).
    *
    * Exactness trick: medians of integers interpolate at most to .5,
    * so DOUBLED medians are exact BIGINTs on both engines —
    * `med2 = 2·median(x)`, per-row deviation `dev2 = |2x − med2|`,
    * `mad4 = 2·median(dev2)` (quadruple scale), and the 3-MAD flag is
    * the pure-integer `2·dev2 > 3·mad4`. A group whose MAD is 0 (over
    * half the values identical) flags every off-median row — the
    * standard MAD degeneracy, and the right answer for near-constant
    * columns.
    *
    * Shape: two exact-percentile aggregates (ObjectHashAggregate value
    * buffering — the small-sf twin of the q60 sketch path, same
    * convention as q41) and one counting aggregate, all keyed on the
    * group; the ≤|groups|-row median frames broadcast back.
    *
    * Output per group: (group, n, med2, mad4, n_outliers).
    */
  def madOutlierStats(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = df.select(col(groupCol).as("grp"),
        col(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val med = v.groupBy("grp")
      .agg(expr("cast(2 * percentile(x, 0.5) as bigint)").as("med2"))
    val dev = v.join(broadcast(med), "grp")
      .withColumn("dev2", abs(col("x") * 2 - col("med2")))
    val mad = dev.groupBy("grp")
      .agg(expr("cast(2 * percentile(dev2, 0.5) as bigint)").as("mad4"))
    dev.join(broadcast(mad), "grp")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        max("med2").as("med2"), max("mad4").as("mad4"),
        sum(when(col("dev2") * 2 > col("mad4") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("grp").as(groupCol), col("n"), col("med2"), col("mad4"),
        col("n_outliers"))
  }

  /** Gopher-style within-document repetition signals (Rae et al.,
    * "Scaling Language Models: … Gopher", 2021, Table A1) — the
    * quality-filter family that catches DEGENERATE text the cross-doc
    * dedup stack can't see: a crawler loop that pastes one phrase 200
    * times is unique corpus-wide but worthless as training data. Three
    * exact-integer basis-point signals per doc, aggregated per group:
    *
    *  - `top1_bp`: occurrences of the single most frequent token over
    *    total tokens (Gopher's "most common word" fraction);
    *  - `top2_char_bp`: characters covered by occurrences of the most
    *    frequent word 2-gram over total characters (count × gram chars,
    *    the space-joined gram matching the space-joined text);
    *  - `dup5_bp`: 5-gram occurrences beyond each gram's first over
    *    total 5-grams (duplicate-n-gram fraction, occurrence counting).
    *
    * A doc is flagged when `top2_char_bp > 2000` or `dup5_bp > 1500`
    * (Gopher's 0.20 top-2-gram and 0.15 dup-n-gram cut points).
    *
    * Determinism: the top gram is the (count DESC, char-length DESC,
    * gram ASC) argmax — both engines realize the identical total order.
    * Ties on the empty doc fold to count 0 → every bp 0, unflagged.
    *
    * Shape: ALL per-doc work is map-side array HOFs — the n-gram
    * counting runs inside one projection via a run-length fold over the
    * doc's SORTED gram array (no explode, no per-gram shuffle rows) —
    * followed by one hash aggregate on the group key. At 100 TB this is
    * the shape you want: per-doc cost rides the scan, the only exchange
    * carries ≤|groups| rows. The fold's intermediate is one small
    * struct per doc, never a grams×grams product.
    */
  def repetitionStats(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    // run-length argmax over a SORTED string array → struct(cnt, len, g):
    // equal grams are adjacent after array_sort, so one fold counts each
    // run and keeps the (count DESC, length DESC, gram ASC) champion —
    // ascending sort means a later full tie never displaces the
    // incumbent, realizing the gram-ASC tie-break for free.
    def topOfSorted(sortedArr: String): String = {
      val r = s"IF(x = a.prev, a.run + 1L, 1L)"
      val better = s"($r > a.bc OR ($r = a.bc AND CAST(length(x) AS BIGINT) > a.bl))"
      s"""aggregate($sortedArr,
         |  named_struct('prev', '', 'run', 0L, 'bc', 0L, 'bl', 0L, 'bg', ''),
         |  (a, x) -> named_struct(
         |    'prev', x,
         |    'run', $r,
         |    'bc', IF($better, $r, a.bc),
         |    'bl', IF($better, CAST(length(x) AS BIGINT), a.bl),
         |    'bg', IF($better, x, a.bg)),
         |  a -> named_struct('cnt', a.bc, 'len', a.bl, 'g', a.bg))""".stripMargin
    }
    val txt = coalesce(col(textCol), lit(""))
    val per = df
      .select(col(groupCol),
        graft.functions.TextFunctions.tokens(txt).as("tk"),
        greatest(length(txt).cast("long"), lit(1L)).as("nc"))
      .select(col(groupCol), col("nc"),
        greatest(size(col("tk")).cast("long"), lit(1L)).as("nt"),
        expr(topOfSorted("array_sort(tk)")).as("t1"),
        expr("zip_with(slice(tk, 1, greatest(size(tk) - 1, 0))," +
          " slice(tk, 2, greatest(size(tk) - 1, 0))," +
          " (p, q) -> concat(p, ' ', q))").as("g2"),
        expr("IF(size(tk) >= 5, transform(sequence(0, size(tk) - 5)," +
          " i -> concat_ws(' ', element_at(tk, i + 1), element_at(tk, i + 2)," +
          " element_at(tk, i + 3), element_at(tk, i + 4), element_at(tk, i + 5)))," +
          " array())").as("g5"))
      .select(col(groupCol), col("nc"), col("nt"), col("t1"), col("g5"),
        expr(topOfSorted("array_sort(g2)")).as("t2"))
      .select(col(groupCol),
        expr("(t1.cnt * 10000) div nt").as("top1_bp"),
        expr("(t2.cnt * t2.len * 10000) div nc").as("top2_char_bp"),
        expr("IF(size(g5) = 0, 0L," +
          " ((size(g5) - size(array_distinct(g5))) * 10000L) div size(g5))")
          .as("dup5_bp"))
    per.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(top1_bp) div count(1)").as("avg_top1_bp"),
        expr("sum(top2_char_bp) div count(1)").as("avg_top2_char_bp"),
        expr("sum(dup5_bp) div count(1)").as("avg_dup5_bp"),
        sum(when(col("top2_char_bp") > 2000 || col("dup5_bp") > 1500, 1L)
          .otherwise(0L)).as("n_flagged"))
  }

  /** Per-source vocabulary drift vs the corpus mix — total-variation
    * distance between each source's token distribution and the
    * corpus-wide distribution, restricted to the corpus's exact top-`k`
    * tokens plus ONE out-of-vocabulary bucket holding all remaining
    * mass. The lexical twin of the embedding-space PSI drift (q132):
    * a source whose token shares diverge from the mix is the first
    * sign a crawler source flipped language, template, or spam regime —
    * visible before any model-side metric moves.
    *
    * Exact integers: shares in micro-units (`cnt·10⁶ div total`),
    * `tv_mu = Σ_top |share_src − share_corpus| + |oov_src − oov_corpus|`
    * (unhalved — document as the L1 form). The per-source largest-gap
    * token rides along (|Δ| DESC, token ASC — totally ordered).
    *
    * Scale shape: ONE exploded (source, token) count aggregate — hot
    * tokens collapse map-side in the partial agg — materialized once
    * (TWO consumers: the corpus top-k and the per-source grid joins;
    * the r11 >1-consumer rule). The top-k is orderBy+limit
    * (TakeOrderedAndProject — per-partition heaps, never a global
    * sort); everything downstream operates on the ≤|sources|·k grid
    * with the k-row top frame BROADCAST. At 100 TB the only
    * corpus-sized cost is the one counts exchange, itself bounded by
    * distinct (source, token) pairs, and `k` caps all driver traffic.
    * Sources whose every doc is empty carry no token row and drop out
    * (no 0/0 share is ever formed).
    */
  def vocabDrift(df: DataFrame, sourceCol: String, textCol: String,
      topK: Int = 64): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    Iterate.loop(df.sparkSession) { l =>
      val counts = l.pin(df.select(col(sourceCol).as("src"),
          explode(graft.functions.TextFunctions.tokens(
            coalesce(col(textCol), lit("")))).as("tok"))
        .groupBy("src", "tok").agg(count(lit(1)).as("cnt")))
      val top = l.pin(counts.groupBy("tok").agg(sum("cnt").as("ccnt"))
        .orderBy(col("ccnt").desc, col("tok").asc).limit(topK))
      val ctot = counts.agg(sum("cnt").as("ctot"))
      val stot = counts.groupBy("src").agg(sum("cnt").as("tot"))
      val perTok = stot.crossJoin(broadcast(top))
        .join(counts, Seq("src", "tok"), "left")
        .crossJoin(broadcast(ctot))
        .select(col("src"), col("tot"), col("ctot"), col("tok"),
          col("ccnt"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .withColumn("delta_mu",
          abs(expr("(cnt * 1000000) div tot") -
            expr("(ccnt * 1000000) div ctot")))
      val agg = perTok.groupBy("src", "tot", "ctot")
        .agg(sum("delta_mu").as("tv_top"),
          sum("cnt").as("top_cnt"), sum("ccnt").as("ctop"))
        .select(col("src"), col("tot"),
          (col("tv_top") +
            abs(expr("((tot - top_cnt) * 1000000) div tot") -
              expr("((ctot - ctop) * 1000000) div ctot"))).as("tv_mu"))
      val wg = Window.partitionBy("src")
        .orderBy(col("delta_mu").desc, col("tok").asc)
      val gap = perTok.withColumn("__rk", row_number().over(wg))
        .filter(col("__rk") === 1)
        .select(col("src"), col("tok").as("gap_token"),
          col("delta_mu").as("gap_mu"))
      l.finish(agg.join(gap, "src")
        .select(col("src").as(sourceCol), col("tot").as("n_tokens"),
          col("tv_mu"), col("gap_token"), col("gap_mu")))
    }
  }

  /** Exact per-source token-length quantiles (p50/p90/p99) WITHOUT a
    * global sort — the loader-capacity statistic next to
    * [[tokenLengthHistogram]]'s log2 buckets: sequence-length budgeting
    * (q139) and padding-waste planning (q186) want the exact median and
    * tail lengths, not bucket edges, and `percentile` over a corpus is
    * a per-group SORT of every document length at scale.
    *
    * Two-phase histogram selection instead (the q75/q123 prefix-sum
    * discipline): one hash aggregate collapses the corpus to
    * (source, len, n_docs) — the heavy exchange, map-side combined —
    * then the cumulative count and the quantile selection run over the
    * DISTINCT-LENGTH frame only (≤ max document length rows per source,
    * thousands not billions). p_q = min{len : cum ≥ ⌈q·n/100⌉}, i.e.
    * the exact lower discrete quantile, selected by the integer guard
    * `100·cum ≥ q·n` — no floats anywhere, so any engine agrees on
    * every boundary (a float percentile disagrees exactly at the
    * quantile ties that matter).
    *
    * Null/empty docs count at length 0 (they are real rows a loader
    * must budget for — same convention as the histogram's sentinel).
    *
    * Output: (source, n_docs, p50_len, p90_len, p99_len).
    */
  def lengthQuantiles(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.tokens
    Iterate.loop(docs.sparkSession) { l =>
      // 2 consumers (totals + cumulative) — materialize the tiny
      // histogram once; the corpus-sized tokenize must not run twice
      val hist = l.pin(docs.select(col(sourceCol).as("src"),
          coalesce(size(tokens(col(textCol))).cast("long"), lit(0L))
            .as("len"))
        .groupBy("src", "len").agg(count(lit(1)).as("cnt")))
      val tot = hist.groupBy("src").agg(sum("cnt").as("n_docs"))
      val w = Window.partitionBy("src").orderBy("len")
      val cum = hist.withColumn("cum", sum("cnt").over(w))
      def q(p: Int) =
        min(when(col("cum") * 100 >= col("n_docs") * p, col("len")))
          .as(s"p${p}_len")
      l.finish(cum.join(broadcast(tot), "src")
        .groupBy("src")
        .agg(max("n_docs").as("n_docs"), q(50), q(90), q(99))
        .select(col("src").as(sourceCol), col("n_docs"),
          col("p50_len"), col("p90_len"), col("p99_len")))
    }
  }

  /** Nucleus (top-p) vocabulary size per source: the minimal number of
    * distinct tokens that covers ≥ `coverBp` basis points of the
    * source's token mass — the tokenizer-planning statistic behind BPE
    * vocab sizing (q112/q128) and the OOV budget (q182): a source whose
    * 95% nucleus is 300 types is templated boilerplate; one needing
    * 80k types is open-domain prose.
    *
    * Computed WITHOUT ranking individual types (a per-source sort of
    * the vocabulary is exactly the window this module avoids): the
    * vocabulary collapses to its COUNT-OF-COUNTS levels
    * (source, cnt, types-at-cnt) — ≤ O(√n_tokens) rows per source by
    * the partition-number bound, in practice a few hundred — and the
    * cumulative mass walk + the boundary-level selection run over that
    * frame only. All ties sit inside one level by construction, so the
    * nucleus SIZE is tie-break-free: at the boundary level the exact
    * remainder `⌈(target − mass_before) / cnt⌉` types are taken.
    * Integer arithmetic throughout; target = ⌈coverBp·n_tokens/10⁴⌉.
    *
    * Shape: the heavy exchange is the (source, token) count aggregate;
    * then one (source, cnt) aggregate, one window over the level frame,
    * one broadcast totals join. Sources with zero tokens drop out
    * (there is no vocabulary to size).
    *
    * Output: (source, n_tokens, n_types, nucleus_types,
    * nucleus_share_bp [= nucleus_types·10⁴ div n_types]).
    */
  def nucleusVocab(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text", coverBp: Int = 9500): DataFrame = {
    require(coverBp >= 1 && coverBp <= 10000,
      s"coverBp must be in [1, 10000], got $coverBp")
    import graft.functions.TextFunctions.tokens
    Iterate.loop(docs.sparkSession) { l =>
      val counts = docs.select(col(sourceCol).as("src"),
          explode(tokens(coalesce(col(textCol), lit("")))).as("tok"))
        .groupBy("src", "tok").agg(count(lit(1)).as("cnt"))
      // 2 consumers (totals + cumulative walk); ≤ distinct-count-values
      // rows per source — the cheapest frame in the computation
      val levels = l.pin(counts.groupBy("src", "cnt")
        .agg(count(lit(1)).as("types"))
        .withColumn("mass", col("cnt") * col("types")))
      val tot = levels.groupBy("src")
        .agg(sum("mass").as("n_tokens"), sum("types").as("n_types"))
      val w = Window.partitionBy("src").orderBy(col("cnt").desc)
      val walk = levels
        .withColumn("cum_mass", sum("mass").over(w))
        .withColumn("cum_types", sum("types").over(w))
        .join(broadcast(tot), "src")
        .withColumn("target",
          expr(s"(n_tokens * $coverBp + 9999) div 10000"))
      // boundary level = the min-cum_mass level satisfying the target
      // (cum_mass is strictly increasing, so min(struct) lands there);
      // within it take only the remainder of types actually needed
      l.finish(walk.groupBy("src")
        .agg(max("n_tokens").as("n_tokens"), max("n_types").as("n_types"),
          min(when(col("cum_mass") >= col("target"),
            struct(col("cum_mass"),
              (col("cum_types") - col("types") +
                expr("(target - (cum_mass - mass) + cnt - 1) div cnt"))
                .as("nuc")))).getField("nuc").as("nucleus_types"))
        .select(col("src").as(sourceCol), col("n_tokens"), col("n_types"),
          col("nucleus_types"),
          expr("nucleus_types * 10000 div n_types").as("nucleus_share_bp")))
    }
  }

  /** Benford first-digit audit (Benford 1938; Nigrini's forensic
    * accounting use): the leading-digit distribution of a naturally
    * occurring monetary/measure column follows log10(1 + 1/d), and a
    * synthetic, truncated, or fabricated column does not — the classic
    * one-pass data-forgery / pipeline-bug smell test run over a new
    * corpus drop's numeric columns. (A failing Benford audit on a
    * price column has caught unit-mix bugs — cents in a dollars
    * column — long before any downstream aggregate looked wrong.)
    *
    * Exact arithmetic: digit shares in basis points (`n_d·10⁴ div n`),
    * the Benford expectation as PLAN-TIME micro-unit literals (computed
    * once in the driver from doubles — both engines receive identical
    * constants), and the per-digit signed delta. Requires values ≥ 1
    * (the leading digit of `floor(v)`); rows below 1 are counted out
    * into the digit-0 sentinel row rather than silently dropped.
    *
    * Shape: one projection + one ≤10-row hash aggregate + a broadcast
    * totals join — scan-rate at any size.
    *
    * Output: (digit, n_rows, share_bp, benford_bp, delta_bp) — 9 rows
    * plus the sentinel when present; benford_bp/delta_bp are 0 on the
    * sentinel.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val benfordBp: Map[Int, Long] = (1 to 9).map(d =>
      d -> math.floor(math.log10(1.0 + 1.0 / d) * 10000.0 + 0.5).toLong).toMap
    val expectExpr = (1 to 9).foldLeft(lit(0L)) { (acc, d) =>
      when(col("digit") === d, lit(benfordBp(d))).otherwise(acc)
    }
    Iterate.loop(df.sparkSession) { l =>
      val counts = l.pin(df.select(
          when(col(valueCol) >= 1,
            substring(floor(col(valueCol)).cast("long").cast("string"), 1, 1)
              .cast("long"))
            .otherwise(0L).as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_rows")))
      val tot = counts.agg(sum("n_rows").as("n"))
      l.finish(counts.crossJoin(broadcast(tot))
        .withColumn("share_bp", expr("n_rows * 10000 div n"))
        .withColumn("benford_bp",
          when(col("digit") >= 1, expectExpr).otherwise(0L))
        .withColumn("delta_bp",
          when(col("digit") >= 1, col("share_bp") - col("benford_bp"))
            .otherwise(0L))
        .select("digit", "n_rows", "share_bp", "benford_bp", "delta_bp"))
    }
  }

  /** Exact trimmed mean of per-doc token length per source — the
    * robust-location statistic completing the trio with
    * [[lengthQuantiles]] and the q172 MAD: a handful of pathological
    * mega-documents moves a plain mean arbitrarily, and at corpus scale
    * there are ALWAYS mega-documents. Trims exactly `trimBp` basis
    * points of DOCS off each tail (by rank, ties resolved by mass —
    * the same answer any sorted trim produces).
    *
    * Same count-of-counts shape as the quantiles: one corpus exchange
    * to the (source, len) histogram, then per level the CLIPPED take
    * `min(cum, hi) − max(cum−cnt, lo)` (boundary levels contribute
    * partially, interior fully) — no sort of the population. The mean
    * is exact micro-units via the overflow-safe two-term division
    * `(s div n)·10⁶ + ((s mod n)·10⁶) div n` (a single `s·10⁶ div n`
    * overflows BIGINT past ~9·10¹² trimmed tokens per source; the
    * two-term form is exact to any corpus size).
    *
    * Output: (source, n_docs, trimmed_n, trimmed_mean_u).
    */
  def trimmedMean(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text", trimBp: Int = 500): DataFrame = {
    require(trimBp >= 0 && trimBp < 5000,
      s"trimBp must be in [0, 5000), got $trimBp")
    import graft.functions.TextFunctions.tokens
    Iterate.loop(docs.sparkSession) { l =>
      val hist = l.pin(docs.select(col(sourceCol).as("src"),
          coalesce(size(tokens(col(textCol))).cast("long"), lit(0L))
            .as("len"))
        .groupBy("src", "len").agg(count(lit(1)).as("cnt")))
      val tot = hist.groupBy("src").agg(sum("cnt").as("n"))
      val w = Window.partitionBy("src").orderBy("len")
      l.finish(hist.withColumn("cum", sum("cnt").over(w))
        .join(broadcast(tot), "src")
        .withColumn("lo", expr(s"(n * $trimBp) div 10000"))
        .withColumn("hi", col("n") - col("lo"))
        .withColumn("take",
          greatest(least(col("cum"), col("hi"))
            - greatest(col("cum") - col("cnt"), col("lo")), lit(0L)))
        .groupBy("src")
        .agg(max("n").as("n_docs"),
          max(greatest(col("hi") - col("lo"), lit(1L))).as("trimmed_n"),
          sum(col("take") * col("len")).as("tsum"))
        .select(col("src").as(sourceCol), col("n_docs"), col("trimmed_n"),
          expr("(tsum div trimmed_n) * 1000000 " +
            "+ ((tsum % trimmed_n) * 1000000) div trimmed_n")
            .as("trimmed_mean_u")))
    }
  }

  /** The per-source DATA CARD (Gebru et al., "Datasheets for Datasets",
    * 2018): one wide audit row per source composing the four
    * independent profile aggregations a release review reads together —
    * [[corpusDatasheet]] volumes/dups/quality, [[lexicalDiversity]]'s
    * templated-vs-organic ratios, [[lengthQuantiles]]' exact length
    * tails, and [[nucleusVocab]]'s vocabulary concentration.
    *
    * Four corpus scans, irreducibly: the shapes differ (doc-level
    * rollup, token-level distinct, gram-level distinct, histogram
    * walk) and fusing them would gain one scan at the cost of carrying
    * every exploded posting through one exchange. Each component
    * manages its own materialization; the card joins their ≤|sources|-
    * row outputs broadcast, so composition adds no corpus-sized work.
    * A source with zero tokens keeps its card row (nucleus fields 0).
    *
    * Output: (source, n_docs, n_tokens, n_chars, n_langs,
    * n_quality_keep, n_dup_docs, n_types, ttr_bp,
    * trigram_diversity_bp, p50_len, p90_len, p99_len, nucleus_types,
    * nucleus_share_bp).
    */
  def dataCard(docs: DataFrame, sourceCol: String = "source"): DataFrame =
    corpusDatasheet(docs, sourceCol)
      .join(broadcast(lexicalDiversity(docs, sourceCol)
        .select(col(sourceCol), col("n_types"), col("ttr_bp"),
          col("trigram_diversity_bp"))), Seq(sourceCol), "left")
      .join(broadcast(lengthQuantiles(docs, sourceCol)
        .select(col(sourceCol), col("p50_len"), col("p90_len"),
          col("p99_len"))), Seq(sourceCol), "left")
      .join(broadcast(nucleusVocab(docs, sourceCol)
        .select(col(sourceCol), col("nucleus_types"),
          col("nucleus_share_bp"))), Seq(sourceCol), "left")
      .withColumn("nucleus_types", coalesce(col("nucleus_types"), lit(0L)))
      .withColumn("nucleus_share_bp",
        coalesce(col("nucleus_share_bp"), lit(0L)))

  /** k-anonymity profile over a quasi-identifier set (Sweeney, "k-
    * Anonymity: a model for protecting privacy", IJUFKS 2002) — the
    * governance audit a pipeline runs before releasing a table: every
    * row whose quasi-identifier combination is shared by fewer than k
    * rows is re-identifiable at strength k. Complements the q103 PII
    * scrub (which removes direct identifiers; quasi-identifiers survive
    * scrubbing by design).
    *
    * Output is the equivalence-CLASS-SIZE histogram with cumulative
    * at-risk mass: one row per observed class size k —
    * (class_size, n_classes, n_rows, cum_rows [rows in classes of size
    * ≤ k], risk_bp [cum_rows·10⁴ div total]). "What fraction of rows is
    * k-anonymous at k = 5?" reads off the row with class_size 5 (or the
    * last one below it).
    *
    * Shape: the count-of-counts discipline again — one hash aggregate
    * on the quasi-identifier key (the only corpus-sized exchange,
    * map-side combined), one aggregate to class-size levels, and a
    * cumulative window over the LEVEL frame (≤ distinct-class-size
    * rows, single-partition by construction — the frame a global
    * window is actually fine on).
    */
  def kAnonymityProfile(df: DataFrame, quasiIds: Seq[String]): DataFrame = {
    require(quasiIds.nonEmpty, "quasiIds must be non-empty")
    Iterate.loop(df.sparkSession) { l =>
      val classes = df.groupBy(quasiIds.map(col): _*)
        .agg(count(lit(1)).as("k"))
      // 2 consumers (total + cumulative walk) over ≤ distinct-size rows
      val levels = l.pin(classes.groupBy("k")
        .agg(count(lit(1)).as("n_classes"))
        .withColumn("n_rows", col("k") * col("n_classes")))
      val tot = levels.agg(sum("n_rows").as("total_rows"))
      val w = Window.orderBy("k")
      l.finish(levels.withColumn("cum_rows", sum("n_rows").over(w))
        .crossJoin(broadcast(tot))
        .select(col("k").as("class_size"), col("n_classes"), col("n_rows"),
          col("cum_rows"),
          expr("cum_rows * 10000 div total_rows").as("risk_bp")))
    }
  }
}
