package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Classifier, Decontamination, LanguageModel, Sampling, Snapshot}
import org.apache.spark.sql.functions._

/** Corpus-curation policy operators over `documents` (beyond-reference,
  * 100 TB charter — see SURVEY §2.11):
  *
  *  - q85 bigram-LM perplexity scores: CCNet-style quality signal from a
  *    corpus-trained add-one-smoothed bigram model; per-bigram NLL is
  *    quantized to integer micro-nats before summing so the score is
  *    bit-portable across engines (order-free integer sums)
  *  - q86 per-language quality percentile gate: keep documents at or
  *    above their language's p75 quality score (exact interpolated
  *    percentile ≡ DuckDB quantile_cont — the oracle twin of the
  *    approx_percentile production path, same exact/approx pairing as
  *    q41/q60)
  *  - q87 per-domain document cap: at most 8 docs per URL domain,
  *    smallest ids win, via the bounded-heap topn_min_agg — never a
  *    per-domain window sort (a planted hot domain holds 30% of the
  *    corpus)
  *  - q88 √-temperature language rebalancing: sample share ∝ √(natural
  *    share), downsample-only, membership by the md5 id-hash threshold
  *    (IEEE sqrt is correctly rounded, so rates are bit-identical on
  *    both engines — the reason T=2 is the hard-wired exponent)
  *  - q89 Bloom-screened decontamination: q73's exact output through the
  *    map-side Bloom prefilter path (`bloom_agg`/`bloom_might_contain`)
  *    — the oracle IS q73's SQL, because the filter screens candidates
  *    and the exact gram join renders the verdict
  *  - q90 Efraimidis–Spirakis weighted sample: k docs without
  *    replacement, selection probability ∝ weight, keys from the md5
  *    id-hash — a global top-k, no RNG, no sequential state
  *  - q91 stratified per-language sample: exactly n per language in
  *    seeded hash order via the bounded-heap topn_min_agg (integer sort
  *    keys — fully engine-portable ordering)
  *  - q92 corpus snapshot diff: added/removed/changed/unchanged between
  *    two derived snapshots by content fingerprint — the incremental
  *    front door that keeps a refresh from reprocessing the whole corpus
  */
object CurationOps {

  /** DuckDB twin of TextFunctions.tokens (same as TextOps.T). */
  private val T = "list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)"

  /** The synthetic URL column for q87: a planted hot domain holding 30%
    * of docs plus 97 long-tail domains. Both engines derive it from
    * doc_id with the same arithmetic.
    */
  private def urlCol = concat(lit("https://"),
    when(pmod(col("doc_id"), lit(10)) < 3, lit("hot.example.com"))
      .otherwise(concat(lit("d"), pmod(col("doc_id"), lit(97)).cast("string"),
        lit(".example.net"))),
    lit("/doc/"), col("doc_id").cast("string"))

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q85_bigram_perplexity",
      s"""WITH toks AS (SELECT doc_id, $T AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
         |      i -> [tk[i], tk[i+1]])) AS b
         |  FROM toks),
         |pairs AS (SELECT doc_id, b[1] AS w1, b[2] AS w2 FROM bg),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
         |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
         |v AS (SELECT count(DISTINCT t) AS v FROM
         |  (SELECT w1 AS t FROM c12 UNION SELECT w2 AS t FROM c12)),
         |nll AS (
         |  SELECT p.doc_id,
         |    CAST(floor(-ln((c12.c12 + 1) / CAST(c1.c1 + v.v AS DOUBLE))
         |      * 1000000.0 + 0.5) AS BIGINT) AS nll_u
         |  FROM pairs p JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
         |sc AS (
         |  SELECT doc_id, count(*) AS n_bigrams, CAST(sum(nll_u) AS BIGINT) AS s
         |  FROM nll GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
         |  floor(sc.s / sc.n_bigrams / 100.0 + 0.5) / 10000.0 AS nll4
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin) { (s, d) =>
      // the model join always hits (trained on the same corpus), so the
      // per-doc aggregate covers every doc with >= 1 bigram; sub-2-token
      // docs surface with n_bigrams = 0 / null score via the left join
      val docs = Tables.documents(s, d)
      val scores = LanguageModel.perplexityScores(docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
      docs.select("doc_id").join(scores, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          (floor(col("nll_micro_sum") / col("n_bigrams") / 100.0 + 0.5)
            / 10000.0).as("nll4"))
    },

    QueryDef.sql(
      "q86_quality_gate",
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    floor(100.0 * (
         |      0.4 * least(n_chars / 500.0, 1.0) +
         |      0.4 * (CAST(len(list_distinct($T)) AS DOUBLE) / greatest(len($T), 1)) +
         |      0.2 * least((CAST(len(list_filter($T, t -> t IN ('the','a','an','of','and','in','to','is','it','that'))) AS DOUBLE)
         |                   / greatest(len($T), 1)) * 5.0, 1.0)
         |    ) * 10000.0 + 0.5) / 10000.0 AS quality
         |  FROM documents),
         |thr AS (SELECT lang, quantile_cont(quality, 0.75) AS thr
         |        FROM scored GROUP BY lang),
         |kept AS (
         |  SELECT s.lang, count(*) AS n_kept
         |  FROM scored s JOIN thr t USING (lang) WHERE s.quality >= t.thr
         |  GROUP BY s.lang)
         |SELECT s.lang, count(*) AS n_docs, k.n_kept,
         |  floor(t.thr * 10000.0) / 10000.0 AS thr4
         |FROM scored s JOIN thr t USING (lang) JOIN kept k USING (lang)
         |GROUP BY s.lang, k.n_kept, t.thr""".stripMargin) { (s, d) =>
      // thr4 is a PURE floor (no +0.5): an interpolated p75 of 4dp-grid
      // values can land exactly half a grid step between neighbors, where
      // a half-up rounding would sit on the knife edge of the two engines'
      // last-ulp agreement; floor only ties when the quantile IS a grid
      // value (interpolation fraction 0), which both engines return
      // exactly. The >= gate is safe for the same reason: interpolated
      // thresholds lie strictly between adjacent distinct grid values.
      val scored = Tables.documents(s, d).select(col("lang"),
        TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
      val thr = scored.groupBy("lang")
        .agg(expr("percentile(quality, 0.75)").as("thr"))
      val kept = Sampling.percentileGate(scored, "lang", "quality", 0.75,
          exact = true)
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
      scored.groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .join(kept, "lang")
        .join(broadcast(thr), "lang")
        .select(col("lang"), col("n_docs"), col("n_kept"),
          (floor(col("thr") * 10000.0) / 10000.0).as("thr4"))
    },

    QueryDef.sql(
      "q87_domain_cap",
      """WITH x AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(
        |      'https://' ||
        |      CASE WHEN doc_id % 10 < 3 THEN 'hot.example.com'
        |           ELSE 'd' || CAST(doc_id % 97 AS VARCHAR) || '.example.net' END ||
        |      '/doc/' || CAST(doc_id AS VARCHAR),
        |      '^https?://([^/]+)', 1)) AS domain
        |  FROM documents),
        |r AS (SELECT doc_id, domain,
        |        row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
        |      FROM x)
        |SELECT domain, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rn <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN rn <= 8 THEN doc_id ELSE 0 END) AS BIGINT) AS kept_sum
        |FROM r GROUP BY domain""".stripMargin) { (s, d) =>
      // the oracle's row_number formulation is CORRECTNESS-equivalent to
      // topn_min_agg over unique ids; the engine never builds it (the
      // whole point — no per-domain window sort on the hot domain)
      val docs = Tables.documents(s, d).select(col("doc_id"), urlCol.as("url"))
      val dom = lower(regexp_extract(col("url"), "^https?://([^/]+)", 1))
      val kept = Sampling.domainCap(docs, "url", "doc_id", cap = 8)
        .groupBy(dom.as("domain"))
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").cast("long").as("kept_sum"))
      docs.groupBy(dom.as("domain")).agg(count(lit(1)).as("n_docs"))
        .join(kept, "domain")
    },

    QueryDef.sql(
      "q88_temperature_mix",
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |mn AS (SELECT min(n) AS n_min FROM counts),
        |thr AS (
        |  SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE))
        |      * 1000000.0) AS BIGINT) AS thr
        |  FROM counts CROSS JOIN mn),
        |kept AS (
        |  SELECT d.lang, d.doc_id FROM documents d JOIN thr USING (lang)
        |  WHERE CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |          % 1000000 < thr.thr),
        |ks AS (SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS kept_sum
        |       FROM kept GROUP BY lang)
        |SELECT t.lang, CAST(t.n AS BIGINT) AS n_docs, t.thr,
        |  coalesce(ks.n_kept, 0) AS n_kept,
        |  CAST(coalesce(ks.kept_sum, 0) AS BIGINT) AS kept_sum
        |FROM thr t LEFT JOIN ks USING (lang)""".stripMargin) { (s, d) =>
      // language rebalancing: en dominates the synthetic corpus, zh/es are
      // rare — sqrt flattening keeps the smallest language whole and
      // downsamples the rest toward equal-ish shares
      val docs = Tables.documents(s, d)
      val rates = Sampling.sqrtTemperatureRates(docs, "lang")
      val kept = Sampling.sqrtTemperatureSample(docs, "lang", "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").cast("long").as("kept_sum"))
      rates
        .select(col("lang"), col("__n").as("n_docs"), col("__thr").as("thr"))
        .join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("thr"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_sum"), lit(0L)).as("kept_sum"))
    },

    // q89: Bloom-screened decontamination ([[graft.operators
    // .Decontamination.benchmarkContainmentBloom]]). Same planted eval
    // set and SAME ORACLE as q73 — the Bloom filter only screens
    // candidate grams map-side; the exact gram join decides, so false
    // positives cost probe rows, never output rows. What changes is the
    // shuffle: the exact path exchanges every distinct corpus (id, gram)
    // posting to df-cap it, the Bloom path only the grams that might be
    // in the benchmark.
    QueryDef.sql(
      "q89_bloom_decontamination",
      s"""WITH toks AS (
         |  SELECT doc_id, $T AS tk FROM documents),
         |btoks AS (
         |  SELECT doc_id AS bench_id,
         |    list_slice(tk, len(tk)//4 + 1,
         |               len(tk)//4 + greatest(len(tk)//2, 1)) AS tk
         |  FROM toks WHERE doc_id % 25 = 0),
         |cg AS (
         |  SELECT doc_id, CASE WHEN len(tk) = 0 THEN []
         |    ELSE list_distinct(list_transform(generate_series(1, greatest(len(tk) - 4, 1)),
         |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))) END AS g
         |  FROM toks),
         |bg AS (
         |  SELECT bench_id, CASE WHEN len(tk) = 0 THEN []
         |    ELSE list_distinct(list_transform(generate_series(1, greatest(len(tk) - 4, 1)),
         |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))) END AS g
         |  FROM btoks),
         |cpost AS (SELECT doc_id, unnest(g) AS gram FROM cg),
         |rare AS (SELECT gram FROM cpost GROUP BY gram HAVING count(*) <= 1000),
         |kept AS (SELECT c.* FROM cpost c JOIN rare r USING (gram)),
         |bpost AS (SELECT bench_id, unnest(g) AS gram FROM bg),
         |bsizes AS (SELECT bench_id, len(g) AS n_bench_grams FROM bg),
         |shared AS (
         |  SELECT k.doc_id AS id, b.bench_id, count(*) AS n_shared
         |  FROM kept k JOIN bpost b USING (gram)
         |  GROUP BY 1, 2)
         |SELECT s.id, s.bench_id, s.n_shared,
         |  CAST(z.n_bench_grams AS BIGINT) AS n_bench_grams,
         |  floor(s.n_shared * 1.0 / z.n_bench_grams * 10000.0 + 0.5) / 10000.0
         |    AS containment
         |FROM shared s JOIN bsizes z USING (bench_id)
         |WHERE s.n_shared * 1.0 / z.n_bench_grams >= 0.5""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val toks = TextFunctions.tokens(col("text"))
      val bench = docs.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("bench_id"),
          concat_ws(" ", slice(toks,
            (floor(size(toks) / 4) + 1).cast("int"),
            greatest(floor(size(toks) / 2), lit(1)).cast("int"))).as("btext"))
      Decontamination
        .benchmarkContainmentBloom(docs, "doc_id", "text", bench, "bench_id", "btext")
        .select(col("id"), col("bench_id"), col("n_shared"), col("n_bench_grams"),
          TextFunctions.round4hu(col("containment")).as("containment"))
    },

    // q90: Efraimidis–Spirakis weighted sample ([[graft.operators
    // .Sampling.weightedSample]]) — 100 docs without replacement with
    // probability ∝ (n_chars + 1). The oracle replays the identical
    // ln(u)/w top-k; sort keys derive only from the id hash and the
    // weight, so the selected SET is engine-stable (ties broken by id).
    QueryDef.sql(
      "q90_weighted_sample",
      """WITH t AS (
        |  SELECT doc_id, source, CAST(n_chars + 1 AS DOUBLE) AS w,
        |    CAST(concat('0x', substring(md5('s9:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, source, w FROM t
        |ORDER BY ln((h + 0.5) / 4294967296.0) / w DESC, doc_id
        |LIMIT 100""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          (col("n_chars") + 1).cast("double").as("w"))
      Sampling.weightedSample(docs, "doc_id", "w", k = 100, seed = "s9")
    },

    // q91: stratified per-language sample ([[graft.operators.Sampling
    // .stratifiedSample]]) — exactly 20 docs per language in seeded
    // md5-hash order. The oracle's row_number formulation is the
    // correctness twin; the engine runs the bounded-heap aggregate
    // (packed integer keys, no per-language window sort).
    QueryDef.sql(
      "q91_stratified_sample",
      """WITH x AS (
        |  SELECT lang, doc_id,
        |    CAST(concat('0x', substring(md5('s9:' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (SELECT lang, doc_id,
        |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
        |      FROM x)
        |SELECT lang, doc_id FROM r WHERE rn <= 20""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("lang"), col("doc_id"))
      Sampling.stratifiedSample(docs, "lang", "doc_id", nPer = 20, seed = "s9")
        .select("lang", "doc_id")
    },

    // q92: corpus snapshot diff ([[graft.operators.Snapshot.corpusDiff]]).
    // Old snapshot = docs with doc_id % 7 != 3; new = docs with
    // doc_id % 5 != 4, every 11th doc's text amended — so all four
    // statuses occur. Fingerprint = the q31 normalization (md5 of
    // lower/whitespace-collapsed text); the diff itself never reads text.
    QueryDef.sql(
      "q92_corpus_diff",
      """WITH o AS (
        |  SELECT doc_id AS id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS old_fp
        |  FROM documents WHERE doc_id % 7 != 3),
        |n AS (
        |  SELECT doc_id AS id,
        |    md5(trim(regexp_replace(lower(
        |      CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END),
        |      '\s+', ' ', 'g'))) AS new_fp
        |  FROM documents WHERE doc_id % 5 != 4)
        |SELECT coalesce(o.id, n.id) AS id,
        |  CASE WHEN o.id IS NULL THEN 'added'
        |       WHEN n.id IS NULL THEN 'removed'
        |       WHEN o.old_fp = n.new_fp THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  o.old_fp, n.new_fp
        |FROM o FULL OUTER JOIN n ON o.id = n.id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      val newSnap = docs.filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id"), TextFunctions.fingerprint(
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("fp"))
      Snapshot.corpusDiff(oldSnap, newSnap, "doc_id", "fp")
    },

    // q96: epoch up-sampling ([[graft.operators.Sampling.epochUpsample]])
    // — the UP-sampling half of data mixing: src0 repeats 2.5 epochs
    // (2 full copies + the id-hash fraction 0.5 gets a third), src1
    // runs at 0.4 (down-sampling through the same operator), every
    // other source passes through once. The oracle replays the ⌊e⌋ +
    // hash-threshold copy count and the replica expansion; the checksum
    // Σ doc_id·(epoch+1) pins WHICH replicas exist, not just how many.
    QueryDef.sql(
      "q96_epoch_upsample",
      """WITH c AS (
        |  SELECT doc_id, source,
        |    (CASE WHEN source = 'src0' THEN 2 WHEN source = 'src1' THEN 0 ELSE 1 END)
        |    + (CASE WHEN
        |         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |           % 1000000
        |         < (CASE WHEN source = 'src0' THEN 500000
        |                 WHEN source = 'src1' THEN 400000 ELSE 0 END)
        |       THEN 1 ELSE 0 END) AS copies
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, source, unnest(
        |    CASE WHEN copies > 0 THEN generate_series(0, copies - 1)
        |         ELSE [] END) AS epoch
        |  FROM c)
        |SELECT source,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_rows_out,
        |  CAST(max(epoch) AS BIGINT) AS max_epoch,
        |  CAST(sum(doc_id * (epoch + 1)) AS BIGINT) AS replica_checksum
        |FROM e GROUP BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      Sampling.epochUpsample(docs, "source", "doc_id",
          Map("src0" -> 2.5, "src1" -> 0.4))
        .groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_rows_out"),
          max("epoch").cast("long").as("max_epoch"),
          sum(col("doc_id") * (col("epoch") + 1)).cast("long")
            .as("replica_checksum"))
    },

    // q123: mixture-weight solver ([[graft.operators.Sampling
    // .mixtureSolve]]) — the PLANNING table the mixing executors
    // (q57/q88/q96) realize: √-scaled target weights from the
    // per-source token inventory, a 1M-token budget, and per-source
    // target tokens + epochs_bp (the subsample rate below 10⁴, the
    // up-sampling factor above). All ≤|sources|-row exact-integer
    // arithmetic; IEEE sqrt over integer counts is correctly rounded,
    // so the weights replay bit-identically (the q88 argument).
    QueryDef.sql(
      "q123_mixture_solver",
      s"""WITH c AS (
         |  SELECT source, CAST(sum(len($T)) AS BIGINT) AS available_tokens
         |  FROM documents GROUP BY source),
         |w0 AS (SELECT source,
         |         CAST(floor(sqrt(CAST(available_tokens AS DOUBLE))) AS BIGINT)
         |           AS w
         |       FROM c),
         |tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w0),
         |wt AS (SELECT source, (w * 10000) // tw AS weight_bp
         |       FROM w0 CROSS JOIN tw),
         |solved AS (
         |  SELECT c.source, c.available_tokens, wt.weight_bp,
         |    (1000000 * wt.weight_bp) // 10000 AS target_tokens
         |  FROM c JOIN wt USING (source))
         |SELECT source, available_tokens, weight_bp, target_tokens,
         |  (target_tokens * 10000) // greatest(available_tokens, 1) AS epochs_bp,
         |  CASE WHEN (target_tokens * 10000) // greatest(available_tokens, 1)
         |         > 10000
         |       THEN 'upsample' ELSE 'subsample' END AS mode
         |FROM solved""".stripMargin) { (s, d) =>
      val counts = Tables.documents(s, d)
        .select(col("source"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("__nt"))
        .groupBy("source").agg(sum("__nt").as("n_tokens"))
      val w0 = counts.select(col("source"),
        floor(sqrt(col("n_tokens").cast("double"))).cast("long").as("__w"))
      val weights = w0.crossJoin(broadcast(w0.agg(sum("__w").as("__tw"))))
        .select(col("source"), expr("(__w * 10000) div __tw").as("weight_bp"))
      Sampling.mixtureSolve(counts, "source", "n_tokens", weights, 1000000L)
        .select("source", "available_tokens", "weight_bp", "target_tokens",
          "epochs_bp", "mode")
    },

    // q129: mixture EXECUTION ([[graft.operators.Sampling.mixtureTake]])
    // — close the q123 solver → corpus loop: per-source target_tokens
    // (sqrt-weights over a budget of total/4) realized by keeping the
    // highest-scoring docs (q97's exact-integer classifier, desc, doc_id
    // tiebreak) whose token prefix fits the budget. Two-phase prefix sum
    // under the composite order; the per-source rollup pins n_kept,
    // tokens_kept and the effective quality cutoff (min kept score).
    // The total-tokens budget is a bounded 1-row collect (q95 pattern).
    QueryDef.sql(
      "q129_mixture_execute",
      s"""WITH sc AS (
         |  SELECT doc_id, source, CAST(len($T) AS BIGINT) AS nt,
         |    CAST(-3000000 - 40000*len($T) + 200000*len(list_distinct($T))
         |      + 2000*len(regexp_replace(text, '\\s', '', 'g'))
         |      + 300000*len(list_filter($T,
         |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS BIGINT) AS s
         |  FROM documents),
         |bud AS (SELECT CAST(sum(nt) AS BIGINT) // 4 AS b FROM sc),
         |c AS (SELECT source, CAST(sum(nt) AS BIGINT) AS available_tokens
         |      FROM sc GROUP BY source),
         |w0 AS (SELECT source,
         |         CAST(floor(sqrt(CAST(available_tokens AS DOUBLE))) AS BIGINT)
         |           AS w
         |       FROM c),
         |tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w0),
         |wt AS (SELECT source, (w * 10000) // tw AS weight_bp
         |       FROM w0 CROSS JOIN tw),
         |pl AS (SELECT c.source, (bud.b * wt.weight_bp) // 10000 AS target_tokens
         |       FROM c JOIN wt USING (source) CROSS JOIN bud),
         |ord AS (
         |  SELECT source, doc_id, nt, s,
         |    sum(nt) OVER (PARTITION BY source ORDER BY s DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM sc),
         |kept AS (
         |  SELECT o.source, o.nt, o.s, p.target_tokens
         |  FROM ord o JOIN pl p USING (source) WHERE o.cum <= p.target_tokens)
         |SELECT source, target_tokens, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(nt) AS BIGINT) AS tokens_kept,
         |  CAST(min(s) AS BIGINT) AS min_score_micro
         |FROM kept GROUP BY source, target_tokens""".stripMargin) { (s, d) =>
      val scored = Classifier.qualityClassify(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            col("text")), "text")
        .select(col("doc_id"), col("source"), col("score_micro"),
          col("n_tok").cast("long").as("nt"))
      val counts = scored.groupBy("source").agg(sum("nt").as("n_tokens"))
      val budget = counts.agg(sum("n_tokens")).collect().head.getLong(0) / 4
      val w0 = counts.select(col("source"),
        floor(sqrt(col("n_tokens").cast("double"))).cast("long").as("__w"))
      val weights = w0.crossJoin(broadcast(w0.agg(sum("__w").as("__tw"))))
        .select(col("source"), expr("(__w * 10000) div __tw").as("weight_bp"))
      val plan = Sampling.mixtureSolve(counts, "source", "n_tokens",
        weights, budget)
      Sampling.mixtureTake(scored, "source", "doc_id", "nt",
          "score_micro", plan)
        .groupBy("source", "target_tokens")
        .agg(count(lit(1)).as("n_kept"), sum("nt").as("tokens_kept"),
          min("score_micro").as("min_score_micro"))
    },

    // q97: model-based quality filtering ([[graft.operators.Classifier]])
    // — the frozen-linear-model half of the GPT-3/CCNet quality-
    // classifier pattern: integer features, integer micro-weights, one
    // exact BIGINT dot product per document, keep = score ≥ 0. The
    // oracle replays the identical integer arithmetic; no float ever
    // enters the decision, so the match is bit-exact by construction.
    QueryDef.sql(
      "q97_quality_classifier",
      s"""WITH f AS (
        |  SELECT doc_id,
        |    len($T) AS n_tok,
        |    len(list_distinct($T)) AS n_dis,
        |    len(regexp_replace(text, '\\s', '', 'g')) AS n_ch,
        |    len(list_filter($T,
        |      t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
        |      AS stop_hits
        |  FROM documents)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(n_dis AS BIGINT) AS n_dis, CAST(n_ch AS BIGINT) AS n_ch,
        |  CAST(stop_hits AS BIGINT) AS stop_hits,
        |  CAST(-3000000 - 40000*n_tok + 200000*n_dis + 2000*n_ch
        |    + 300000*stop_hits AS BIGINT) AS score_micro,
        |  (-3000000 - 40000*n_tok + 200000*n_dis + 2000*n_ch
        |    + 300000*stop_hits) >= 0 AS keep
        |FROM f""".stripMargin) { (s, d) =>
      Classifier.qualityClassify(
          Tables.documents(s, d).select(col("doc_id"), col("text")), "text")
        .select("doc_id", "n_tok", "n_dis", "n_ch", "stop_hits",
          "score_micro", "keep")
    },

    // q99: corpus mix drift ([[graft.operators.Snapshot
    // .distributionDrift]]) — the statistical companion of q92's row
    // diff, over the same two derived snapshots: per source and per
    // language, both sides' counts, exact integer micro-shares
    // (n·10⁶ div total — never a float), the absolute share drift, and
    // the per-dimension L1 drift (TVD·2). A refresh that adds the right
    // number of rows but shifts the mix shows up here, not in q92.
    QueryDef.sql(
      "q99_mix_drift",
      """WITH o AS (SELECT source, lang FROM documents WHERE doc_id % 7 != 3),
        |n AS (SELECT source, lang FROM documents WHERE doc_id % 5 != 4),
        |oc AS (
        |  SELECT 'source' AS dim, source AS value,
        |    CAST(count(*) AS BIGINT) AS n_old FROM o GROUP BY 1, 2
        |  UNION ALL SELECT 'lang', lang, CAST(count(*) AS BIGINT)
        |  FROM o GROUP BY 1, 2),
        |nc AS (
        |  SELECT 'source' AS dim, source AS value,
        |    CAST(count(*) AS BIGINT) AS n_new FROM n GROUP BY 1, 2
        |  UNION ALL SELECT 'lang', lang, CAST(count(*) AS BIGINT)
        |  FROM n GROUP BY 1, 2),
        |om AS (SELECT dim, value, n_old,
        |  n_old * 1000000 // sum(n_old) OVER (PARTITION BY dim) AS micro_old
        |  FROM oc),
        |nm AS (SELECT dim, value, n_new,
        |  n_new * 1000000 // sum(n_new) OVER (PARTITION BY dim) AS micro_new
        |  FROM nc),
        |j AS (
        |  SELECT coalesce(om.dim, nm.dim) AS dim,
        |    coalesce(om.value, nm.value) AS value,
        |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new,
        |    coalesce(micro_old, 0) AS micro_old,
        |    coalesce(micro_new, 0) AS micro_new
        |  FROM om FULL OUTER JOIN nm
        |    ON om.dim = nm.dim AND om.value = nm.value)
        |SELECT dim, value, n_old, n_new,
        |  CAST(micro_old AS BIGINT) AS micro_old,
        |  CAST(micro_new AS BIGINT) AS micro_new,
        |  CAST(abs(micro_old - micro_new) AS BIGINT) AS drift_micro,
        |  CAST(sum(abs(micro_old - micro_new)) OVER (PARTITION BY dim)
        |    AS BIGINT) AS l1_micro
        |FROM j""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val o = docs.filter(col("doc_id") % 7 =!= 3)
      val n = docs.filter(col("doc_id") % 5 =!= 4)
      def driftOn(dim: String) =
        Snapshot.distributionDrift(o, n, dim).withColumn("dim", lit(dim))
      driftOn("source").unionByName(driftOn("lang"))
        .select("dim", "value", "n_old", "n_new", "micro_old", "micro_new",
          "drift_micro", "l1_micro")
    },

    // q137: classifier operating-point sweep ([[graft.operators
    // .Evaluation.thresholdSweep]]) — how the q86/q97 gate threshold
    // gets CHOSEN: the q97 linear score swept over six candidate cuts
    // against the q33 rule-based label (quality >= 40, i.e. medium or
    // better), emitting the exact confusion matrix and basis-point
    // precision/recall/F1 per cut. One corpus pass, 4·|T| conditional
    // counters, a single-row shuffle — never a per-threshold scan.
    QueryDef.sql(
      "q137_threshold_sweep",
      s"""WITH f AS (
         |  SELECT doc_id,
         |    -3000000 - 40000*len($T) + 200000*len(list_distinct($T))
         |      + 2000*len(regexp_replace(text, '\\s', '', 'g'))
         |      + 300000*len(list_filter($T,
         |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS score_micro,
         |    floor(100.0 * (
         |      0.4 * least(n_chars / 500.0, 1.0) +
         |      0.4 * (CAST(len(list_distinct($T)) AS DOUBLE) / greatest(len($T), 1)) +
         |      0.2 * least((CAST(len(list_filter($T, t -> t IN ('the','a','an','of','and','in','to','is','it','that'))) AS DOUBLE)
         |                   / greatest(len($T), 1)) * 5.0, 1.0)
         |    ) * 10000.0 + 0.5) / 10000.0 >= 40.0 AS label
         |  FROM documents),
         |t(thr_micro) AS (VALUES (-2000000), (-1000000), (0),
         |                        (1000000), (2000000), (4000000)),
         |c AS (
         |  SELECT thr_micro,
         |    CAST(sum(CASE WHEN score_micro >= thr_micro AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN score_micro >= thr_micro AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN score_micro < thr_micro AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN score_micro < thr_micro AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM f CROSS JOIN t GROUP BY 1)
         |SELECT CAST(thr_micro AS BIGINT) AS thr_micro, tp, fp, fn, tn,
         |  CAST((tp * 10000) // greatest(tp + fp, 1) AS BIGINT) AS precision_bp,
         |  CAST((tp * 10000) // greatest(tp + fn, 1) AS BIGINT) AS recall_bp,
         |  CAST((2 * tp * 10000) // greatest(2 * tp + fp + fn, 1) AS BIGINT) AS f1_bp
         |FROM c""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = Classifier.qualityClassify(
          docs.select(col("doc_id"), col("text"), col("n_chars")), "text")
        .withColumn("label",
          TextFunctions.qualityScore(col("text"), col("n_chars")) >= 40.0)
      graft.operators.Evaluation.thresholdSweep(scored, "score_micro", "label",
        Seq(-2000000L, -1000000L, 0L, 1000000L, 2000000L, 4000000L))
    },

    // q140: exact per-source ROC-AUC ([[graft.operators.Evaluation
    // .rocAuc]]) — q137's threshold-free companion: the q97 classifier
    // ranked against the q33 rule label via the Mann-Whitney rank-sum
    // identity, u2 = 2·U carried as an exact BIGINT (ties count once
    // in u2), auc_bp = u2·10⁴ div (2·n_pos·n_neg). Per source, so a
    // source whose label is one-sided reports the documented 0. The
    // oracle replays the (score → pos/neg counts → exclusive cumneg)
    // chain with a plain window; the engine's prefix is the two-phase
    // runningOffset — no unpartitioned window over the score axis.
    QueryDef.sql(
      "q140_roc_auc",
      s"""WITH f AS (
         |  SELECT doc_id, source,
         |    -3000000 - 40000*len($T) + 200000*len(list_distinct($T))
         |      + 2000*len(regexp_replace(text, '\\s', '', 'g'))
         |      + 300000*len(list_filter($T,
         |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS score_micro,
         |    floor(100.0 * (
         |      0.4 * least(n_chars / 500.0, 1.0) +
         |      0.4 * (CAST(len(list_distinct($T)) AS DOUBLE) / greatest(len($T), 1)) +
         |      0.2 * least((CAST(len(list_filter($T, t -> t IN ('the','a','an','of','and','in','to','is','it','that'))) AS DOUBLE)
         |                   / greatest(len($T), 1)) * 5.0, 1.0)
         |    ) * 10000.0 + 0.5) / 10000.0 >= 40.0 AS label
         |  FROM documents),
         |g AS (
         |  SELECT source, score_micro,
         |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         |    CAST(sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS BIGINT) AS neg
         |  FROM f GROUP BY 1, 2),
         |o AS (
         |  SELECT *, coalesce(sum(neg) OVER (PARTITION BY source
         |    ORDER BY score_micro
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
         |  FROM g)
         |SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
         |  CAST(sum(neg) AS BIGINT) AS n_neg,
         |  CAST(sum(pos * (2 * cumneg + neg)) AS BIGINT) AS u2,
         |  CAST(sum(pos * (2 * cumneg + neg)) * 10000
         |    // greatest(2 * sum(pos) * sum(neg), 1) AS BIGINT) AS auc_bp
         |FROM o GROUP BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = Classifier.qualityClassify(
          docs.select(col("doc_id"), col("source"), col("text"), col("n_chars")),
          "text")
        .withColumn("label",
          TextFunctions.qualityScore(col("text"), col("n_chars")) >= 40.0)
      graft.operators.Evaluation.rocAuc(scored, "score_micro", "label",
        Seq("source"))
    },

    // q171: Cohen's kappa between the heuristic quality gate
    // (qualityScore ≥ 40, the q95 pipeline rule) and the frozen linear
    // classifier's keep (q97) — [[graft.operators.Evaluation
    // .agreementKappa]]: can the cheap rule stand in for the model?
    // Chance agreement comes from the per-rater marginals (each
    // divided by n before the product — overflow-safe to ~9·10¹²
    // rows); integer division truncates toward zero on BOTH engines,
    // so a negative kappa replays exactly. One aggregate, 1-row
    // result.
    QueryDef.sql(
      "q171_gate_agreement_kappa",
      s"""WITH f AS (
         |  SELECT
         |    floor(100.0 * (
         |      0.4 * least(n_chars / 500.0, 1.0) +
         |      0.4 * (CAST(len(list_distinct($T)) AS DOUBLE) / greatest(len($T), 1)) +
         |      0.2 * least((CAST(len(list_filter($T, t -> t IN ('the','a','an','of','and','in','to','is','it','that'))) AS DOUBLE)
         |                   / greatest(len($T), 1)) * 5.0, 1.0)
         |    ) * 10000.0 + 0.5) / 10000.0 >= 40.0 AS a,
         |    (-3000000 - 40000*len($T) + 200000*len(list_distinct($T))
         |      + 2000*len(regexp_replace(text, '\\s', '', 'g'))
         |      + 300000*len(list_filter($T,
         |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))) >= 0 AS b
         |  FROM documents),
         |c AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
         |  FROM f),
         |p AS (
         |  SELECT *, ((n11 + n00) * 1000000) // n AS po_u,
         |    ((((n11 + n10) * 1000000) // n) * (((n11 + n01) * 1000000) // n)) // 1000000
         |      + ((((n01 + n00) * 1000000) // n) * (((n10 + n00) * 1000000) // n)) // 1000000 AS pe_u
         |  FROM c)
         |SELECT n, n11, n10, n01, n00,
         |  CAST(po_u AS BIGINT) AS po_u, CAST(pe_u AS BIGINT) AS pe_u,
         |  CAST(CASE WHEN pe_u >= 1000000 THEN 0
         |    ELSE ((po_u - pe_u) * 1000000) // (1000000 - pe_u) END AS BIGINT)
         |    AS kappa_u
         |FROM p""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = Classifier.qualityClassify(
          docs.select(col("doc_id"), col("text"), col("n_chars")), "text")
        .withColumn("rule_keep",
          TextFunctions.qualityScore(col("text"), col("n_chars")) >= 40.0)
      graft.operators.Evaluation.agreementKappa(scored, "rule_keep", "keep")
    },

    // q142: calibration (reliability) table ([[graft.operators
    // .Evaluation.calibrationTable]]) — the triptych's third leg after
    // q137 (operating point) and q140 (ranking): per million-unit
    // score bucket, how often the q33 rule label is actually positive.
    // Bucketing is integral `div` — toward-zero truncation on BOTH
    // engines (spec-pinned for negatives), so edges are bit-identical.
    // One projection + one hash aggregate on the bucket key.
    QueryDef.sql(
      "q142_calibration",
      s"""WITH f AS (
         |  SELECT doc_id,
         |    -3000000 - 40000*len($T) + 200000*len(list_distinct($T))
         |      + 2000*len(regexp_replace(text, '\\s', '', 'g'))
         |      + 300000*len(list_filter($T,
         |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS score_micro,
         |    floor(100.0 * (
         |      0.4 * least(n_chars / 500.0, 1.0) +
         |      0.4 * (CAST(len(list_distinct($T)) AS DOUBLE) / greatest(len($T), 1)) +
         |      0.2 * least((CAST(len(list_filter($T, t -> t IN ('the','a','an','of','and','in','to','is','it','that'))) AS DOUBLE)
         |                   / greatest(len($T), 1)) * 5.0, 1.0)
         |    ) * 10000.0 + 0.5) / 10000.0 >= 40.0 AS label
         |  FROM documents),
         |c AS (
         |  SELECT score_micro // 1000000 AS bucket,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
         |  FROM f GROUP BY 1)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(bucket * 1000000 AS BIGINT) AS score_lo_micro, n, n_pos,
         |  CAST((n_pos * 10000) // greatest(n, 1) AS BIGINT) AS pos_rate_bp
         |FROM c""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = Classifier.qualityClassify(
          docs.select(col("doc_id"), col("text"), col("n_chars")), "text")
        .withColumn("label",
          TextFunctions.qualityScore(col("text"), col("n_chars")) >= 40.0)
      graft.operators.Evaluation.calibrationTable(scored, "score_micro",
        "label", 1000000L)
    },

    // q144: TRAIN a linear model at corpus scale ([[graft.operators
    // .Classifier.trainLinear2]]) — the training half of the q97 story
    // (q97 applies frozen weights; this fits them): OLS by exact normal
    // equations, distilling the 4-feature frozen score into a 2-feature
    // proxy (n_tok, n_dis). One hash aggregate yields ten exact-BIGINT
    // sufficient statistics (the only corpus-sized work); the centered
    // 2×2 Cramer solve runs as double expression strings interpolated
    // VERBATIM into both this oracle and the Spark selectExpr, so the
    // micro-unit weights and bp R² are engine-identical.
    QueryDef.sql(
      "q144_train_classifier",
      s"""WITH f AS (
         |  SELECT CAST(len($T) AS BIGINT) AS x1,
         |    CAST(len(list_distinct($T)) AS BIGINT) AS x2,
         |    CAST(-3000000 - 40000*len($T) + 200000*len(list_distinct($T))
         |      + 2000*len(regexp_replace(text, '\\s', '', 'g'))
         |      + 300000*len(list_filter($T,
         |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS BIGINT) AS y
         |  FROM documents),
         |s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x1 * x1) AS BIGINT) AS sx11,
         |    CAST(sum(x2 * x2) AS BIGINT) AS sx22,
         |    CAST(sum(x1 * x2) AS BIGINT) AS sx12,
         |    CAST(sum(x1 * y) AS BIGINT) AS sx1y,
         |    CAST(sum(x2 * y) AS BIGINT) AS sx2y,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM f),
         |m AS (SELECT *, ${Classifier.FitMomentExprs.mkString(", ")} FROM s),
         |d AS (SELECT *, ${Classifier.FitSolveExprs.mkString(", ")} FROM m),
         |w AS (SELECT *, ${Classifier.FitWeightExprs.mkString(", ")} FROM d)
         |SELECT ${Classifier.FitOutputExprs.mkString(", ")} FROM w""".stripMargin) { (s, d) =>
      val scored = Classifier.qualityClassify(
        Tables.documents(s, d).select(col("doc_id"), col("text")), "text")
      Classifier.trainLinear2(scored, "n_tok", "n_dis", "score_micro")
    },

    // q145: apply the TRAINED weights back to the corpus ([[graft
    // .operators.Classifier.applyLinear2]]) — the q144 artifact proven
    // usable end to end (the q119 train→apply pattern): fit the
    // 2-feature proxy, score every document with it via one exact
    // integer projection under a broadcast of the 1-row weights, and
    // report per source how the proxy gate agrees with the frozen
    // 4-feature gate (keep counts, agreement, exact absolute error
    // mass). Two corpus passes total — the train aggregate and the
    // apply scan; nothing else is corpus-sized.
    QueryDef.sql(
      "q145_apply_trained",
      s"""WITH f AS (
         |  SELECT source, CAST(len($T) AS BIGINT) AS x1,
         |    CAST(len(list_distinct($T)) AS BIGINT) AS x2,
         |    CAST(-3000000 - 40000*len($T) + 200000*len(list_distinct($T))
         |      + 2000*len(regexp_replace(text, '\\s', '', 'g'))
         |      + 300000*len(list_filter($T,
         |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS BIGINT) AS y
         |  FROM documents),
         |s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x1 * x1) AS BIGINT) AS sx11,
         |    CAST(sum(x2 * x2) AS BIGINT) AS sx22,
         |    CAST(sum(x1 * x2) AS BIGINT) AS sx12,
         |    CAST(sum(x1 * y) AS BIGINT) AS sx1y,
         |    CAST(sum(x2 * y) AS BIGINT) AS sx2y,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM f),
         |m AS (SELECT *, ${Classifier.FitMomentExprs.mkString(", ")} FROM s),
         |d AS (SELECT *, ${Classifier.FitSolveExprs.mkString(", ")} FROM m),
         |w AS (SELECT *, ${Classifier.FitWeightExprs.mkString(", ")} FROM d),
         |wq AS (SELECT ${Classifier.FitOutputExprs.mkString(", ")} FROM w),
         |a AS (
         |  SELECT f.source, f.y,
         |    CAST((wq.w0_u + wq.w1_u * f.x1 + wq.w2_u * f.x2) // 1000000
         |      AS BIGINT) AS fit
         |  FROM f CROSS JOIN wq)
         |SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN y >= 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_keep_frozen,
         |  CAST(sum(CASE WHEN fit >= 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_keep_fit,
         |  CAST(sum(CASE WHEN (y >= 0) = (fit >= 0) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_agree,
         |  CAST(sum(abs(y - fit)) AS BIGINT) AS abs_err_micro
         |FROM a GROUP BY source""".stripMargin) { (s, d) =>
      val scored = Classifier.qualityClassify(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          col("text")), "text")
      val w = Classifier.trainLinear2(scored, "n_tok", "n_dis", "score_micro")
      Classifier.applyLinear2(scored, "n_tok", "n_dis", w)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(when(col("score_micro") >= 0, 1L).otherwise(0L))
            .as("n_keep_frozen"),
          sum(when(col("score_fit_micro") >= 0, 1L).otherwise(0L))
            .as("n_keep_fit"),
          sum(when((col("score_micro") >= 0) === (col("score_fit_micro") >= 0),
            1L).otherwise(0L)).as("n_agree"),
          sum(abs(col("score_micro") - col("score_fit_micro")))
            .as("abs_err_micro"))
    },

    // q146: held-out evaluation — the ML-hygiene loop the three
    // classifier pieces compose into: fit q144's proxy on the q57
    // hash-split TRAIN fold only, then score ALL folds with the
    // trained weights and report per fold: gate agreement with the
    // frozen model, the trained gate's F1 against the frozen gate, and
    // mean absolute error — so train-vs-test deltas (generalization)
    // are a two-row read. Metrics are exact integers (the fit is the
    // q145 integer projection; the split is the portable md5 bucket),
    // so the whole loop hash-verifies.
    QueryDef.sql(
      "q146_holdout_eval",
      s"""WITH f AS (
         |  SELECT CASE
         |      WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
         |      WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
         |      ELSE 'test' END AS split,
         |    CAST(len($T) AS BIGINT) AS x1,
         |    CAST(len(list_distinct($T)) AS BIGINT) AS x2,
         |    CAST(-3000000 - 40000*len($T) + 200000*len(list_distinct($T))
         |      + 2000*len(regexp_replace(text, '\\s', '', 'g'))
         |      + 300000*len(list_filter($T,
         |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS BIGINT) AS y
         |  FROM documents),
         |s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x1 * x1) AS BIGINT) AS sx11,
         |    CAST(sum(x2 * x2) AS BIGINT) AS sx22,
         |    CAST(sum(x1 * x2) AS BIGINT) AS sx12,
         |    CAST(sum(x1 * y) AS BIGINT) AS sx1y,
         |    CAST(sum(x2 * y) AS BIGINT) AS sx2y,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM f WHERE split = 'train'),
         |m AS (SELECT *, ${Classifier.FitMomentExprs.mkString(", ")} FROM s),
         |d AS (SELECT *, ${Classifier.FitSolveExprs.mkString(", ")} FROM m),
         |w AS (SELECT *, ${Classifier.FitWeightExprs.mkString(", ")} FROM d),
         |wq AS (SELECT ${Classifier.FitOutputExprs.mkString(", ")} FROM w),
         |a AS (
         |  SELECT f.split, f.y,
         |    CAST((wq.w0_u + wq.w1_u * f.x1 + wq.w2_u * f.x2) // 1000000
         |      AS BIGINT) AS fit
         |  FROM f CROSS JOIN wq),
         |c AS (
         |  SELECT split, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN (y >= 0) = (fit >= 0) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS agr,
         |    CAST(sum(CASE WHEN y >= 0 AND fit >= 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN y < 0 AND fit >= 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN y >= 0 AND fit < 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fn,
         |    CAST(sum(abs(y - fit)) AS BIGINT) AS abserr
         |  FROM a GROUP BY split)
         |SELECT split, n,
         |  CAST((agr * 10000) // greatest(n, 1) AS BIGINT) AS agree_bp,
         |  CAST((2 * tp * 10000) // greatest(2 * tp + fp + fn, 1) AS BIGINT)
         |    AS f1_bp,
         |  CAST(abserr // greatest(n, 1) AS BIGINT) AS mae_micro
         |FROM c""".stripMargin) { (s, d) =>
      val scored = Classifier.qualityClassify(
          Tables.documents(s, d).select(col("doc_id"), col("text")), "text")
        .withColumn("split",
          graft.operators.Sampling.splitLabel(col("doc_id")))
      val w = Classifier.trainLinear2(scored.filter(col("split") === "train"),
        "n_tok", "n_dis", "score_micro")
      Classifier.applyLinear2(scored, "n_tok", "n_dis", w)
        .withColumn("agree",
          (col("score_micro") >= 0) === (col("score_fit_micro") >= 0))
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          sum(when(col("agree"), 1L).otherwise(0L)).as("agr"),
          sum(when(col("score_micro") >= 0 && col("score_fit_micro") >= 0, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("score_micro") < 0 && col("score_fit_micro") >= 0, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("score_micro") >= 0 && col("score_fit_micro") < 0, 1L)
            .otherwise(0L)).as("fn"),
          sum(abs(col("score_micro") - col("score_fit_micro"))).as("abserr"))
        .select(col("split"), col("n"),
          expr("(agr * 10000) div greatest(n, 1)").as("agree_bp"),
          expr("(2 * tp * 10000) div greatest(2 * tp + fp + fn, 1)")
            .as("f1_bp"),
          expr("abserr div greatest(n, 1)").as("mae_micro"))
    },

    // q150: interpolated Kneser-Ney bigram perplexity ([[graft
    // .operators.LanguageModel.knPerplexityScores]]) — q85's CCNet
    // signal with the standard smoothing upgrade (Kneser & Ney 1995;
    // Chen & Goodman 1999, D = 0.75): discounted bigram mass
    // redistributed by CONTINUATION diversity, so templated repetition
    // (frequent but context-glued transitions) separates from organic
    // prose. The probability expression is [[LanguageModel.KnProbSql]]
    // VERBATIM on both engines; per-bigram NLLs quantize to micro-nats
    // before the exact-integer per-doc sum.
    QueryDef.sql(
      "q150_kneser_ney",
      s"""WITH toks AS (SELECT doc_id, $T AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
         |      i -> [tk[i], tk[i+1]])) AS b
         |  FROM toks),
         |pairs AS (SELECT doc_id, b[1] AS w1, b[2] AS w2 FROM bg),
         |c12t AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |         FROM pairs GROUP BY w1, w2),
         |byw1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         |           CAST(count(*) AS BIGINT) AS n1fw
         |         FROM c12t GROUP BY w1),
         |byw2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1bw
         |         FROM c12t GROUP BY w2),
         |ty AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM c12t),
         |nll AS (
         |  SELECT p.doc_id,
         |    CAST(floor(-ln(${LanguageModel.KnProbSql})
         |      * 1000000.0 + 0.5) AS BIGINT) AS nll_u
         |  FROM pairs p JOIN c12t USING (w1, w2) JOIN byw1 USING (w1)
         |  JOIN byw2 USING (w2) CROSS JOIN ty),
         |sc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(nll_u) AS BIGINT) AS s
         |  FROM nll GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
         |  coalesce(sc.s, 0) AS nll_kn_micro
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scores = LanguageModel.knPerplexityScores(docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
      docs.select("doc_id").join(scores, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("nll_kn_micro_sum"), lit(0L)).as("nll_kn_micro"))
    },

    // q208: interpolated Kneser-Ney TRIGRAM perplexity ([[graft
    // .operators.LanguageModel.knTrigramPerplexityScores]]) — q150 one
    // order up, closing the gap to CCNet practice (real perplexity
    // filters run order ≥ 3). The full backoff chain (trigram discount →
    // continuation-bigram discount → unigram continuation share) is
    // [[LanguageModel.KnProb3Sql]] VERBATIM on both engines over
    // exact-integer counts that all derive from the distinct-trigram
    // table; per-trigram NLLs quantize to micro-nats before the
    // exact-integer per-doc sum. Corpus perplexity under this model is
    // strictly below q150's bigram one (CurationSpec pins it). Oracle
    // note: tt2 rides the bwt frame as `count(*) OVER ()` instead of
    // q150's `CROSS JOIN ty` — a trailing cross join after THIS chain's
    // five USING joins sends DuckDB 1.0's join-order search into a
    // 100 GB blowup on a 500-doc corpus (measured; fine at four joins).
    QueryDef.sql(
      "q208_kneser_ney_trigram",
      s"""WITH toks AS (SELECT doc_id, $T AS tk FROM documents),
         |tg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
         |      i -> [tk[i], tk[i+1], tk[i+2]])) AS g
         |  FROM toks),
         |trip AS (SELECT doc_id, g[1] AS w1, g[2] AS w2, g[3] AS w3 FROM tg),
         |c123t AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c123
         |          FROM trip GROUP BY w1, w2, w3),
         |ctx AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12,
         |          CAST(count(*) AS BIGINT) AS nfw
         |        FROM c123t GROUP BY w1, w2),
         |bwt AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS nbw,
         |          CAST(count(*) OVER () AS BIGINT) AS tt2
         |        FROM c123t GROUP BY w2, w3),
         |byw2 AS (SELECT w2, CAST(sum(nbw) AS BIGINT) AS midtot,
         |           CAST(count(*) AS BIGINT) AS midfw
         |         FROM bwt GROUP BY w2),
         |byw3 AS (SELECT w3, CAST(count(*) AS BIGINT) AS nlow
         |         FROM bwt GROUP BY w3),
         |nll AS (
         |  SELECT p.doc_id,
         |    CAST(floor(-ln(${LanguageModel.KnProb3Sql})
         |      * 1000000.0 + 0.5) AS BIGINT) AS nll_u
         |  FROM trip p JOIN c123t USING (w1, w2, w3) JOIN ctx USING (w1, w2)
         |  JOIN bwt USING (w2, w3) JOIN byw2 USING (w2) JOIN byw3 USING (w3)),
         |sc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |    CAST(sum(nll_u) AS BIGINT) AS s
         |  FROM nll GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(sc.n_trigrams, 0) AS n_trigrams,
         |  coalesce(sc.s, 0) AS nll_kn3_micro
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scores = LanguageModel.knTrigramPerplexityScores(docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
      docs.select("doc_id").join(scores, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
          coalesce(col("nll_kn3_micro_sum"), lit(0L)).as("nll_kn3_micro"))
    },

    // q153: leave-one-source-out data valuation ([[graft.operators
    // .Classifier.trainLinear2LeaveOneOut]]) — the LOO baseline of Data
    // Shapley (Ghorbani & Zou 2019) at domain granularity: for every
    // source, the q144 proxy trained WITHOUT it (all models from ONE
    // pass — OLS statistics are additive, so each holdout is the exact
    // BIGINT difference total − group), then applied back to the
    // held-out source: high agreement = the domain is redundant, low =
    // it carries signal no other domain supplies. Weight solve is the
    // q144 FitExprs chain verbatim; the apply is the q145 integer
    // projection.
    QueryDef.sql(
      "q153_loo_valuation",
      s"""WITH f AS (
         |  SELECT source, CAST(len($T) AS BIGINT) AS x1,
         |    CAST(len(list_distinct($T)) AS BIGINT) AS x2,
         |    CAST(-3000000 - 40000*len($T) + 200000*len(list_distinct($T))
         |      + 2000*len(regexp_replace(text, '\\s', '', 'g'))
         |      + 300000*len(list_filter($T,
         |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS BIGINT) AS y
         |  FROM documents),
         |g AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS gn,
         |    CAST(sum(x1) AS BIGINT) AS gsx1, CAST(sum(x2) AS BIGINT) AS gsx2,
         |    CAST(sum(y) AS BIGINT) AS gsy,
         |    CAST(sum(x1 * x1) AS BIGINT) AS gsx11,
         |    CAST(sum(x2 * x2) AS BIGINT) AS gsx22,
         |    CAST(sum(x1 * x2) AS BIGINT) AS gsx12,
         |    CAST(sum(x1 * y) AS BIGINT) AS gsx1y,
         |    CAST(sum(x2 * y) AS BIGINT) AS gsx2y,
         |    CAST(sum(y * y) AS BIGINT) AS gsyy
         |  FROM f GROUP BY source),
         |t AS (
         |  SELECT CAST(sum(gn) AS BIGINT) AS tn,
         |    CAST(sum(gsx1) AS BIGINT) AS tsx1, CAST(sum(gsx2) AS BIGINT) AS tsx2,
         |    CAST(sum(gsy) AS BIGINT) AS tsy,
         |    CAST(sum(gsx11) AS BIGINT) AS tsx11,
         |    CAST(sum(gsx22) AS BIGINT) AS tsx22,
         |    CAST(sum(gsx12) AS BIGINT) AS tsx12,
         |    CAST(sum(gsx1y) AS BIGINT) AS tsx1y,
         |    CAST(sum(gsx2y) AS BIGINT) AS tsx2y,
         |    CAST(sum(gsyy) AS BIGINT) AS tsyy
         |  FROM g),
         |loo AS (
         |  SELECT g.source AS grp,
         |    CAST(t.tn - g.gn AS BIGINT) AS n,
         |    CAST(t.tsx1 - g.gsx1 AS BIGINT) AS sx1,
         |    CAST(t.tsx2 - g.gsx2 AS BIGINT) AS sx2,
         |    CAST(t.tsy - g.gsy AS BIGINT) AS sy,
         |    CAST(t.tsx11 - g.gsx11 AS BIGINT) AS sx11,
         |    CAST(t.tsx22 - g.gsx22 AS BIGINT) AS sx22,
         |    CAST(t.tsx12 - g.gsx12 AS BIGINT) AS sx12,
         |    CAST(t.tsx1y - g.gsx1y AS BIGINT) AS sx1y,
         |    CAST(t.tsx2y - g.gsx2y AS BIGINT) AS sx2y,
         |    CAST(t.tsyy - g.gsyy AS BIGINT) AS syy
         |  FROM g CROSS JOIN t),
         |m AS (SELECT *, ${Classifier.FitMomentExprs.mkString(", ")} FROM loo),
         |d2 AS (SELECT *, ${Classifier.FitSolveExprs.mkString(", ")} FROM m),
         |w AS (SELECT *, ${Classifier.FitWeightExprs.mkString(", ")} FROM d2),
         |wq AS (SELECT grp, ${Classifier.FitOutputExprs.mkString(", ")} FROM w),
         |a AS (
         |  SELECT f.source, f.y, wq.n, wq.w0_u, wq.w1_u, wq.w2_u, wq.r2_bp,
         |    CAST((wq.w0_u + wq.w1_u * f.x1 + wq.w2_u * f.x2) // 1000000
         |      AS BIGINT) AS fit
         |  FROM f JOIN wq ON f.source = wq.grp)
         |SELECT source, n AS n_train, w0_u, w1_u, w2_u, r2_bp,
         |  CAST(count(*) AS BIGINT) AS n_holdout,
         |  CAST(sum(CASE WHEN (y >= 0) = (fit >= 0) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_agree,
         |  CAST(sum(abs(y - fit)) AS BIGINT) AS abs_err_micro
         |FROM a GROUP BY source, n, w0_u, w1_u, w2_u, r2_bp""".stripMargin) { (s, d) =>
      val scored = Classifier.qualityClassify(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          col("text")), "text")
      val w = Classifier.trainLinear2LeaveOneOut(scored, "source",
        "n_tok", "n_dis", "score_micro")
      scored
        .join(broadcast(w.withColumnRenamed("grp", "source")), "source")
        .withColumn("fit",
          expr("(w0_u + w1_u * n_tok + w2_u * n_dis) div 1000000"))
        .groupBy(col("source"), col("n").as("n_train"), col("w0_u"),
          col("w1_u"), col("w2_u"), col("r2_bp"))
        .agg(count(lit(1)).as("n_holdout"),
          sum(when((col("score_micro") >= 0) === (col("fit") >= 0), 1L)
            .otherwise(0L)).as("n_agree"),
          sum(abs(col("score_micro") - col("fit"))).as("abs_err_micro"))
    },

    // q184: token-blocklist gate ([[graft.operators.Decontamination
    // .blocklistGate]], C4 Raffel et al. 2020 §2.2) — exact whole-token
    // matching against a plan-time literal term list; per-doc work is
    // one map-side filter-count inside codegen (no join, no posting
    // rows), only the ≤|sources|-row aggregate shuffles. Terms chosen
    // from the synthetic vocab so every source carries real hit mass.
    QueryDef.sql(
      "q184_blocklist_gate",
      s"""WITH per AS (
         |  SELECT source,
         |    CAST(len(list_filter(
         |      list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
         |        t -> len(t) > 0),
         |      t -> t IN ('spark', 'hash', 'merge', 'join'))) AS BIGINT)
         |      AS hits
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flagged,
         |  CAST(sum(hits) AS BIGINT) AS n_hits,
         |  (CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    * 10000) // count(*) AS flag_bp
         |FROM per GROUP BY source""".stripMargin) { (s, d) =>
      graft.operators.Decontamination.blocklistGate(
        Tables.documents(s, d), "source", "text",
        Seq("spark", "hash", "merge", "join"))
    }
  )
}
