package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{LanguageModel, Sampling}
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
    }
  )
}
