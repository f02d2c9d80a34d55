package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Classifier, Dedup}
import org.apache.spark.sql.functions._

/** Text / dedup operators for training-data pipelines on the `documents`
  * table (BASELINE.json north star; graded alongside SURVEY §2):
  *
  *  - q30 exact dedup stats (hash-groupBy on normalized-text md5)
  *  - q31 per-document fingerprint + token stats
  *  - q32 token-count rollup (incl. BPE-ish subword estimate)
  *  - q33 quality scores with label buckets
  *  - q34 language-ID heuristic vs the labeled lang column
  *  - q35 n-gram (3-shingle) Jaccard near-dup candidates via inverted index
  *  - q37 MinHash-LSH band statistics (portable hash family — full oracle)
  *  - q38 SimHash hamming-candidate stats (portable family — full oracle)
  *  - q61 vocab-driven subword piece counts (greedy longest-prefix over
  *    the checked-in vocab; recursive-CTE oracle — full hash check)
  *  - q73 decontamination: corpus docs containing a benchmark item by
  *    distinct 5-gram containment (planted: every 25th doc's middle-half
  *    tokens form the eval set, so sources and their dups must flag)
  *  - q74 PII scrub: planted emails/phones/SSNs/IPs — extraction counts AND
  *    redacted strings under the hash check
  *  - q75 sequence packing: concat-and-chunk placement via the two-phase
  *    distributed prefix sum, vs a one-window SQL oracle
  *  - q76 repetition quality signals (dup-token / dup-3-gram / top-token
  *    fractions, Gopher-style), relational posting aggregates
  *  - q77 segment-level exact dedup (C4/RefinedWeb line dedup with a
  *    16-token window segmenter): global first-occurrence keep +
  *    per-doc text reassembly, all under the hash check
  *  - q78 token-budget source mixing: first 800 tokens of each source
  *    via the per-partition distributed prefix sum
  *  - q80 chunk materialization: the packed 256-token sequences
  *    themselves, every chunk's content hash-pinned
  *  - q81 seeded corpus shuffle + packing: md5-keyed deterministic
  *    permutation (portable, no RNG) feeding the chunk placement
  *  - q82 cross-source segment-overlap matrix (contamination diagnostic
  *    before mixing sources)
  *  - q83 boilerplate strip: EVERY occurrence of a high-df segment
  *    removed (vs q77's keep-first), reassembly hash-pinned
  *  - q84 curation funnel: strip-then-dedup composed in one pass over
  *    the postings, per-source survival counts at each stage
  */
object TextOps {

  /** DuckDB twin of TextFunctions.tokens: split on whitespace runs with
    * empties removed. `string_split_regex` + `list_filter`.
    */
  private val T = "list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)"

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q30_dedup_exact",
      s"""SELECT source, count(*) AS n_docs,
         |  count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS n_distinct,
         |  CAST(count(*) - count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS BIGINT) AS n_dups
         |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(TextFunctions.fingerprint(col("text"))).as("n_distinct"))
        .withColumn("n_dups", (col("n_docs") - col("n_distinct")).cast("long"))
    },

    QueryDef.sql(
      "q31_fingerprints",
      s"""SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         |  n_chars, len($T) AS n_tokens
         |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        col("n_chars"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
    },

    QueryDef.sql(
      "q32_token_stats",
      s"""SELECT source, lang, count(*) AS n_docs,
         |  CAST(sum(len($T)) AS BIGINT) AS total_tokens,
         |  floor(avg(CAST(len($T) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avg_tokens,
         |  max(len($T)) AS max_tokens,
         |  CAST(sum(len($T) + len(list_filter($T, t -> len(t) > 6))) AS BIGINT) AS est_subwords
         |FROM documents GROUP BY source, lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).cast("long").as("total_tokens"),
          TextFunctions.round4hu(avg(TextFunctions.tokenCount(col("text")).cast("double"))).as("avg_tokens"),
          max(TextFunctions.tokenCount(col("text"))).as("max_tokens"),
          sum(TextFunctions.subwordCountEstimate(col("text"))).cast("long").as("est_subwords"))
    },

    QueryDef.sql(
      "q33_quality_scores",
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    floor(100.0 * (
         |      0.4 * least(n_chars / 500.0, 1.0) +
         |      0.4 * (CAST(len(list_distinct($T)) AS DOUBLE) / greatest(len($T), 1)) +
         |      0.2 * least((CAST(len(list_filter($T, t -> t IN ('the','a','an','of','and','in','to','is','it','that'))) AS DOUBLE)
         |                   / greatest(len($T), 1)) * 5.0, 1.0)
         |    ) * 10000.0 + 0.5) / 10000.0 AS quality
         |  FROM documents)
         |SELECT doc_id, quality,
         |  CASE WHEN quality >= 70 THEN 'high' WHEN quality >= 40 THEN 'medium'
         |       ELSE 'low' END AS quality_label
         |FROM scored""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
        .withColumn("quality_label", TextFunctions.qualityLabel(col("quality")))
    },

    QueryDef.sql(
      "q34_langid_confusion",
      s"""WITH hits AS (
         |  SELECT lang,
         |    len(list_filter($T, t -> t IN ('the','a','of','and','is'))) AS h_en,
         |    len(list_filter($T, t -> t IN ('le','la','les','et','est'))) AS h_fr,
         |    len(list_filter($T, t -> t IN ('el','la','los','y','es'))) AS h_es,
         |    len(list_filter($T, t -> t IN ('der','die','das','und','ist'))) AS h_de,
         |    len(list_filter($T, t -> t IN ('的','是','和','了','在'))) AS h_zh
         |  FROM documents),
         |pred AS (
         |  SELECT lang,
         |    CASE
         |      WHEN h_en + h_fr + h_es + h_de + h_zh = 0 THEN 'und'
         |      WHEN h_en > 0 AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_de AND h_en >= h_zh THEN 'en'
         |      WHEN h_fr > 0 AND h_fr > h_en AND h_fr >= h_es AND h_fr >= h_de AND h_fr >= h_zh THEN 'fr'
         |      WHEN h_es > 0 AND h_es > h_en AND h_es > h_fr AND h_es >= h_de AND h_es >= h_zh THEN 'es'
         |      WHEN h_de > 0 AND h_de > h_en AND h_de > h_fr AND h_de > h_es AND h_de >= h_zh THEN 'de'
         |      WHEN h_zh > 0 THEN 'zh'
         |      ELSE 'und' END AS predicted
         |  FROM hits)
         |SELECT lang, predicted, count(*) AS n FROM pred GROUP BY lang, predicted""".stripMargin) { (s, d) =>
      // hash/split each token once: explode → 5 conditional sums per doc,
      // then argmax over the materialized hit columns (the scalar langId
      // re-splits the text on every one of its ~35 internal references)
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode_outer(TextFunctions.tokens(col("text"))).as("t"))
      val hitCols = TextFunctions.LangMarkers.map { case (lang, words) =>
        lang -> sum(when(col("t").isInCollection(words), 1).otherwise(0)).as(s"h_$lang")
      }
      val hits = toks.groupBy("doc_id", "lang")
        .agg(hitCols.head._2, hitCols.tail.map(_._2): _*)
      hits
        .withColumn("predicted", TextFunctions.langIdFromHits(
          TextFunctions.LangMarkers.map { case (lang, _) => lang -> col(s"h_$lang") }))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
    },

    QueryDef.sql(
      "q35_ngram_neardup",
      s"""WITH toks AS (
         |  SELECT doc_id, source, $T AS tk FROM documents),
         |sh AS (
         |  SELECT doc_id, source,
         |    CASE WHEN len(tk) = 0 THEN []
         |         ELSE list_distinct(list_transform(generate_series(1, greatest(len(tk) - 2, 1)),
         |           i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS shingles
         |  FROM toks),
         |sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
         |postings AS (SELECT doc_id, source, unnest(shingles) AS shingle FROM sh),
         |rare AS (
         |  SELECT source, shingle FROM postings
         |  GROUP BY source, shingle HAVING count(*) <= 1000),
         |kept AS (SELECT p.* FROM postings p JOIN rare r USING (source, shingle)),
         |pairs AS (
         |  SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |  FROM kept a JOIN kept b
         |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.source, a.doc_id, b.doc_id),
         |jac AS (
         |  SELECT p.source, p.id_a, p.id_b,
         |    CAST(p.n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - p.n_shared) AS j
         |  FROM pairs p
         |  JOIN sizes sa ON p.id_a = sa.doc_id
         |  JOIN sizes sb ON p.id_b = sb.doc_id),
         |per_src AS (
         |  SELECT source, count(*) AS n_cand_pairs,
         |    CAST(sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pairs,
         |    floor(max(j) * 10000.0 + 0.5) / 10000.0 AS max_jaccard
         |  FROM jac GROUP BY source)
         |SELECT d.source, count(DISTINCT d.doc_id) AS n_docs,
         |  coalesce(p.n_cand_pairs, 0) AS n_cand_pairs,
         |  coalesce(p.n_dup_pairs, 0) AS n_dup_pairs,
         |  coalesce(p.max_jaccard, 0.0) AS max_jaccard
         |FROM documents d LEFT JOIN per_src p ON d.source = p.source
         |GROUP BY d.source, p.n_cand_pairs, p.n_dup_pairs, p.max_jaccard""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source")
      val perSource = pairs.groupBy("block")
        .agg(count(lit(1)).as("n_cand_pairs"),
          sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L)).as("n_dup_pairs"),
          graft.functions.TextFunctions.round4hu(max("jaccard")).as("max_jaccard"))
      docs.groupBy("source").agg(countDistinct("doc_id").as("n_docs"))
        .join(perSource, col("source") === col("block"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_cand_pairs"), lit(0L)).as("n_cand_pairs"),
          coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
          coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"))
    },

    // q37/q38 run the PortableHashFamily (md5-derived, exact BIGINT
    // permutations) so DuckDB reproduces signatures bit-for-bit — full
    // hash-verification of the LSH machinery; the xxhash64 production
    // family is pinned by planted-duplicate specs (OperatorsSpec).
    QueryDef.sql("q37_minhash_band_stats", q37Sql) { (s, d) =>
      Dedup.minhashBandStats(Tables.documents(s, d), "doc_id", "text",
        family = Dedup.PortableHashFamily)
    },

    QueryDef.sql("q38_simhash_candidates", q38Sql) { (s, d) =>
      // maxBucketSize=500 BINDS on this data (the synthetic docs share
      // vocabulary, so simhash chunk values cluster: at sf0.1 one 8-bit
      // chunk bucket holds ~27% of all docs — ~900k of the 2.8M uncapped
      // pairs from a single bucket). Exercising the cap here puts the
      // documented megabucket mitigation itself under cross-engine hash
      // verification, not just under specs.
      val cands = Dedup.simhashCandidatesPortable(
        Tables.documents(s, d), "doc_id", "text", verifyThreshold = 16,
        maxBucketSize = 500)
      // per-source stats stay non-empty even when no near-dups exist
      Tables.documents(s, d).groupBy("source").agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(cands.agg(
          count(lit(1)).as("n_candidate_pairs"),
          coalesce(min("hamming"), lit(-1)).cast("long").as("min_hamming"))))
    },

    QueryDef.sql(
      "q59_tfidf_top_terms",
      s"""WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         |toks AS (SELECT doc_id, unnest($T) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
         |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         |scored AS (
         |  SELECT doc_id, tf.token, tf.tf, dfreq.df,
         |    floor(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) * 10000.0 + 0.5)
         |      / 10000.0 AS score
         |  FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n),
         |ranked AS (
         |  SELECT doc_id, token, tf, df, score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
         |  FROM scored)
         |SELECT doc_id AS id, token, tf, df, score, rank
         |FROM ranked WHERE rank <= 3 AND doc_id < 100""".stripMargin) { (s, d) =>
      // ranking on the 4dp-rounded score (then token) keeps the order
      // reproducible across libm implementations
      graft.operators.TfIdf.topTerms(Tables.documents(s, d), "doc_id", "text", 3)
        .filter(col("id") < 100)
    },

    QueryDef.sql("q65_winnowing_fingerprints", q65Sql) { (s, d) =>
      // local fingerprints (MOSS winnowing) — the containment/partial-copy
      // detector; per-source stats keep the result stable and non-empty,
      // n_shared counts (doc, fp) rows whose fingerprint appears in >1 doc
      val docs = Tables.documents(s, d)
      // one (fp)-keyed exchange shared by the per-doc join branch and the
      // shared-fp aggregate — without it both branches re-run the kernel
      val fps = Dedup.winnowFingerprints(docs, "doc_id", "text")
        .repartition(col("fp"))
      val withSrc = fps.join(
        docs.select(col("doc_id").as("id"), col("source")), Seq("id"))
      val shared = fps.groupBy("fp")
        .agg(countDistinct("id").as("nd_"))
        .filter(col("nd_") > 1)
        .select(col("fp"), lit(1).as("is_shared"))
      withSrc.join(broadcast(shared), Seq("fp"), "left")
        .groupBy("source")
        .agg(countDistinct("id").as("n_docs"),
          count(lit(1)).as("n_fingerprints"),
          sum(when(col("is_shared").isNotNull, 1L).otherwise(0L)).as("n_shared"))
    },

    QueryDef.sql("q63_incremental_minhash", q63Sql) { (s, d) =>
      // deterministic batch split: every 5th doc is "new", the rest are
      // the stored corpus — the index is built ONLY from the corpus side
      // (history never re-signed), candidates restricted to pairs
      // involving >= 1 new doc
      val docs = Tables.documents(s, d)
      val existing = docs.filter(col("doc_id") % 5 =!= 0)
      val newDocs = docs.filter(col("doc_id") % 5 === 0)
      val idx = Dedup.minhashIndex(existing, "doc_id", "text",
        family = Dedup.PortableHashFamily)
      Dedup.minhashCandidatesIncremental(newDocs, "doc_id", "text", idx,
        family = Dedup.PortableHashFamily, maxBucketSize = 500)
    },

    // q73: decontamination ([[graft.operators.Decontamination]]). The
    // eval set is PLANTED deterministically in both engines: every 25th
    // document's middle-half token slice becomes a benchmark item, so
    // its source doc (and that doc's exact/near dups) must flag with
    // containment ~1.0 while unrelated docs share nothing. Containment
    // is over the BENCHMARK item's distinct 5-grams — the convention
    // that catches a long document embedding a whole eval item.
    QueryDef.sql(
      "q73_decontamination",
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
      graft.operators.Decontamination
        .benchmarkContainment(docs, "doc_id", "text", bench, "bench_id", "btext")
        .select(col("id"), col("bench_id"), col("n_shared"), col("n_bench_grams"),
          TextFunctions.round4hu(col("containment")).as("containment"))
    },

    // q74: PII scrub ([[graft.functions.Pii]]). PII is PLANTED
    // deterministically per customer in both engines (the q20 pattern):
    // emails on ck%3=0, NANP phones on ck%4=0, IPv4 on ck%5=0, SSN-shaped
    // ddd-dd-dddd on ck%7=0 — so the regex EXTRACTION counts and the
    // REDACTED strings are both under the hash check. Patterns restrict
    // to the Java-regex ∩ RE2 subset.
    QueryDef.sql(
      "q74_pii_scrub",
      """WITH raw AS (
        |  SELECT c_custkey,
        |    concat('note ',
        |      CASE WHEN c_custkey % 3 = 0
        |           THEN concat('contact user', CAST(c_custkey AS VARCHAR), '@example.com ')
        |           ELSE '' END,
        |      CASE WHEN c_custkey % 4 = 0
        |           THEN concat('call ', lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0'),
        |                '-', lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0'),
        |                '-', lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0'), ' ')
        |           ELSE '' END,
        |      CASE WHEN c_custkey % 5 = 0
        |           THEN concat('from ', CAST(c_custkey % 256 AS VARCHAR),
        |                '.', CAST((c_custkey * 3) % 256 AS VARCHAR),
        |                '.', CAST((c_custkey * 5) % 256 AS VARCHAR),
        |                '.', CAST((c_custkey * 7) % 256 AS VARCHAR), ' ')
        |           ELSE '' END,
        |      CASE WHEN c_custkey % 7 = 0
        |           THEN concat('id ', lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0'),
        |                '-', lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0'),
        |                '-', lpad(CAST((c_custkey * 11) % 10000 AS VARCHAR), 4, '0'), ' ')
        |           ELSE '' END,
        |      'end') AS text
        |  FROM customer)
        |SELECT c_custkey,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssns,
        |  CAST(len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g') AS redacted
        |FROM raw""".stripMargin) { (s, d) =>
      val ck = col("c_custkey")
      val text = concat(lit("note "),
        when(ck % 3 === 0,
          concat(lit("contact user"), ck.cast("string"), lit("@example.com ")))
          .otherwise(""),
        when(ck % 4 === 0,
          concat(lit("call "), lpad((ck % 1000).cast("string"), 3, "0"),
            lit("-"), lpad(((ck * 7) % 1000).cast("string"), 3, "0"),
            lit("-"), lpad(((ck * 13) % 10000).cast("string"), 4, "0"), lit(" ")))
          .otherwise(""),
        when(ck % 5 === 0,
          concat(lit("from "), (ck % 256).cast("string"),
            lit("."), ((ck * 3) % 256).cast("string"),
            lit("."), ((ck * 5) % 256).cast("string"),
            lit("."), ((ck * 7) % 256).cast("string"), lit(" ")))
          .otherwise(""),
        when(ck % 7 === 0,
          concat(lit("id "), lpad((ck % 1000).cast("string"), 3, "0"),
            lit("-"), lpad((ck % 100).cast("string"), 2, "0"),
            lit("-"), lpad(((ck * 11) % 10000).cast("string"), 4, "0"), lit(" ")))
          .otherwise(""),
        lit("end"))
      Tables.customer(s, d)
        .select(ck, text.as("text"))
        .select(ck,
          graft.functions.Pii.emailCount(col("text")).cast("long").as("n_emails"),
          graft.functions.Pii.phoneCount(col("text")).cast("long").as("n_phones"),
          graft.functions.Pii.ssnCount(col("text")).cast("long").as("n_ssns"),
          graft.functions.Pii.ipv4Count(col("text")).cast("long").as("n_ips"),
          graft.functions.Pii.redact(col("text")).as("redacted"))
    },

    // q75: concat-and-chunk sequence packing ([[graft.operators.Packing]]).
    // The oracle computes the global running offset with one SQL window —
    // the engine runs the two-phase distributed prefix sum (per-group
    // running sums in parallel + a prefix over group TOTALS), so the
    // hash match cross-validates the distributed formulation exactly.
    QueryDef.sql(
      "q75_sequence_packing",
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($T) AS BIGINT) AS n_tokens FROM documents),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS "offset"
         |  FROM t)
         |SELECT doc_id, n_tokens, "offset",
         |  CASE WHEN n_tokens > 0 THEN "offset" // 256 END AS first_chunk,
         |  CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // 256 END AS last_chunk,
         |  CAST(CASE WHEN n_tokens > 0
         |    THEN ("offset" + n_tokens - 1) // 256 - "offset" // 256 + 1
         |    ELSE 0 END AS BIGINT) AS n_chunks
         |FROM o""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.Packing.concatChunkPlacement(docs, "doc_id", "n_tokens",
        capacity = 256, groupOf = expr("doc_id div 64"))
        .select(col("doc_id"), col("n_tokens"), col("offset"),
          col("first_chunk"), col("last_chunk"), col("n_chunks"))
    },

    // q98: sliding-window chunking with overlap ([[graft.operators
    // .Packing.slidingChunks]]) — the retrieval/eval-window shape
    // (width 32, stride 16 ⇒ 16-token overlap), vs q75/q80's
    // concat-and-chunk. Pure map-side generator, no shuffle; the
    // oracle replays window starts via generate_series and pins each
    // window's content by md5. Chunk count per doc = ⌈n/16⌉.
    QueryDef.sql(
      "q98_sliding_chunks",
      s"""WITH t AS (
         |  SELECT doc_id, $T AS tk, CAST(len($T) AS BIGINT) AS n
         |  FROM documents WHERE len($T) > 0),
         |e AS (
         |  SELECT doc_id, tk, n,
         |    unnest(generate_series(0, (n - 1) // 16)) AS chunk_idx
         |  FROM t)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(chunk_idx * 16 AS BIGINT) AS start_token,
         |  CAST(least(32, n - chunk_idx * 16) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(
         |    list_slice(tk, chunk_idx * 16 + 1, least(chunk_idx * 16 + 32, n)),
         |    ' ')) AS chunk_fp
         |FROM e""".stripMargin) { (s, d) =>
      graft.operators.Packing.slidingChunks(
          Tables.documents(s, d), "doc_id", "text", width = 32, stride = 16)
        .withColumnRenamed("id", "doc_id")
    },

    // q76: Gopher-style repetition quality signals — duplicate-token
    // fraction, duplicate-3-gram fraction, top-token fraction — computed
    // RELATIONALLY (posting rows → per-doc aggregates; no per-element
    // array lambdas, which re-evaluate their inputs per element) and
    // rolled up per source with a flag rate at the published-style
    // thresholds (top token > 0.2, dup 3-grams > 0.3).
    QueryDef.sql(
      "q76_repetition_signals",
      s"""WITH toks AS (
         |  SELECT doc_id, source, $T AS tk FROM documents),
         |sh AS (
         |  SELECT doc_id, CASE WHEN len(tk) = 0 THEN []
         |    ELSE list_transform(generate_series(1, greatest(len(tk) - 2, 1)),
         |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])) END AS g
         |  FROM toks),
         |trows AS (SELECT doc_id, unnest(tk) AS t FROM toks),
         |tcounts AS (SELECT doc_id, t, count(*) AS cnt FROM trows GROUP BY doc_id, t),
         |tstats AS (
         |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok, count(*) AS n_tok_d,
         |    max(cnt) AS top_cnt
         |  FROM tcounts GROUP BY doc_id),
         |grows AS (SELECT doc_id, unnest(g) AS g FROM sh),
         |gstats AS (
         |  SELECT doc_id, count(*) AS n_g, count(DISTINCT g) AS n_g_d
         |  FROM grows GROUP BY doc_id),
         |per_doc AS (
         |  SELECT t.doc_id,
         |    1.0 - t.n_tok_d * 1.0 / t.n_tok AS dup_tok_frac,
         |    t.top_cnt * 1.0 / t.n_tok AS top_tok_frac,
         |    1.0 - g.n_g_d * 1.0 / g.n_g AS dup_3g_frac
         |  FROM tstats t JOIN gstats g USING (doc_id))
         |SELECT d.source, count(*) AS n_docs,
         |  floor(avg(p.dup_tok_frac) * 10000.0 + 0.5) / 10000.0 AS avg_dup_tok,
         |  floor(avg(p.top_tok_frac) * 10000.0 + 0.5) / 10000.0 AS avg_top_tok,
         |  floor(avg(p.dup_3g_frac) * 10000.0 + 0.5) / 10000.0 AS avg_dup_3g,
         |  CAST(sum(CASE WHEN p.top_tok_frac > 0.2 OR p.dup_3g_frac > 0.3
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         |FROM documents d JOIN per_doc p USING (doc_id)
         |GROUP BY d.source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val tokRows = docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("t"))
      val tstats = tokRows.groupBy("doc_id", "t").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(sum("cnt").as("n_tok"), count(lit(1)).as("n_tok_d"),
          max("cnt").as("top_cnt"))
      val gstats = Dedup.shinglePostings(docs, "doc_id", "text", None, 3)
        .groupBy("id")
        .agg(count(lit(1)).as("n_g"), countDistinct("shingle").as("n_g_d"))
        .withColumnRenamed("id", "doc_id")
      val perDoc = tstats.join(gstats, Seq("doc_id"))
        .select(col("doc_id"),
          (lit(1.0) - col("n_tok_d") / col("n_tok")).as("dup_tok_frac"),
          (col("top_cnt") / col("n_tok")).as("top_tok_frac"),
          (lit(1.0) - col("n_g_d") / col("n_g")).as("dup_3g_frac"))
      docs.join(perDoc, Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          TextFunctions.round4hu(avg("dup_tok_frac")).as("avg_dup_tok"),
          TextFunctions.round4hu(avg("top_tok_frac")).as("avg_top_tok"),
          TextFunctions.round4hu(avg("dup_3g_frac")).as("avg_dup_3g"),
          sum(when(col("top_tok_frac") > 0.2 || col("dup_3g_frac") > 0.3, 1L)
            .otherwise(0L)).as("n_flagged"))
    },

    // q77: segment-level exact dedup ([[graft.operators.Dedup.segmentDedup]]).
    // C4/RefinedWeb line dedup with a 16-token window segmenter (the
    // corpus has no newlines). The hash check covers the keep/drop
    // decision AND the reassembled text, so the digest-only shuffle path
    // is verified to rebuild exactly what the direct SQL computes.
    QueryDef.sql(
      "q77_segment_dedup",
      s"""WITH t AS (SELECT doc_id, $T AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, tk,
         |    unnest(generate_series(0, CAST(ceil(len(tk)/16.0) AS BIGINT) - 1)) AS idx
         |  FROM t WHERE len(tk) > 0),
         |s AS (
         |  SELECT doc_id, idx,
         |    array_to_string(tk[idx*16+1 : idx*16+16], ' ') AS seg
         |  FROM g),
         |k AS (
         |  SELECT doc_id, idx, seg,
         |    row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, idx) AS rn
         |  FROM s),
         |a AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    string_agg(seg, ' ' ORDER BY idx) AS kept_text
         |  FROM k WHERE rn = 1 GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(ceil(len($T)/16.0) AS BIGINT) AS n_segs,
         |  coalesce(a.n_kept, 0) AS n_kept,
         |  coalesce(a.kept_text, '') AS kept_text
         |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin) { (s, d) =>
      Dedup.segmentDedup(Tables.documents(s, d), "doc_id", "text", 16)
    },

    // q136: INTRA-document segment dedup ([[graft.operators.Dedup
    // .segmentDedupIntra]]) — q77's keep-first rule scoped per doc (the
    // C4 "drop repeated spans within a page" cleanup): self-repetition
    // goes, cross-doc sharing stays. One hash aggregate on (id, digest),
    // no window, embarrassingly parallel by doc.
    QueryDef.sql(
      "q136_segment_dedup_intra",
      s"""WITH t AS (SELECT doc_id, $T AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, tk,
         |    unnest(generate_series(0, CAST(ceil(len(tk)/16.0) AS BIGINT) - 1)) AS idx
         |  FROM t WHERE len(tk) > 0),
         |s AS (
         |  SELECT doc_id, idx,
         |    array_to_string(tk[idx*16+1 : idx*16+16], ' ') AS seg
         |  FROM g),
         |k AS (
         |  SELECT doc_id, idx, seg,
         |    row_number() OVER (PARTITION BY doc_id, md5(seg) ORDER BY idx) AS rn
         |  FROM s),
         |a AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    string_agg(seg, ' ' ORDER BY idx) AS kept_text
         |  FROM k WHERE rn = 1 GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(ceil(len($T)/16.0) AS BIGINT) AS n_segs,
         |  coalesce(a.n_kept, 0) AS n_kept,
         |  coalesce(a.kept_text, '') AS kept_text
         |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin) { (s, d) =>
      Dedup.segmentDedupIntra(Tables.documents(s, d), "doc_id", "text", 16)
    },

    // q78: token-budget source mixing ([[graft.operators.Packing
    // .takeTokenBudget]]) — the first 800 tokens of each source in doc
    // order, truncation-free. The oracle's one-window-per-source running
    // sum cross-validates the per-partition two-phase prefix sum.
    QueryDef.sql(
      "q78_token_budget_mix",
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($T) AS BIGINT) AS n_tokens
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS "offset"
         |  FROM t)
         |SELECT doc_id, source, n_tokens, "offset"
         |FROM o WHERE "offset" + n_tokens <= 800""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.Packing.takeTokenBudget(docs, "doc_id", "n_tokens",
        budget = 800, groupOf = expr("doc_id div 64"),
        partitionCols = Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("offset"))
    },

    // q80: the packed sequences themselves ([[graft.operators.Packing
    // .packChunks]]) — q75 verifies placement, this pins every chunk's
    // CONTENT: each token lands at its global position, chunks cut at
    // exactly 256, md5 of the space-joined chunk text hash-matched.
    QueryDef.sql(
      "q80_pack_chunks",
      s"""WITH t AS (SELECT doc_id, $T AS tk FROM documents),
         |c AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM t),
         |o AS (
         |  SELECT doc_id, tk, n,
         |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS off
         |  FROM c),
         |g AS (
         |  SELECT doc_id, off, unnest(generate_series(1, n)) AS i, tk
         |  FROM o WHERE n > 0),
         |tok AS (SELECT off + i - 1 AS gpos, tk[i] AS tok FROM g)
         |SELECT gpos // 256 AS chunk_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  md5(string_agg(tok, ' ' ORDER BY gpos)) AS chunk_fp
         |FROM tok GROUP BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      graft.operators.Packing.packChunks(docs, "doc_id", "tk",
        capacity = 256, groupOf = expr("doc_id div 64"))
    },

    // q81: seeded corpus shuffle + packing ([[graft.operators.Packing
    // .shuffledChunkPlacement]]) — the training order is the md5-keyed
    // permutation (seed "r8"), so the SAME docs land at DIFFERENT
    // offsets than q75's doc_id order; the oracle replays the identical
    // permutation (md5 hex sorts identically in both engines: pure
    // ASCII [0-9a-f]).
    QueryDef.sql(
      "q81_shuffled_packing",
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($T) AS BIGINT) AS n_tokens,
         |    md5('r8:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, n_tokens, shuffle_key,
         |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY shuffle_key
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS "offset"
         |  FROM t)
         |SELECT doc_id, n_tokens, shuffle_key, "offset",
         |  CASE WHEN n_tokens > 0 THEN "offset" // 256 END AS first_chunk,
         |  CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // 256 END AS last_chunk,
         |  CAST(CASE WHEN n_tokens > 0
         |    THEN ("offset" + n_tokens - 1) // 256 - "offset" // 256 + 1
         |    ELSE 0 END AS BIGINT) AS n_chunks
         |FROM o""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.Packing.shuffledChunkPlacement(docs, "doc_id",
        "n_tokens", capacity = 256, seed = "r8")
        .select(col("doc_id"), col("n_tokens"), col("shuffle_key"),
          col("offset"), col("first_chunk"), col("last_chunk"), col("n_chunks"))
    },

    // q82: cross-source segment overlap ([[graft.operators.Dedup
    // .segmentOverlapMatrix]]) — distinct 16-token segments shared by
    // each source pair. The engine joins digests; distinct-digest counts
    // equal distinct-segment counts (the established md5 convention).
    QueryDef.sql(
      "q82_source_overlap",
      s"""WITH t AS (SELECT doc_id, source, $T AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, source, tk,
         |    unnest(generate_series(0, CAST(ceil(len(tk)/16.0) AS BIGINT) - 1)) AS idx
         |  FROM t WHERE len(tk) > 0),
         |s AS (
         |  SELECT DISTINCT source,
         |    array_to_string(tk[idx*16+1 : idx*16+16], ' ') AS seg
         |  FROM g)
         |SELECT a.source AS block_a, b.source AS block_b,
         |  CAST(count(*) AS BIGINT) AS n_shared_segments
         |FROM s a JOIN s b ON a.seg = b.seg AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Dedup.segmentOverlapMatrix(Tables.documents(s, d),
        "doc_id", "text", "source", 16)
    },

    // q83: boilerplate strip ([[graft.operators.Dedup.stripBoilerplate]])
    // — EVERY occurrence of a segment seen in more than 2 docs is
    // removed (q77 keeps the first; the first copy of boilerplate is
    // still boilerplate). The hash check again covers the reassembled
    // text.
    QueryDef.sql(
      "q83_boilerplate_strip",
      s"""WITH t AS (SELECT doc_id, $T AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, tk,
         |    unnest(generate_series(0, CAST(ceil(len(tk)/16.0) AS BIGINT) - 1)) AS idx
         |  FROM t WHERE len(tk) > 0),
         |s AS (
         |  SELECT doc_id, idx,
         |    array_to_string(tk[idx*16+1 : idx*16+16], ' ') AS seg
         |  FROM g),
         |f AS (SELECT seg, count(DISTINCT doc_id) AS df FROM s GROUP BY seg),
         |a AS (
         |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    string_agg(s.seg, ' ' ORDER BY s.idx) AS kept_text
         |  FROM s JOIN f USING (seg) WHERE f.df <= 2 GROUP BY s.doc_id)
         |SELECT d.doc_id,
         |  CAST(ceil(len($T)/16.0) AS BIGINT) AS n_segs,
         |  coalesce(a.n_kept, 0) AS n_kept,
         |  coalesce(a.kept_text, '') AS kept_text
         |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin) { (s, d) =>
      Dedup.stripBoilerplate(Tables.documents(s, d), "doc_id", "text",
        width = 16, maxDf = 2)
    },

    // q84: curation funnel ([[graft.operators.Dedup.curationFunnel]]) —
    // strip (df > 2) then first-occurrence dedup, one pass over the
    // postings, survival counts per source. The oracle chains the same
    // two stages over one segmentation.
    QueryDef.sql(
      "q84_curation_funnel",
      s"""WITH t AS (SELECT doc_id, source, $T AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, source, tk,
         |    unnest(generate_series(0, CAST(ceil(len(tk)/16.0) AS BIGINT) - 1)) AS idx
         |  FROM t WHERE len(tk) > 0),
         |s AS (
         |  SELECT doc_id, source, idx,
         |    array_to_string(tk[idx*16+1 : idx*16+16], ' ') AS seg
         |  FROM g),
         |f AS (SELECT seg, count(DISTINCT doc_id) AS df FROM s GROUP BY seg),
         |stripped AS (
         |  SELECT s.doc_id, s.source, s.idx, s.seg
         |  FROM s JOIN f USING (seg) WHERE f.df <= 2),
         |deduped AS (
         |  SELECT source FROM (
         |    SELECT source,
         |      row_number() OVER (PARTITION BY seg ORDER BY doc_id, idx) AS rn
         |    FROM stripped) WHERE rn = 1),
         |c_docs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |           FROM documents GROUP BY source),
         |c_segs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_segs
         |           FROM s GROUP BY source),
         |c_strip AS (SELECT source, CAST(count(*) AS BIGINT) AS n_after_strip
         |            FROM stripped GROUP BY source),
         |c_dedup AS (SELECT source, CAST(count(*) AS BIGINT) AS n_after_dedup
         |            FROM deduped GROUP BY source)
         |SELECT d.source, d.n_docs,
         |  coalesce(a.n_segs, 0) AS n_segs,
         |  coalesce(b.n_after_strip, 0) AS n_after_strip,
         |  coalesce(c.n_after_dedup, 0) AS n_after_dedup
         |FROM c_docs d
         |LEFT JOIN c_segs a USING (source)
         |LEFT JOIN c_strip b USING (source)
         |LEFT JOIN c_dedup c USING (source)""".stripMargin) { (s, d) =>
      Dedup.curationFunnel(Tables.documents(s, d), "doc_id", "text",
        "source", width = 16, maxDf = 2)
    },

    QueryDef.sql("q61_subword_pieces", q61Sql) { (s, d) =>
      // project the piece count ONCE (the codegen'd SubwordPieceCount
      // static call), then aggregate the materialized column — referencing
      // the expression from all three aggregates would re-tokenize the
      // text per reference
      Tables.documents(s, d)
        .select(col("lang"),
          // NULL text counts as 0 pieces, matching the oracle's
          // LEFT JOIN + coalesce over the word CTE (a null-skipping
          // avg/max would diverge on corpora with null documents)
          coalesce(graft.plans.SubwordExpression.subwordPieces(col("text")),
            lit(0L)).as("pieces"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("pieces").cast("long").as("total_pieces"),
          max("pieces").cast("long").as("max_pieces"),
          TextFunctions.round4hu(avg(col("pieces").cast("double"))).as("avg_pieces"))
    },

    // q126: maximal shared token spans ([[graft.operators.Dedup
    // .sharedSpans]]) — exact-substring copy detection, relationally:
    // stride-1 8-gram digests, df-capped (2..50), pair-joined, grouped
    // along diagonals (pb − pa) into maximal runs; spans ≥ 12 tokens.
    // The testdata holds real verbatim copies (93-token spans at
    // sf0.01) — the hash pins every span's exact offsets and length.
    QueryDef.sql(
      "q126_shared_spans",
      s"""WITH t AS (SELECT doc_id, $T AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    md5(array_to_string(tk[i:i+7], ' ')) AS g
         |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
         |        FROM t WHERE len(tk) >= 8)),
         |keep AS (
         |  SELECT g.doc_id, g.pos, g.g FROM g
         |  JOIN (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g) f
         |    ON g.g = f.g WHERE f.df BETWEEN 2 AND 50),
         |m AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
         |    b.pos AS pb, b.pos - a.pos AS d
         |  FROM keep a JOIN keep b ON a.g = b.g AND a.doc_id < b.doc_id),
         |r AS (
         |  SELECT *, pa - row_number() OVER (
         |    PARTITION BY id_a, id_b, d ORDER BY pa) AS run
         |  FROM m)
         |SELECT id_a, id_b, CAST(min(pa) AS BIGINT) AS start_a,
         |  CAST(min(pb) AS BIGINT) AS start_b,
         |  CAST(max(pa) - min(pa) + 8 AS BIGINT) AS span_tokens
         |FROM r GROUP BY id_a, id_b, d, run
         |HAVING max(pa) - min(pa) + 8 >= 12""".stripMargin) { (s, d) =>
      Dedup.sharedSpans(Tables.documents(s, d), "doc_id", "text",
        w = 8, maxGramDf = 50, minSpan = 12)
    },

    // q127: span removal ([[graft.operators.Dedup.removeSpans]]) — the
    // rewrite half of q126 (Lee et al. 2022: keep ONE occurrence of each
    // duplicated span): every doc appearing as id_b loses its
    // [start_b, start_b+span) interval, overlapping cuts union per doc
    // (islands merge), text rebuilt map-side from surviving positions.
    // The hash pins every doc's exact surviving text + removal counts.
    QueryDef.sql(
      "q127_span_removal",
      s"""WITH t AS (SELECT doc_id, $T AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    md5(array_to_string(tk[i:i+7], ' ')) AS g
         |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
         |        FROM t WHERE len(tk) >= 8)),
         |kg AS (
         |  SELECT g.doc_id, g.pos, g.g FROM g
         |  JOIN (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g) f
         |    ON g.g = f.g WHERE f.df BETWEEN 2 AND 50),
         |m AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
         |    b.pos AS pb, b.pos - a.pos AS d
         |  FROM kg a JOIN kg b ON a.g = b.g AND a.doc_id < b.doc_id),
         |r AS (
         |  SELECT *, pa - row_number() OVER (
         |    PARTITION BY id_a, id_b, d ORDER BY pa) AS run
         |  FROM m),
         |sp AS (
         |  SELECT id_b, min(pb) AS start_b,
         |    max(pa) - min(pa) + 8 AS span_tokens
         |  FROM r GROUP BY id_a, id_b, d, run
         |  HAVING max(pa) - min(pa) + 8 >= 12),
         |iv AS (SELECT id_b AS doc_id, start_b AS s,
         |       start_b + span_tokens AS e FROM sp),
         |mk AS (
         |  SELECT doc_id, s, e, max(e) OVER (
         |    PARTITION BY doc_id ORDER BY s, e
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM iv),
         |isl AS (
         |  SELECT doc_id, s, e,
         |    sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
         |  FROM mk),
         |mg AS (SELECT doc_id, min(s) AS s, max(e) AS e
         |       FROM isl GROUP BY doc_id, grp),
         |pos AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i
         |        FROM t WHERE len(tk) > 0),
         |kp AS (
         |  SELECT p.doc_id, p.i, p.tk[p.i] AS tok FROM pos p
         |  WHERE NOT EXISTS (SELECT 1 FROM mg
         |    WHERE mg.doc_id = p.doc_id AND p.i - 1 >= mg.s AND p.i - 1 < mg.e)),
         |ag AS (SELECT doc_id, count(*) AS n_kept,
         |       string_agg(tok, ' ' ORDER BY i) AS kept_text
         |       FROM kp GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
         |  CAST(len(t.tk) - coalesce(ag.n_kept, 0) AS BIGINT) AS n_removed,
         |  coalesce(ag.kept_text, '') AS kept_text
         |FROM t LEFT JOIN ag ON t.doc_id = ag.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.removeSpans(docs, "doc_id", "text",
        Dedup.sharedSpans(docs, "doc_id", "text",
          w = 8, maxGramDf = 50, minSpan = 12))
    },

    // q130: top shared passages ([[graft.operators.Dedup
    // .topSharedPassages]]) — q126's span table rolled up by passage
    // CONTENT: the k most-duplicated passages with instance and holder
    // counts, ranked (n_spans desc, passage) — a total order under
    // LIMIT. The curator-facing datasheet view of the copy mass.
    QueryDef.sql(
      "q130_top_passages",
      s"""WITH t AS (SELECT doc_id, $T AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    md5(array_to_string(tk[i:i+7], ' ')) AS g
         |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
         |        FROM t WHERE len(tk) >= 8)),
         |kg AS (
         |  SELECT g.doc_id, g.pos, g.g FROM g
         |  JOIN (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g) f
         |    ON g.g = f.g WHERE f.df BETWEEN 2 AND 50),
         |m AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
         |    b.pos AS pb, b.pos - a.pos AS d
         |  FROM kg a JOIN kg b ON a.g = b.g AND a.doc_id < b.doc_id),
         |r AS (
         |  SELECT *, pa - row_number() OVER (
         |    PARTITION BY id_a, id_b, d ORDER BY pa) AS run
         |  FROM m),
         |sp AS (
         |  SELECT id_a, id_b, min(pa) AS start_a,
         |    max(pa) - min(pa) + 8 AS span_tokens
         |  FROM r GROUP BY id_a, id_b, d, run
         |  HAVING max(pa) - min(pa) + 8 >= 12),
         |px AS (
         |  SELECT array_to_string(
         |      t.tk[sp.start_a + 1 : sp.start_a + sp.span_tokens], ' ')
         |      AS passage,
         |    sp.span_tokens, unnest([sp.id_a, sp.id_b]) AS d
         |  FROM sp JOIN t ON t.doc_id = sp.id_a)
         |SELECT passage, CAST(max(span_tokens) AS BIGINT) AS span_tokens,
         |  CAST(count(*) // 2 AS BIGINT) AS n_spans,
         |  CAST(count(DISTINCT d) AS BIGINT) AS n_docs
         |FROM px GROUP BY passage
         |ORDER BY n_spans DESC, passage LIMIT 10""".stripMargin) { (s, d) =>
      Dedup.topSharedPassages(Tables.documents(s, d), "doc_id", "text",
        w = 8, maxGramDf = 50, minSpan = 12, k = 10)
    },

    // q131: quality-aware dedup representatives ([[graft.operators
    // .Dedup.dedupByPairsBest]]) — q126's span pairs become clusters
    // (transitive closure), and each cluster keeps its BEST member by
    // q97's integer classifier score (id tiebreak) instead of min-id.
    // Oracle: recursive-CTE closure (q55 precedent) + row_number argmax.
    QueryDef.sql(
      "q131_best_rep_dedup",
      s"""WITH RECURSIVE t AS (SELECT doc_id, $T AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    md5(array_to_string(tk[i:i+7], ' ')) AS g
         |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
         |        FROM t WHERE len(tk) >= 8)),
         |kg AS (
         |  SELECT g.doc_id, g.pos, g.g FROM g
         |  JOIN (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g) f
         |    ON g.g = f.g WHERE f.df BETWEEN 2 AND 50),
         |m AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
         |    b.pos AS pb, b.pos - a.pos AS d
         |  FROM kg a JOIN kg b ON a.g = b.g AND a.doc_id < b.doc_id),
         |r AS (
         |  SELECT *, pa - row_number() OVER (
         |    PARTITION BY id_a, id_b, d ORDER BY pa) AS run
         |  FROM m),
         |sp2 AS (
         |  SELECT id_a, id_b
         |  FROM r GROUP BY id_a, id_b, d, run
         |  HAVING max(pa) - min(pa) + 8 >= 12),
         |e AS (SELECT DISTINCT id_a AS src, id_b AS dst FROM sp2),
         |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |nodes AS (SELECT DISTINCT src AS id FROM sym),
         |reach(id, rr) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT s.dst, reach.rr FROM reach JOIN sym s ON s.src = reach.id),
         |cmp AS (SELECT id, min(rr) AS comp FROM reach GROUP BY id),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(-3000000 - 40000*len($T) + 200000*len(list_distinct($T))
         |      + 2000*len(regexp_replace(text, '\\s', '', 'g'))
         |      + 300000*len(list_filter($T,
         |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS BIGINT) AS s
         |  FROM documents),
         |lab AS (
         |  SELECT sc.doc_id, coalesce(cmp.comp, sc.doc_id) AS comp, sc.s
         |  FROM sc LEFT JOIN cmp ON sc.doc_id = cmp.id),
         |rk AS (
         |  SELECT doc_id, comp, s, row_number() OVER (
         |    PARTITION BY comp ORDER BY s DESC, doc_id) AS rn
         |  FROM lab)
         |SELECT doc_id, CAST(s AS BIGINT) AS score_micro
         |FROM rk WHERE rn = 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = Classifier.qualityClassify(
          docs.select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("score_micro"))
      val pairs = Dedup.sharedSpans(docs, "doc_id", "text",
        w = 8, maxGramDf = 50, minSpan = 12).select("id_a", "id_b")
      Dedup.dedupByPairsBest(scored, "doc_id", "score_micro", pairs)
    },

    // q125: chunk-boundary table ([[graft.operators.Packing
    // .chunkBoundaries]]) — the attention-mask metadata for q80's packed
    // chunks: one row per (chunk, doc) with the doc's span inside the
    // chunk (chunks cross document boundaries by design; the trainer
    // masks cross-doc attention at exactly these spans). Same prefix
    // sum as q75, then a map-side sequence explode; Σ n_in_chunk per
    // chunk equals q80's chunk token counts (spec-pinned).
    QueryDef.sql(
      "q125_chunk_boundaries",
      s"""WITH t AS (SELECT doc_id, CAST(len($T) AS BIGINT) AS n_tokens
         |           FROM documents),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS off
         |  FROM t),
         |s AS (
         |  SELECT doc_id, n_tokens, off,
         |    unnest(generate_series(off // 256, (off + n_tokens - 1) // 256))
         |      AS chunk_id
         |  FROM o WHERE n_tokens > 0)
         |SELECT doc_id, n_tokens, chunk_id,
         |  CAST(greatest(off, chunk_id * 256) - chunk_id * 256 AS BIGINT)
         |    AS start_in_chunk,
         |  CAST(least(off + n_tokens, (chunk_id + 1) * 256)
         |    - greatest(off, chunk_id * 256) AS BIGINT) AS n_in_chunk
         |FROM s""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.Packing.chunkBoundaries(docs, "doc_id", "n_tokens",
          capacity = 256, groupOf = expr("doc_id div 64"))
        .select("doc_id", "n_tokens", "chunk_id", "start_in_chunk", "n_in_chunk")
    },

    // q93: shard manifest ([[graft.operators.Packing.shardManifest]]) —
    // q80's packed chunks grouped into 4-chunk training shards, each
    // shard's content pinned by a fingerprint of its chunk fingerprints
    // in chunk order. The audit record for the written shard files
    // (Packing.writeShards, layout spec-pinned): a trainer verifies a
    // shard byte-for-byte without re-deriving the packing.
    QueryDef.sql(
      "q93_shard_manifest",
      s"""WITH t AS (SELECT doc_id, $T AS tk FROM documents),
         |c AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM t),
         |o AS (
         |  SELECT doc_id, tk, n,
         |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS off
         |  FROM c),
         |g AS (
         |  SELECT doc_id, off, unnest(generate_series(1, n)) AS i, tk
         |  FROM o WHERE n > 0),
         |tok AS (SELECT off + i - 1 AS gpos, tk[i] AS tok FROM g),
         |chunks AS (
         |  SELECT gpos // 256 AS chunk_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    md5(string_agg(tok, ' ' ORDER BY gpos)) AS chunk_fp
         |  FROM tok GROUP BY 1)
         |SELECT chunk_id // 4 AS shard_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  md5(string_agg(chunk_fp, ' ' ORDER BY chunk_id)) AS shard_fp
         |FROM chunks GROUP BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      graft.operators.Packing.shardManifest(
        graft.operators.Packing.packChunks(docs, "doc_id", "tk",
          capacity = 256, groupOf = expr("doc_id div 64")),
        chunksPerShard = 4)
    },

    // q138: shard read-back integrity audit ([[graft.operators.Packing
    // .auditShards]]) — the verification half of q93's manifest
    // contract, exercised end to end: write the q93 shards with
    // writeShards, re-read the files, recompute each shard's count/
    // token/fingerprint record from what is on disk, and compare with
    // the manifest. The oracle replays the manifest from `documents`
    // alone and asserts every match flag TRUE — so a hash match here
    // proves the Spark write→read→recompute round trip preserved every
    // chunk bit-for-bit, not merely that two in-memory frames agree.
    QueryDef.sql(
      "q138_shard_audit",
      s"""WITH t AS (SELECT doc_id, $T AS tk FROM documents),
         |c AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM t),
         |o AS (
         |  SELECT doc_id, tk, n,
         |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS off
         |  FROM c),
         |g AS (
         |  SELECT doc_id, off, unnest(generate_series(1, n)) AS i, tk
         |  FROM o WHERE n > 0),
         |tok AS (SELECT off + i - 1 AS gpos, tk[i] AS tok FROM g),
         |chunks AS (
         |  SELECT gpos // 256 AS chunk_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    md5(string_agg(tok, ' ' ORDER BY gpos)) AS chunk_fp
         |  FROM tok GROUP BY 1)
         |SELECT chunk_id // 4 AS shard_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  md5(string_agg(chunk_fp, ' ' ORDER BY chunk_id)) AS shard_fp,
         |  true AS chunks_match, true AS tokens_match, true AS fp_match
         |FROM chunks GROUP BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      // TWO consumers (writeShards + shardManifest) — checkpoint the
      // packed chunks once so the prefix-sum subtree computes once (the
      // q95/BPE/CC diamond rule). Measured PARITY at sf0.1 (5.4 s both
      // ways — the per-shard-directory write overhead dominates at toy
      // scale, stage profile in PERF_NOTES), but at corpus scale the
      // packing subtree is the corpus-sized cost and the write
      // amortizes, so the bounded shape is the right default.
      val chunks = graft.operators.Packing.packChunks(docs, "doc_id", "tk",
        capacity = 256, groupOf = expr("doc_id div 64")).localCheckpoint()
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_shard_audit/" +
        new java.io.File(d).getName
      graft.operators.Packing.writeShards(chunks, dir, chunksPerShard = 4)
      graft.operators.Packing.auditShards(s, dir,
        graft.operators.Packing.shardManifest(chunks, chunksPerShard = 4))
    },

    // q143: Jaccard similarity-band histogram ([[graft.operators.Dedup
    // .jaccardBandHistogram]]) — the view that CHOOSES the near-dup
    // threshold (q35 reports pair counts at a FIXED 0.5 cut; this
    // shows the whole distribution). Band edges are exact integers
    // from the pair frame's counts — (n_shared·10) div union — never
    // the float jaccard; band 10 is exactly j = 1. One hash aggregate
    // over the df-capped candidate pairs.
    QueryDef.sql(
      "q143_jaccard_bands",
      s"""WITH toks AS (
         |  SELECT doc_id, source, $T AS tk FROM documents),
         |sh AS (
         |  SELECT doc_id, source,
         |    CASE WHEN len(tk) = 0 THEN []
         |         ELSE list_distinct(list_transform(generate_series(1, greatest(len(tk) - 2, 1)),
         |           i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS shingles
         |  FROM toks),
         |sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
         |postings AS (SELECT doc_id, source, unnest(shingles) AS shingle FROM sh),
         |rare AS (
         |  SELECT source, shingle FROM postings
         |  GROUP BY source, shingle HAVING count(*) <= 1000),
         |kept AS (SELECT p.* FROM postings p JOIN rare r USING (source, shingle)),
         |pairs AS (
         |  SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM kept a JOIN kept b
         |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3),
         |banded AS (
         |  SELECT p.source,
         |    CAST((p.n_shared * 10) // (sa.n_sh + sb.n_sh - p.n_shared)
         |      AS BIGINT) AS band
         |  FROM pairs p
         |  JOIN sizes sa ON p.id_a = sa.doc_id
         |  JOIN sizes sb ON p.id_b = sb.doc_id)
         |SELECT source AS block, band, CAST(band * 1000 AS BIGINT) AS band_lo_bp,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM banded GROUP BY 1, 2""".stripMargin) { (s, d) =>
      graft.operators.Dedup.jaccardBandHistogram(
        graft.operators.Dedup.ngramJaccardPairs(
          Tables.documents(s, d), "doc_id", "text", "source"))
    },

    // q148: top collocations by PMI ([[graft.operators.Profile
    // .pmiCollocations]]) — which adjacent pairs co-occur far beyond
    // chance (Church & Hanks 1990): the datasheet's multiword-term /
    // templated-phrase view, and phrase-vocabulary input for tokenizer
    // planning. Exact BIGINT counts feed ONE double ln quantized to
    // micro-nats (the BM25 idf convention, identical arithmetic text on
    // both engines); Nb totals are taken BEFORE the min-count floor;
    // top-50 under the total order (pmi desc, w1, w2).
    QueryDef.sql(
      "q148_pmi_collocations",
      s"""WITH tk AS (SELECT $T AS t FROM documents),
         |uc AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(t) AS w FROM tk) GROUP BY w),
         |bc AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair FROM (
         |    SELECT t[i] AS w1, t[i + 1] AS w2
         |    FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
         |          FROM tk WHERE len(t) >= 2))
         |  GROUP BY 1, 2),
         |nb AS (SELECT CAST(sum(n_pair) AS BIGINT) AS nb FROM bc),
         |nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uc),
         |j AS (
         |  SELECT b.w1, b.w2, b.n_pair,
         |    CAST(floor(ln((CAST(b.n_pair AS DOUBLE) * CAST(nu.nu AS DOUBLE) * CAST(nu.nu AS DOUBLE))
         |        / (CAST(nb.nb AS DOUBLE) * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)))
         |      * 1000000.0 + 0.5) AS BIGINT) AS pmi_u
         |  FROM bc b JOIN uc u1 ON b.w1 = u1.w JOIN uc u2 ON b.w2 = u2.w
         |  CROSS JOIN nb CROSS JOIN nu
         |  WHERE b.n_pair >= 5)
         |SELECT w1, w2, n_pair, pmi_u FROM j
         |ORDER BY pmi_u DESC, w1, w2 LIMIT 50""".stripMargin) { (s, d) =>
      graft.operators.Profile.pmiCollocations(Tables.documents(s, d))
    },

    // q154: per-source Zipf slope ([[graft.operators.Profile
    // .zipfSlope]]) — the datasheet's rank-frequency-law health number
    // (slope ≈ −10⁶ micro-units for natural text; flat = templated
    // head, steep = vocabulary collapse). Exact-integer OLS over the
    // top-256 tokens per source: ln(rank)/ln(freq) floored to
    // micro-nats, BIGINT sums, ONE double division via
    // [[Profile.ZipfSlopeExprSql]] verbatim on both engines. The Spark
    // side cuts top-k by a bounded-heap frequency THRESHOLD (no
    // full-vocabulary window); the oracle's plain row_number produces
    // the identical set.
    QueryDef.sql(
      "q154_zipf_slope",
      s"""WITH tc AS (
         |  SELECT source, t AS token, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT source, unnest($T) AS t FROM documents)
         |  GROUP BY source, t),
         |rk AS (
         |  SELECT source, freq,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY freq DESC, token) AS rnk
         |  FROM tc),
         |f AS (
         |  SELECT source,
         |    CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
         |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
         |  FROM rk WHERE rnk <= 256),
         |s AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM f GROUP BY source)
         |SELECT source, n AS n_fit, ${graft.operators.Profile.ZipfSlopeExprSql}
         |FROM s""".stripMargin) { (s, d) =>
      graft.operators.Profile.zipfSlope(Tables.documents(s, d))
    },

    // q155: per-document trigram novelty ([[graft.operators.Profile
    // .trigramNovelty]]) — the fraction of a doc's distinct 3-shingles
    // appearing in NO other document, in basis points: the
    // inverse-boilerplate number (q77/q130 count what's shared; this
    // folds what ISN'T to one per-doc signal). Same shingle convention
    // as the MinHash family (distinct per doc, so df is a plain count);
    // empty docs report zeros via the left join.
    QueryDef.sql(
      "q155_trigram_novelty",
      s"""WITH toks AS (SELECT doc_id, $T AS tk FROM documents),
         |sh AS (SELECT doc_id, $ShinglesSql AS shingles FROM toks),
         |post AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |dfc AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY s),
         |per AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
         |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
         |  FROM post JOIN dfc USING (s) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(p.n_tri, 0) AS n_tri,
         |  coalesce(p.n_unique, 0) AS n_unique,
         |  CAST(coalesce(p.n_unique, 0) * 10000
         |    // greatest(coalesce(p.n_tri, 0), 1) AS BIGINT) AS novelty_bp
         |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id""".stripMargin) { (s, d) =>
      graft.operators.Profile.trigramNovelty(Tables.documents(s, d))
        .withColumnRenamed("id", "doc_id")
    },

    // q162: per-source Herdan/Heaps' law exponent ([[graft.operators
    // .Profile.herdanSlope]]) — q154's companion: Zipf reads the
    // aggregate vocabulary's frequency law, this reads how vocabulary
    // SCALES with document length (V ≈ K·N^β; β→1 = id/hash noise,
    // β→0 = templated collapse). Per-doc token/type counts are pure
    // array projections (no explode), ONE hash aggregate per source
    // over micro-nat OLS sums, slope via [[Profile.olsSlopeMicroSql]]
    // verbatim on both engines.
    QueryDef.sql(
      "q162_herdan_exponent",
      s"""WITH c AS (
         |  SELECT source,
         |    CAST(len($T) AS BIGINT) AS nt,
         |    CAST(len(list_distinct($T)) AS BIGINT) AS nv
         |  FROM documents),
         |f AS (
         |  SELECT source,
         |    CAST(floor(ln(CAST(nt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
         |    CAST(floor(ln(CAST(nv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
         |  FROM c WHERE nt >= 1),
         |s AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM f GROUP BY source)
         |SELECT source, n AS n_fit,
         |  ${graft.operators.Profile.olsSlopeMicroSql("herdan_slope_micro")}
         |FROM s""".stripMargin) { (s, d) =>
      graft.operators.Profile.herdanSlope(Tables.documents(s, d))
    },

    // q174: per-source Flesch reading-ease ([[graft.operators.Profile
    // .readabilityStats]], Flesch 1948) — the readability axis next to
    // lexical diversity (q122): sentences = [.!?]+ runs, syllables =
    // per-word vowel-group counts via the collapse trick
    // len(replace(p,'#')) − len(replace(p,'')), micro-unit Flesch in
    // exact integers (both div remainders deterministic). Null text
    // folds to the empty-doc sentinel (w=1, s=1, syl=0), the q141
    // convention. One map-side projection (array fold, no explode) +
    // one hash aggregate per source.
    QueryDef.sql(
      "q174_readability",
      s"""WITH per AS (
         |  SELECT source,
         |    greatest(CAST(len($TC) AS BIGINT), 1) AS w,
         |    greatest(
         |      CAST(len(regexp_replace(coalesce(text, ''), '[.!?]+', '#', 'g')) AS BIGINT)
         |      - CAST(len(regexp_replace(coalesce(text, ''), '[.!?]+', '', 'g')) AS BIGINT),
         |      1) AS s,
         |    CAST(coalesce(list_sum(list_transform($TC, wd -> greatest(
         |      len(regexp_replace(lower(wd), '[aeiouy]+', '#', 'g'))
         |      - len(regexp_replace(lower(wd), '[aeiouy]+', '', 'g')), 1))), 0)
         |      AS BIGINT) AS syl
         |  FROM documents),
         |f AS (SELECT source,
         |        206835000 - (1015000 * w) // s - (84600000 * syl) // w
         |          AS flesch_u
         |      FROM per)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(flesch_u) // count(*) AS BIGINT) AS avg_flesch_u,
         |  CAST(sum(CASE WHEN flesch_u >= 60000000 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_easy,
         |  CAST(sum(CASE WHEN flesch_u < 30000000 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hard
         |FROM f GROUP BY source""".stripMargin) { (s, d) =>
      graft.operators.Profile.readabilityStats(
        Tables.documents(s, d), "source", "text")
    },

    // q180: Gopher CHARACTER-fraction repetition signals ([[graft
    // .operators.Profile.repetitionStats]], Rae et al. 2021 Table A1) —
    // the paper's char-mass form next to q76's token-fraction form: top
    // token fraction, top word-2-gram CHARACTER fraction (count × gram
    // chars over total chars — the published 0.20 cut point), duplicate
    // 5-gram fraction, all exact-integer basis points. Where q76 goes
    // through posting rows (explode → per-doc aggregates), this shape
    // is ALL map-side: a run-length fold over each doc's sorted gram
    // array — no explode, no per-gram shuffle rows; the only exchange
    // carries ≤|sources| rows. Two implementations, two signal sets,
    // one filter family.
    QueryDef.sql(
      "q180_repetition_char_fractions",
      s"""WITH tk AS (
         |  SELECT doc_id, source, $TC AS toks,
         |    greatest(CAST(len(coalesce(text, '')) AS BIGINT), 1) AS nc
         |  FROM documents),
         |d AS (SELECT doc_id, source, nc,
         |  greatest(CAST(len(toks) AS BIGINT), 1) AS nt, toks,
         |  list_transform(range(1, CAST(len(toks) AS INTEGER)),
         |    i -> toks[i] || ' ' || toks[i + 1]) AS g2,
         |  CASE WHEN len(toks) >= 5 THEN
         |    list_transform(range(1, CAST(len(toks) AS INTEGER) - 3),
         |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
         |        || ' ' || toks[i + 3] || ' ' || toks[i + 4])
         |  ELSE [] END AS g5
         |  FROM tk),
         |t1 AS (SELECT doc_id, cnt FROM (
         |    SELECT doc_id, g, count(*) AS cnt,
         |      row_number() OVER (PARTITION BY doc_id
         |        ORDER BY count(*) DESC, len(g) DESC, g ASC) AS rn
         |    FROM (SELECT doc_id, unnest(toks) AS g FROM d) GROUP BY doc_id, g)
         |  WHERE rn = 1),
         |t2 AS (SELECT doc_id, cnt, CAST(len(g) AS BIGINT) AS glen FROM (
         |    SELECT doc_id, g, count(*) AS cnt,
         |      row_number() OVER (PARTITION BY doc_id
         |        ORDER BY count(*) DESC, len(g) DESC, g ASC) AS rn
         |    FROM (SELECT doc_id, unnest(g2) AS g FROM d) GROUP BY doc_id, g)
         |  WHERE rn = 1),
         |d5 AS (SELECT doc_id, CAST(len(g5) AS BIGINT) AS n5,
         |    CAST(len(list_distinct(g5)) AS BIGINT) AS nd5 FROM d),
         |per AS (
         |  SELECT d.source,
         |    (coalesce(t1.cnt, 0) * 10000) // d.nt AS top1_bp,
         |    (coalesce(t2.cnt * t2.glen, 0) * 10000) // d.nc AS top2_char_bp,
         |    CASE WHEN d5.n5 = 0 THEN 0
         |         ELSE ((d5.n5 - d5.nd5) * 10000) // d5.n5 END AS dup5_bp
         |  FROM d LEFT JOIN t1 USING (doc_id) LEFT JOIN t2 USING (doc_id)
         |    JOIN d5 USING (doc_id))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(top1_bp) // count(*) AS BIGINT) AS avg_top1_bp,
         |  CAST(sum(top2_char_bp) // count(*) AS BIGINT) AS avg_top2_char_bp,
         |  CAST(sum(dup5_bp) // count(*) AS BIGINT) AS avg_dup5_bp,
         |  CAST(sum(CASE WHEN top2_char_bp > 2000 OR dup5_bp > 1500
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         |FROM per GROUP BY source""".stripMargin) { (s, d) =>
      graft.operators.Profile.repetitionStats(
        Tables.documents(s, d), "source", "text")
    },

    // q186: length-bucketed batching with padding-waste accounting
    // ([[graft.operators.Packing.lengthBucketBatches]]) — the
    // dynamic-padding loader prep next to q75's concat-and-chunk: docs
    // stay WHOLE, similar lengths batch together under the portable
    // md5 pseudo-shuffle, each batch pads only to its own max. One
    // exchange on the bucket key (the row_number window partitions by
    // bucket — never a global sort), one (bucket, batch) aggregate,
    // one ≤|buckets|-row rollup; waste_bp is exact integers.
    QueryDef.sql(
      "q186_length_bucket_batches",
      s"""WITH per AS (
         |  SELECT doc_id AS id, CAST(len($TC) AS BIGINT) AS len
         |  FROM documents),
         |b AS (SELECT id, len, len // 16 AS bucket FROM per),
         |r AS (SELECT id, len, bucket,
         |    (row_number() OVER (PARTITION BY bucket
         |      ORDER BY md5(CAST(id AS VARCHAR)) ASC, id ASC) - 1) // 8
         |      AS batch
         |  FROM b),
         |pb AS (SELECT bucket, batch, CAST(count(*) AS BIGINT) AS nr,
         |    CAST(sum(len) AS BIGINT) AS tokens,
         |    CAST(max(len) AS BIGINT) AS maxlen
         |  FROM r GROUP BY bucket, batch)
         |SELECT bucket, CAST(sum(nr) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_batches,
         |  CAST(sum(tokens) AS BIGINT) AS token_volume,
         |  CAST(sum(maxlen * nr) AS BIGINT) AS padded_volume,
         |  ((CAST(sum(maxlen * nr) AS BIGINT) - CAST(sum(tokens) AS BIGINT))
         |    * 10000) // greatest(CAST(sum(maxlen * nr) AS BIGINT), 1)
         |    AS waste_bp
         |FROM pb GROUP BY bucket""".stripMargin) { (s, d) =>
      graft.operators.Packing.lengthBucketBatches(
        Tables.documents(s, d), "doc_id", "text",
        bucketWidth = 16, batchSize = 8)
    },

    // q187: feature-hashed bag-of-words similarity ([[graft.operators
    // .TfIdf.hashedBowTopK]], Weinberger et al. ICML 2009) — the
    // model-free text→vector bridge: every token occurrence lands in
    // one of 64 signed buckets off the portable md5 hash, and cosine is
    // computed RELATIONALLY from the sparse bucket sums (dot over the
    // shared-bucket join with the query side broadcast, norms per-doc)
    // — exact integers until the final divide-and-round, no dense
    // vector ever materialized, per-doc wire capped at dim rows.
    QueryDef.sql(
      "q187_feature_hash_ann",
      s"""WITH th AS (
         |  SELECT id, CAST(concat('0x', substring(md5(t), 1, 8)) AS BIGINT) AS h
         |  FROM (SELECT doc_id AS id, unnest($TC) AS t FROM documents)),
         |bs AS (
         |  SELECT id, h % 64 AS b,
         |    CAST(sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END)
         |      AS BIGINT) AS w
         |  FROM th GROUP BY id, h % 64
         |  HAVING sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) <> 0),
         |nrm AS (SELECT id, CAST(sum(w * w) AS BIGINT) AS n2 FROM bs GROUP BY id),
         |qb AS (SELECT id AS qid, b, w AS qw FROM bs WHERE id < 3),
         |dot AS (SELECT qid, c.id AS nid, CAST(sum(qw * c.w) AS BIGINT) AS dp
         |  FROM qb JOIN bs c USING (b) WHERE qid <> c.id GROUP BY qid, c.id),
         |sc AS (SELECT qid, nid,
         |    CAST(dp AS DOUBLE)
         |      / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
         |      AS cos
         |  FROM dot JOIN nrm qn ON qn.id = dot.qid
         |  JOIN nrm cn ON cn.id = dot.nid)
         |SELECT qid, nid, floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine, rank
         |FROM (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid
         |        ORDER BY cos DESC, nid) AS rank FROM sc)
         |WHERE rank <= 5""".stripMargin) { (s, d) =>
      graft.operators.TfIdf.hashedBowTopK(
        Tables.documents(s, d), "doc_id", "text",
        queryMaxId = 3L, dim = 64, k = 5)
    },

    // q188: hashed-BOW calibration curve ([[graft.operators.TfIdf
    // .hashedBowPairCosines]]) — the evaluation half of q187: over a
    // bounded 500-doc slice, every pair's hashed cosine (exact
    // micro-units) bucketed by its EXACT 3-gram Jaccard band — does
    // the cheap vectorizer order pairs the way lexical truth does?
    // The q137/q142-style measurement query: all frames bounded by the
    // slice contract, the only corpus-shaped work is the slice's own
    // shingle postings.
    QueryDef.sql(
      "q188_feature_hash_calibration",
      s"""WITH d AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 500),
         |th AS (SELECT id,
         |    CAST(concat('0x', substring(md5(t), 1, 8)) AS BIGINT) AS h
         |  FROM (SELECT id, unnest(
         |    list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
         |      x -> len(x) > 0)) AS t FROM d)),
         |bs AS (SELECT id, h % 64 AS b,
         |    CAST(sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END)
         |      AS BIGINT) AS w
         |  FROM th GROUP BY id, h % 64
         |  HAVING sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) <> 0),
         |nrm AS (SELECT id, CAST(sum(w * w) AS BIGINT) AS n2 FROM bs GROUP BY id),
         |dt AS (SELECT a.id AS id_a, b2.id AS id_b,
         |    CAST(sum(a.w * b2.w) AS BIGINT) AS dp
         |  FROM bs a JOIN bs b2 ON a.b = b2.b AND a.id < b2.id GROUP BY 1, 2),
         |cosu AS (SELECT p.id_a, p.id_b,
         |    CAST(floor(CAST(coalesce(dt.dp, 0) AS DOUBLE)
         |      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
         |      * 1000000.0 + 0.5) AS BIGINT) AS cos_u
         |  FROM (SELECT a.id AS id_a, b2.id AS id_b
         |        FROM d a JOIN d b2 ON a.id < b2.id) p
         |  LEFT JOIN dt ON dt.id_a = p.id_a AND dt.id_b = p.id_b
         |  JOIN nrm na ON na.id = p.id_a JOIN nrm nb ON nb.id = p.id_b),
         |toks AS (SELECT id, list_filter(string_split_regex(text, '\\s+'),
         |    x -> len(x) > 0) AS tk FROM d),
         |sh AS (SELECT id, CASE WHEN len(tk) = 0 THEN []
         |    ELSE list_distinct(list_transform(
         |      generate_series(1, greatest(len(tk) - 2, 1)),
         |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS shingles
         |  FROM toks),
         |sz AS (SELECT id, CAST(len(shingles) AS BIGINT) AS ns FROM sh
         |  WHERE len(shingles) > 0),
         |shr AS (SELECT a.id AS id_a, b2.id AS id_b,
         |    CAST(count(*) AS BIGINT) AS shared
         |  FROM (SELECT id, unnest(shingles) AS sg FROM sh) a
         |  JOIN (SELECT id, unnest(shingles) AS sg FROM sh) b2
         |    ON a.sg = b2.sg AND a.id < b2.id
         |  GROUP BY 1, 2),
         |j AS (SELECT c.cos_u,
         |    (10 * coalesce(shr.shared, 0))
         |      // (sa.ns + sb.ns - coalesce(shr.shared, 0)) AS band
         |  FROM cosu c JOIN sz sa ON sa.id = c.id_a
         |  JOIN sz sb ON sb.id = c.id_b
         |  LEFT JOIN shr ON shr.id_a = c.id_a AND shr.id_b = c.id_b)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(cos_u) // count(*) AS BIGINT) AS avg_cos_u
         |FROM j GROUP BY band""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions
      val docs = Tables.documents(s, d)
      val slice = docs.filter(col("doc_id") < 500)
      val cosU = graft.operators.TfIdf.hashedBowPairCosines(
        docs, "doc_id", "text", maxId = 500L, dim = 64)
      val sh = slice.select(col("doc_id").as("id"),
        TextFunctions.shingles(col("text")).as("sgs"))
      val sz = sh.select(col("id"), size(col("sgs")).cast("long").as("ns"))
        .filter(col("ns") > 0)
      val ex = sh.select(col("id"), explode(col("sgs")).as("sg"))
      val shr = ex.select(col("id").as("id_a"), col("sg"))
        .join(ex.select(col("id").as("id_b"), col("sg")), "sg")
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      cosU
        .join(broadcast(sz.select(col("id").as("id_a"), col("ns").as("sa"))),
          "id_a")
        .join(broadcast(sz.select(col("id").as("id_b"), col("ns").as("sb"))),
          "id_b")
        .join(shr, Seq("id_a", "id_b"), "left")
        .withColumn("band",
          expr("(10 * coalesce(shared, 0)) div (sa + sb - coalesce(shared, 0))"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(cos_u) div count(1)").as("avg_cos_u"))
    },

    // q182: per-source vocabulary drift ([[graft.operators.Profile
    // .vocabDrift]]) — total-variation distance in micro-units between
    // each source's token shares and the corpus mix over the exact
    // top-64 tokens + one OOV bucket, with the largest-gap token riding
    // along. The lexical twin of q132's embedding PSI. One exploded
    // count aggregate materialized once (two consumers), top-k via
    // per-partition heaps, all downstream joins on the broadcast ≤64-row
    // top frame.
    QueryDef.sql(
      "q182_vocab_drift",
      s"""WITH p AS (SELECT source AS src, unnest($TC) AS tok FROM documents),
         |counts AS (SELECT src, tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM p GROUP BY src, tok),
         |top AS (SELECT tok, ccnt FROM (
         |    SELECT tok, CAST(sum(cnt) AS BIGINT) AS ccnt,
         |      row_number() OVER (ORDER BY sum(cnt) DESC, tok ASC) AS rk
         |    FROM counts GROUP BY tok) WHERE rk <= 64),
         |ct AS (SELECT CAST(sum(cnt) AS BIGINT) AS ctot FROM counts),
         |stot AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS tot
         |  FROM counts GROUP BY src),
         |pert AS (
         |  SELECT s.src, s.tot, ct.ctot, t.tok, t.ccnt,
         |    coalesce(c.cnt, 0) AS cnt,
         |    abs((coalesce(c.cnt, 0) * 1000000) // s.tot
         |      - (t.ccnt * 1000000) // ct.ctot) AS delta_mu
         |  FROM stot s CROSS JOIN top t CROSS JOIN ct
         |  LEFT JOIN counts c ON c.src = s.src AND c.tok = t.tok),
         |agg AS (
         |  SELECT src, tot,
         |    CAST(sum(delta_mu)
         |      + abs(((tot - sum(cnt)) * 1000000) // tot
         |          - ((ctot - sum(ccnt)) * 1000000) // ctot)
         |      AS BIGINT) AS tv_mu
         |  FROM pert GROUP BY src, tot, ctot),
         |gap AS (SELECT src, tok AS gap_token,
         |    CAST(delta_mu AS BIGINT) AS gap_mu FROM (
         |    SELECT src, tok, delta_mu, row_number() OVER (PARTITION BY src
         |      ORDER BY delta_mu DESC, tok ASC) AS rk FROM pert)
         |  WHERE rk = 1)
         |SELECT a.src AS source, a.tot AS n_tokens, a.tv_mu,
         |  g.gap_token, g.gap_mu
         |FROM agg a JOIN gap g USING (src)""".stripMargin) { (s, d) =>
      graft.operators.Profile.vocabDrift(
        Tables.documents(s, d), "source", "text", topK = 64)
    },

    // q189: exact per-source length quantiles ([[graft.operators.Profile
    // .lengthQuantiles]]) — p50/p90/p99 token counts selected from the
    // (source, len) HISTOGRAM by integer prefix-sum, never a per-group
    // sort of document lengths: the heavy exchange is one map-side-
    // combined count aggregate; the window runs over distinct lengths
    // only. p_q = min{len : 100·cum ≥ q·n} — the exact lower discrete
    // quantile, float-free on both engines.
    QueryDef.sql(
      "q189_length_quantiles",
      s"""WITH lens AS (SELECT source AS src,
         |    CAST(len($TC) AS BIGINT) AS len FROM documents),
         |hist AS (SELECT src, len, CAST(count(*) AS BIGINT) AS cnt
         |  FROM lens GROUP BY src, len),
         |tot AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS n_docs
         |  FROM hist GROUP BY src),
         |cum AS (SELECT src, len,
         |    CAST(sum(cnt) OVER (PARTITION BY src ORDER BY len) AS BIGINT)
         |      AS cum
         |  FROM hist)
         |SELECT t.src AS source, t.n_docs,
         |  min(CASE WHEN c.cum * 100 >= t.n_docs * 50 THEN c.len END)
         |    AS p50_len,
         |  min(CASE WHEN c.cum * 100 >= t.n_docs * 90 THEN c.len END)
         |    AS p90_len,
         |  min(CASE WHEN c.cum * 100 >= t.n_docs * 99 THEN c.len END)
         |    AS p99_len
         |FROM cum c JOIN tot t USING (src)
         |GROUP BY t.src, t.n_docs""".stripMargin) { (s, d) =>
      graft.operators.Profile.lengthQuantiles(
        Tables.documents(s, d), "source", "text")
    },

    // q190: nucleus (top-p) vocabulary size per source ([[graft.operators
    // .Profile.nucleusVocab]]) — the minimal number of types covering
    // ≥95% of token mass, computed over the COUNT-OF-COUNTS levels
    // (≤ O(√n) rows per source) instead of ranking the vocabulary: ties
    // all sit inside one level, so the size is tie-break-free and the
    // only window runs over the level frame. Tokenizer-planning twin of
    // q128's fertility and q182's OOV bucket.
    QueryDef.sql(
      "q190_nucleus_vocab",
      s"""WITH p AS (SELECT source AS src, unnest($TC) AS tok FROM documents),
         |counts AS (SELECT src, tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM p GROUP BY src, tok),
         |levels AS (SELECT src, cnt,
         |    CAST(count(*) AS BIGINT) AS types,
         |    CAST(cnt * count(*) AS BIGINT) AS mass
         |  FROM counts GROUP BY src, cnt),
         |tot AS (SELECT src, CAST(sum(mass) AS BIGINT) AS n_tokens,
         |    CAST(sum(types) AS BIGINT) AS n_types
         |  FROM levels GROUP BY src),
         |walk AS (SELECT src, cnt, types, mass,
         |    CAST(sum(mass) OVER (PARTITION BY src ORDER BY cnt DESC)
         |      AS BIGINT) AS cum_mass,
         |    CAST(sum(types) OVER (PARTITION BY src ORDER BY cnt DESC)
         |      AS BIGINT) AS cum_types
         |  FROM levels),
         |sel AS (SELECT w.src, t.n_tokens, t.n_types,
         |    w.cum_types - w.types
         |      + (((t.n_tokens * 9500 + 9999) // 10000)
         |         - (w.cum_mass - w.mass) + w.cnt - 1) // w.cnt
         |      AS nucleus_types,
         |    row_number() OVER (PARTITION BY w.src ORDER BY w.cum_mass ASC)
         |      AS rk
         |  FROM walk w JOIN tot t USING (src)
         |  WHERE w.cum_mass >= (t.n_tokens * 9500 + 9999) // 10000)
         |SELECT src AS source, n_tokens, n_types,
         |  CAST(nucleus_types AS BIGINT) AS nucleus_types,
         |  CAST(nucleus_types * 10000 // n_types AS BIGINT)
         |    AS nucleus_share_bp
         |FROM sel WHERE rk = 1""".stripMargin) { (s, d) =>
      graft.operators.Profile.nucleusVocab(
        Tables.documents(s, d), "source", "text", coverBp = 9500)
    },

    // q202: exact trimmed mean of doc token length per source
    // ([[graft.operators.Profile.trimmedMean]]) — the robust-location
    // statistic next to q189's quantiles and q172's MAD, computed from
    // the same (source, len) histogram by clipped per-level takes; the
    // mean closes in overflow-safe two-term exact micro-units.
    QueryDef.sql(
      "q202_trimmed_mean",
      s"""WITH lens AS (SELECT source AS src,
         |    CAST(len($TC) AS BIGINT) AS len FROM documents),
         |hist AS (SELECT src, len, CAST(count(*) AS BIGINT) AS cnt
         |  FROM lens GROUP BY src, len),
         |tot AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM hist GROUP BY src),
         |walk AS (SELECT h.src, h.len, h.cnt, t.n,
         |    (t.n * 500) // 10000 AS lo,
         |    t.n - (t.n * 500) // 10000 AS hi,
         |    CAST(sum(h.cnt) OVER (PARTITION BY h.src ORDER BY h.len)
         |      AS BIGINT) AS cum
         |  FROM hist h JOIN tot t USING (src)),
         |agg AS (SELECT src, max(n) AS n_docs,
         |    greatest(max(hi - lo), 1) AS trimmed_n,
         |    CAST(sum(greatest(least(cum, hi) - greatest(cum - cnt, lo), 0)
         |      * len) AS BIGINT) AS tsum
         |  FROM walk GROUP BY src)
         |SELECT src AS source, n_docs, CAST(trimmed_n AS BIGINT) AS trimmed_n,
         |  CAST((tsum // trimmed_n) * 1000000
         |    + ((tsum % trimmed_n) * 1000000) // trimmed_n AS BIGINT)
         |    AS trimmed_mean_u
         |FROM agg""".stripMargin) { (s, d) =>
      graft.operators.Profile.trimmedMean(
        Tables.documents(s, d), "source", "text", trimBp = 500)
    },

    // q195: shard-balance audit ([[graft.operators.Packing
    // .shardBalanceAudit]]) — exact Gini + max/mean of token mass over
    // a 64-way portable md5 sharding: the straggler forecast a layout
    // is checked against before an epoch commits to it. One corpus
    // exchange to ≤64 rows; all statistics integer.
    QueryDef.sql(
      "q195_shard_balance",
      s"""WITH d AS (SELECT
         |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 64 AS shard,
         |    CAST(len($TC) AS BIGINT) AS n
         |  FROM documents),
         |shards AS (SELECT shard, CAST(sum(n) AS BIGINT) AS tok
         |  FROM d GROUP BY shard),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_shards,
         |    CAST(sum(tok) AS BIGINT) AS total_tokens,
         |    min(tok) AS min_tokens, max(tok) AS max_tokens
         |  FROM shards),
         |ranked AS (SELECT tok,
         |    row_number() OVER (ORDER BY tok, shard) AS i
         |  FROM shards),
         |s AS (SELECT CAST(sum(i * tok) AS BIGINT) AS ssum FROM ranked)
         |SELECT n_shards, total_tokens, min_tokens, max_tokens,
         |  CAST(((2 * ssum - (n_shards + 1) * total_tokens) * 10000)
         |    // (n_shards * greatest(total_tokens, 1)) AS BIGINT) AS gini_bp,
         |  CAST((max_tokens * n_shards * 10000)
         |    // greatest(total_tokens, 1) AS BIGINT) AS max_over_mean_bp
         |FROM s CROSS JOIN tot""".stripMargin) { (s, d) =>
      graft.operators.Packing.shardBalanceAudit(
        Tables.documents(s, d), "doc_id", "text", nShards = 64)
    },
  )

  /** DuckDB twin of the house tokenizer over null-coalesced text
    * (readability needs the q141 empty-doc sentinel, not null algebra).
    */
  private def TC: String =
    "list_filter(string_split_regex(coalesce(text, ''), '\\s+'), t -> len(t) > 0)"

  /** DuckDB twin of the shingle construction (matches
    * TextFunctions.shingles incl. the empty-text → empty-array rule).
    */
  // a def, not a val: referenced during `val all`'s initializer, which runs
  // before any val declared below `all` would be assigned
  private def ShinglesSql: String =
    """CASE WHEN len(tk) = 0 THEN []
      |     ELSE list_distinct(list_transform(generate_series(1, greatest(len(tk) - 2, 1)),
      |       i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END""".stripMargin

  /** q37 oracle: the full MinHash-LSH band-stat computation in ANSI SQL —
    * same shingles, same md5-based first-level hash, same (A·H+B) mod P
    * permutations (constants interpolated from PortableHashFamily so the
    * two sides can never drift), same concat-string band buckets.
    */
  private def q37Sql: String = {
    val F = Dedup.PortableHashFamily
    val (perms, bands, rpb) = (16, 4, 4)
    val mins = (0 until perms)
      .map(i => s"min(${F.permuteSql("h", i)}) AS m$i").mkString(",\n  ")
    val bandRows = (0 until bands).map { b =>
      val cols = (b * rpb until (b + 1) * rpb).map(i => s"m$i").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $cols) AS bucket FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (SELECT doc_id, $T AS tk FROM documents),
       |sh AS (SELECT doc_id, $ShinglesSql AS shingles FROM toks),
       |postings AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |hh AS (SELECT doc_id, ${F.firstLevelSql("s")} AS h FROM postings),
       |sig AS (SELECT doc_id,
       |  $mins
       |  FROM hh GROUP BY doc_id),
       |bnd AS ($bandRows),
       |bs AS (SELECT band, bucket, count(*) AS sz FROM bnd GROUP BY band, bucket)
       |SELECT band, count(*) AS n_buckets, max(sz) AS max_bucket,
       |  floor(avg(sz) * 10000.0 + 0.5) / 10000.0 AS avg_bucket,
       |  CAST(sum(sz * (sz - 1) / 2) AS BIGINT) AS n_cand_pairs
       |FROM bs GROUP BY band""".stripMargin
  }

  /** q63 oracle: the full incremental MinHash-LSH candidate computation in
    * ANSI SQL — the steady-state 100 TB dedup shape (new batch banded
    * against the stored index + within-batch pairs, history never
    * re-signed). Same portable family as q37; the band rows over ALL
    * documents equal stored-index ∪ new-batch bands because family and
    * banding parameters match. Mirrors the Spark side exactly: bucket cap
    * over old+new members, old–new pairs emitted once from the old side,
    * new–new once via the id-order guard.
    */
  private def q63Sql: String = {
    val F = Dedup.PortableHashFamily
    val (perms, bands, rpb) = (16, 4, 4)
    val mins = (0 until perms)
      .map(i => s"min(${F.permuteSql("h", i)}) AS m$i").mkString(",\n  ")
    val bandRows = (0 until bands).map { b =>
      val cols = (b * rpb until (b + 1) * rpb).map(i => s"m$i").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $cols) AS bucket FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (SELECT doc_id, $T AS tk FROM documents),
       |sh AS (SELECT doc_id, $ShinglesSql AS shingles FROM toks),
       |postings AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |hh AS (SELECT doc_id, ${F.firstLevelSql("s")} AS h FROM postings),
       |sig AS (SELECT doc_id,
       |  $mins
       |  FROM hh GROUP BY doc_id),
       |bnd AS ($bandRows),
       |tagged AS (SELECT doc_id, band, bucket, (doc_id % 5 = 0) AS is_new FROM bnd),
       |small AS (SELECT band, bucket FROM tagged
       |          GROUP BY band, bucket HAVING count(*) <= 500),
       |kept AS (SELECT t.* FROM tagged t JOIN small USING (band, bucket)),
       |pairs AS (
       |  SELECT least(a.doc_id, b.doc_id) AS id_a,
       |    greatest(a.doc_id, b.doc_id) AS id_b,
       |    count(*) AS n_bands_shared
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.bucket = b.bucket
       |   AND b.is_new AND a.doc_id <> b.doc_id
       |   AND (NOT a.is_new OR a.doc_id < b.doc_id)
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, CAST(n_bands_shared AS BIGINT) AS n_bands_shared
       |FROM pairs""".stripMargin
  }

  /** q65 oracle: winnowing fingerprints in ANSI SQL — the kernel's
    * Karp–Rabin polynomial recomputed DIRECTLY per gram (the rolling
    * update is just an evaluation-order optimization; Σ cpⱼ·B^{k−1−j}
    * mod P is the definition, and the B^j mod P weights are interpolated
    * from the kernel's constants so the two can never drift), same
    * w-window minima incl. the short-doc single window, distinct
    * (doc, fp) pairs, then per-source stats with the count of
    * fingerprints shared across >1 document.
    */
  private def q65Sql: String = {
    val (k, w) = (8, 4)
    val P = graft.plans.SigOps.WinnowP
    val B = graft.plans.SigOps.WinnowB
    val pows = Array.iterate(1L, k)(p => (p * B) % P).reverse // B^(k-1)..B^0
    val gram = (0 until k)
      .map(j => s"(cps[CAST(i + $j AS INTEGER)] * ${pows(j)}) % $P")
      .mkString("(", " + ", s") % $P")
    s"""WITH d AS (SELECT doc_id, source, text, len(text) AS n FROM documents
       |           WHERE text IS NOT NULL),
       |cp AS (SELECT doc_id, source, n,
       |  list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS cps
       |  FROM d),
       |hs AS (SELECT doc_id, source,
       |  list_transform(range(1, greatest(n - $k + 1, 0) + 1),
       |    i -> $gram) AS h
       |  FROM cp),
       |wins AS (SELECT doc_id, source,
       |  CASE WHEN len(h) = 0 THEN []
       |       ELSE list_transform(range(1, greatest(len(h) - $w + 1, 1) + 1),
       |         j -> list_min(h[CAST(j AS INTEGER):CAST(j + $w - 1 AS INTEGER)])) END AS wm
       |  FROM hs),
       |fps AS (SELECT DISTINCT doc_id, source, unnest(wm) AS fp FROM wins),
       |shared AS (SELECT fp FROM fps GROUP BY fp HAVING count(DISTINCT doc_id) > 1)
       |SELECT f.source, count(DISTINCT f.doc_id) AS n_docs,
       |  count(*) AS n_fingerprints,
       |  CAST(sum(CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
       |FROM fps f LEFT JOIN shared s ON f.fp = s.fp
       |GROUP BY f.source""".stripMargin
  }

  /** q61 oracle: the SAME greedy longest-prefix segmentation as
    * [[graft.functions.SubwordBpe.countPieces]] as a recursive CTE — each
    * step strips the longest `starts_with` vocab match from the word's
    * remainder (1-char fallback) and bumps the piece count. The vocab is
    * interpolated from the checked-in resource so the two sides can never
    * drift. Recursion runs over DISTINCT words (the corpus vocabulary),
    * not occurrences, then joins counts back — the same trick that makes
    * the operator cheap at scale.
    */
  private def q61Sql: String = {
    val lowerToks =
      "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"
    s"""WITH RECURSIVE vocab(p) AS (VALUES ${graft.functions.SubwordBpe.vocabValuesSql}),
       |words AS (
       |  SELECT doc_id, unnest($lowerToks) AS w FROM documents),
       |wd AS (SELECT DISTINCT w FROM words),
       |seg AS (
       |  SELECT w, w AS rest, 0 AS cnt FROM wd
       |  UNION ALL
       |  SELECT w,
       |    substr(rest, 1 + coalesce(len((SELECT p FROM vocab
       |      WHERE starts_with(rest, p) ORDER BY len(p) DESC, p LIMIT 1)), 1)),
       |    cnt + 1
       |  FROM seg WHERE len(rest) > 0),
       |pc AS (SELECT w, cnt AS pieces FROM seg WHERE len(rest) = 0),
       |perdoc AS (
       |  SELECT words.doc_id, CAST(sum(pc.pieces) AS BIGINT) AS pieces
       |  FROM words JOIN pc USING (w) GROUP BY words.doc_id),
       |base AS (
       |  SELECT d.doc_id, d.lang, coalesce(p.pieces, 0) AS pieces
       |  FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(pieces) AS BIGINT) AS total_pieces,
       |  CAST(max(pieces) AS BIGINT) AS max_pieces,
       |  floor(avg(CAST(pieces AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avg_pieces
       |FROM base GROUP BY lang""".stripMargin
  }

  /** q38 oracle: 32-bit portable SimHash (md5-derived token hashes, ±1 bit
    * sums, 8-bit chunk blocking, full-hamming verify ≤ 16) in ANSI SQL.
    */
  private def q38Sql: String = {
    val F = Dedup.PortableHashFamily
    val bitSums = (0 until 32)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n  ")
    val sigTerms = (0 until 32)
      .map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i}::BIGINT ELSE 0::BIGINT END)")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest($T) AS t FROM documents),
       |hh AS (SELECT doc_id, ${F.firstLevelSql("t")} AS h FROM tok),
       |bits AS (SELECT doc_id,
       |  $bitSums
       |  FROM hh GROUP BY doc_id),
       |sg AS (SELECT doc_id, $sigTerms AS sig FROM bits),
       |chunked AS (
       |  SELECT doc_id, sig, c AS chunk, (sig >> (c * 8)) & 255 AS chunk_val
       |  FROM sg, (SELECT unnest([0, 1, 2, 3]) AS c) chunks),
       |small AS (
       |  SELECT chunk, chunk_val FROM chunked
       |  GROUP BY chunk, chunk_val HAVING count(*) <= 500),
       |kept AS (SELECT c.* FROM chunked c JOIN small USING (chunk, chunk_val)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    bit_count(xor(a.sig, b.sig)) AS hamming
       |  FROM kept a JOIN kept b
       |    ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id),
       |agg AS (
       |  SELECT count(*) AS n_candidate_pairs,
       |    CAST(coalesce(min(hamming), -1) AS BIGINT) AS min_hamming
       |  FROM cand WHERE hamming <= 16)
       |SELECT d.source, count(*) AS n_docs, a.n_candidate_pairs, a.min_hamming
       |FROM documents d CROSS JOIN agg a
       |GROUP BY d.source, a.n_candidate_pairs, a.min_hamming""".stripMargin
  }
}
