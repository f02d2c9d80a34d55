package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup
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
  *  - q37 MinHash-LSH band statistics (rows-only: xxhash64 has no DuckDB twin)
  *  - q38 SimHash hamming-candidate stats (rows-only, same reason)
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
         |    list_distinct(list_transform(generate_series(1, greatest(len(tk) - 2, 1)),
         |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS shingles
         |  FROM toks),
         |sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
         |postings AS (SELECT doc_id, source, unnest(shingles) AS shingle FROM sh),
         |pairs AS (
         |  SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |  FROM postings a JOIN postings b
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

    QueryDef.rowsOnly("q37_minhash_band_stats") { (s, d) =>
      Dedup.minhashBandStats(Tables.documents(s, d), "doc_id", "text")
    },

    QueryDef.rowsOnly("q38_simhash_candidates") { (s, d) =>
      val cands = Dedup.simhashCandidates(Tables.documents(s, d), "doc_id", "text", maxHamming = 16)
      // per-bucket stats stay non-empty even when no near-dups exist
      Tables.documents(s, d).groupBy("source").agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(cands.agg(
          count(lit(1)).as("n_candidate_pairs"),
          coalesce(min("hamming"), lit(-1L)).as("min_hamming"))))
    }
  )
}
