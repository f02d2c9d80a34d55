package graft.queries

import graft.Tables
import graft.operators.Tokenizer

/** Tokenizer training (beyond-reference, SURVEY §2.11): q112 runs three
  * rounds of corpus-scale BPE merge induction
  * ([[graft.operators.Tokenizer]]) and emits the merge table — the
  * train-side companion of the frozen-vocabulary APPLY path
  * ([[graft.functions.SubwordBpe]], q61). The oracle replays every
  * round — pair counting, (freq desc, lhs, rhs) argmax, and the
  * boundary-spaced `replace` rewrite — byte-for-byte in chained CTEs.
  */
object TokenizerOps {

  /** DuckDB twin of TextFunctions.tokens (same as TextOps.T). */
  private val T = "list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)"

  /** One BPE round as DuckDB CTEs: pairs + argmax + rewrite + post-merge
    * token count, all derived from `w${k-1}`.
    */
  private def bpeRound(k: Int): String = {
    val prev = s"w${k - 1}"
    s"""p$k AS (
       |  SELECT b[1] AS lhs, b[2] AS rhs, CAST(sum(freq) AS BIGINT) AS f
       |  FROM (
       |    SELECT freq,
       |      unnest(list_transform(generate_series(1, greatest(len(s) - 1, 0)),
       |        i -> [s[i], s[i+1]])) AS b
       |    FROM (SELECT list_filter(string_split(w, ' '), x -> len(x) > 0) AS s,
       |                 freq FROM $prev))
       |  GROUP BY 1, 2),
       |m$k AS (SELECT lhs, rhs, f FROM p$k ORDER BY f DESC, lhs, rhs LIMIT 1),
       |w$k AS (SELECT replace(w, ' ' || m.lhs || ' ' || m.rhs || ' ',
       |                       ' ' || m.lhs || m.rhs || ' ') AS w, freq
       |        FROM $prev CROSS JOIN m$k m),
       |a$k AS (SELECT CAST(sum(freq * len(list_filter(string_split(w, ' '),
       |                 x -> len(x) > 0))) AS BIGINT) AS tokens_after
       |        FROM w$k)""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q112_bpe_merges",
      s"""WITH words AS (
         |  SELECT t AS word, count(*) AS freq
         |  FROM (SELECT unnest($T) AS t FROM documents) GROUP BY 1),
         |w0 AS (SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS w,
         |              freq FROM words),
         |${bpeRound(1)},
         |${bpeRound(2)},
         |${bpeRound(3)}
         |SELECT CAST(1 AS BIGINT) AS step, lhs, rhs, f AS freq, tokens_after
         |  FROM m1 CROSS JOIN a1
         |UNION ALL
         |SELECT 2, lhs, rhs, f, tokens_after FROM m2 CROSS JOIN a2
         |UNION ALL
         |SELECT 3, lhs, rhs, f, tokens_after FROM m3 CROSS JOIN a3""".stripMargin) {
      (s, d) => Tokenizer.bpeMergeTable(Tables.documents(s, d), "text", 3)
    },

    // q119: the TRAIN→APPLY round trip — train 3 merges on `documents`
    // (exactly q112), then tokenize the corpus WITH them
    // ([[graft.operators.Tokenizer.applyMerges]]): per-doc token counts
    // under the trained vocabulary. The oracle replays training (the
    // q112 CTE chain yields m1–m3) and then the apply — the same
    // boundary-spaced replace per merge, per document word — so the
    // whole train→apply loop is pinned end to end. Docs with no
    // whitespace tokens are absent (no words to segment).
    QueryDef.sql(
      "q119_bpe_apply",
      s"""WITH words AS (
         |  SELECT t AS word, count(*) AS freq
         |  FROM (SELECT unnest($T) AS t FROM documents) GROUP BY 1),
         |w0 AS (SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS w,
         |              freq FROM words),
         |${bpeRound(1)},
         |${bpeRound(2)},
         |${bpeRound(3)},
         |dw AS (SELECT doc_id, unnest($T) AS word FROM documents),
         |ap0 AS (SELECT doc_id,
         |          ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS w
         |        FROM dw),
         |ap1 AS (SELECT doc_id, replace(w, ' ' || m.lhs || ' ' || m.rhs || ' ',
         |                 ' ' || m.lhs || m.rhs || ' ') AS w
         |        FROM ap0 CROSS JOIN m1 m),
         |ap2 AS (SELECT doc_id, replace(w, ' ' || m.lhs || ' ' || m.rhs || ' ',
         |                 ' ' || m.lhs || m.rhs || ' ') AS w
         |        FROM ap1 CROSS JOIN m2 m),
         |ap3 AS (SELECT doc_id, replace(w, ' ' || m.lhs || ' ' || m.rhs || ' ',
         |                 ' ' || m.lhs || m.rhs || ' ') AS w
         |        FROM ap2 CROSS JOIN m3 m)
         |SELECT doc_id,
         |  CAST(sum(len(list_filter(string_split(w, ' '), x -> len(x) > 0)))
         |    AS BIGINT) AS n_tokens
         |FROM ap3 GROUP BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Tokenizer.collectMerges(
        Tokenizer.bpeMergeTable(docs, "text", 3))
      Tokenizer.applyMerges(docs, "doc_id", "text", merges)
    },

    // q128: tokenizer fertility per language ([[graft.operators
    // .Tokenizer.fertilityByGroup]], Rust et al. 2021) — train the 3
    // merges (q112's chain), replay them over every word occurrence,
    // and roll up per lang: mean pieces per word (fertility) and the
    // continued-word rate (pct_split). The slice-level readout that
    // decides whether the trained vocabulary under-serves a language.
    QueryDef.sql(
      "q128_tokenizer_fertility",
      s"""WITH words AS (
         |  SELECT t AS word, count(*) AS freq
         |  FROM (SELECT unnest($T) AS t FROM documents) GROUP BY 1),
         |w0 AS (SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS w,
         |              freq FROM words),
         |${bpeRound(1)},
         |${bpeRound(2)},
         |${bpeRound(3)},
         |dw AS (SELECT lang, unnest($T) AS word FROM documents),
         |f0 AS (SELECT lang,
         |          ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS w
         |        FROM dw),
         |f1 AS (SELECT lang, replace(w, ' ' || m.lhs || ' ' || m.rhs || ' ',
         |                 ' ' || m.lhs || m.rhs || ' ') AS w
         |        FROM f0 CROSS JOIN m1 m),
         |f2 AS (SELECT lang, replace(w, ' ' || m.lhs || ' ' || m.rhs || ' ',
         |                 ' ' || m.lhs || m.rhs || ' ') AS w
         |        FROM f1 CROSS JOIN m2 m),
         |f3 AS (SELECT lang, replace(w, ' ' || m.lhs || ' ' || m.rhs || ' ',
         |                 ' ' || m.lhs || m.rhs || ' ') AS w
         |        FROM f2 CROSS JOIN m3 m),
         |pieces AS (SELECT lang,
         |             len(list_filter(string_split(w, ' '), x -> len(x) > 0))
         |               AS p
         |           FROM f3)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(p) AS BIGINT) AS n_pieces,
         |  floor(sum(p) * 1.0 / count(*) * 10000.0 + 0.5) / 10000.0
         |    AS fertility,
         |  floor(avg(CASE WHEN p >= 2 THEN 1.0 ELSE 0.0 END) * 10000.0 + 0.5)
         |    / 10000.0 AS pct_split
         |FROM pieces GROUP BY lang""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Tokenizer.collectMerges(
        Tokenizer.bpeMergeTable(docs, "text", 3))
      Tokenizer.fertilityByGroup(docs, "lang", "text", merges)
    },
  )
}
