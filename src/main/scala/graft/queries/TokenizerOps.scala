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

    // q163: the unigram-LM seeded vocabulary ([[graft.operators
    // .UnigramLm.seedVocab]], Kudo 2018 / SentencePiece) — the OTHER
    // tokenizer family next to q112's BPE: occurrence-weighted substring
    // candidates over the distinct-word frame, ALL single chars kept
    // (character coverage) + the top-64 multi-char pieces with freq ≥ 2
    // under the (freq desc, piece) total order, costs = exact micro-nat
    // −ln p over the selected vocabulary's mass. Output rows are the
    // MODEL (bounded: alphabet + 64 at any corpus scale).
    QueryDef.sql(
      "q163_unigram_vocab",
      s"""WITH $UnigramVocabCtes
         |SELECT piece, freq, cost_u FROM vocab""".stripMargin) { (s, d) =>
      graft.operators.UnigramLm.seedVocab(
        graft.operators.UnigramLm.wordFrame(Tables.documents(s, d), "text"),
        maxPieceLen = 6, vocabSize = 64, minCount = 2L)
    },

    // q164: Viterbi segmentation under the q163 model ([[graft.operators
    // .UnigramLm.segmentStats]]) — exact packed-BIGINT DP (64·cost +
    // n_pieces, so one integer min is "min cost then fewest pieces")
    // over each DISTINCT word, rolled up per source over occurrences:
    // words, over-cap exclusions (reported, never dropped), pieces, and
    // the corpus NLL in micro-nats (the tokenizer-side twin of the
    // q85/q150 perplexities). The oracle unrolls the DP as 16
    // MATERIALIZED CTE rounds — reachable cells only, so the Spark
    // side's Inf sentinel never needs an oracle twin.
    QueryDef.sql(
      "q164_unigram_segment",
      s"""WITH $UnigramVocabCtes,
         |${dpChain("", "vocab")},
         |$OccCte
         |${rollupSql("seg", round = -1)}""".stripMargin) { (s, d) =>
      graft.operators.UnigramLm.segmentStats(
        Tables.documents(s, d), "text", "source",
        maxPieceLen = 6, vocabSize = 64, minCount = 2L)
    },

    // q165: one HARD-EM round over the q163 model ([[graft.operators
    // .UnigramLm.segmentStatsEm]], Viterbi-EM / segmental k-means):
    // recover the best-path PIECES by a backward walk (at each position
    // the piece ACHIEVING the packed cell value, smallest start on
    // ties), recount piece frequencies along those paths, drop unused
    // multi-char pieces, floor the alphabet at 1, renormalize, and
    // re-segment. Output = the (source, round) training curve; Gibbs'
    // inequality makes the NLL column non-increasing (spec-pinned).
    // The oracle replays BOTH DP unrolls and the 16-step walk —
    // equality against the vall16 cells, min(s) tie-break — then the
    // M-step recount in plain SQL.
    QueryDef.sql(
      "q165_unigram_em",
      s"""WITH $UnigramVocabCtes,
         |${dpChain("", "vocab")},
         |walk0 AS (
         |  SELECT word, CAST(len(word) AS BIGINT) AS pos
         |  FROM words WHERE len(word) <= 16),
         |${(1 to 16).map(walkRound).mkString(",\n")},
         |chosen AS MATERIALIZED (
         |  SELECT word, substring(word, CAST(s + 1 AS INTEGER),
         |    CAST(e - s AS INTEGER)) AS piece
         |  FROM (${(1 to 16).map(j => s"SELECT * FROM step$j")
                     .mkString(" UNION ALL ")})),
         |pcnt AS (
         |  SELECT c.piece, CAST(sum(w.freq) AS BIGINT) AS c
         |  FROM chosen c JOIN words w USING (word) GROUP BY c.piece),
         |vocab1_0 AS (
         |  SELECT v.piece,
         |    CASE WHEN len(v.piece) = 1 THEN greatest(coalesce(p.c, 0), 1)
         |         ELSE p.c END AS freq
         |  FROM vocab v LEFT JOIN pcnt p USING (piece)
         |  WHERE len(v.piece) = 1 OR coalesce(p.c, 0) >= 1),
         |tot1 AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM vocab1_0),
         |vocab1 AS MATERIALIZED (
         |  SELECT piece, freq, ${graft.operators.UnigramLm.CostExprSql}
         |  FROM vocab1_0 CROSS JOIN tot1),
         |${dpChain("r1", "vocab1")},
         |$OccCte
         |${rollupSql("seg", round = 0)}
         |UNION ALL
         |${rollupSql("r1seg", round = 1)}""".stripMargin) { (s, d) =>
      graft.operators.UnigramLm.segmentStatsEm(
        Tables.documents(s, d), "text", "source", emRounds = 1,
        maxPieceLen = 6, vocabSize = 64, minCount = 2L)
    },
  )

  /** Per-(source, word) occurrence counts — the rollup's left side. */
  private def OccCte: String =
    s"""occ AS MATERIALIZED (
       |  SELECT source, word, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT source, unnest($T) AS word FROM documents)
       |  GROUP BY source, word)""".stripMargin

  /** The per-source rollup over a segmentation CTE; `round = -1` omits
    * the round column (q164's shape).
    */
  private def rollupSql(seg: String, round: Int): String = {
    val roundCol =
      if (round < 0) "" else s"CAST($round AS BIGINT) AS round,\n  "
    s"""SELECT source, $roundCol
       |  CAST(sum(CASE WHEN s.n_pieces IS NOT NULL THEN o.n ELSE 0 END)
       |    AS BIGINT) AS n_words,
       |  CAST(sum(CASE WHEN s.n_pieces IS NULL THEN o.n ELSE 0 END)
       |    AS BIGINT) AS n_excluded,
       |  CAST(sum(CASE WHEN s.n_pieces IS NOT NULL THEN o.n * s.n_pieces
       |    ELSE 0 END) AS BIGINT) AS n_pieces,
       |  CAST(sum(CASE WHEN s.cost_u IS NOT NULL THEN o.n * s.cost_u
       |    ELSE 0 END) AS BIGINT) AS nll_micro_nats
       |FROM occ o LEFT JOIN $seg s USING (word)
       |GROUP BY source""".stripMargin
  }

  /** The full Viterbi DP as CTEs under a name prefix: in-vocab spans,
    * the 16 unrolled rounds, and the decoded `${pfx}seg` — so the EM
    * query can run the chain twice (seed vocab, then the re-estimated
    * one) without name collisions.
    */
  private def dpChain(pfx: String, vocab: String): String =
    s"""${pfx}sstarts AS (
       |  SELECT word, unnest(generate_series(1, len(word))) AS i
       |  FROM words WHERE len(word) <= 16),
       |${pfx}sp0 AS (
       |  SELECT word, i, unnest(generate_series(i, least(len(word), i + 15))) AS e
       |  FROM ${pfx}sstarts),
       |${pfx}wp AS MATERIALIZED (
       |  SELECT s.word, s.i - 1 AS s, s.e AS e, v.cost_u AS c
       |  FROM ${pfx}sp0 s JOIN $vocab v
       |    ON substring(s.word, CAST(s.i AS INTEGER),
       |                 CAST(s.e - s.i + 1 AS INTEGER)) = v.piece),
       |${pfx}vall0 AS (
       |  SELECT word, CAST(0 AS BIGINT) AS j, CAST(0 AS BIGINT) AS b
       |  FROM words WHERE len(word) <= 16),
       |${(1 to 16).map(j => vitRound(pfx, j)).mkString(",\n")},
       |${pfx}seg AS MATERIALIZED (
       |  SELECT w.word, v.b // 64 AS cost_u, v.b % 64 AS n_pieces
       |  FROM words w JOIN ${pfx}vall16 v
       |    ON v.word = w.word AND v.j = len(w.word))""".stripMargin

  /** Shared q163/q164 CTE prefix: distinct words → occurrence-weighted
    * substring candidates (two lateral-unnest stages — a single SELECT
    * with two unnests would ZIP them) → char + top-64 vocabulary with
    * [[graft.operators.UnigramLm.CostExprSql]] costs.
    */
  private def UnigramVocabCtes: String =
    s"""words AS MATERIALIZED (
       |  SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($T) AS t FROM documents) GROUP BY 1),
       |cstarts AS (
       |  SELECT word, freq, unnest(generate_series(1, len(word))) AS i
       |  FROM words),
       |cand0 AS (
       |  SELECT word, freq, i,
       |    unnest(generate_series(1, least(6, len(word) - i + 1))) AS l
       |  FROM cstarts),
       |cands AS MATERIALIZED (
       |  SELECT substring(word, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece,
       |    CAST(sum(freq) AS BIGINT) AS freq
       |  FROM cand0 GROUP BY 1),
       |chars AS (SELECT piece, freq FROM cands WHERE len(piece) = 1),
       |topv AS (
       |  SELECT piece, freq FROM (
       |    SELECT piece, freq,
       |      row_number() OVER (ORDER BY freq DESC, piece) AS rnk
       |    FROM cands WHERE len(piece) >= 2 AND freq >= 2)
       |  WHERE rnk <= 64),
       |vocab0 AS (SELECT * FROM chars UNION ALL SELECT * FROM topv),
       |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM vocab0),
       |vocab AS MATERIALIZED (
       |  SELECT piece, freq, ${graft.operators.UnigramLm.CostExprSql}
       |  FROM vocab0 CROSS JOIN tot)""".stripMargin

  /** One Viterbi round: cells reachable at position j from any reachable
    * cell at a span start (min over packed costs), accumulated into
    * `${pfx}vall$j` — the pcaIter unroll pattern, MATERIALIZED
    * throughout.
    */
  private def vitRound(pfx: String, j: Int): String =
    s"""${pfx}vit$j AS MATERIALIZED (
       |  SELECT p.word, CAST($j AS BIGINT) AS j,
       |    min(pr.b + p.c * 64 + 1) AS b
       |  FROM ${pfx}wp p JOIN ${pfx}vall${j - 1} pr
       |    ON p.word = pr.word AND pr.j = p.s
       |  WHERE p.e = $j GROUP BY p.word),
       |${pfx}vall$j AS MATERIALIZED (
       |  SELECT * FROM ${pfx}vall${j - 1} UNION ALL SELECT * FROM ${pfx}vit$j)""".stripMargin

  /** One backward-walk step over the round-0 DP: from every position a
    * walk currently occupies, the piece ACHIEVING the packed cell value
    * (pr.b + 64·c + 1 = cur.b) with the smallest start — exactly
    * [[graft.operators.UnigramLm.viterbiPieces]]' tie-break. Walks at
    * position 0 are done and carry forward unchanged.
    */
  private def walkRound(k: Int): String =
    s"""step$k AS MATERIALIZED (
       |  SELECT w.word, w.pos AS e, min(p.s) AS s
       |  FROM walk${k - 1} w
       |  JOIN vall16 cur ON cur.word = w.word AND cur.j = w.pos
       |  JOIN wp p ON p.word = w.word AND p.e = w.pos
       |  JOIN vall16 pr ON pr.word = p.word AND pr.j = p.s
       |  WHERE w.pos > 0 AND pr.b + p.c * 64 + 1 = cur.b
       |  GROUP BY w.word, w.pos),
       |walk$k AS MATERIALIZED (
       |  SELECT word, CAST(s AS BIGINT) AS pos FROM step$k
       |  UNION ALL
       |  SELECT word, pos FROM walk${k - 1} WHERE pos = 0)""".stripMargin
}
