package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Decontamination, Dedup, LanguageModel, Packing, Sampling, Snapshot}
import org.apache.spark.sql.functions._

/** q95: the END-TO-END corpus-to-shards pipeline — every curation layer
  * this engine ships, composed into ONE verified query (VERDICT r9 #2):
  *
  *   snapshot reprocess slice → Bloom-screened decontamination →
  *   segment-level dedup → perplexity score + per-language median gate →
  *   per-domain cap → √-temperature language mix → seeded shuffle →
  *   concat-and-chunk packing → shard manifest
  *
  * The individually-verified stages (q92, q89, q77, q85, q86, q87, q88,
  * q81, q93) prove each layer; THIS query proves they compose — same
  * constructions, chained, with per-stage survival counts riding every
  * output row so the funnel's shape is part of the hash check.
  *
  * Composition shape notes (the 100 TB story):
  *  - EVERY inter-stage hand-off is `localCheckpoint()`ed — not an
  *    optimization but a structural requirement, measured twice over:
  *    (1) each stage's plan references its input at least twice (dedup
  *    segments + rejoins, the gate aggregates a threshold + probes, the
  *    cap builds a keep-set + semi-joins, the mix counts + filters, the
  *    prefix sum runs local sums + group totals), so without
  *    materialization the physical plan re-derives the full upstream
  *    chain ~2^stages times — measured as hundreds of stages and a
  *    driver OOM at 500 docs, each re-derivation re-broadcasting the
  *    MB-size Bloom literal in its task binary; (2) `cache()` alone
  *    fixes the recompute but keeps the LINEAGE — seven nested
  *    InMemoryRelations each embedding every predecessor's full tree
  *    (Bloom literal included) made the per-action plan STRING blow up
  *    multiplicatively and OOM the driver inside explainString.
  *    localCheckpoint truncates the lineage at each stage: downstream
  *    plans start from the materialized partitions, which is exactly
  *    the inter-stage tables a production pipeline checkpoints to
  *    storage between stages at 100 TB ([[graft.operators.Dedup
  *    .connectedComponents]] precedent).
  *  - every stage is the operator's own scale shape: the decon screen
  *    is the map-side Bloom literal, dedup's keep-first is the grouped
  *    no-window aggregate, the gate threshold is a broadcast per-lang
  *    table, the cap is the bounded-heap topn aggregate, the mix is a
  *    count aggregate + hash-threshold filter, packing is the two-phase
  *    prefix sum. Nothing new is introduced by composing them.
  *
  * Stage parameters deliberately mirror the stage queries' own (width
  * 16, df cap 2 replaced by decon defaults, cap 8, p50 gate, capacity
  * 256, 4 chunks/shard) so divergences localize to composition, never
  * to re-tuned constants.
  */
object PipelineOps {

  /** DuckDB tokenizer twin over an arbitrary column (TextOps.T is
    * hardwired to `text`).
    */
  private def Tk(c: String): String =
    s"list_filter(string_split_regex($c, '\\s+'), t -> len(t) > 0)"

  private def q95Sql: String =
    s"""WITH fp_old AS (
       |  SELECT doc_id, md5(trim(regexp_replace(lower(
       |    CASE WHEN doc_id % 11 = 0 THEN text || ' v0' ELSE text END),
       |    '\\s+', ' ', 'g'))) AS fp
       |  FROM documents WHERE doc_id % 7 != 3),
       |fp_new AS (
       |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |  FROM documents),
       |slice AS (
       |  SELECT d.doc_id, d.text, d.lang, d.source
       |  FROM documents d JOIN fp_new n USING (doc_id)
       |  LEFT JOIN fp_old o USING (doc_id)
       |  WHERE o.doc_id IS NULL OR (o.fp = n.fp) IS NOT TRUE),
       |stoks AS (SELECT doc_id, ${Tk("text")} AS tk FROM slice),
       |atoks AS (SELECT doc_id, ${Tk("text")} AS tk FROM documents),
       |btoks AS (
       |  SELECT doc_id AS bench_id,
       |    list_slice(tk, len(tk)//4 + 1,
       |               len(tk)//4 + greatest(len(tk)//2, 1)) AS tk
       |  FROM atoks WHERE doc_id % 25 = 0),
       |cg AS (
       |  SELECT doc_id, CASE WHEN len(tk) = 0 THEN []
       |    ELSE list_distinct(list_transform(generate_series(1, greatest(len(tk) - 4, 1)),
       |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))) END AS g
       |  FROM stoks),
       |bg AS (
       |  SELECT bench_id, CASE WHEN len(tk) = 0 THEN []
       |    ELSE list_distinct(list_transform(generate_series(1, greatest(len(tk) - 4, 1)),
       |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))) END AS g
       |  FROM btoks),
       |cpost AS (SELECT doc_id, unnest(g) AS gram FROM cg),
       |rare AS (SELECT gram FROM cpost GROUP BY gram HAVING count(*) <= 1000),
       |keptg AS (SELECT c.* FROM cpost c JOIN rare r USING (gram)),
       |bpost AS (SELECT bench_id, unnest(g) AS gram FROM bg),
       |bsizes AS (SELECT bench_id, len(g) AS n_bench_grams FROM bg),
       |shared AS (
       |  SELECT k.doc_id, b.bench_id, count(*) AS n_shared
       |  FROM keptg k JOIN bpost b USING (gram) GROUP BY 1, 2),
       |flagged AS (
       |  SELECT DISTINCT s.doc_id FROM shared s JOIN bsizes z USING (bench_id)
       |  WHERE s.n_shared * 1.0 / z.n_bench_grams >= 0.5),
       |clean AS (
       |  SELECT * FROM slice WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
       |ct AS (SELECT doc_id, ${Tk("text")} AS tk FROM clean),
       |sg AS (
       |  SELECT doc_id, tk,
       |    unnest(generate_series(0, CAST(ceil(len(tk)/16.0) AS BIGINT) - 1)) AS idx
       |  FROM ct WHERE len(tk) > 0),
       |seg AS (
       |  SELECT doc_id, idx,
       |    array_to_string(tk[idx*16+1 : idx*16+16], ' ') AS seg
       |  FROM sg),
       |segk AS (
       |  SELECT doc_id, idx, seg,
       |    row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, idx) AS rn
       |  FROM seg),
       |dedup AS (
       |  SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS kept_text
       |  FROM segk WHERE rn = 1 GROUP BY doc_id),
       |dd AS (
       |  SELECT c.doc_id, c.lang, c.source, d.kept_text
       |  FROM clean c JOIN dedup d USING (doc_id)),
       |ptoks AS (SELECT doc_id, ${Tk("kept_text")} AS tk FROM dd),
       |pbg AS (
       |  SELECT doc_id,
       |    unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
       |      i -> [tk[i], tk[i+1]])) AS b
       |  FROM ptoks),
       |ppairs AS (SELECT doc_id, b[1] AS w1, b[2] AS w2 FROM pbg),
       |pc12 AS (SELECT w1, w2, count(*) AS c12 FROM ppairs GROUP BY w1, w2),
       |pc1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pc12 GROUP BY w1),
       |pv AS (SELECT count(DISTINCT t) AS v FROM
       |  (SELECT w1 AS t FROM pc12 UNION SELECT w2 AS t FROM pc12)),
       |pnll AS (
       |  SELECT p.doc_id,
       |    CAST(floor(-ln((pc12.c12 + 1) / CAST(pc1.c1 + pv.v AS DOUBLE))
       |      * 1000000.0 + 0.5) AS BIGINT) AS nll_u
       |  FROM ppairs p JOIN pc12 USING (w1, w2) JOIN pc1 USING (w1) CROSS JOIN pv),
       |psc AS (
       |  SELECT doc_id, count(*) AS nb, CAST(sum(nll_u) AS BIGINT) AS s
       |  FROM pnll GROUP BY doc_id),
       |nsc AS (
       |  SELECT dd.doc_id, dd.lang, dd.source, dd.kept_text,
       |    -(psc.s // psc.nb) AS neg_u
       |  FROM dd JOIN psc USING (doc_id)),
       |thr AS (SELECT lang, quantile_cont(neg_u, 0.5) AS thr FROM nsc GROUP BY lang),
       |gated AS (
       |  SELECT n.doc_id, n.lang, n.source, n.kept_text
       |  FROM nsc n JOIN thr t USING (lang) WHERE n.neg_u >= t.thr),
       |gd AS (
       |  SELECT g.*, lower(regexp_extract(
       |    'https://' ||
       |    CASE WHEN doc_id % 10 < 3 THEN 'hot.example.com'
       |         ELSE 'd' || CAST(doc_id % 97 AS VARCHAR) || '.example.net' END ||
       |    '/doc/' || CAST(doc_id AS VARCHAR),
       |    '^https?://([^/]+)', 1)) AS domain
       |  FROM gated g),
       |capped AS (
       |  SELECT doc_id, lang, source, kept_text FROM (
       |    SELECT gd.*, row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
       |    FROM gd) WHERE rn <= 8),
       |mcounts AS (SELECT lang, count(*) AS n FROM capped GROUP BY lang),
       |mmin AS (SELECT min(n) AS n_min FROM mcounts),
       |mthr AS (
       |  SELECT lang,
       |    CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE))
       |      * 1000000.0) AS BIGINT) AS thr
       |  FROM mcounts CROSS JOIN mmin),
       |mixed AS (
       |  SELECT c.* FROM capped c JOIN mthr USING (lang)
       |  WHERE CAST(concat('0x', substring(md5(CAST(c.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
       |          % 1000000 < mthr.thr),
       |mc AS (
       |  SELECT md5('s10:' || CAST(doc_id AS VARCHAR)) AS skey,
       |    ${Tk("kept_text")} AS tk
       |  FROM mixed),
       |mn AS (SELECT skey, tk, CAST(len(tk) AS BIGINT) AS n FROM mc),
       |mo AS (
       |  SELECT skey, tk, n,
       |    CAST(coalesce(sum(n) OVER (ORDER BY skey
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
       |  FROM mn),
       |mg AS (SELECT off, unnest(generate_series(1, n)) AS i, tk FROM mo WHERE n > 0),
       |mtok AS (SELECT off + i - 1 AS gpos, tk[i] AS tok FROM mg),
       |chunks AS (
       |  SELECT gpos // 256 AS chunk_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    md5(string_agg(tok, ' ' ORDER BY gpos)) AS chunk_fp
       |  FROM mtok GROUP BY 1),
       |manifest AS (
       |  SELECT chunk_id // 4 AS shard_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |    md5(string_agg(chunk_fp, ' ' ORDER BY chunk_id)) AS shard_fp
       |  FROM chunks GROUP BY 1),
       |stats AS (SELECT
       |  (SELECT count(*) FROM documents) AS n_input,
       |  (SELECT count(*) FROM slice) AS n_slice,
       |  (SELECT count(*) FROM clean) AS n_clean,
       |  (SELECT count(*) FROM dd) AS n_dedup,
       |  (SELECT count(*) FROM gated) AS n_gated,
       |  (SELECT count(*) FROM capped) AS n_capped,
       |  (SELECT count(*) FROM mixed) AS n_mixed)
       |SELECT m.shard_id, m.n_chunks, m.n_tokens, m.shard_fp, s.*
       |FROM manifest m CROSS JOIN stats s""".stripMargin

  /** q179 oracle: the v2 funnel as one CTE chain — q95's slice+decon
    * prefix verbatim, then q127's span-removal CTEs over the clean
    * slice, q94's cell/subcell candidates over the survivors'
    * embeddings + q131's recursive-CTE closure and quality argmax on
    * the REWRITTEN text, the shared-LM gate readout, q95's mix, and
    * q120's curriculum-ordered chunk/manifest tail.
    */
  private def q179Sql: String =
    s"""WITH RECURSIVE fp_old AS MATERIALIZED (
       |  SELECT doc_id, md5(trim(regexp_replace(lower(
       |    CASE WHEN doc_id % 11 = 0 THEN text || ' v0' ELSE text END),
       |    '\\s+', ' ', 'g'))) AS fp
       |  FROM documents WHERE doc_id % 7 != 3),
       |fp_new AS MATERIALIZED (
       |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |  FROM documents),
       |slice AS MATERIALIZED (
       |  SELECT d.doc_id, d.text, d.lang, d.source
       |  FROM documents d JOIN fp_new n USING (doc_id)
       |  LEFT JOIN fp_old o USING (doc_id)
       |  WHERE o.doc_id IS NULL OR (o.fp = n.fp) IS NOT TRUE),
       |stoks AS MATERIALIZED (SELECT doc_id, ${Tk("text")} AS tk FROM slice),
       |atoks AS MATERIALIZED (SELECT doc_id, ${Tk("text")} AS tk FROM documents),
       |btoks AS MATERIALIZED (
       |  SELECT doc_id AS bench_id,
       |    list_slice(tk, len(tk)//4 + 1,
       |               len(tk)//4 + greatest(len(tk)//2, 1)) AS tk
       |  FROM atoks WHERE doc_id % 25 = 0),
       |cg AS MATERIALIZED (
       |  SELECT doc_id, CASE WHEN len(tk) = 0 THEN []
       |    ELSE list_distinct(list_transform(generate_series(1, greatest(len(tk) - 4, 1)),
       |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))) END AS g
       |  FROM stoks),
       |bg AS MATERIALIZED (
       |  SELECT bench_id, CASE WHEN len(tk) = 0 THEN []
       |    ELSE list_distinct(list_transform(generate_series(1, greatest(len(tk) - 4, 1)),
       |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))) END AS g
       |  FROM btoks),
       |cpost AS MATERIALIZED (SELECT doc_id, unnest(g) AS gram FROM cg),
       |rare AS MATERIALIZED (SELECT gram FROM cpost GROUP BY gram HAVING count(*) <= 1000),
       |keptg AS MATERIALIZED (SELECT c.* FROM cpost c JOIN rare r USING (gram)),
       |bpost AS MATERIALIZED (SELECT bench_id, unnest(g) AS gram FROM bg),
       |bsizes AS MATERIALIZED (SELECT bench_id, len(g) AS n_bench_grams FROM bg),
       |shared AS MATERIALIZED (
       |  SELECT k.doc_id, b.bench_id, count(*) AS n_shared
       |  FROM keptg k JOIN bpost b USING (gram) GROUP BY 1, 2),
       |flagged AS MATERIALIZED (
       |  SELECT DISTINCT s.doc_id FROM shared s JOIN bsizes z USING (bench_id)
       |  WHERE s.n_shared * 1.0 / z.n_bench_grams >= 0.5),
       |clean AS MATERIALIZED (
       |  SELECT * FROM slice WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
       |ct AS MATERIALIZED (SELECT doc_id, ${Tk("text")} AS tk FROM clean),
       |g3 AS MATERIALIZED (
       |  SELECT doc_id, i - 1 AS pos,
       |    md5(array_to_string(tk[i:i+7], ' ')) AS g
       |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
       |        FROM ct WHERE len(tk) >= 8)),
       |kg3 AS MATERIALIZED (
       |  SELECT g3.doc_id, g3.pos, g3.g FROM g3
       |  JOIN (SELECT g, count(DISTINCT doc_id) AS df FROM g3 GROUP BY g) f
       |    ON g3.g = f.g WHERE f.df BETWEEN 2 AND 50),
       |m3 AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
       |    b.pos AS pb, b.pos - a.pos AS d
       |  FROM kg3 a JOIN kg3 b ON a.g = b.g AND a.doc_id < b.doc_id),
       |r3 AS MATERIALIZED (
       |  SELECT *, pa - row_number() OVER (
       |    PARTITION BY id_a, id_b, d ORDER BY pa) AS run
       |  FROM m3),
       |sp3 AS MATERIALIZED (
       |  SELECT id_b, min(pb) AS start_b,
       |    max(pa) - min(pa) + 8 AS span_tokens
       |  FROM r3 GROUP BY id_a, id_b, d, run
       |  HAVING max(pa) - min(pa) + 8 >= 12),
       |iv3 AS MATERIALIZED (SELECT id_b AS doc_id, start_b AS s,
       |        start_b + span_tokens AS e FROM sp3),
       |mk3 AS MATERIALIZED (
       |  SELECT doc_id, s, e, max(e) OVER (
       |    PARTITION BY doc_id ORDER BY s, e
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |  FROM iv3),
       |isl3 AS MATERIALIZED (
       |  SELECT doc_id, s, e,
       |    sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
       |  FROM mk3),
       |mg3 AS MATERIALIZED (SELECT doc_id, min(s) AS s, max(e) AS e
       |        FROM isl3 GROUP BY doc_id, grp),
       |pos3 AS MATERIALIZED (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i
       |         FROM ct WHERE len(tk) > 0),
       |kp3 AS MATERIALIZED (
       |  SELECT p.doc_id, p.i, p.tk[p.i] AS tok FROM pos3 p
       |  WHERE NOT EXISTS (SELECT 1 FROM mg3
       |    WHERE mg3.doc_id = p.doc_id AND p.i - 1 >= mg3.s AND p.i - 1 < mg3.e)),
       |ag3 AS MATERIALIZED (SELECT doc_id, count(*) AS n_kept,
       |        string_agg(tok, ' ' ORDER BY i) AS kept_text
       |        FROM kp3 GROUP BY doc_id),
       |spanned AS MATERIALIZED (
       |  SELECT c.doc_id, c.lang, c.source, a.kept_text
       |  FROM clean c JOIN ag3 a USING (doc_id) WHERE a.n_kept > 0),
       |e4 AS MATERIALIZED (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne
       |       FROM embeddings JOIN spanned ON vec_id = spanned.doc_id),
       |nn4 AS MATERIALIZED (SELECT greatest(1,
       |          CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)) AS k
       |        FROM e4),
       |rc4 AS MATERIALIZED (
       |  SELECT nid AS cid, ne AS ce,
       |    row_number() OVER (ORDER BY md5(CAST(nid AS VARCHAR)), nid) AS rn
       |  FROM e4),
       |cents4 AS MATERIALIZED (SELECT cid, ce FROM rc4 CROSS JOIN nn4 WHERE rn <= k),
       |assign4 AS MATERIALIZED (
       |  SELECT nid, ne, cid,
       |    list_dot_product(ce, ce) - 2 * list_dot_product(ne, ce) AS dist
       |  FROM e4 CROSS JOIN cents4),
       |cells4 AS MATERIALIZED (
       |  SELECT nid, ne, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY nid ORDER BY dist, cid) AS rn
       |    FROM assign4) WHERE rn = 1),
       |sizes4 AS MATERIALIZED (SELECT cell, count(*) AS sz FROM cells4 GROUP BY cell),
       |sub4 AS MATERIALIZED (
       |  SELECT nid, ne, cells4.cell AS cell,
       |    CAST(concat('0x', substring(md5(CAST(nid AS VARCHAR)), 1, 8)) AS BIGINT)
       |      % CAST(ceil(CAST(sz AS DOUBLE) / 4096.0) AS BIGINT) AS subcell
       |  FROM cells4 JOIN sizes4 ON cells4.cell = sizes4.cell),
       |prs AS MATERIALIZED (
       |  SELECT a.nid AS src, b.nid AS dst
       |  FROM sub4 a JOIN sub4 b ON a.cell = b.cell AND a.subcell = b.subcell
       |    AND a.nid < b.nid AND list_cosine_similarity(a.ne, b.ne) >= 0.3),
       |sym4 AS MATERIALIZED (SELECT src, dst FROM prs UNION SELECT dst, src FROM prs),
       |nodes4 AS (SELECT DISTINCT src AS id FROM sym4),
       |reach(id, rr) AS (
       |  SELECT id, id FROM nodes4
       |  UNION
       |  SELECT s.dst, reach.rr FROM reach JOIN sym4 s ON s.src = reach.id),
       |cmp4 AS MATERIALIZED (SELECT id, min(rr) AS comp FROM reach GROUP BY id),
       |sc4 AS MATERIALIZED (
       |  SELECT doc_id, lang, source, kept_text,
       |    CAST(-3000000 - 40000*len(${Tk("kept_text")})
       |      + 200000*len(list_distinct(${Tk("kept_text")}))
       |      + 2000*len(regexp_replace(kept_text, '\\s', '', 'g'))
       |      + 300000*len(list_filter(${Tk("kept_text")},
       |          t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
       |      AS BIGINT) AS s
       |  FROM spanned),
       |lab4 AS MATERIALIZED (
       |  SELECT sc4.*, coalesce(cmp4.comp, sc4.doc_id) AS comp
       |  FROM sc4 LEFT JOIN cmp4 ON sc4.doc_id = cmp4.id),
       |rk4 AS MATERIALIZED (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY comp ORDER BY s DESC, doc_id) AS rn
       |  FROM lab4),
       |bestrep AS MATERIALIZED (
       |  SELECT doc_id, lang, source, kept_text FROM rk4 WHERE rn = 1),
       |ptoks AS MATERIALIZED (SELECT doc_id, ${Tk("kept_text")} AS tk FROM bestrep),
       |pbg AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
       |      i -> [tk[i], tk[i+1]])) AS b
       |  FROM ptoks),
       |ppairs AS MATERIALIZED (SELECT doc_id, b[1] AS w1, b[2] AS w2 FROM pbg),
       |pc12 AS MATERIALIZED (SELECT w1, w2, count(*) AS c12 FROM ppairs GROUP BY w1, w2),
       |pc1 AS MATERIALIZED (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pc12 GROUP BY w1),
       |pv AS MATERIALIZED (SELECT count(DISTINCT t) AS v FROM
       |  (SELECT w1 AS t FROM pc12 UNION SELECT w2 AS t FROM pc12)),
       |pnll AS MATERIALIZED (
       |  SELECT p.doc_id,
       |    CAST(floor(-ln((pc12.c12 + 1) / CAST(pc1.c1 + pv.v AS DOUBLE))
       |      * 1000000.0 + 0.5) AS BIGINT) AS nll_u
       |  FROM ppairs p JOIN pc12 USING (w1, w2) JOIN pc1 USING (w1) CROSS JOIN pv),
       |psc AS MATERIALIZED (
       |  SELECT doc_id, count(*) AS nb, CAST(sum(nll_u) AS BIGINT) AS s
       |  FROM pnll GROUP BY doc_id),
       |nsc AS MATERIALIZED (
       |  SELECT b.doc_id, b.lang, b.source, b.kept_text,
       |    -(psc.s // psc.nb) AS neg_u,
       |    CAST(floor(CAST(psc.s AS DOUBLE) / psc.nb / 100.0 + 0.5)
       |      AS BIGINT) AS nllu
       |  FROM bestrep b JOIN psc USING (doc_id)),
       |thr AS MATERIALIZED (SELECT lang, quantile_cont(neg_u, 0.5) AS thr FROM nsc GROUP BY lang),
       |gated AS MATERIALIZED (
       |  SELECT n.doc_id, n.lang, n.source, n.kept_text, n.nllu
       |  FROM nsc n JOIN thr t USING (lang) WHERE n.neg_u >= t.thr),
       |mcounts AS MATERIALIZED (SELECT lang, count(*) AS n FROM gated GROUP BY lang),
       |mmin AS MATERIALIZED (SELECT min(n) AS n_min FROM mcounts),
       |mthr AS MATERIALIZED (
       |  SELECT lang,
       |    CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE))
       |      * 1000000.0) AS BIGINT) AS thr
       |  FROM mcounts CROSS JOIN mmin),
       |mixed AS MATERIALIZED (
       |  SELECT g.* FROM gated g JOIN mthr USING (lang)
       |  WHERE CAST(concat('0x', substring(md5(CAST(g.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
       |          % 1000000 < mthr.thr),
       |cthr AS MATERIALIZED (SELECT ${(1 to 9).map(i =>
             s"CAST(floor(quantile_cont(nllu, 0.$i) * 10000.0 + 0.5) AS BIGINT) AS t$i")
             .mkString(", ")} FROM mixed),
       |ck AS MATERIALIZED (
       |  SELECT doc_id, kept_text,
       |    CAST(${(1 to 9).map(i =>
             s"CASE WHEN nllu * 10000 > cthr.t$i THEN 1 ELSE 0 END")
             .mkString(" + ")} AS BIGINT) AS bucket,
       |    md5('cur:' || CAST(doc_id AS VARCHAR)) AS ckey
       |  FROM mixed CROSS JOIN cthr),
       |mc AS MATERIALIZED (
       |  SELECT CAST(bucket AS VARCHAR) || ':' || ckey || ':' ||
       |    lpad(CAST(doc_id AS VARCHAR), 10, '0') AS okey,
       |    ${Tk("kept_text")} AS tk
       |  FROM ck),
       |mn AS MATERIALIZED (SELECT okey, tk, CAST(len(tk) AS BIGINT) AS n FROM mc),
       |mo AS MATERIALIZED (
       |  SELECT okey, tk, n,
       |    CAST(coalesce(sum(n) OVER (ORDER BY okey
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
       |  FROM mn),
       |mg7 AS MATERIALIZED (SELECT off, unnest(generate_series(1, n)) AS i, tk FROM mo WHERE n > 0),
       |mtok AS MATERIALIZED (SELECT off + i - 1 AS gpos, tk[i] AS tok FROM mg7),
       |chunks AS MATERIALIZED (
       |  SELECT gpos // 256 AS chunk_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    md5(string_agg(tok, ' ' ORDER BY gpos)) AS chunk_fp
       |  FROM mtok GROUP BY 1),
       |manifest AS MATERIALIZED (
       |  SELECT chunk_id // 4 AS shard_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |    md5(string_agg(chunk_fp, ' ' ORDER BY chunk_id)) AS shard_fp
       |  FROM chunks GROUP BY 1),
       |stats AS (SELECT
       |  (SELECT count(*) FROM documents) AS n_input,
       |  (SELECT count(*) FROM slice) AS n_slice,
       |  (SELECT count(*) FROM clean) AS n_clean,
       |  (SELECT count(*) FROM spanned) AS n_spanned,
       |  (SELECT count(*) FROM bestrep) AS n_bestrep,
       |  (SELECT count(*) FROM gated) AS n_gated,
       |  (SELECT count(*) FROM mixed) AS n_mixed)
       |SELECT m.shard_id, m.n_chunks, m.n_tokens, m.shard_fp, s.*
       |FROM manifest m CROSS JOIN stats s""".stripMargin

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql("q95_corpus_to_shards", q95Sql) { (s, d) =>
      val docs = Tables.documents(s, d)

      // S1 — snapshot reprocess slice (q92 construction, amended on the
      // OLD side so the new text stays canonical): docs with
      // doc_id % 7 == 3 are absent from the old snapshot (added), every
      // 11th doc's old fingerprint differs (changed); only those
      // re-enter the pipeline this "refresh".
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"), TextFunctions.fingerprint(
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v0")))
            .otherwise(col("text"))).as("fp"))
      val newSnap = docs.select(col("doc_id"), col("text"), col("lang"),
        col("source"), TextFunctions.fingerprint(col("text")).as("fp"))
      val sliceDf = Snapshot.reprocessSlice(oldSnap, newSnap, "doc_id", "fp")
        .drop("fp").localCheckpoint()

      // S2 — Bloom-screened decontamination (q89 construction: the eval
      // set is the middle half of every 25th document of the FULL
      // corpus — external to the slice); flagged docs leave the pipeline
      val toks = TextFunctions.tokens(col("text"))
      val bench = docs.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("bench_id"),
          concat_ws(" ", slice(toks,
            (floor(size(toks) / 4) + 1).cast("int"),
            greatest(floor(size(toks) / 2), lit(1)).cast("int"))).as("btext"))
      val flagged = Decontamination.benchmarkContainmentBloom(
          sliceDf, "doc_id", "text", bench, "bench_id", "btext")
        .select(col("id").as("doc_id")).distinct()
      val clean = sliceDf.join(flagged, Seq("doc_id"), "left_anti").localCheckpoint()

      // S3 — segment-level keep-first dedup (q77 shape); fully-duplicate
      // and zero-token docs (n_kept = 0) leave here
      val deduped = Dedup.segmentDedup(clean, "doc_id", "text", width = 16)
        .filter(col("n_kept") > 0)
        .join(clean.select("doc_id", "lang", "source"), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"), col("kept_text"))
        .localCheckpoint()

      // S4 — bigram-LM perplexity (trained on the deduped slice itself,
      // q85 machinery) + per-language MEDIAN gate on the integer
      // micro-nat mean (integer scores make the interpolated threshold
      // exact on both engines); the gate keeps the LOW-perplexity half,
      // so the score is negated into percentileGate's >= convention
      val scores = LanguageModel.perplexityScores(deduped, "doc_id", "kept_text")
        .withColumnRenamed("id", "doc_id")
        .select(col("doc_id"),
          (-expr("nll_micro_sum div n_bigrams")).as("neg_u"))
      val scored = deduped.join(scores, Seq("doc_id")).localCheckpoint()
      val gated = Sampling.percentileGate(scored, "lang", "neg_u", 0.5,
          exact = true)
        .drop("neg_u")
        .localCheckpoint()

      // S5 — per-domain cap (q87's synthetic URL: one hot domain holding
      // 30% of ids plus 97 long-tail domains), smallest ids win
      val url = concat(lit("https://"),
        when(pmod(col("doc_id"), lit(10)) < 3, lit("hot.example.com"))
          .otherwise(concat(lit("d"), pmod(col("doc_id"), lit(97)).cast("string"),
            lit(".example.net"))),
        lit("/doc/"), col("doc_id").cast("string"))
      val capped = Sampling.domainCap(gated.withColumn("url", url),
        "url", "doc_id", cap = 8).drop("url").localCheckpoint()

      // S6 — √-temperature language rebalancing (q88)
      val mixed = Sampling.sqrtTemperatureSample(capped, "lang", "doc_id")
        .localCheckpoint()

      // S7 — seeded shuffle (md5 permutation, q81) + concat-and-chunk
      // packing (q80/q93) + 4-chunk shard manifest (q93)
      val packedIn = mixed.select(col("doc_id"),
          TextFunctions.tokens(col("kept_text")).as("tk"))
        .withColumn("skey",
          md5(concat_ws(":", lit("s10"), col("doc_id").cast("string"))))
      val manifest = Packing.shardManifest(
        Packing.packChunks(packedIn, "skey", "tk", capacity = 256,
          groupOf = substring(col("skey"), 1, 2)),
        chunksPerShard = 4)

      // S8 — the funnel's survival counts ride every row: the hash check
      // then pins not just the shard fingerprints but the whole funnel
      val stats = docs.agg(count(lit(1)).as("n_input"))
        .crossJoin(sliceDf.agg(count(lit(1)).as("n_slice")))
        .crossJoin(clean.agg(count(lit(1)).as("n_clean")))
        .crossJoin(deduped.agg(count(lit(1)).as("n_dedup")))
        .crossJoin(gated.agg(count(lit(1)).as("n_gated")))
        .crossJoin(capped.agg(count(lit(1)).as("n_capped")))
        .crossJoin(mixed.agg(count(lit(1)).as("n_mixed")))
      manifest.crossJoin(broadcast(stats))
    },

    // q116: curriculum ordering — the training-ORDER stage between
    // selection and packing. Difficulty = q85's integer micro-nat mean
    // NLL; deciles come from nine exact percentile thresholds
    // (value-based assignment, so ties share a bucket and the rule is
    // engine-replayable — positional ntile would need a global sort);
    // within a bucket the order key is a fresh md5 draw, giving the
    // standard easy→hard curriculum with shuffled bands. The ordering
    // KEY (bucket, ckey, doc_id) is the deliverable: shard writers
    // range-partition by it (q81/q93 machinery); no global window
    // anywhere. Docs with <2 tokens have no perplexity and are
    // excluded (curriculum needs a difficulty signal). At 100 TB the
    // nine exact percentiles become approx_percentile (q86's trade).
    QueryDef.sql(
      "q116_curriculum_order",
      s"""WITH $CurriculumCtes
         |SELECT doc_id, nllu, bucket, ckey FROM cur""".stripMargin) { (s, d) =>
      curriculumKeyed(s, d)
    },

    // q120: curriculum-ORDERED shard materialization — closes the loop
    // q116 opened: its (bucket, ckey, doc_id) ordering key actually
    // drives the q80/q93 packing machinery. The key serializes as
    // `bucket:ckey:zero-padded-doc_id` so lexicographic order IS the
    // curriculum order; the prefix (bucket + first ckey hex char) is
    // the monotone prefix-sum group, so packing keeps the two-phase
    // shape with no global window. Chunks then freely span bucket
    // boundaries (concat-and-chunk over the curriculum stream) and the
    // 4-chunk shard manifest pins content AND order: a shard_fp only
    // matches if every chunk holds the right tokens in the right
    // curriculum position. Docs without a difficulty signal (<2
    // tokens) are excluded upstream by q116's contract — they carry no
    // tokens to pack either way. Writing the shards is
    // [[graft.operators.Packing.writeShards]] over the same chunks
    // frame (layout + fingerprint round-trip spec-pinned).
    // q179: corpus-to-shards v2 (VERDICT r11 #6) — q95's funnel rebuilt
    // with the round-11 stages: snapshot slice (q92) → Bloom decon
    // (q89) → SPAN REMOVAL (q127, replacing segment dedup: rewrite the
    // copies instead of dropping segments) → SEMANTIC dedup keeping the
    // BEST-quality representative (q94's cell/subcell candidates +
    // q131's cluster argmax, replacing min-id policies; pipeline tau
    // 0.3 — tighter than q94's 0.5 because the synthetic embeddings'
    // cosine mass sits lower than real text embeddings', and the
    // funnel must demonstrably exercise the stage) → perplexity
    // median gate (q85/q86) → √-temperature mix (q88) → CURRICULUM-
    // ordered shards (q116/q120, replacing the flat seeded shuffle).
    // One bigram LM (trained on the best-rep survivors) feeds BOTH the
    // gate (neg_u) and the curriculum difficulty (nllu) — one pass,
    // two readouts. Every inter-stage hand-off localCheckpoints (the
    // q95 structural rule) and the funnel's seven survival counts ride
    // every output row, so the hash check pins the shard fingerprints
    // AND the funnel's shape.
    QueryDef.sql("q179_corpus_to_shards_v2", q179Sql) { (s, d) =>
      import graft.operators.{Classifier, Similarity}
      val docs = Tables.documents(s, d)

      // S1 — snapshot reprocess slice (q95 S1 verbatim)
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"), TextFunctions.fingerprint(
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v0")))
            .otherwise(col("text"))).as("fp"))
      val newSnap = docs.select(col("doc_id"), col("text"), col("lang"),
        col("source"), TextFunctions.fingerprint(col("text")).as("fp"))
      val sliceDf = Snapshot.reprocessSlice(oldSnap, newSnap, "doc_id", "fp")
        .drop("fp").localCheckpoint()

      // S2 — Bloom-screened decontamination (q95 S2 verbatim)
      val toks = TextFunctions.tokens(col("text"))
      val bench = docs.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("bench_id"),
          concat_ws(" ", slice(toks,
            (floor(size(toks) / 4) + 1).cast("int"),
            greatest(floor(size(toks) / 2), lit(1)).cast("int"))).as("btext"))
      val flagged = Decontamination.benchmarkContainmentBloom(
          sliceDf, "doc_id", "text", bench, "bench_id", "btext")
        .select(col("id").as("doc_id")).distinct()
      val clean = sliceDf.join(flagged, Seq("doc_id"), "left_anti")
        .localCheckpoint()

      // S3 — span-level copy REMOVAL within the clean slice (q126/q127
      // machinery): each duplicated span keeps its first occurrence,
      // later holders lose the interval; docs rewritten to nothing drop
      val spanned = Dedup.removeSpans(clean, "doc_id", "text",
          Dedup.sharedSpans(clean, "doc_id", "text",
            w = 8, maxGramDf = 50, minSpan = 12))
        .filter(col("n_tokens") - col("n_removed") > 0)
        .join(clean.select("doc_id", "lang", "source"), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"), col("kept_text"))
        .localCheckpoint()

      // S4 — semantic dedup, BEST-quality representative: q94's
      // auto-k cell/subcell candidate pairs over the SURVIVORS'
      // embeddings, clustered transitively, each cluster keeping its
      // best doc by the q97 integer quality score on the REWRITTEN text
      val embS = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
        .join(spanned.select(col("doc_id").as("id")), Seq("id"))
        .localCheckpoint()
      val pairs = Similarity.semanticNearDupPairs(embS, tau = 0.3)
      val scored = Classifier.qualityClassify(spanned, "kept_text")
        .select(col("doc_id"), col("lang"), col("source"), col("kept_text"),
          col("score_micro"))
      val bestRep = Dedup.dedupByPairsBest(scored, "doc_id", "score_micro",
          pairs)
        .select(col("doc_id"), col("lang"), col("source"), col("kept_text"))
        .localCheckpoint()

      // S5 — ONE bigram LM (trained on the best-rep survivors), two
      // readouts: the gate score neg_u and the curriculum nllu
      val px = LanguageModel.perplexityScores(bestRep, "doc_id", "kept_text")
        .select(col("id").as("doc_id"),
          (-expr("nll_micro_sum div n_bigrams")).as("neg_u"),
          floor(col("nll_micro_sum").cast("double") / col("n_bigrams")
            / 100.0 + 0.5).cast("long").as("nllu"))
      val scoredG = bestRep.join(px, Seq("doc_id")).localCheckpoint()
      val gated = Sampling.percentileGate(scoredG, "lang", "neg_u", 0.5,
          exact = true)
        .drop("neg_u")
        .localCheckpoint()

      // S6 — √-temperature language rebalancing (q88)
      val mixed = Sampling.sqrtTemperatureSample(gated, "lang", "doc_id")
        .localCheckpoint()

      // S7 — curriculum-ordered shards (q116/q120): difficulty deciles
      // from nine exact percentiles over the FINAL mix, okey serializes
      // (bucket, md5 draw, doc_id) so lexicographic order IS the
      // curriculum order; packing keeps the two-phase prefix shape
      val thrExprs = (1 to 9).map(i =>
        floor(expr(s"percentile(nllu, 0.$i)") * 10000.0 + 0.5)
          .cast("long").as(s"t$i"))
      val thr = mixed.agg(thrExprs.head, thrExprs.tail: _*)
      val keyed = mixed.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("kept_text"),
          (1 to 9).map(i =>
            when(col("nllu") * 10000L > col(s"t$i"), 1).otherwise(0))
            .reduce(_ + _).cast("long").as("bucket"),
          md5(concat(lit("cur:"), col("doc_id").cast("string"))).as("ckey"))
      val packedIn = keyed.select(
        concat(col("bucket").cast("string"), lit(":"), col("ckey"),
          lit(":"), lpad(col("doc_id").cast("string"), 10, "0")).as("okey"),
        TextFunctions.tokens(col("kept_text")).as("tk"))
      val manifest = Packing.shardManifest(
        Packing.packChunks(packedIn, "okey", "tk", capacity = 256,
          groupOf = substring(col("okey"), 1, 3)),
        chunksPerShard = 4)

      // S8 — the funnel's survival counts ride every row
      val stats = docs.agg(count(lit(1)).as("n_input"))
        .crossJoin(sliceDf.agg(count(lit(1)).as("n_slice")))
        .crossJoin(clean.agg(count(lit(1)).as("n_clean")))
        .crossJoin(spanned.agg(count(lit(1)).as("n_spanned")))
        .crossJoin(bestRep.agg(count(lit(1)).as("n_bestrep")))
        .crossJoin(gated.agg(count(lit(1)).as("n_gated")))
        .crossJoin(mixed.agg(count(lit(1)).as("n_mixed")))
      manifest.crossJoin(broadcast(stats))
    },

    QueryDef.sql(
      "q120_curriculum_shards",
      s"""WITH $CurriculumCtes,
         |ok AS (
         |  SELECT doc_id,
         |    CAST(bucket AS VARCHAR) || ':' || ckey || ':' ||
         |      lpad(CAST(doc_id AS VARCHAR), 10, '0') AS okey
         |  FROM cur),
         |dt AS (SELECT ok.okey, ${Tk("d.text")} AS tk
         |       FROM documents d JOIN ok ON d.doc_id = ok.doc_id),
         |cn AS (SELECT okey, tk, CAST(len(tk) AS BIGINT) AS n FROM dt),
         |o AS (
         |  SELECT okey, tk, n,
         |    CAST(coalesce(sum(n) OVER (ORDER BY okey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS off
         |  FROM cn),
         |g AS (
         |  SELECT off, unnest(generate_series(1, n)) AS i, tk
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
      Packing.shardManifest(curriculumChunks(s, d), chunksPerShard = 4)
    }
  )

  /** The q116 curriculum key as a reusable frame:
    * (doc_id, nllu, bucket, ckey). Difficulty = q85's integer micro-nat
    * mean NLL; deciles from nine exact percentile thresholds
    * (value-based, engine-replayable); within-bucket order a fresh md5
    * draw. Docs with <2 tokens have no perplexity and are excluded. At
    * 100 TB the nine exact percentiles become approx_percentile (q86's
    * trade).
    */
  private def curriculumKeyed(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val scores = LanguageModel.perplexityScores(
        Tables.documents(s, d), "doc_id", "text")
      .select(col("id").as("doc_id"),
        floor(col("nll_micro_sum").cast("double") / col("n_bigrams") / 100.0
          + 0.5).cast("long").as("nllu"))
    val thrExprs = (1 to 9).map(i =>
      floor(expr(s"percentile(nllu, 0.$i)") * 10000.0 + 0.5)
        .cast("long").as(s"t$i"))
    val thr = scores.agg(thrExprs.head, thrExprs.tail: _*)
    scores.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("nllu"),
        (1 to 9).map(i =>
          when(col("nllu") * 10000L > col(s"t$i"), 1).otherwise(0))
          .reduce(_ + _).cast("long").as("bucket"),
        md5(concat(lit("cur:"), col("doc_id").cast("string"))).as("ckey"))
  }

  /** q120's chunk frame: curriculum-ordered concat-and-chunk packing of
    * `documents` (capacity 256). Shared by the query (manifest) and the
    * writeShards round-trip spec.
    */
  def curriculumChunks(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val okey = concat(col("bucket").cast("string"), lit(":"), col("ckey"),
      lit(":"), lpad(col("doc_id").cast("string"), 10, "0"))
    val packedIn = curriculumKeyed(s, d)
      .select(col("doc_id"), okey.as("okey"))
      .join(Tables.documents(s, d).select(col("doc_id"), col("text")), "doc_id")
      .select(col("okey"), TextFunctions.tokens(col("text")).as("tk"))
    Packing.packChunks(packedIn, "okey", "tk", capacity = 256,
      groupOf = substring(col("okey"), 1, 3))
  }

  /** DuckDB CTE chain ending in `cur (doc_id, nllu, bucket, ckey)` — the
    * q116 oracle body, shared with q120.
    */
  private def CurriculumCtes: String =
    s"""toks AS (SELECT doc_id, ${Tk("text")} AS tk FROM documents),
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
       |  SELECT doc_id,
       |    CAST(floor(CAST(sum(nll_u) AS DOUBLE) / count(*) / 100.0 + 0.5)
       |      AS BIGINT) AS nllu
       |  FROM nll GROUP BY doc_id),
       |thr AS (SELECT ${(1 to 9).map(i =>
           s"CAST(floor(quantile_cont(nllu, 0.$i) * 10000.0 + 0.5) AS BIGINT) AS t$i")
           .mkString(", ")} FROM sc),
       |cur AS (
       |  SELECT doc_id, nllu,
       |    CAST(${(1 to 9).map(i => s"CASE WHEN nllu * 10000 > thr.t$i THEN 1 ELSE 0 END")
           .mkString(" + ")} AS BIGINT) AS bucket,
       |    md5('cur:' || CAST(doc_id AS VARCHAR)) AS ckey
       |  FROM sc CROSS JOIN thr)""".stripMargin
}
