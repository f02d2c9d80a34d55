package graft.queries

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.{Decontamination, Evaluation, ProductQuantizer, Similarity}
import graft.functions.TextFunctions.round4hu
import org.apache.spark.sql.functions._

/** Embedding similarity-search coverage on the `embeddings` table
  * (array<float>, dim 64).
  *
  *  - q36 brute-force cosine top-k ANN baseline — exact DuckDB oracle via
  *    `list_cosine_similarity` over DOUBLE[] (same left-to-right double
  *    accumulation as the codegen'd cosine, so rank order matches).
  *  - q39 LSH-bucketed ANN — exact oracle: the hyperplanes are plan-time
  *    literal INTEGER weight arrays ([[VectorFunctions.hyperplaneWeights]]),
  *    so the very same literals are interpolated into the DuckDB SQL and
  *    buckets reproduce bit-for-bit (`list_dot_product` sign).
  *  - q40 multimodal feature rollup — exact oracle: the payload is
  *    ASCII-sanitized text bytes, so DuckDB recomputes the stub's byte
  *    histogram per character (float division parity via CAST AS FLOAT).
  */
object VectorOps {

  private val Dim = 64

  /** q40 DuckDB twin of Multimodal.decodeStub's byte histogram: per-doc
    * f_j = float(count of bytes ≡ j mod 8) / float(max(n,1)).
    */
  private def q40Sql: String = {
    val fCols = (0 until 8).map { j =>
      s"CAST(len(list_filter(bm, b -> b = $j)) AS FLOAT) / CAST(greatest(n_bytes, 1) AS FLOAT) AS f$j"
    }.mkString(",\n         |    ")
    val fSum = (0 until 8).map(j => s"CAST(f$j AS DOUBLE)").mkString(" + ")
    s"""WITH media AS (
       |  SELECT doc_id AS media_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image'
       |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |    regexp_replace(coalesce(text, ''), '[^\\x20-\\x7e]', '?', 'g') AS s
       |  FROM documents),
       |feats AS (
       |  SELECT media_id, kind, strlen(s) AS n_bytes,
       |    list_transform(range(1, CAST(strlen(s) AS INTEGER) + 1),
       |      i -> unicode(s[i:i]) % 8) AS bm
       |  FROM media),
       |hist AS (
       |  SELECT media_id, kind, n_bytes,
       |    $fCols
       |  FROM feats)
       |SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |  floor(avg(f0) * 10000.0 + 0.5) / 10000.0 AS avg_f0,
       |  floor(avg($fSum) * 10000.0 + 0.5) / 10000.0 AS avg_feature_sum
       |FROM hist GROUP BY kind""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q36_cosine_topk",
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings),
        |scored AS (
        |  SELECT qid, nid, list_cosine_similarity(qe, ne) AS cos
        |  FROM q CROSS JOIN c WHERE qid <> nid),
        |ranked AS (
        |  SELECT qid, nid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM scored)
        |SELECT qid, nid, floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine, rank
        |FROM ranked WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
      Similarity.bruteForceTopK(emb.filter(col("id") < 10), emb, k = 5)
        .select(col("qid"), col("nid"), round4hu(col("cosine")).as("cosine"), col("rank"))
    },

    QueryDef.sql(
      "q39_lsh_ann",
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings),
         |qb AS (SELECT qid, qe, ${VectorFunctions.lshBucketSql("qe", 4, Dim)} AS bucket FROM q),
         |cb AS (SELECT nid, ne, ${VectorFunctions.lshBucketSql("ne", 4, Dim)} AS bucket FROM c),
         |scored AS (
         |  SELECT qid, qb.bucket AS bucket, nid, list_cosine_similarity(qe, ne) AS cos
         |  FROM qb JOIN cb ON qb.bucket = cb.bucket WHERE qid <> nid),
         |ranked AS (
         |  SELECT qid, bucket, nid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, bucket, nid, floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine, rank
         |FROM ranked WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
      Similarity.lshTopK(emb.filter(col("id") < 10), emb, k = 3, nPlanes = 4, dim = Dim)
        .select(col("qid"), col("bucket"), col("nid"),
          round4hu(col("cosine")).as("cosine"), col("rank"))
    },

    QueryDef.sql("q40_multimodal_features", q40Sql) { (s, d) =>
      graft.operators.Multimodal.featureStats(
        graft.operators.Multimodal.fromDocuments(Tables.documents(s, d)))
    },

    // q69: the frame-sampling plan (sequence + explode over the typed
    // duration metadata) under the oracle — per video, frames at 500 ms
    // steps inclusive of the endpoint, so n = ⌊dur/500⌋+1 and
    // max = ⌊dur/500⌋·500 with dur = n_chars×10 from fromDocuments' meta
    QueryDef.sql(
      "q69_frame_sampling",
      """SELECT doc_id AS media_id,
        |  CAST((coalesce(n_chars, 0) * 10) // 500 + 1 AS BIGINT) AS n_frames,
        |  CAST((coalesce(n_chars, 0) * 10) // 500 * 500 AS BIGINT) AS max_frame_ms
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin) { (s, d) =>
      graft.operators.Multimodal.sampleFrames(
        graft.operators.Multimodal.fromDocuments(Tables.documents(s, d)),
        everyMs = 500)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"), max("frame_ms").as("max_frame_ms"))
    },

    // q135: ANN recall self-audit ([[graft.operators.Evaluation
    // .recallAtK]]) — the in-engine version of the rehearsal ladders'
    // recall column: IVF top-5 at nProbe 3/12 (q56's index) scored
    // against the exact brute-force top-5 (q36's ranking) per query,
    // as exact basis-point ratios. The post-rebuild index check a
    // production deployment alarms on.
    QueryDef.sql(
      "q135_ann_recall",
      """WITH c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne
        |           FROM embeddings),
        |cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
        |          FROM embeddings
        |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 12),
        |assign AS (
        |  SELECT nid, ne, cid,
        |    list_dot_product(ce, ce) - 2 * list_dot_product(ne, ce) AS dist
        |  FROM c CROSS JOIN cents),
        |cells AS (
        |  SELECT nid, ne, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY nid ORDER BY dist, cid) AS rn
        |    FROM assign) WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |      FROM embeddings WHERE vec_id < 10),
        |qassign AS (
        |  SELECT qid, qe, cid,
        |    list_dot_product(ce, ce) - 2 * list_dot_product(qe, ce) AS dist
        |  FROM q CROSS JOIN cents),
        |probes AS (
        |  SELECT qid, qe, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS rn
        |    FROM qassign) WHERE rn <= 3),
        |iscored AS (
        |  SELECT qid, nid, list_cosine_similarity(qe, ne) AS cos
        |  FROM probes JOIN cells ON probes.cell = cells.cell WHERE qid <> nid),
        |ivf AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid,
        |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |    FROM iscored) WHERE rank <= 5),
        |escored AS (
        |  SELECT q.qid, c.nid, list_cosine_similarity(qe, ne) AS cos
        |  FROM q CROSS JOIN c WHERE qid <> nid),
        |ex AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid,
        |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |    FROM escored) WHERE rank <= 5),
        |ov AS (SELECT ivf.qid, CAST(count(*) AS BIGINT) AS n_overlap
        |       FROM ivf JOIN ex ON ivf.qid = ex.qid AND ivf.nid = ex.nid
        |       GROUP BY ivf.qid),
        |ec AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_exact
        |       FROM ex GROUP BY qid)
        |SELECT ec.qid, coalesce(ov.n_overlap, 0) AS n_overlap, ec.n_exact,
        |  (coalesce(ov.n_overlap, 0) * 10000) // ec.n_exact AS recall_bp
        |FROM ec LEFT JOIN ov ON ec.qid = ov.qid""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      val queries = emb.filter(col("id") < 10)
      val cents = Similarity.sampleCentroidsPortable(emb, 12)
      Evaluation.recallAtK(
        Similarity.ivfTopK(queries, emb, k = 5, nProbe = 3,
          centroids = Some(cents)),
        Similarity.bruteForceTopK(queries, emb, k = 5), k = 5)
    },

    // q133: SEMANTIC decontamination ([[graft.operators.Decontamination
    // .semanticScreen]]) — the embedding-level bench-overlap screen the
    // n-gram paths (q73/q89) cannot see. Bench = vec_id % 4 == 0 (the
    // small fixed set, centroids fit there md5-portably), corpus = the
    // rest; same-cell cosine >= 0.4 flags a hit. Oracle replays fit,
    // argmin assignment, same-cell join, and the rounded max cosine.
    QueryDef.sql(
      "q133_semantic_decontamination",
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |bench AS (SELECT * FROM e WHERE id % 4 = 0),
        |corp AS (SELECT * FROM e WHERE id % 4 <> 0),
        |cents AS (SELECT id AS cid, v AS ce FROM bench
        |          ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 8),
        |bcell AS (
        |  SELECT id AS bid, v AS bv, cell FROM (
        |    SELECT bench.id, bench.v, c.cid AS cell,
        |      row_number() OVER (PARTITION BY bench.id
        |        ORDER BY list_dot_product(ce, ce) - 2 * list_dot_product(v, ce),
        |          c.cid) AS rn
        |    FROM bench CROSS JOIN cents c) WHERE rn = 1),
        |ccell AS (
        |  SELECT id, v, cell FROM (
        |    SELECT corp.id, corp.v, c.cid AS cell,
        |      row_number() OVER (PARTITION BY corp.id
        |        ORDER BY list_dot_product(ce, ce) - 2 * list_dot_product(v, ce),
        |          c.cid) AS rn
        |    FROM corp CROSS JOIN cents c) WHERE rn = 1),
        |hits AS (
        |  SELECT cc.id, list_cosine_similarity(cc.v, b.bv) AS cos
        |  FROM ccell cc JOIN bcell b USING (cell)
        |  WHERE list_cosine_similarity(cc.v, b.bv) >= 0.4)
        |SELECT id, CAST(count(*) AS BIGINT) AS n_bench_hits,
        |  floor(max(cos) * 10000.0 + 0.5) / 10000.0 AS max_cos4
        |FROM hits GROUP BY id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      Decontamination.semanticScreen(
        emb.filter(col("id") % 4 =!= 0), emb.filter(col("id") % 4 === 0),
        tau = 0.4, nCentroids = 8)
    },

    QueryDef.sql(
      "q56_ivf_ann",
      """WITH c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings),
        |cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
        |          FROM embeddings
        |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 12),
        |assign AS (
        |  SELECT nid, ne, cid,
        |    list_dot_product(ce, ce) - 2 * list_dot_product(ne, ce) AS dist
        |  FROM c CROSS JOIN cents),
        |cells AS (
        |  SELECT nid, ne, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY nid ORDER BY dist, cid) AS rn
        |    FROM assign) WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |      FROM embeddings WHERE vec_id < 10),
        |qassign AS (
        |  SELECT qid, qe, cid,
        |    list_dot_product(ce, ce) - 2 * list_dot_product(qe, ce) AS dist
        |  FROM q CROSS JOIN cents),
        |probes AS (
        |  SELECT qid, qe, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS rn
        |    FROM qassign) WHERE rn <= 3),
        |scored AS (
        |  SELECT qid, probes.cell AS cell, nid, list_cosine_similarity(qe, ne) AS cos
        |  FROM probes JOIN cells ON probes.cell = cells.cell WHERE qid <> nid),
        |ranked AS (
        |  SELECT qid, cell, nid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM scored)
        |SELECT qid, cell, nid, floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine, rank
        |FROM ranked WHERE rank <= 3""".stripMargin) { (s, d) =>
      // full-oracle IVF: md5-sampled centroids are recomputable by any
      // engine; cell assignment is ‖c‖²−2·x·c argmin (the same expansion
      // baked into centroidRanks, so literal norms and plan-time dot
      // products reproduce bit-for-bit against DuckDB's DOUBLE[] ops)
      val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
      val cents = Similarity.sampleCentroidsPortable(emb, 12)
      Similarity.ivfTopK(emb.filter(col("id") < 10), emb, k = 3,
        nProbe = 3, centroids = Some(cents))
        .select(col("qid"), col("cell"), col("nid"),
          round4hu(col("cosine")).as("cosine"), col("rank"))
    },

    // q62: embedding-cosine near-duplicate detection (the DEDUP
    // formulation of similarity — pairs above a threshold, not top-k),
    // LSH-blocked via the same plan-time-literal hyperplanes as q39 so
    // DuckDB reproduces buckets bit-for-bit. The testdata embeddings are
    // near-random (max pair cosine ≈ 0.6), so like q38 the query reports
    // the observability row a dedup operator needs either way: candidate
    // volume, pairs over the threshold, max cosine — per label so the
    // result is never empty and the blocking stats stay visible.
    QueryDef.sql(
      "q62_embedding_neardup",
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v, label
         |           FROM embeddings),
         |b AS (SELECT id, v, ${VectorFunctions.lshBucketSql("v", 4, Dim)} AS bucket FROM e),
         |pairs AS (
         |  SELECT list_cosine_similarity(a.v, b2.v) AS c
         |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.id < b2.id),
         |stats AS (
         |  SELECT count(*) AS n_candidate_pairs,
         |    CAST(sum(CASE WHEN c >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_05,
         |    floor(max(c) * 10000.0 + 0.5) / 10000.0 AS max_cosine
         |  FROM pairs)
         |SELECT label, count(*) AS n_vecs,
         |  s.n_candidate_pairs, s.n_neardup_05, s.max_cosine
         |FROM e CROSS JOIN stats s
         |GROUP BY label, s.n_candidate_pairs, s.n_neardup_05, s.max_cosine""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"), col("label"))
      // threshold −1 keeps every in-bucket candidate so the stats row can
      // report candidate volume alongside the ≥0.5 near-dup count
      val pairs = Similarity.cosineNearDupPairs(
        emb.select("id", "embedding"), threshold = -1.0, nPlanes = 4, dim = Dim)
      val stats = pairs.agg(
        count(lit(1)).as("n_candidate_pairs"),
        sum(when(col("cosine") >= 0.5, 1L).otherwise(0L)).as("n_neardup_05"),
        round4hu(max("cosine")).as("max_cosine"))
      emb.groupBy("label").agg(count(lit(1)).as("n_vecs"))
        .crossJoin(broadcast(stats))
    },

    // q94: SemDeDup-style semantic dedup ([[graft.operators.Similarity
    // .semanticDedup]]) — IVF-cell clustering with the AUTO-SCALED
    // centroid count (k = max(1, ⌈√n⌉), UNCLAMPED since r11 — the
    // oracle pins the scaling rule itself, not a frozen k; past
    // LiteralAssignLimit the same rule dispatches to the broadcast-join
    // argmin, cell-identical by spec), the unconditional
    // deterministic cell sub-split (⌈size/4096⌉ sub-cells by md5
    // id-hash — identity at these SFs, but the oracle replays the rule
    // so the guarded shape IS the verified shape), then the
    // upper-triangular drop: any vector with a cosine ≥ 0.5 smaller-id
    // neighbor in its (cell, subcell). DuckDB replays centroid
    // sampling, assignment, split, and drop with DOUBLE[] ops;
    // cross-engine ≥-on-cosine is the q62 precedent.
    QueryDef.sql(
      "q94_semantic_dedup",
      """WITH e AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings),
        |nn AS (SELECT greatest(1,
        |         CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)) AS k
        |       FROM e),
        |rc AS (
        |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce,
        |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |  FROM embeddings),
        |cents AS (SELECT cid, ce FROM rc CROSS JOIN nn WHERE rn <= k),
        |assign AS (
        |  SELECT nid, ne, cid,
        |    list_dot_product(ce, ce) - 2 * list_dot_product(ne, ce) AS dist
        |  FROM e CROSS JOIN cents),
        |cells AS (
        |  SELECT nid, ne, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY nid ORDER BY dist, cid) AS rn
        |    FROM assign) WHERE rn = 1),
        |sizes AS (SELECT cell, count(*) AS sz FROM cells GROUP BY cell),
        |sub AS (
        |  SELECT nid, ne, cells.cell AS cell,
        |    CAST(concat('0x', substring(md5(CAST(nid AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % CAST(ceil(CAST(sz AS DOUBLE) / 4096.0) AS BIGINT) AS subcell
        |  FROM cells JOIN sizes ON cells.cell = sizes.cell),
        |dropped AS (
        |  SELECT DISTINCT b.nid
        |  FROM sub a JOIN sub b ON a.cell = b.cell AND a.subcell = b.subcell
        |    AND a.nid < b.nid AND list_cosine_similarity(a.ne, b.ne) >= 0.5)
        |SELECT s.nid AS id, s.cell, (d.nid IS NULL) AS kept
        |FROM sub s LEFT JOIN dropped d ON s.nid = d.nid""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
      Similarity.semanticDedup(emb, tau = 0.5)
    },

    // q106: product-quantization encoding ([[graft.operators
    // .ProductQuantizer]]) — 8 subspaces × 16 codes over the 64-dim
    // embeddings, md5-portable codebooks, q56's ‖c‖²−2·x·c argmin on
    // dimension slices, distortion in order-free integer micro-units.
    // The oracle replays sampling, slicing, per-subspace argmin, bit
    // packing, and the micro-unit distortion sum.
    QueryDef.sql(
      "q106_pq_codes",
      s"""$PqCommonSql
         |SELECT nid AS vec_id,
         |  CAST(sum(CAST(code AS BIGINT) << (4 * mi)) AS BIGINT) AS packed_code,
         |  CAST(sum(t) AS BIGINT) AS distortion_u
         |FROM codes GROUP BY nid""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
      val model = ProductQuantizer.fitPortable(emb, dim = Dim, m = 8, ks = 16)
      ProductQuantizer.encode(emb, model)
        .select(col("id").as("vec_id"), col("packed_code"), col("distortion_u"))
    },

    // q107: ADC top-5 search over the q106 code table — per-query
    // micro-unit lookup tables built from the same codebooks, m
    // shift-mask lookups + an integer sum per code row, rank by
    // (dist_u, nid). Never touches the original embeddings after
    // encoding — the 100 TB search scans ~1.5% of the corpus bytes.
    QueryDef.sql(
      "q107_pq_adc_topk",
      s"""$PqCommonSql,
         |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |      FROM embeddings WHERE vec_id < 3),
         |qsl AS (
         |  SELECT qid, mi, j,
         |    list_slice(qe, 8 * mi + 1, 8 * mi + 8) AS qsub,
         |    list_slice(ce, 8 * mi + 1, 8 * mi + 8) AS csub
         |  FROM q CROSS JOIN ms CROSS JOIN cents),
         |qterms AS (
         |  SELECT qid, mi, j,
         |    CAST(floor(((list_dot_product(csub, csub)
         |           - 2 * list_dot_product(qsub, csub))
         |           + list_dot_product(qsub, qsub)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS t
         |  FROM qsl),
         |dist AS (
         |  SELECT qid, nid, CAST(sum(qt.t) AS BIGINT) AS dist_u
         |  FROM codes JOIN qterms qt ON qt.mi = codes.mi AND qt.j = codes.code
         |  WHERE nid <> qid GROUP BY qid, nid),
         |ranked AS (
         |  SELECT qid, nid, dist_u,
         |    row_number() OVER (PARTITION BY qid ORDER BY dist_u, nid) AS rank
         |  FROM dist)
         |SELECT qid, nid, dist_u, rank FROM ranked WHERE rank <= 5""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
        val model = ProductQuantizer.fitPortable(emb, dim = Dim, m = 8, ks = 16)
        val codes = ProductQuantizer.encode(emb, model)
        val queries = emb.filter(col("id") < 3).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
          .sortBy(_._1)
        ProductQuantizer.adcTopK(codes, queries, model, k = 5)
          .select(col("qid"), col("nid"), col("dist_u"), col("rank"))
    },

    // q114: IVF-PQ — the FAISS composition of q56's coarse cells with
    // q107's ADC code scoring. Queries probe their 3 nearest of 12
    // coarse cells and ADC-score ONLY the code rows there: the scan
    // reads nProbe/nlist of a code table that is itself ~1.5% of the
    // corpus bytes. The oracle replays coarse assignment, probe
    // selection, LUTs, the cell-restricted join, and ranking.
    QueryDef.sql(
      "q114_ivfpq_topk",
      s"""$PqCommonSql,
         |ccents AS (
         |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cce
         |  FROM embeddings
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 12),
         |cells AS (
         |  SELECT nid, cid AS cell FROM (
         |    SELECT nid, cid,
         |      row_number() OVER (PARTITION BY nid ORDER BY
         |        list_dot_product(cce, cce) - 2 * list_dot_product(ne, cce),
         |        cid) AS rn
         |    FROM e CROSS JOIN ccents) WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |      FROM embeddings WHERE vec_id < 3),
         |qprobes AS (
         |  SELECT qid, cid AS cell FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY
         |        list_dot_product(cce, cce) - 2 * list_dot_product(qe, cce),
         |        cid) AS rn
         |    FROM q CROSS JOIN ccents) WHERE rn <= 3),
         |qsl AS (
         |  SELECT qid, mi, j,
         |    list_slice(qe, 8 * mi + 1, 8 * mi + 8) AS qsub,
         |    list_slice(ce, 8 * mi + 1, 8 * mi + 8) AS csub
         |  FROM q CROSS JOIN ms CROSS JOIN cents),
         |qterms AS (
         |  SELECT qid, mi, j,
         |    CAST(floor(((list_dot_product(csub, csub)
         |           - 2 * list_dot_product(qsub, csub))
         |           + list_dot_product(qsub, qsub)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS t
         |  FROM qsl),
         |dist AS (
         |  SELECT qt.qid, c.nid, CAST(sum(qt.t) AS BIGINT) AS dist_u
         |  FROM codes c
         |  JOIN cells ON cells.nid = c.nid
         |  JOIN qprobes qp ON qp.cell = cells.cell
         |  JOIN qterms qt ON qt.qid = qp.qid AND qt.mi = c.mi AND qt.j = c.code
         |  WHERE c.nid <> qp.qid
         |  GROUP BY qt.qid, c.nid),
         |ranked AS (
         |  SELECT qid, nid, dist_u,
         |    row_number() OVER (PARTITION BY qid ORDER BY dist_u, nid) AS rank
         |  FROM dist)
         |SELECT qid, nid, dist_u, rank FROM ranked WHERE rank <= 5""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
        val model = ProductQuantizer.fitPortable(emb, dim = Dim, m = 8, ks = 16)
        val coarse = Similarity.sampleCentroidsPortable(emb, 12)
        val index = ProductQuantizer.ivfpqIndex(emb, coarse, model)
        val queries = emb.filter(col("id") < 3).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
          .sortBy(_._1)
        ProductQuantizer.ivfpqTopK(index, queries, model, coarse,
            nProbe = 3, k = 5)
          .select(col("qid"), col("nid"), col("dist_u"), col("rank"))
    },

    // q118: ADC shortlist + EXACT rerank — the FAISS two-stage search
    // (shortlist 4·k by ADC over the codes, rescore those 20 rows with
    // the exact micro-unit distance against the original vectors, keep
    // top 5 by (exact_u, nid)). Closes the r10 recall ceiling: the
    // rerank reads |q|·20 vectors — free at any scale. The oracle
    // replays codebooks, ADC shortlist, and the exact rescore.
    QueryDef.sql(
      "q118_pq_adc_rerank",
      s"""$PqCommonSql,
         |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |      FROM embeddings WHERE vec_id < 3),
         |qsl AS (
         |  SELECT qid, mi, j,
         |    list_slice(qe, 8 * mi + 1, 8 * mi + 8) AS qsub,
         |    list_slice(ce, 8 * mi + 1, 8 * mi + 8) AS csub
         |  FROM q CROSS JOIN ms CROSS JOIN cents),
         |qterms AS (
         |  SELECT qid, mi, j,
         |    CAST(floor(((list_dot_product(csub, csub)
         |           - 2 * list_dot_product(qsub, csub))
         |           + list_dot_product(qsub, qsub)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS t
         |  FROM qsl),
         |dist AS (
         |  SELECT qid, nid, CAST(sum(qt.t) AS BIGINT) AS dist_u
         |  FROM codes JOIN qterms qt ON qt.mi = codes.mi AND qt.j = codes.code
         |  WHERE nid <> qid GROUP BY qid, nid),
         |short AS (
         |  SELECT qid, nid FROM (
         |    SELECT qid, nid,
         |      row_number() OVER (PARTITION BY qid ORDER BY dist_u, nid) AS r
         |    FROM dist) WHERE r <= 20),
         |ex AS (
         |  SELECT s.qid, s.nid,
         |    CAST(floor(((list_dot_product(qe, qe)
         |           - 2 * list_dot_product(ne, qe))
         |           + list_dot_product(ne, ne)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS exact_u
         |  FROM short s JOIN e ON e.nid = s.nid JOIN q ON q.qid = s.qid),
         |ranked AS (
         |  SELECT qid, nid, exact_u,
         |    row_number() OVER (PARTITION BY qid ORDER BY exact_u, nid) AS rank
         |  FROM ex)
         |SELECT qid, nid, exact_u, rank FROM ranked WHERE rank <= 5""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
        val model = ProductQuantizer.fitPortable(emb, dim = Dim, m = 8, ks = 16)
        val codes = ProductQuantizer.encode(emb, model)
        val queries = emb.filter(col("id") < 3).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
          .sortBy(_._1)
        ProductQuantizer.adcTopKRerank(codes, emb, queries, model, k = 5,
            shortlistMult = 4)
          .select(col("qid"), col("nid"), col("exact_u"), col("rank"))
    },

    // q124: RESIDUAL IVF-PQ — the true FAISS IVFPQ: codes quantize
    // x − c(cell) (residuals cluster near 0, so the same 8×16 codebook
    // budget resolves much finer structure than raw-vector codes), in
    // the engine's integer discipline: residuals are micro-unit
    // BIGINTs, codebooks are md5-sampled residual rows, and every
    // distance from there on is exact integer arithmetic — no floats
    // anywhere after the one quantization step. Search probes 3 of 12
    // cells and scores codes against PER-CELL query-residual LUTs.
    // The oracle replays assignment, residuals, codebook sampling,
    // encoding, per-cell LUTs, and ranking end to end.
    QueryDef.sql(
      "q124_ivfpq_residual",
      """WITH e AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings),
        |cc AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cce
        |       FROM embeddings
        |       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 12),
        |cells AS (
        |  SELECT nid, cid AS cell FROM (
        |    SELECT nid, cid, row_number() OVER (PARTITION BY nid ORDER BY
        |      list_dot_product(cce, cce) - 2 * list_dot_product(ne, cce),
        |      cid) AS rn
        |    FROM e CROSS JOIN cc) WHERE rn = 1),
        |resid AS (
        |  SELECT e.nid, cells.cell,
        |    list_transform(generate_series(1, 64),
        |      i -> CAST(floor((ne[i] - cce[i]) * 1000000.0 + 0.5) AS BIGINT))
        |      AS rv
        |  FROM e JOIN cells USING (nid) JOIN cc ON cells.cell = cc.cid),
        |rc AS (
        |  SELECT rn - 1 AS j, rv AS cv FROM (
        |    SELECT row_number() OVER (
        |      ORDER BY md5(CAST(nid AS VARCHAR)), nid) AS rn, rv
        |    FROM resid) WHERE rn <= 16),
        |ms AS (SELECT unnest(generate_series(0, 7)) AS mi),
        |assign AS (
        |  SELECT nid, cell, mi, j,
        |    CAST(list_dot_product(csub, csub)
        |       - 2 * list_dot_product(nsub, csub) AS BIGINT) AS d
        |  FROM (
        |    SELECT nid, cell, mi, j,
        |      CAST(list_slice(rv, 8 * mi + 1, 8 * mi + 8) AS DOUBLE[]) AS nsub,
        |      CAST(list_slice(cv, 8 * mi + 1, 8 * mi + 8) AS DOUBLE[]) AS csub
        |    FROM resid CROSS JOIN ms CROSS JOIN rc)),
        |codes AS (
        |  SELECT nid, cell, mi, j AS code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY nid, mi ORDER BY d, j) AS rn
        |    FROM assign) WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |      FROM embeddings WHERE vec_id < 3),
        |qprobes AS (
        |  SELECT qid, cid AS cell FROM (
        |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY
        |      list_dot_product(cce, cce) - 2 * list_dot_product(qe, cce),
        |      cid) AS rn
        |    FROM q CROSS JOIN cc) WHERE rn <= 3),
        |qresid AS (
        |  SELECT qid, qp.cell,
        |    list_transform(generate_series(1, 64),
        |      i -> CAST(floor((qe[i] - cce[i]) * 1000000.0 + 0.5) AS BIGINT))
        |      AS qr
        |  FROM q JOIN qprobes qp USING (qid) JOIN cc ON qp.cell = cc.cid),
        |qterms AS (
        |  SELECT qid, cell, mi, j,
        |    CAST(list_dot_product(qsub, qsub)
        |       - 2 * list_dot_product(qsub, csub)
        |       + list_dot_product(csub, csub) AS BIGINT) AS t
        |  FROM (
        |    SELECT qid, cell, mi, j,
        |      CAST(list_slice(qr, 8 * mi + 1, 8 * mi + 8) AS DOUBLE[]) AS qsub,
        |      CAST(list_slice(cv, 8 * mi + 1, 8 * mi + 8) AS DOUBLE[]) AS csub
        |    FROM qresid CROSS JOIN ms CROSS JOIN rc)),
        |dist AS (
        |  SELECT qt.qid, c.nid, CAST(sum(qt.t) AS BIGINT) AS dist_u
        |  FROM codes c
        |  JOIN qterms qt ON qt.cell = c.cell AND qt.mi = c.mi AND qt.j = c.code
        |  WHERE c.nid <> qt.qid
        |  GROUP BY qt.qid, c.nid),
        |ranked AS (
        |  SELECT qid, nid, dist_u,
        |    row_number() OVER (PARTITION BY qid ORDER BY dist_u, nid) AS rank
        |  FROM dist)
        |SELECT qid, nid, dist_u, rank FROM ranked WHERE rank <= 5""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
        val coarse = Similarity.sampleCentroidsPortable(emb, 12)
        val model = ProductQuantizer.fitResidualPortable(emb, coarse,
          dim = Dim, m = 8, ks = 16)
        val index = ProductQuantizer.encodeResiduals(emb, coarse, model)
        val queries = emb.filter(col("id") < 3).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
          .sortBy(_._1)
        ProductQuantizer.ivfpqResidualTopK(index, queries, model, coarse,
            nProbe = 3, k = 5)
          .select(col("qid"), col("nid"), col("dist_u"), col("rank"))
    },

    // q147: Rocchio nearest-centroid pseudo-labeling ([[graft.operators
    // .Similarity.labelCentroidsMicro]] + [[graft.operators.Similarity
    // .nearestCentroidAssign]]) — the cheap label propagator a curation
    // pipeline uses to spread a small labeled set over an unlabeled
    // corpus: per-label micro-unit centroids fit on the hash-split
    // TRAIN fold, every vector assigned to its nearest centroid by
    // exact integer squared L2 (a pure HOF projection under a 1-row
    // broadcast of the whole model — no join explosion, no shuffle),
    // and the per-fold confusion matrix (true label × predicted label)
    // read out so held-out pseudo-label quality is visible. Ties break
    // to the smaller label on both engines.
    QueryDef.sql(
      "q147_pseudo_label",
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    CASE WHEN CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
        |         WHEN CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split,
        |    embedding
        |  FROM embeddings),
        |xu AS (
        |  SELECT vec_id,
        |    unnest(generate_series(1, len(embedding))) AS pos,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS u
        |  FROM e),
        |cv AS (
        |  SELECT e.label AS clabel, x.pos,
        |    CAST(sum(x.u) AS BIGINT) // CAST(count(*) AS BIGINT) AS cu
        |  FROM xu x JOIN e USING (vec_id) WHERE e.split = 'train'
        |  GROUP BY 1, 2),
        |dist AS (
        |  SELECT x.vec_id, c.clabel,
        |    CAST(sum((x.u - c.cu) * (x.u - c.cu)) AS BIGINT) AS d2
        |  FROM xu x JOIN cv c USING (pos) GROUP BY 1, 2),
        |pred AS (
        |  SELECT vec_id, clabel AS pred FROM (
        |    SELECT vec_id, clabel,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel)
        |        AS rn
        |    FROM dist) WHERE rn = 1)
        |SELECT e.split, e.label, p.pred, CAST(count(*) AS BIGINT) AS n
        |FROM e JOIN pred p USING (vec_id)
        |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding"))
        .withColumn("split",
          graft.operators.Sampling.splitLabel(col("vec_id")))
      val cents = Similarity.labelCentroidsMicro(
        emb.filter(col("split") === "train"), "label", "embedding")
      Similarity.nearestCentroidAssign(emb, cents, "embedding")
        .groupBy(col("split"), col("label"), col("pred_label").as("pred"))
        .agg(count(lit(1)).as("n"))
    },

    // q156: top principal component by exact-integer power iteration
    // ([[graft.operators.Pca.topComponentWithProjections]]) — the
    // variance-axis readout of the embedding collection (collapsed
    // mass on few directions is where PQ/cosine degrade, per the r10
    // ADC ladder) plus the top-10 vectors by absolute projection. All
    // BIGINT: milli-unit quantization, per-row div-1024 damping inside
    // the matvec sums, max-renormalization to 1000 — the oracle unrolls
    // all three iterations as CTEs with identical arithmetic.
    QueryDef.sql(
      "q156_pca_power_iteration",
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id, i,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0 + 0.5)
         |      AS BIGINT) AS e
         |  FROM (SELECT vec_id, embedding,
         |          unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings)),
         |v0 AS (SELECT DISTINCT i, CAST(1000 AS BIGINT) AS v FROM q),
         |${pcaIter("v0", "v1")},
         |${pcaIter("v1", "v2")},
         |${pcaIter("v2", "v3")},
         |p AS (
         |  SELECT q.vec_id, CAST(sum(q.e * v.v) AS BIGINT) AS score
         |  FROM q JOIN v3 v USING (i) GROUP BY q.vec_id),
         |top AS (
         |  SELECT vec_id, score FROM p
         |  ORDER BY abs(score) DESC, vec_id LIMIT 10)
         |SELECT kind, CAST(key AS BIGINT) AS key, value FROM (
         |  SELECT 'component' AS kind, i AS key, v AS value FROM v3
         |  UNION ALL SELECT 'projection', vec_id, score FROM top)
         |ORDER BY kind, key""".stripMargin) { (s, d) =>
      graft.operators.Pca.topComponentWithProjections(
        Tables.embeddings(s, d), iters = 3, k = 10)
    },

    // q160: the SECOND principal direction by exact Hotelling deflation
    // ([[graft.operators.Pca.deflatedComponents]]): residual
    // r = ‖v₁‖²·x − (x·v₁)·v₁ is exact BIGINT and exactly orthogonal
    // (scaled by ‖v₁‖², never divided), then one elementwise div ‖v₁‖²
    // re-enters milli scale and the same power iteration runs on the
    // residuals. Output = the 64 component2 rows + the exact v₁·v₂
    // alignment dot (near-zero, bounded by the residual truncation) —
    // the oracle replays deflation and both iteration chains as CTEs.
    QueryDef.sql(
      "q160_pca_second_component",
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id, i,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0 + 0.5)
         |      AS BIGINT) AS e
         |  FROM (SELECT vec_id, embedding,
         |          unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings)),
         |v0 AS (SELECT DISTINCT i, CAST(1000 AS BIGINT) AS v FROM q),
         |${pcaIter("v0", "v1")},
         |${pcaIter("v1", "v2")},
         |${pcaIter("v2", "v3")},
         |vn AS MATERIALIZED (SELECT CAST(sum(v * v) AS BIGINT) AS vn FROM v3),
         |sp AS MATERIALIZED (
         |  SELECT q.vec_id, CAST(sum(q.e * v.v) AS BIGINT) AS s
         |  FROM q JOIN v3 v USING (i) GROUP BY q.vec_id),
         |r AS MATERIALIZED (
         |  SELECT q.vec_id, q.i,
         |    CAST((vn.vn * q.e - sp.s * v.v) // vn.vn AS BIGINT) AS e
         |  FROM q JOIN v3 v USING (i) JOIN sp USING (vec_id) CROSS JOIN vn),
         |u0 AS (SELECT DISTINCT i, CAST(1000 AS BIGINT) AS v FROM r),
         |${pcaIter("u0", "u1", "r")},
         |${pcaIter("u1", "u2", "r")},
         |${pcaIter("u2", "u3", "r")},
         |al AS (
         |  SELECT CAST(sum(a.v * b.v) AS BIGINT) AS a
         |  FROM v3 a JOIN u3 b USING (i))
         |SELECT kind, CAST(key AS BIGINT) AS key, value FROM (
         |  SELECT 'component2' AS kind, i AS key, v AS value FROM u3
         |  UNION ALL SELECT 'alignment', 0, a FROM al)
         |ORDER BY kind, key""".stripMargin) { (s, d) =>
      graft.operators.Pca.secondComponentWithAlignment(
        Tables.embeddings(s, d), iters = 3)
    },

    // q177: explained-variance ratios for the top-2 PCA components
    // ([[graft.operators.Pca.explainedVarianceBp]]) — the
    // "is this embedding space compressible" readout behind PQ
    // subspace budgets and IVF anisotropy. Uncentered (the power
    // iteration's own convention); per-vector projection energy
    // s² div ‖v‖² divides BEFORE the corpus sum (exact, bounded);
    // ratio_bp = projE·10⁴ div totE. The oracle replays the full q160
    // chain (both iterations + deflation) and the energy arithmetic.
    QueryDef.sql(
      "q177_explained_variance",
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id, i,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0 + 0.5)
         |      AS BIGINT) AS e
         |  FROM (SELECT vec_id, embedding,
         |          unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings)),
         |v0 AS (SELECT DISTINCT i, CAST(1000 AS BIGINT) AS v FROM q),
         |${pcaIter("v0", "v1")},
         |${pcaIter("v1", "v2")},
         |${pcaIter("v2", "v3")},
         |vn AS MATERIALIZED (SELECT CAST(sum(v * v) AS BIGINT) AS vn FROM v3),
         |sp AS MATERIALIZED (
         |  SELECT q.vec_id, CAST(sum(q.e * v.v) AS BIGINT) AS s
         |  FROM q JOIN v3 v USING (i) GROUP BY q.vec_id),
         |r AS MATERIALIZED (
         |  SELECT q.vec_id, q.i,
         |    CAST((vn.vn * q.e - sp.s * v.v) // vn.vn AS BIGINT) AS e
         |  FROM q JOIN v3 v USING (i) JOIN sp USING (vec_id) CROSS JOIN vn),
         |u0 AS (SELECT DISTINCT i, CAST(1000 AS BIGINT) AS v FROM r),
         |${pcaIter("u0", "u1", "r")},
         |${pcaIter("u1", "u2", "r")},
         |${pcaIter("u2", "u3", "r")},
         |vn2 AS MATERIALIZED (
         |  SELECT CAST(sum(v * v) AS BIGINT) AS vn FROM u3),
         |s2 AS MATERIALIZED (
         |  SELECT q.vec_id, CAST(sum(q.e * u.v) AS BIGINT) AS s
         |  FROM q JOIN u3 u USING (i) GROUP BY q.vec_id),
         |tot AS (SELECT CAST(sum(e * e) AS BIGINT) AS tot_e FROM q),
         |e1 AS (SELECT CAST(sum((sp.s * sp.s) // vn.vn) AS BIGINT) AS proj_e
         |       FROM sp CROSS JOIN vn),
         |e2 AS (SELECT CAST(sum((s2.s * s2.s) // vn2.vn) AS BIGINT) AS proj_e
         |       FROM s2 CROSS JOIN vn2)
         |SELECT CAST(1 AS BIGINT) AS component, vn.vn AS v_norm2,
         |  e1.proj_e, tot.tot_e,
         |  CAST((e1.proj_e * 10000) // tot.tot_e AS BIGINT) AS ratio_bp
         |FROM e1 CROSS JOIN vn CROSS JOIN tot
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), vn2.vn, e2.proj_e, tot.tot_e,
         |  CAST((e2.proj_e * 10000) // tot.tot_e AS BIGINT)
         |FROM e2 CROSS JOIN vn2 CROSS JOIN tot
         |ORDER BY component""".stripMargin) { (s, d) =>
      graft.operators.Pca.explainedVarianceBp(Tables.embeddings(s, d), iters = 3)
    },

    // q178: MMR diversified rerank ([[graft.operators.Retrieval
    // .mmrSelect]], Carbonell & Goldstein SIGIR'98) over the q36
    // cosine shortlist — pick 5 of the top-10 greedily under
    // mmr_u = (7·rel_u − 3·maxsim_u) div 10, so near-duplicate hits
    // cannot crowd out coverage. Both engines quantize the SAME
    // bit-identical cosine doubles to micro before selection (the
    // q36 precedent), every round is a window argmax over the bounded
    // shortlist, and the oracle unrolls all five rounds as CTEs.
    QueryDef.sql(
      "q178_mmr_rerank",
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |           FROM embeddings WHERE vec_id < 3),
         |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne
         |      FROM embeddings),
         |scored AS (
         |  SELECT qid, nid, list_cosine_similarity(qe, ne) AS cos
         |  FROM q CROSS JOIN c WHERE qid <> nid),
         |top AS MATERIALIZED (
         |  SELECT qid, nid,
         |    CAST(floor(cos * 1000000.0 + 0.5) AS BIGINT) AS rel_u
         |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |          ORDER BY cos DESC, nid) AS rk FROM scored)
         |  WHERE rk <= 10),
         |ce AS MATERIALIZED (
         |  SELECT t.qid, t.nid, c.ne FROM top t JOIN c USING (nid)),
         |pairs AS MATERIALIZED (
         |  SELECT a.qid, a.nid AS na, b.nid AS nb,
         |    CAST(floor(list_cosine_similarity(a.ne, b.ne) * 1000000.0
         |      + 0.5) AS BIGINT) AS sim_u
         |  FROM ce a JOIN ce b ON a.qid = b.qid AND a.nid <> b.nid),
         |p1 AS MATERIALIZED (
         |  SELECT qid, nid, mmr_u FROM (
         |    SELECT qid, nid, CAST((7 * rel_u) // 10 AS BIGINT) AS mmr_u,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY (7 * rel_u) // 10 DESC, nid) AS rn
         |    FROM top) WHERE rn = 1),
         |${(2 to 5).map(mmrRound).mkString(",\n")}
         |${(1 to 5).map(r =>
             s"SELECT qid, CAST($r AS BIGINT) AS mmr_rank, nid, mmr_u FROM p$r")
             .mkString("\nUNION ALL\n")}
         |ORDER BY qid, mmr_rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      val top = Similarity.bruteForceTopK(emb.filter(col("id") < 3), emb, 10)
      val rel = top.select(col("qid"), col("nid"),
        expr("cast(floor(cosine * 1000000.0 + 0.5) as bigint)").as("rel_u"))
      val cand = top.select(col("qid"), col("nid"))
        .join(emb.withColumnRenamed("id", "nid"), "nid")
      val sims = cand.as("a")
        .join(cand.as("b"),
          col("a.qid") === col("b.qid") && col("a.nid") =!= col("b.nid"))
        .select(col("a.qid").as("qid"), col("a.nid").as("na"),
          col("b.nid").as("nb"),
          floor(graft.plans.VectorExpressions
              .cosineNative(col("a.embedding"), col("b.embedding"))
              * lit(1000000.0) + lit(0.5))
            .cast("long").as("sim_u"))
      graft.operators.Retrieval.mmrSelect(rel, sims, m = 5)
        .orderBy("qid", "mmr_rank")
    },

    // q181: binary-code ANN ([[graft.operators.Similarity
    // .srpHammingTopK]], Charikar SimHash STOC 2002) — 62 SRP sign bits
    // packed into ONE BIGINT (8 bytes vs the 256-byte embedding, the
    // PQ-codes compression argument), corpus ranked by XOR-popcount
    // Hamming distance, top k·mult reranked by exact cosine. The binary
    // sibling of q118's ADC+rerank: no codebook fit, two ALU ops per
    // scored row, plan-time literal hyperplanes shared with q39 so the
    // oracle embeds the identical weights.
    QueryDef.sql(
      "q181_srp_hamming_ann",
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne
         |      FROM embeddings),
         |qc AS (SELECT qid, qe, ${VectorFunctions.srpCodeSql("qe", 62, Dim)} AS qcode FROM q),
         |cc AS (SELECT nid, ne, ${VectorFunctions.srpCodeSql("ne", 62, Dim)} AS ncode FROM c),
         |h AS (SELECT qid, nid, qe, ne,
         |    CAST(bit_count(xor(qcode, ncode)) AS BIGINT) AS hamming
         |  FROM qc CROSS JOIN cc WHERE qid <> nid),
         |cand AS (SELECT qid, nid, qe, ne, hamming FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY hamming ASC, nid ASC) AS hrank FROM h)
         |  WHERE hrank <= 80),
         |ranked AS (SELECT qid, nid, hamming,
         |    list_cosine_similarity(qe, ne) AS cos,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY list_cosine_similarity(qe, ne) DESC, nid ASC) AS rank
         |  FROM cand)
         |SELECT qid, nid, hamming,
         |  floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine, rank
         |FROM ranked WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.srpHammingTopK(emb.filter(col("id") < 10), emb,
          k = 5, mult = 16, nPlanes = 62, dim = Dim)
        .select(col("qid"), col("nid"), col("hamming"),
          round4hu(col("cosine")).as("cosine"), col("rank"))
    },

    // q183: SRP recall self-audit — q135's readout for the binary-code
    // path: recall@5 of q181's Hamming-shortlist + exact-rerank search
    // vs the brute-force top-5, exact basis points per query. Together
    // with q135 (IVF) and the q118 rerank specs this puts every ANN
    // family in the engine under the same production alarm metric.
    QueryDef.sql(
      "q183_srp_recall",
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne
         |      FROM embeddings),
         |qc AS (SELECT qid, qe, ${VectorFunctions.srpCodeSql("qe", 62, Dim)} AS qcode FROM q),
         |cc AS (SELECT nid, ne, ${VectorFunctions.srpCodeSql("ne", 62, Dim)} AS ncode FROM c),
         |h AS (SELECT qid, nid, qe, ne,
         |    bit_count(xor(qcode, ncode)) AS hamming
         |  FROM qc CROSS JOIN cc WHERE qid <> nid),
         |cand AS (SELECT qid, nid, qe, ne FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY hamming ASC, nid ASC) AS hrank FROM h)
         |  WHERE hrank <= 80),
         |srp AS (SELECT qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
         |      ORDER BY list_cosine_similarity(qe, ne) DESC, nid ASC) AS rank
         |    FROM cand) WHERE rank <= 5),
         |escored AS (
         |  SELECT q.qid, c.nid, list_cosine_similarity(qe, ne) AS cos
         |  FROM q CROSS JOIN c WHERE qid <> nid),
         |ex AS (SELECT qid, nid FROM (
         |    SELECT qid, nid,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |    FROM escored) WHERE rank <= 5),
         |ov AS (SELECT srp.qid, CAST(count(*) AS BIGINT) AS n_overlap
         |       FROM srp JOIN ex ON srp.qid = ex.qid AND srp.nid = ex.nid
         |       GROUP BY srp.qid),
         |ec AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_exact
         |       FROM ex GROUP BY qid)
         |SELECT ec.qid, coalesce(ov.n_overlap, 0) AS n_overlap, ec.n_exact,
         |  (coalesce(ov.n_overlap, 0) * 10000) // ec.n_exact AS recall_bp
         |FROM ec LEFT JOIN ov ON ec.qid = ov.qid""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      val queries = emb.filter(col("id") < 10)
      Evaluation.recallAtK(
        Similarity.srpHammingTopK(queries, emb, k = 5, mult = 16,
          nPlanes = 62, dim = Dim),
        Similarity.bruteForceTopK(queries, emb, k = 5), k = 5)
    },

    // q185: cell-partitioned vector store ([[graft.operators.Similarity
    // .writeCellStore]]/searchCellStore) — the AT-REST form of q56's IVF
    // index: corpus written hive-partitioned by cell, the search's
    // probed cells landing in the scan as a PartitionFilter so unprobed
    // cells' files are never OPENED (zero I/O, not merely zero compute —
    // at 100 TB the store is the dominant bytes and nProbe/k of it is
    // what a search should read). Results are q56's exactly — the
    // oracle IS q56's: layout changes where bytes live, never what the
    // search returns.
    QueryDef.sql(
      "q185_ivf_cell_store",
      """WITH c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings),
        |cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
        |          FROM embeddings
        |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 12),
        |assign AS (
        |  SELECT nid, ne, cid,
        |    list_dot_product(ce, ce) - 2 * list_dot_product(ne, ce) AS dist
        |  FROM c CROSS JOIN cents),
        |cells AS (
        |  SELECT nid, ne, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY nid ORDER BY dist, cid) AS rn
        |    FROM assign) WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |      FROM embeddings WHERE vec_id < 10),
        |qassign AS (
        |  SELECT qid, qe, cid,
        |    list_dot_product(ce, ce) - 2 * list_dot_product(qe, ce) AS dist
        |  FROM q CROSS JOIN cents),
        |probes AS (
        |  SELECT qid, qe, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS rn
        |    FROM qassign) WHERE rn <= 3),
        |scored AS (
        |  SELECT qid, probes.cell AS cell, nid, list_cosine_similarity(qe, ne) AS cos
        |  FROM probes JOIN cells ON probes.cell = cells.cell WHERE qid <> nid),
        |ranked AS (
        |  SELECT qid, cell, nid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM scored)
        |SELECT qid, cell, nid, floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine, rank
        |FROM ranked WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      val cents = Similarity.sampleCentroidsPortable(emb, 12)
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_cell_store/" +
        new java.io.File(d).getName
      Similarity.writeCellStore(emb, cents, dir)
      Similarity.searchCellStore(s, dir, emb.filter(col("id") < 10),
          k = 3, nProbe = 3, cents = cents)
        .select(col("qid"), col("cell"), col("nid"),
          round4hu(col("cosine")).as("cosine"), col("rank"))
    },

    // q191: label-centroid cosine matrix ([[graft.operators.Similarity
    // .centroidCosineMatrix]]) — the class CONFUSABILITY audit: pairwise
    // micro-unit cosine between the exact-integer per-label centroids
    // (q147's fit), read before trusting a pseudo-labeler or a
    // label-stratified mix (a high-cosine pair is where nearest-centroid
    // assignment bleeds). One corpus exchange (the centroid fit); dot and
    // norms are exact BIGINT over the ≤|labels|·dim frame, the final
    // divide-and-floor identical IEEE on both engines.
    QueryDef.sql(
      "q191_centroid_confusability",
      """WITH xu AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    unnest(generate_series(1, len(embedding))) AS pos,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS u
        |  FROM embeddings),
        |cv AS (
        |  SELECT label, pos,
        |    CAST(sum(u) AS BIGINT) // CAST(count(*) AS BIGINT) AS cu
        |  FROM xu GROUP BY label, pos),
        |norms AS (
        |  SELECT label, CAST(sum(cu * cu) AS BIGINT) AS n2
        |  FROM cv GROUP BY label),
        |dots AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |    CAST(sum(a.cu * b.cu) AS BIGINT) AS dot
        |  FROM cv a JOIN cv b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY a.label, b.label)
        |SELECT d.label_a, d.label_b, d.dot,
        |  CASE WHEN na.n2 > 0 AND nb.n2 > 0 THEN
        |    CAST(floor(CAST(d.dot AS DOUBLE)
        |      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        |      * 1000000.0 + 0.5) AS BIGINT)
        |  ELSE 0 END AS cos_u
        |FROM dots d
        |JOIN norms na ON na.label = d.label_a
        |JOIN norms nb ON nb.label = d.label_b""".stripMargin) { (s, d) =>
      Similarity.centroidCosineMatrix(
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            col("embedding")),
        "label", "embedding")
    },

    // q193: margin-based uncertainty sampling ([[graft.operators
    // .Similarity.uncertaintyMarginTopK]], Lewis & Gale SIGIR'94) — the
    // 20 vectors whose nearest-centroid call is tightest (smallest
    // best-vs-second-best d2 gap): the labeling worklist the q147
    // pseudo-labeler hands back to a human. Model rides one broadcast
    // row, distances are a HOF projection, only the TakeOrdered top-k
    // leaves the scan.
    QueryDef.sql(
      "q193_uncertainty_margin",
      """WITH xu AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    unnest(generate_series(1, len(embedding))) AS pos,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS u
        |  FROM embeddings),
        |cv AS (
        |  SELECT label AS clabel, pos,
        |    CAST(sum(u) AS BIGINT) // CAST(count(*) AS BIGINT) AS cu
        |  FROM xu GROUP BY 1, 2),
        |dist AS (
        |  SELECT x.vec_id, c.clabel,
        |    CAST(sum((x.u - c.cu) * (x.u - c.cu)) AS BIGINT) AS d2
        |  FROM xu x JOIN cv c USING (pos) GROUP BY 1, 2),
        |rk AS (
        |  SELECT vec_id, clabel, d2,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel)
        |      AS rn
        |  FROM dist)
        |SELECT a.vec_id, e.label,
        |  a.clabel AS pred_label, b.clabel AS second_label,
        |  a.d2 AS d2_best, b.d2 AS d2_second, b.d2 - a.d2 AS margin
        |FROM rk a
        |JOIN rk b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2
        |JOIN (SELECT vec_id, CAST(label AS BIGINT) AS label
        |      FROM embeddings) e ON e.vec_id = a.vec_id
        |ORDER BY margin, a.vec_id LIMIT 20""".stripMargin) { (s, d) =>
      Similarity.uncertaintyMarginTopK(
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            col("embedding")),
        "vec_id", "label", "embedding", k = 20)
    },

    // q194: confident label noise ([[graft.operators.Similarity
    // .labelNoiseTopK]], Northcutt et al. 2021 in margin form) — the 20
    // vectors whose assigned label disagrees with the nearest centroid
    // by the WIDEST margin: the re-labeling worklist, complement of
    // q193's ambiguity worklist. Disagreement filter runs map-side
    // before the TakeOrdered.
    QueryDef.sql(
      "q194_label_noise",
      """WITH xu AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    unnest(generate_series(1, len(embedding))) AS pos,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS u
        |  FROM embeddings),
        |cv AS (
        |  SELECT label AS clabel, pos,
        |    CAST(sum(u) AS BIGINT) // CAST(count(*) AS BIGINT) AS cu
        |  FROM xu GROUP BY 1, 2),
        |dist AS (
        |  SELECT x.vec_id, c.clabel,
        |    CAST(sum((x.u - c.cu) * (x.u - c.cu)) AS BIGINT) AS d2
        |  FROM xu x JOIN cv c USING (pos) GROUP BY 1, 2),
        |rk AS (
        |  SELECT vec_id, clabel, d2,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel)
        |      AS rn
        |  FROM dist)
        |SELECT a.vec_id, e.label,
        |  a.clabel AS pred_label, b.clabel AS second_label,
        |  a.d2 AS d2_best, b.d2 AS d2_second, b.d2 - a.d2 AS margin
        |FROM rk a
        |JOIN rk b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2
        |JOIN (SELECT vec_id, CAST(label AS BIGINT) AS label
        |      FROM embeddings) e ON e.vec_id = a.vec_id
        |WHERE e.label <> a.clabel
        |ORDER BY margin DESC, a.vec_id LIMIT 20""".stripMargin) { (s, d) =>
      Similarity.labelNoiseTopK(
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            col("embedding")),
        "vec_id", "label", "embedding", k = 20)
    },
  )

  /** One exact-integer power iteration as DuckDB CTEs: per-vector score
    * s = Σ e·v, per-dimension damped sum w = Σ (e·s) div 1024,
    * max-renormalization to 1000 milli-units — the arithmetic of
    * [[graft.operators.Pca.topComponentVector]] verbatim.
    *
    * Every CTE is MATERIALIZED: DuckDB 1.0 inlines multiply-referenced
    * CTEs, so a chained iteration (each `cur` referenced by the next
    * round's s AND w) re-expands the whole prefix ~4× per round —
    * q160's 6-round chain ran minutes un-hinted, sub-second hinted
    * (the SQL twin of the q95/q112 Spark diamond lesson).
    */
  /** One MMR greedy round as DuckDB CTEs: remaining candidates score
    * (7·rel − 3·max sim-to-selected) div 10, argmax by (mmr desc, nid)
    * — the exact loop body of [[graft.operators.Retrieval.mmrSelect]],
    * including its missing-pair = similarity-0 LEFT-join semantics (a
    * candidate with no sims row against any selected item is maximally
    * diverse, not dropped).
    */
  private def mmrRound(r: Int): String = {
    val sel = (1 until r).map(i => s"SELECT qid, nid FROM p$i")
      .mkString(" UNION ALL ")
    s"""c$r AS MATERIALIZED (
       |  SELECT t.qid, t.nid,
       |    CAST((7 * t.rel_u - 3 * coalesce(ms.maxsim, 0)) // 10 AS BIGINT)
       |      AS mmr_u
       |  FROM top t
       |  LEFT JOIN (
       |    SELECT p.qid, p.na AS nid, max(p.sim_u) AS maxsim
       |    FROM pairs p JOIN ($sel) s ON s.qid = p.qid AND s.nid = p.nb
       |    GROUP BY p.qid, p.na) ms
       |    ON ms.qid = t.qid AND ms.nid = t.nid
       |  WHERE NOT EXISTS (SELECT 1 FROM ($sel) s2
       |                    WHERE s2.qid = t.qid AND s2.nid = t.nid)),
       |p$r AS MATERIALIZED (
       |  SELECT qid, nid, mmr_u FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY mmr_u DESC, nid) AS rn
       |    FROM c$r) WHERE rn = 1)""".stripMargin
  }

  private def pcaIter(prev: String, cur: String, data: String = "q"): String =
    s"""s$cur AS MATERIALIZED (
       |  SELECT $data.vec_id, CAST(sum($data.e * v.v) AS BIGINT) AS s
       |  FROM $data JOIN $prev v USING (i) GROUP BY $data.vec_id),
       |w$cur AS MATERIALIZED (
       |  SELECT $data.i, CAST(sum(($data.e * s.s) // 1024) AS BIGINT) AS w
       |  FROM $data JOIN s$cur s USING (vec_id) GROUP BY $data.i),
       |m$cur AS MATERIALIZED (SELECT greatest(max(abs(w)), 1) AS mx FROM w$cur),
       |$cur AS MATERIALIZED (
       |  SELECT i, CAST((w * 1000) // m.mx AS BIGINT) AS v
       |  FROM w$cur CROSS JOIN m$cur m)""".stripMargin

  /** Shared PQ replay for q106/q107: md5-sampled 16-row codebook, 8
    * dimension slices, per-(vector, subspace) argmin with (dist, code)
    * tie-break, true distance carried in integer micro-units.
    */
  private def PqCommonSql: String =
    """WITH e AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings),
      |cents AS (
      |  SELECT rn - 1 AS j, ce FROM (
      |    SELECT row_number() OVER (
      |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn,
      |      CAST(embedding AS DOUBLE[]) AS ce
      |    FROM embeddings) WHERE rn <= 16),
      |ms AS (SELECT unnest(generate_series(0, 7)) AS mi),
      |sl AS (
      |  SELECT nid, mi, j,
      |    list_slice(ne, 8 * mi + 1, 8 * mi + 8) AS nsub,
      |    list_slice(ce, 8 * mi + 1, 8 * mi + 8) AS csub
      |  FROM e CROSS JOIN ms CROSS JOIN cents),
      |assign AS (
      |  SELECT nid, mi, j,
      |    list_dot_product(csub, csub) - 2 * list_dot_product(nsub, csub) AS d,
      |    CAST(floor(((list_dot_product(csub, csub)
      |           - 2 * list_dot_product(nsub, csub))
      |           + list_dot_product(nsub, nsub)) * 1000000.0 + 0.5)
      |      AS BIGINT) AS t
      |  FROM sl),
      |codes AS (
      |  SELECT nid, mi, j AS code, t FROM (
      |    SELECT *, row_number() OVER (PARTITION BY nid, mi ORDER BY d, j) AS rn
      |    FROM assign) WHERE rn = 1)""".stripMargin
}
