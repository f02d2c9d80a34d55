package graft.queries

import graft.Tables
import graft.operators.{Classifier, Dsir, Evaluation, Influence, Profile, Retrieval, Sampling}
import org.apache.spark.sql.functions._

/** Ranking & selection operators (beyond-reference, SURVEY §2.11): who
  * matters in the interaction graph, which documents match a query, and
  * which documents look like the target corpus.
  *
  *  - q108 PageRank influence ([[graft.operators.Influence]]): damped
  *    integer PageRank over the customer↔supplier interaction graph —
  *    the recursive influence measure the reference's per-entity
  *    engagement scores stop short of. Oracle replays all three
  *    iterations in chained CTEs with identical BIGINT arithmetic.
  *  - q109 BM25 top-k retrieval ([[graft.operators.Retrieval]]): ranked
  *    content search over `documents` with the exact-rational k1=1.2 /
  *    b=0.75 term factor and micro-nat idf.
  *  - q110 DSIR importance weights ([[graft.operators.Dsir]]):
  *    hashed-bigram log-likelihood-ratio selection (target = src0 docs)
  *    per Xie et al. 2023 — the "select web data that looks like the
  *    curated set" signal, in exact micro-nat sums.
  *  - q111 winsorized score normalization
  *    ([[graft.operators.Sampling.winsorizedNormalize]]): per-source
  *    robust min-max of `n_chars` onto [0, 10000] integer units — the
  *    scale-alignment step before cross-source quality gating.
  */
object RankingOps {

  /** DuckDB twin of TextFunctions.tokens (same as TextOps.T). */
  private val T = "list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)"

  /** One PageRank iteration as a DuckDB CTE: `cur` from `prev` over the
    * shared `e` (edges), `deg` (out-degrees), and `n` (nodes) CTEs —
    * the exact integer update [[Influence.pageRankInteger]] runs.
    */
  /** One PERSONALIZED PageRank iteration as a DuckDB CTE — teleport
    * comes from the shared `tele` CTE (per-node tele_u) instead of the
    * uniform 150000, otherwise identical arithmetic to [[prIter]].
    */
  private def pprIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT t.node,
       |    CAST(t.tele_u + coalesce(c.in_u, 0) AS BIGINT) AS rank_u
       |  FROM tele t LEFT JOIN (
       |    SELECT e.dst,
       |      CAST(sum(((r.rank_u // d.outdeg) * 850000) // 1000000) AS BIGINT) AS in_u
       |    FROM e JOIN deg d ON e.src = d.src JOIN $prev r ON r.node = e.src
       |    GROUP BY e.dst) c ON t.node = c.dst)""".stripMargin

  /** One k-core peel round as DuckDB CTEs: degrees over e(r-1),
    * survivors vs the shared `kf` threshold, surviving edge list er —
    * the exact loop body of [[Influence.kCorePeelProfile]].
    */
  private def kcoreRound(r: Int): String = {
    val prev = if (r == 1) "e0" else s"e${r - 1}"
    s"""deg$r AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev)
       |  GROUP BY node),
       |s$r AS (SELECT node FROM deg$r CROSS JOIN kf WHERE deg >= kf.k),
       |e$r AS MATERIALIZED (
       |  SELECT e.a, e.b FROM $prev e
       |  JOIN s$r x ON e.a = x.node JOIN s$r y ON e.b = y.node)""".stripMargin
  }

  private def prIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.node,
       |    CAST(150000 + coalesce(c.in_u, 0) AS BIGINT) AS rank_u
       |  FROM n LEFT JOIN (
       |    SELECT e.dst,
       |      CAST(sum(((r.rank_u // d.outdeg) * 850000) // 1000000) AS BIGINT) AS in_u
       |    FROM e JOIN deg d ON e.src = d.src JOIN $prev r ON r.node = e.src
       |    GROUP BY e.dst) c ON n.node = c.dst)""".stripMargin

  /** q207's degree-oriented triangle chain over an `und(a, b)` CTE —
    * q166's construction parametrized so the exact and sampled graphs
    * replay the identical state machine. Exposes `<p>tri(src, x, y)`.
    */
  private def triChainSql(undName: String, p: String): String =
    s"""${p}deg AS MATERIALIZED (
       |  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
       |    SELECT a AS node FROM $undName
       |    UNION ALL SELECT b AS node FROM $undName)
       |  GROUP BY node),
       |${p}dir AS MATERIALIZED (
       |  SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS src,
       |         CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS dst
       |  FROM (SELECT u.a, u.b, x.degree AS da, y.degree AS db
       |        FROM $undName u JOIN ${p}deg x ON u.a = x.node
       |                   JOIN ${p}deg y ON u.b = y.node)),
       |${p}tri AS MATERIALIZED (
       |  SELECT w.src, w.x, w.y
       |  FROM (SELECT e1.src, e1.dst AS x, e2.dst AS y
       |        FROM ${p}dir e1 JOIN ${p}dir e2
       |          ON e1.src = e2.src AND e1.dst < e2.dst) w
       |  JOIN $undName ON w.x = $undName.a AND w.y = $undName.b)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // q108: 3 damped integer-PageRank rounds over the bipartite
    // customer↔supplier graph (an edge per distinct (custkey, suppkey)
    // purchase pair, both directions), top-25 suppliers by rank.
    QueryDef.sql(
      "q108_pagerank_influence",
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS (SELECT src, dst FROM e0
         |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |n AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_u FROM n),
         |${prIter("r0", "r1")},
         |${prIter("r1", "r2")},
         |${prIter("r2", "r3")}
         |SELECT (node - 1) // 2 AS s_suppkey, rank_u
         |FROM r3 WHERE node % 2 = 1
         |ORDER BY rank_u DESC, s_suppkey LIMIT 25""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val e0 = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      Influence.pageRankInteger(edges, 3)
        .filter(pmod(col("node"), lit(2)) === 1)
        .select(expr("(node - 1) div 2").as("s_suppkey"), col("rank_u"))
        .orderBy(col("rank_u").desc, col("s_suppkey").asc)
        .limit(25)
    },

    // q109: BM25(k1=1.2, b=0.75) top-10 per query for three fixed
    // queries over the corpus vocabulary; ties broken by doc_id.
    QueryDef.sql(
      "q109_bm25_search",
      s"""WITH q AS (SELECT CAST(a AS BIGINT) AS qid, b AS term
         |  FROM (VALUES (1,'hash'),(1,'join'),(2,'window'),(2,'agg'),
         |               (3,'spark'),(3,'stream'),(3,'data')) v(a, b)),
         |toks AS (SELECT doc_id, $T AS tk FROM documents),
         |posting AS (
         |  SELECT doc_id, t AS term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
         |tot AS (SELECT count(*) AS n, CAST(sum(len(tk)) AS BIGINT) AS total
         |        FROM toks),
         |dft AS (
         |  SELECT term, count(*) AS df FROM posting
         |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
         |idf AS (
         |  SELECT term,
         |    CAST(floor(ln(CAST(2 * tot.n + 2 AS DOUBLE) / (2 * df + 1))
         |      * 1000000.0 + 0.5) AS BIGINT) AS idf_u
         |  FROM dft CROSS JOIN tot),
         |contrib AS (
         |  SELECT q.qid, p.doc_id,
         |    (idf.idf_u * 22 * p.tf * t.total)
         |      // (10 * p.tf * t.total + 3 * t.total + 9 * dl.dl * t.n) AS c
         |  FROM q JOIN posting p USING (term) JOIN idf USING (term)
         |  JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN tot t),
         |score AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_u
         |          FROM contrib GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, doc_id, score_u,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score_u DESC, doc_id) AS rnk
         |  FROM score)
         |SELECT qid, doc_id, score_u, rnk FROM ranked WHERE rnk <= 10""".stripMargin) { (s, d) =>
      import s.implicits._
      val qt = Seq((1L, "hash"), (1L, "join"), (2L, "window"), (2L, "agg"),
        (3L, "spark"), (3L, "stream"), (3L, "data")).toDF("qid", "term")
      Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text", qt, 10)
        .select(col("qid"), col("doc").as("doc_id"), col("score_u"), col("rnk"))
    },

    // q168: Dirichlet query-likelihood retrieval (Zhai & Lafferty
    // SIGIR'01, μ=2000) — the language-modeling leg next to q109's
    // BM25 over the SAME queries and index shape: matched-postings-only
    // scoring via the rank-equivalent decomposition
    // Σ ln(1 + tf·total/(μ·cf)) + |q|·ln(μ/(dl+μ)), each piece
    // micro-nat-quantized before the BIGINT sum. A second lexical
    // scorer is what RRF fusion (q115) actually wants to fuse.
    QueryDef.sql(
      "q168_query_likelihood",
      s"""WITH q AS (SELECT CAST(a AS BIGINT) AS qid, b AS term
         |  FROM (VALUES (1,'hash'),(1,'join'),(2,'window'),(2,'agg'),
         |               (3,'spark'),(3,'stream'),(3,'data')) v(a, b)),
         |toks AS (SELECT doc_id, $T AS tk FROM documents),
         |posting AS (
         |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, t AS term,
         |    CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, tk, unnest(tk) AS t FROM toks)
         |  GROUP BY 1, 2, 3),
         |tot AS (SELECT CAST(sum(len(tk)) AS BIGINT) AS total FROM toks),
         |cf AS (
         |  SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM posting
         |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
         |nq AS (SELECT qid, CAST(count(*) AS BIGINT) AS nq FROM q GROUP BY 1),
         |m AS (
         |  SELECT q.qid, p.doc_id, p.dl,
         |    CAST(floor(ln(CAST(2000 * cf.cf + p.tf * t.total AS DOUBLE)
         |      / CAST(2000 * cf.cf AS DOUBLE)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS m_u
         |  FROM q JOIN posting p USING (term) JOIN cf USING (term)
         |  CROSS JOIN tot t),
         |score AS (
         |  SELECT m.qid, m.doc_id,
         |    CAST(sum(m.m_u) AS BIGINT)
         |      + max(nq.nq) * CAST(floor(ln(2000
         |          / CAST(max(m.dl) + 2000 AS DOUBLE))
         |          * 1000000.0 + 0.5) AS BIGINT) AS score_u
         |  FROM m JOIN nq USING (qid) GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, doc_id, score_u,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score_u DESC, doc_id) AS rnk
         |  FROM score)
         |SELECT qid, doc_id, score_u, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= 10""".stripMargin) { (s, d) =>
      import s.implicits._
      val qt = Seq((1L, "hash"), (1L, "join"), (2L, "window"), (2L, "agg"),
        (3L, "spark"), (3L, "stream"), (3L, "data")).toDF("qid", "term")
      Retrieval.queryLikelihoodTopK(
          Tables.documents(s, d), "doc_id", "text", qt, 10)
        .select(col("qid"), col("doc").as("doc_id"), col("score_u"), col("rnk"))
    },

    // q169: 3 rounds of PERSONALIZED PageRank over the q108 bipartite
    // customer↔supplier graph, teleport seeded on nation-0 customers
    // ([[graft.operators.Influence.personalizedPageRank]], Haveliwala
    // WWW'02) — domain-trust propagation: suppliers rank by how much
    // trusted-customer mass flows to them, not by raw connectivity.
    // Seeds restrict to in-graph nodes (customers with no orders carry
    // no mass); top-25 suppliers under (rank_u desc, s_suppkey).
    QueryDef.sql(
      "q169_personalized_pagerank",
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS (SELECT src, dst FROM e0
         |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |n AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
         |sd AS (
         |  SELECT DISTINCT c_custkey * 2 AS node FROM customer
         |  WHERE c_nationkey = 0),
         |sg AS (SELECT sd.node FROM sd JOIN n USING (node)),
         |ct AS (SELECT (SELECT count(*) FROM n) AS n_nodes,
         |              (SELECT count(*) FROM sg) AS n_seeds),
         |tele AS (
         |  SELECT n.node,
         |    CASE WHEN sg.node IS NOT NULL
         |      THEN CAST((150000 * ct.n_nodes) // ct.n_seeds AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS tele_u,
         |    CASE WHEN sg.node IS NOT NULL
         |      THEN CAST((1000000 * ct.n_nodes) // ct.n_seeds AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS rank_u
         |  FROM n LEFT JOIN sg ON n.node = sg.node CROSS JOIN ct),
         |r0 AS (SELECT node, rank_u FROM tele),
         |${pprIter("r0", "r1")},
         |${pprIter("r1", "r2")},
         |${pprIter("r2", "r3")}
         |SELECT (node - 1) // 2 AS s_suppkey, rank_u
         |FROM r3 WHERE node % 2 = 1
         |ORDER BY rank_u DESC, s_suppkey LIMIT 25""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val e0 = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables.customer(s, d)
        .filter(col("c_nationkey") === 0)
        .select((col("c_custkey") * 2).as("node"))
      Influence.personalizedPageRank(edges, seeds, 3)
        .filter(pmod(col("node"), lit(2)) === 1)
        .select(expr("(node - 1) div 2").as("s_suppkey"), col("rank_u"))
        .orderBy(col("rank_u").desc, col("s_suppkey").asc)
        .limit(25)
    },

    // q170: the k-core peel curve of the part co-purchase graph
    // ([[graft.operators.Influence.kCorePeelProfile]], Seidman 1983 /
    // Montresor PODC'11) — 4 bounded peel rounds with k self-scaled to
    // avg-degree+1, reporting (round, k, n_nodes, n_edges) after each
    // peel. The curve separates the cohesive always-bought-together
    // backbone from the long tail; counts going to zero IS the finding
    // (this graph is near-regular — nothing sits far above average
    // cohesion). Bounded rounds keep the semantics a deterministic
    // function of the input at every scale factor.
    QueryDef.sql(
      "q170_kcore_peel",
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
         |                  greatest(a.l_partkey, b.l_partkey) AS b
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         |kf AS (
         |  SELECT CAST((2 * (SELECT count(*) FROM e0))
         |    // (SELECT count(*) FROM (
         |        SELECT a AS node FROM e0 UNION SELECT b FROM e0))
         |    + 1 AS BIGINT) AS k),
         |${(1 to 4).map(r => kcoreRound(r)).mkString(",\n")}
         |${(1 to 4).map(r =>
             s"""SELECT CAST($r AS BIGINT) AS round, kf.k,
                |  CAST((SELECT count(*) FROM s$r) AS BIGINT) AS n_nodes,
                |  CAST((SELECT count(*) FROM e$r) AS BIGINT) AS n_edges
                |FROM kf""".stripMargin).mkString("\nUNION ALL\n")}
         |ORDER BY round""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val r = l.select(col("ok"), col("pk").as("pk2"))
      val edges = l.join(r, Seq("ok"))
        .where(col("pk") =!= col("pk2"))
        .select(col("pk").as("u"), col("pk2").as("v"))
      Influence.kCorePeelProfile(edges, 4).orderBy("round")
    },

    // q110: DSIR log importance weights with target = source 'src0',
    // 256 hashed-bigram buckets; top-50 docs by weight. Docs with < 2
    // tokens have no features and are absent (paper's formulation
    // scores feature occurrences).
    QueryDef.sql(
      "q110_dsir_importance",
      s"""WITH toks AS (SELECT doc_id, source, $T AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id, source,
         |    unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
         |      i -> [tk[i], tk[i+1]])) AS b
         |  FROM toks),
         |pairs AS (
         |  SELECT doc_id, source = 'src0' AS is_tgt,
         |    CAST(concat('0x', substring(md5(b[1] || ' ' || b[2]), 1, 8))
         |      AS BIGINT) % 256 AS bucket
         |  FROM bg),
         |counts AS (
         |  SELECT bucket, count(*) AS raw_c,
         |    CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT) AS tgt_c
         |  FROM pairs GROUP BY 1),
         |tot AS (SELECT CAST(sum(raw_c) AS BIGINT) AS raw_tot,
         |               CAST(sum(tgt_c) AS BIGINT) AS tgt_tot FROM counts),
         |lr AS (
         |  SELECT bucket,
         |    CAST(floor(ln((tgt_c + 1) / CAST(tgt_tot + 256 AS DOUBLE))
         |      * 1000000.0 + 0.5) AS BIGINT)
         |    - CAST(floor(ln((raw_c + 1) / CAST(raw_tot + 256 AS DOUBLE))
         |      * 1000000.0 + 0.5) AS BIGINT) AS lr_u
         |  FROM counts CROSS JOIN tot),
         |w AS (SELECT doc_id, count(*) AS n_bigrams,
         |             CAST(sum(lr_u) AS BIGINT) AS weight_u
         |      FROM pairs JOIN lr USING (bucket) GROUP BY 1)
         |SELECT doc_id, n_bigrams, weight_u FROM w
         |ORDER BY weight_u DESC, doc_id LIMIT 50""".stripMargin) { (s, d) =>
      Dsir.importanceWeights(Tables.documents(s, d), "doc_id", "text",
          col("source") === "src0", 256)
        .withColumnRenamed("id", "doc_id")
        .select("doc_id", "n_bigrams", "weight_u")
        .orderBy(col("weight_u").desc, col("doc_id").asc)
        .limit(50)
    },

    // q111: per-source winsorized min-max of n_chars onto [0, 10000].
    QueryDef.sql(
      "q111_winsorized_norm",
      """WITH thr AS (
        |  SELECT source,
        |    CAST(floor(quantile_cont(n_chars, 0.05) * 10000.0 + 0.5)
        |      AS BIGINT) AS lo_u,
        |    CAST(floor(quantile_cont(n_chars, 0.95) * 10000.0 + 0.5)
        |      AS BIGINT) AS hi_u
        |  FROM documents GROUP BY 1)
        |SELECT d.doc_id, d.source,
        |  ((least(greatest(d.n_chars * 10000, t.lo_u), t.hi_u) - t.lo_u)
        |    * 10000) // greatest(t.hi_u - t.lo_u, 1) AS norm_u
        |FROM documents d JOIN thr t USING (source)""".stripMargin) { (s, d) =>
      Sampling.winsorizedNormalize(Tables.documents(s, d), "source", "n_chars")
        .select("doc_id", "source", "norm_u")
    },

    // q113: leakage-safe split — near-dup clusters (bag-of-words md5,
    // which really collides on this shuffle-of-a-shared-vocab corpus:
    // 54 collisions at sf0.01, 1065 at sf0.1) hash to a split by their
    // min-id representative, so near-twins never straddle train/val/test.
    QueryDef.sql(
      "q113_leakage_safe_split",
      s"""WITH k AS (
         |  SELECT doc_id,
         |    md5(list_aggr(list_sort(list_distinct($T)), 'string_agg', ' '))
         |      AS ck
         |  FROM documents),
         |r AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY ck) AS rep FROM k)
         |SELECT doc_id, rep,
         |  CASE
         |    WHEN CAST(concat('0x', substring(md5(CAST(rep AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 100 < 80 THEN 'train'
         |    WHEN CAST(concat('0x', substring(md5(CAST(rep AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 100 < 90 THEN 'val'
         |    ELSE 'test' END AS split
         |FROM r""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions.tokens
      val bowFp = md5(array_join(array_sort(array_distinct(
        tokens(col("text")))), " "))
      Sampling.leakageSafeSplit(Tables.documents(s, d), "doc_id", bowFp)
        .select("doc_id", "rep", "split")
    },

    // q115: hybrid retrieval — doc-by-example queries (doc_id < 3) run
    // BOTH as BM25 over their distinct terms (top-20, self kept in the
    // ranking then dropped — ranks stay as computed) and as embedding
    // cosine top-20 (vec_id ≡ doc_id in the testdata), fused by
    // integer reciprocal-rank fusion, top-10 per query.
    QueryDef.sql(
      "q115_hybrid_rrf",
      s"""WITH toks AS (SELECT doc_id, $T AS tk FROM documents),
         |q AS (SELECT DISTINCT doc_id AS qid, t AS term
         |      FROM (SELECT doc_id, unnest(tk) AS t FROM toks
         |            WHERE doc_id < 3)),
         |posting AS (
         |  SELECT doc_id, t AS term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
         |tot AS (SELECT count(*) AS n, CAST(sum(len(tk)) AS BIGINT) AS total
         |        FROM toks),
         |dft AS (
         |  SELECT term, count(*) AS df FROM posting
         |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
         |idf AS (
         |  SELECT term,
         |    CAST(floor(ln(CAST(2 * tot.n + 2 AS DOUBLE) / (2 * df + 1))
         |      * 1000000.0 + 0.5) AS BIGINT) AS idf_u
         |  FROM dft CROSS JOIN tot),
         |contrib AS (
         |  SELECT q.qid, p.doc_id,
         |    (idf.idf_u * 22 * p.tf * t.total)
         |      // (10 * p.tf * t.total + 3 * t.total + 9 * dl.dl * t.n) AS c
         |  FROM q JOIN posting p USING (term) JOIN idf USING (term)
         |  JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN tot t),
         |score AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_u
         |          FROM contrib GROUP BY 1, 2),
         |bm AS (
         |  SELECT qid, doc_id AS nid, rnk AS rank FROM (
         |    SELECT qid, doc_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY score_u DESC, doc_id) AS rnk
         |    FROM score) WHERE rnk <= 20),
         |e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
         |      FROM embeddings),
         |cosr AS (
         |  SELECT qid, nid, rank FROM (
         |    SELECT q2.id AS qid, c2.id AS nid,
         |      row_number() OVER (PARTITION BY q2.id
         |        ORDER BY list_cosine_similarity(q2.v, c2.v) DESC, c2.id)
         |        AS rank
         |    FROM e q2 CROSS JOIN e c2 WHERE q2.id < 3 AND c2.id <> q2.id)
         |  WHERE rank <= 20),
         |fused AS (
         |  SELECT coalesce(b2.qid, cosr.qid) AS qid,
         |    coalesce(b2.nid, cosr.nid) AS nid,
         |    coalesce(1000000 // (60 + b2.rank), 0)
         |      + coalesce(1000000 // (60 + cosr.rank), 0) AS rrf_u
         |  FROM (SELECT * FROM bm WHERE nid <> qid) b2
         |  FULL OUTER JOIN cosr ON b2.qid = cosr.qid AND b2.nid = cosr.nid)
         |SELECT qid, nid, CAST(rrf_u AS BIGINT) AS rrf_u, rank FROM (
         |  SELECT qid, nid, rrf_u,
         |    row_number() OVER (PARTITION BY qid ORDER BY rrf_u DESC, nid)
         |      AS rank
         |  FROM fused) WHERE rank <= 10""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions.tokens
      val docs = Tables.documents(s, d)
      val qt = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), explode(tokens(col("text"))).as("term"))
        .distinct()
      val bm = Retrieval.bm25TopK(docs, "doc_id", "text", qt, 20)
        .filter(col("doc") =!= col("qid"))
        .select(col("qid"), col("doc").as("nid"), col("rnk").as("rank"))
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      val cos = graft.operators.Similarity
        .bruteForceTopK(emb.filter(col("id") < 3), emb, 20)
        .select(col("qid"), col("nid"), col("rank"))
      Retrieval.rrfFuse(bm, cos, k = 10)
    },

    // q134: hard-negative mining ([[graft.operators.Evaluation
    // .hardNegatives]], DPR) — q121's top-10 BM25 ranking minus the
    // same-source qrels and minus self-retrieval: the retriever's
    // near-misses, i.e. the contrastive-training negatives. Oracle =
    // the q121 chain with a NOT-EXISTS final select.
    QueryDef.sql(
      "q134_hard_negatives",
      s"""WITH toks AS (SELECT doc_id, $T AS tk FROM documents),
         |q AS (SELECT DISTINCT doc_id AS qid, t AS term
         |      FROM (SELECT doc_id, unnest(tk) AS t FROM toks
         |            WHERE doc_id < 3)),
         |posting AS (
         |  SELECT doc_id, t AS term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
         |tot AS (SELECT count(*) AS n, CAST(sum(len(tk)) AS BIGINT) AS total
         |        FROM toks),
         |dft AS (
         |  SELECT term, count(*) AS df FROM posting
         |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
         |idf AS (
         |  SELECT term,
         |    CAST(floor(ln(CAST(2 * tot.n + 2 AS DOUBLE) / (2 * df + 1))
         |      * 1000000.0 + 0.5) AS BIGINT) AS idf_u
         |  FROM dft CROSS JOIN tot),
         |contrib AS (
         |  SELECT q.qid, p.doc_id,
         |    (idf.idf_u * 22 * p.tf * t.total)
         |      // (10 * p.tf * t.total + 3 * t.total + 9 * dl.dl * t.n) AS c
         |  FROM q JOIN posting p USING (term) JOIN idf USING (term)
         |  JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN tot t),
         |score AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_u
         |          FROM contrib GROUP BY 1, 2),
         |bm AS (
         |  SELECT qid, doc_id AS nid, rnk AS rank FROM (
         |    SELECT qid, doc_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY score_u DESC, doc_id) AS rnk
         |    FROM score) WHERE rnk <= 10),
         |qrels AS (
         |  SELECT a.doc_id AS qid, b.doc_id AS nid
         |  FROM documents a JOIN documents b
         |    ON a.source = b.source AND b.doc_id <> a.doc_id
         |  WHERE a.doc_id < 3)
         |SELECT bm.qid, bm.nid, CAST(bm.rank AS BIGINT) AS rank
         |FROM bm
         |WHERE bm.qid <> bm.nid
         |  AND NOT EXISTS (SELECT 1 FROM qrels
         |    WHERE qrels.qid = bm.qid AND qrels.nid = bm.nid)""".stripMargin) {
      (s, d) =>
      import graft.functions.TextFunctions.tokens
      val docs = Tables.documents(s, d)
      val qt = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), explode(tokens(col("text"))).as("term"))
        .distinct()
      val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", qt, 10)
        .select(col("qid"), col("doc").as("nid"), col("rnk").as("rank"))
      val qrels = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), col("source").as("__qsrc"))
        .join(docs.select(col("doc_id").as("nid"), col("source")),
          col("__qsrc") === col("source") && col("qid") =!= col("nid"))
        .select("qid", "nid")
      Evaluation.hardNegatives(ranked, qrels)
    },

    // q121: retrieval-quality metrics ([[graft.operators.Evaluation]])
    // — the evaluation layer over the BM25 retriever: doc-by-example
    // queries (doc_id < 3) ranked top-10, scored against a
    // deterministic relevance set (same-source docs, self excluded) in
    // exact integer units: MRR as 10⁶ div first-relevant-rank, DCG as
    // per-rank micro-unit gains quantized before summation, and IDCG
    // as the same gains over ranks 1..min(n_rel, 10) — nDCG is the
    // exact ratio dcg_u/idcg_u. Self-retrieval (rank 1, excluded from
    // qrels) is part of what is measured: the raw retriever's rank
    // budget. The oracle replays ranking, qrels, and every gain.
    QueryDef.sql(
      "q121_retrieval_metrics",
      s"""WITH toks AS (SELECT doc_id, $T AS tk FROM documents),
         |q AS (SELECT DISTINCT doc_id AS qid, t AS term
         |      FROM (SELECT doc_id, unnest(tk) AS t FROM toks
         |            WHERE doc_id < 3)),
         |posting AS (
         |  SELECT doc_id, t AS term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
         |tot AS (SELECT count(*) AS n, CAST(sum(len(tk)) AS BIGINT) AS total
         |        FROM toks),
         |dft AS (
         |  SELECT term, count(*) AS df FROM posting
         |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
         |idf AS (
         |  SELECT term,
         |    CAST(floor(ln(CAST(2 * tot.n + 2 AS DOUBLE) / (2 * df + 1))
         |      * 1000000.0 + 0.5) AS BIGINT) AS idf_u
         |  FROM dft CROSS JOIN tot),
         |contrib AS (
         |  SELECT q.qid, p.doc_id,
         |    (idf.idf_u * 22 * p.tf * t.total)
         |      // (10 * p.tf * t.total + 3 * t.total + 9 * dl.dl * t.n) AS c
         |  FROM q JOIN posting p USING (term) JOIN idf USING (term)
         |  JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN tot t),
         |score AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_u
         |          FROM contrib GROUP BY 1, 2),
         |bm AS (
         |  SELECT qid, doc_id AS nid, rnk AS rank FROM (
         |    SELECT qid, doc_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY score_u DESC, doc_id) AS rnk
         |    FROM score) WHERE rnk <= 10),
         |qrels AS (
         |  SELECT a.doc_id AS qid, b.doc_id AS nid
         |  FROM documents a JOIN documents b
         |    ON a.source = b.source AND b.doc_id <> a.doc_id
         |  WHERE a.doc_id < 3),
         |hits AS (
         |  SELECT bm.qid, bm.rank
         |  FROM bm JOIN qrels ON bm.qid = qrels.qid AND bm.nid = qrels.nid),
         |agg AS (
         |  SELECT qid, CAST(count(*) AS BIGINT) AS n_hits,
         |    CAST(max(1000000 // rank) AS BIGINT) AS mrr_u,
         |    CAST(sum(CAST(floor(1000000.0 * ln(2.0) / ln(rank + 1) + 0.5)
         |      AS BIGINT)) AS BIGINT) AS dcg_u
         |  FROM hits GROUP BY qid),
         |nrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel
         |         FROM qrels GROUP BY qid),
         |qs AS (SELECT DISTINCT qid FROM bm)
         |SELECT qs.qid,
         |  coalesce(n.n_rel, 0) AS n_rel,
         |  coalesce(a.n_hits, 0) AS n_hits,
         |  coalesce(a.mrr_u, 0) AS mrr_u,
         |  coalesce(a.dcg_u, 0) AS dcg_u,
         |  CASE WHEN coalesce(n.n_rel, 0) >= 1 THEN
         |    CAST(list_sum(list_transform(
         |      generate_series(1, CAST(least(n.n_rel, 10) AS INTEGER)),
         |      r -> CAST(floor(1000000.0 * ln(2.0) / ln(r + 1) + 0.5)
         |        AS BIGINT))) AS BIGINT)
         |  ELSE 0 END AS idcg_u
         |FROM qs LEFT JOIN nrel n ON qs.qid = n.qid
         |LEFT JOIN agg a ON qs.qid = a.qid""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions.tokens
      val docs = Tables.documents(s, d)
      val qt = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), explode(tokens(col("text"))).as("term"))
        .distinct()
      val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", qt, 10)
        .select(col("qid"), col("doc").as("nid"), col("rnk").as("rank"))
      val qrels = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), col("source").as("__qsrc"))
        .join(docs.select(col("doc_id").as("nid"), col("source")),
          col("__qsrc") === col("source") && col("qid") =!= col("nid"))
        .select("qid", "nid")
      Evaluation.rankingMetrics(ranked, qrels, k = 10)
    },

    // q149: chi-squared target-domain vocabulary ([[graft.operators
    // .Classifier.chiSquaredTokens]]) — the token-level counterpart of
    // q110's DSIR doc weights: which tokens' PRESENCE most separates
    // the target domain (source 'src0') from the rest, by the 2×2
    // document-presence chi² (Manning & Schütze ch. 5's feature
    // selection). The statistic text is [[Classifier.ChiSqExprSql]]
    // VERBATIM on both sides over exact BIGINT counts; min-count 5
    // floors unstable cells; top-50 under (chi2_u desc, token).
    QueryDef.sql(
      "q149_chi2_tokens",
      s"""WITH pres AS (
         |  SELECT (source = 'src0') AS pos, list_distinct($T) AS tk
         |  FROM documents),
         |m AS (
         |  SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos_docs,
         |    CAST(count(*) AS BIGINT) AS n_docs
         |  FROM pres),
         |tc AS (
         |  SELECT token,
         |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |    CAST(count(*) AS BIGINT) AS n_all
         |  FROM (SELECT pos, unnest(tk) AS token FROM pres)
         |  GROUP BY token),
         |f AS (
         |  SELECT token, n_pos, CAST(n_all - n_pos AS BIGINT) AS n_neg,
         |    ${Classifier.ChiSqExprSql}
         |  FROM tc CROSS JOIN m WHERE n_all >= 5)
         |SELECT token, n_pos, n_neg, chi2_u FROM f
         |ORDER BY chi2_u DESC, token LIMIT 50""".stripMargin) { (s, d) =>
      Classifier.chiSquaredTokens(
        Tables.documents(s, d)
          .withColumn("is_target", col("source") === "src0"),
        "is_target")
    },

    // q151: HITS hubs & authorities ([[graft.operators.Influence
    // .hitsInteger]]) over the DIRECTED customer→supplier purchase
    // graph — the two-role centrality PageRank's single score collapses
    // (Kleinberg 1999): discerning buyers (hubs) vs sought-after
    // suppliers (authorities). Two exact-integer iterations with
    // max-renormalization each half-step; output is the top-25 of each
    // role under one total order (role, score desc, key).
    QueryDef.sql(
      "q151_hits_centrality",
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |n AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
         |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub_u FROM n),
         |${hitsIter("h0", "a1", "h1")},
         |${hitsIter("h1", "a2", "h2")},
         |sup AS (
         |  SELECT 'supplier' AS role, (node - 1) // 2 AS entity_key,
         |    auth_u AS score_u
         |  FROM a2 WHERE node % 2 = 1
         |  ORDER BY auth_u DESC, node LIMIT 25),
         |cust AS (
         |  SELECT 'customer' AS role, node // 2 AS entity_key,
         |    hub_u AS score_u
         |  FROM h2 WHERE node % 2 = 0
         |  ORDER BY hub_u DESC, node LIMIT 25)
         |SELECT role, CAST(entity_key AS BIGINT) AS entity_key, score_u
         |FROM (SELECT * FROM sup UNION ALL SELECT * FROM cust)
         |ORDER BY role, score_u DESC, entity_key""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val e0 = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val res = Influence.hitsInteger(e0, 2)
      val sup = res.filter(pmod(col("node"), lit(2)) === 1)
        .select(lit("supplier").as("role"),
          expr("(node - 1) div 2").as("entity_key"),
          col("auth_u").as("score_u"))
        .orderBy(col("score_u").desc, col("entity_key")).limit(25)
      val cust = res.filter(pmod(col("node"), lit(2)) === 0)
        .select(lit("customer").as("role"),
          expr("node div 2").as("entity_key"),
          col("hub_u").as("score_u"))
        .orderBy(col("score_u").desc, col("entity_key")).limit(25)
      sup.unionByName(cust)
        .orderBy(col("role"), col("score_u").desc, col("entity_key"))
    },

    // q152: TextRank corpus keywords ([[graft.operators.Profile
    // .textRankKeywords]]) — PageRank over the word-adjacency graph
    // (Mihalcea & Tarau 2004): tokens many DIFFERENT tokens attach to,
    // the hub vocabulary neither tf nor q148's PMI surfaces. Reuses the
    // q108 integer-PageRank kernel verbatim (the oracle chains the same
    // prIter CTEs over string nodes); edges are distinct adjacent
    // pairs, self-loops dropped, mirrored then re-distincted.
    QueryDef.sql(
      "q152_textrank_keywords",
      s"""WITH tk AS (SELECT $T AS t FROM documents),
         |e0 AS (
         |  SELECT DISTINCT w1 AS src, w2 AS dst FROM (
         |    SELECT t[i] AS w1, t[i + 1] AS w2
         |    FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
         |          FROM tk WHERE len(t) >= 2))
         |  WHERE w1 <> w2),
         |e AS (SELECT src, dst FROM e0
         |      UNION SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |n AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_u FROM n),
         |${prIter("r0", "r1")},
         |${prIter("r1", "r2")},
         |${prIter("r2", "r3")}
         |SELECT node AS token, rank_u FROM r3
         |ORDER BY rank_u DESC, token LIMIT 30""".stripMargin) { (s, d) =>
      Profile.textRankKeywords(Tables.documents(s, d))
    },

    // q166: exact triangle counts + clustering coefficients over the
    // part co-purchase graph ([[graft.operators.Influence
    // .triangleStats]], Suri & Vassilvitskii WWW'11 degree orientation)
    // — the community-structure statistic the centralities miss: at
    // equal degree, a part bought in cohesive baskets (high cc) vs one
    // bridging unrelated ones. Every edge orients (deg, id)-low → high,
    // so each triangle closes from exactly ONE wedge and hub fan-out is
    // O(m^1.5) total — no reducer sees a hub's full quadratic. Top-25
    // under the (n_tri desc, node) total order.
    QueryDef.sql(
      "q166_triangle_clustering",
      """WITH und AS MATERIALIZED (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
        |                  greatest(a.l_partkey, b.l_partkey) AS b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS MATERIALIZED (
        |  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        |  GROUP BY node),
        |dir AS MATERIALIZED (
        |  SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS src,
        |         CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS dst
        |  FROM (SELECT u.a, u.b, x.degree AS da, y.degree AS db
        |        FROM und u JOIN deg x ON u.a = x.node
        |                   JOIN deg y ON u.b = y.node)),
        |tri AS MATERIALIZED (
        |  SELECT w.src, w.x, w.y
        |  FROM (SELECT e1.src, e1.dst AS x, e2.dst AS y
        |        FROM dir e1 JOIN dir e2
        |          ON e1.src = e2.src AND e1.dst < e2.dst) w
        |  JOIN und ON w.x = und.a AND w.y = und.b),
        |per AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |    SELECT src AS node FROM tri
        |    UNION ALL SELECT x AS node FROM tri
        |    UNION ALL SELECT y AS node FROM tri) GROUP BY node)
        |SELECT d.node, d.degree,
        |  CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_tri,
        |  CAST(CASE WHEN d.degree < 2 THEN 0
        |    ELSE (2 * coalesce(p.n_tri, 0) * 10000)
        |         // (d.degree * (d.degree - 1)) END AS BIGINT) AS cc_bp
        |FROM deg d LEFT JOIN per p USING (node)
        |ORDER BY n_tri DESC, node LIMIT 25""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val r = l.select(col("ok"), col("pk").as("pk2"))
      val edges = l.join(r, Seq("ok"))
        .where(col("pk") =!= col("pk2"))
        .select(col("pk").as("u"), col("pk2").as("v"))
      Influence.triangleStats(edges)
        .orderBy(col("n_tri").desc, col("node")).limit(25)
    },

    // q207: DOULION approximate triangle count vs exact, in basis
    // points ([[graft.operators.Influence.triangleCountApprox]],
    // Tsourakakis et al. KDD'09 — VERDICT r12 #3): keep each canonical
    // co-purchase edge iff its md5 pair-hash lands under p = 0.25,
    // count triangles exactly on the sampled graph through the SAME
    // degree-oriented chain, scale by 1/p³. The one-row readout pins
    // the exact count, the sampled count, the unbiased estimate, and
    // the estimate's error in bp — the q135-style exactness audit that
    // makes the approximate twin trustworthy before it replaces the
    // exact pass at a scale where O(m^1.5) is too hot.
    QueryDef.sql(
      "q207_triangle_doulion",
      s"""WITH und AS MATERIALIZED (
         |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
         |                  greatest(a.l_partkey, b.l_partkey) AS b
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         |s_und AS MATERIALIZED (
         |  SELECT a, b FROM und
         |  WHERE CAST(concat('0x', substring(md5(
         |      CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 8))
         |    AS BIGINT) % 10000 < 2500),
         |${triChainSql("und", "x_")},
         |${triChainSql("s_und", "s_")},
         |ec AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM x_tri),
         |sc AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled_tri FROM s_tri)
         |SELECT ec.n_exact, sc.n_sampled_tri,
         |  CAST(sc.n_sampled_tri * 1000000000000 //
         |    (CAST(2500 AS BIGINT) * 2500 * 2500) AS BIGINT) AS n_est,
         |  CAST(abs(sc.n_sampled_tri * 1000000000000 //
         |      (CAST(2500 AS BIGINT) * 2500 * 2500) - ec.n_exact) * 10000
         |    // greatest(ec.n_exact, 1) AS BIGINT) AS err_bp
         |FROM ec CROSS JOIN sc""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val r = l.select(col("ok"), col("pk").as("pk2"))
      val edges = l.join(r, Seq("ok"))
        .where(col("pk") =!= col("pk2"))
        .select(col("pk").as("u"), col("pk2").as("v"))
        .localCheckpoint(true)
      val exact = Influence.triangleStats(edges)
        .agg((sum("n_tri") / 3).cast("long").as("n_exact"))
      val approx = Influence.triangleCountApprox(edges, pBp = 2500)
      exact.crossJoin(approx)
        .select(col("n_exact"), col("n_sampled_tri"), col("n_est"),
          expr("abs(n_est - n_exact) * 10000 div greatest(n_exact, 1)")
            .as("err_bp"))
    },

    // q198: degree-distribution profile + power-law slope ([[graft
    // .operators.Influence.degreeDistribution]]) per side of the q108
    // customer–supplier graph — the graph datasheet read BEFORE running
    // centralities at a new scale: max_degree is the skew-join hub,
    // slope_micro the scale-free diagnostic. Count-of-counts shape;
    // the micro-nat OLS text is shared verbatim with q154/q162.
    QueryDef.sql(
      "q198_degree_distribution",
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS (SELECT src, dst FROM e0
         |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (
         |  SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |      AS side,
         |    src, CAST(count(*) AS BIGINT) AS deg
         |  FROM e GROUP BY 1, 2),
         |levels AS (SELECT side, deg, CAST(count(*) AS BIGINT) AS n_nodes
         |  FROM deg GROUP BY 1, 2),
         |tot AS (SELECT side, CAST(sum(n_nodes) AS BIGINT) AS n_nodes,
         |    CAST(sum(deg * n_nodes) AS BIGINT) AS n_edge_ends,
         |    max(deg) AS max_degree
         |  FROM levels GROUP BY side),
         |fit0 AS (SELECT side,
         |    CAST(floor(ln(CAST(deg AS DOUBLE)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS x,
         |    CAST(floor(ln(CAST(n_nodes AS DOUBLE)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS y
         |  FROM levels),
         |fit AS (SELECT side, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM fit0 GROUP BY side)
         |SELECT t.side, t.n_nodes, t.n_edge_ends, t.max_degree,
         |  f.n AS n_levels,
         |  ${graft.operators.Profile.olsSlopeMicroSql("slope_micro")}
         |FROM tot t JOIN fit f USING (side)""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val e0 = o.join(li, o("o_orderkey") === li("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = e0
        .union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .withColumn("side",
          when(pmod(col("src"), lit(2)) === 0, "customer")
            .otherwise("supplier"))
      Influence.degreeDistribution(edges, "side")
    },
  )

  /** One HITS half-iteration pair as DuckDB CTEs: authorities `aCur`
    * from hubs `hPrev`, then hubs `hCur` from `aCur`, each
    * max-renormalized to 10⁶ — the exact integer update
    * [[Influence.hitsInteger]] runs, over the shared `e`/`n` CTEs.
    */
  private def hitsIter(hPrev: String, aCur: String, hCur: String): String =
    s"""${aCur}r AS (
       |  SELECT e.dst AS node, CAST(sum(h.hub_u) AS BIGINT) AS raw
       |  FROM e JOIN $hPrev h ON h.node = e.src GROUP BY e.dst),
       |${aCur}m AS (SELECT max(raw) AS mx FROM ${aCur}r),
       |$aCur AS (
       |  SELECT n.node,
       |    CAST(coalesce((r.raw * 1000000) // m.mx, 0) AS BIGINT) AS auth_u
       |  FROM n LEFT JOIN ${aCur}r r ON n.node = r.node CROSS JOIN ${aCur}m m),
       |${hCur}r AS (
       |  SELECT e.src AS node, CAST(sum(a.auth_u) AS BIGINT) AS raw
       |  FROM e JOIN $aCur a ON a.node = e.dst GROUP BY e.src),
       |${hCur}m AS (SELECT max(raw) AS mx FROM ${hCur}r),
       |$hCur AS (
       |  SELECT n.node,
       |    CAST(coalesce((r.raw * 1000000) // m.mx, 0) AS BIGINT) AS hub_u
       |  FROM n LEFT JOIN ${hCur}r r ON n.node = r.node CROSS JOIN ${hCur}m m)""".stripMargin
}
