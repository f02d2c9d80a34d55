package graft

import graft.operators.{Classifier, Dsir, Evaluation, Influence, Retrieval, Sampling}
import org.apache.spark.sql.functions._

/** Ranking & selection operators: integer PageRank, BM25 retrieval,
  * DSIR importance weights, winsorized normalization.
  */
class RankingSpec extends SparkSpec {
  import sqlImplicits._

  test("pageRankInteger matches hand-computed ranks on a 3-cycle-ish graph") {
    // 1→2, 1→3, 2→3, 3→1: outdeg 1:2, 2:1, 3:1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    // one iteration: contrib(1→each) = (1e6 div 2)*0.85 = 425000;
    // contrib(2→3) = 850000; contrib(3→1) = 850000
    val r1 = Influence.pageRankInteger(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 1425000L))
    // second iteration from those ranks:
    // 1 gets (1425000*850000) div 1e6 = 1211250; 2 gets (1000000 div 2)
    // damped = 425000; 3 gets 425000 + (575000*850000) div 1e6 = 488750
    val r2 = Influence.pageRankInteger(edges, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("pageRankInteger: dangling sink keeps teleport-only source alive") {
    // 1→2 only: node 2 has no out-edges (mass leaks), node 1 no inbound
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r2 = Influence.pageRankInteger(edges, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: 1 = teleport 150000; 2 = 150000 + 850000
    // iter2: 2's inbound re-derives from 1's new rank: (150000*0.85)
    assert(r2 == Map(1L -> 150000L, 2L -> 277500L))
  }

  test("pageRankInteger is invariant to input partitioning") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L), (2L, 1L))
    val a = Influence.pageRankInteger(e.toDF("src", "dst"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Influence.pageRankInteger(
        e.toDF("src", "dst").repartition(7), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("personalizedPageRank: hand chain, unreachable ranks 0, stale seeds ignored") {
    // chain 1→2→3 plus isolated 4→5; seeds = {1}: N = 5, nS = 1,
    // rank0(1) = 5e6, tele(1) = 750000.
    // iter1: 2 gets (5e6 div 1)*0.85 = 4.25e6; ranks (750000, 4250000, 0, 0, 0)
    // iter2: 2 gets (750000*0.85) = 637500; 3 gets (4.25e6*0.85) = 3612500
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    // caches released (the r10 rule): only the eager result may remain
    var r2: Map[Long, Long] = null
    assertReleases("personalizedPageRank", allowed = 1) {
      r2 = Influence.personalizedPageRank(edges, seeds, 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(r2 == Map(1L -> 750000L, 2L -> 637500L, 3L -> 3612500L,
      4L -> 0L, 5L -> 0L), r2.toString)
    // a seed absent from the graph is ignored: nS stays 1, ranks identical
    val r2stale = Influence.personalizedPageRank(edges,
      Seq(1L, 99L).toDF("node"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2stale == r2)
  }

  test("personalizedPageRank is invariant to input partitioning") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L), (2L, 1L))
    val s = Seq(2L, 3L)
    val a = Influence.personalizedPageRank(e.toDF("src", "dst"),
        s.toDF("node"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Influence.personalizedPageRank(
        e.toDF("src", "dst").repartition(7), s.toDF("node").repartition(3), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("bm25TopK ranks the matching doc first and respects doc-length penalty") {
    // two docs contain 'cat'; the shorter doc has the same tf so BM25's
    // length normalization must rank it higher. 'dog' appears in one doc.
    val docs = Seq(
      (1L, "cat cat filler filler filler filler filler filler"),
      (2L, "cat cat pad"),
      (3L, "dog pad pad"),
      (4L, "unrelated words only here")).toDF("id", "text")
    val q = Seq((1L, "cat"), (2L, "dog")).toDF("qid", "term")
    val got = Retrieval.bm25TopK(docs, "id", "text", q, 10)
      .orderBy("qid", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // query 1: doc 2 (short) above doc 1 (long); query 2: only doc 3
    assert(got.toSeq == Seq((1L, 2L, 1L), (1L, 1L, 2L), (2L, 3L, 1L)))
  }

  test("bm25TopK: rarer term outscores common term at equal tf and dl") {
    // 'rare' in 1 doc, 'common' in 3 — idf must order the single-term scores
    val docs = Seq(
      (1L, "rare pad pad"), (2L, "common pad pad"),
      (3L, "common xx yy"), (4L, "common zz ww")).toDF("id", "text")
    val q = Seq((1L, "rare"), (2L, "common")).toDF("qid", "term")
    val scores = Retrieval.bm25TopK(docs, "id", "text", q, 10)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(1L) > scores(2L))
  }

  test("bm25TopK caps results at k with deterministic tie-break") {
    val docs = (1L to 8L).map(i => (i, "term pad")).toDF("id", "text")
    val q = Seq((1L, "term")).toDF("qid", "term")
    val got = Retrieval.bm25TopK(docs, "id", "text", q, 3)
      .orderBy("rnk").collect().map(_.getLong(1))
    // all scores tie (same tf, dl, idf) → doc id ascending, first 3
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("rrfFuse: both-list hits beat single-list hits; absences score 0") {
    // qid 1: nid 10 is rank 1 in BOTH lists; nid 11 rank 2 lexical only;
    // nid 12 rank 1 semantic only (ranks per list, not global)
    val bm = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "nid", "rank")
    val cs = Seq((1L, 10L, 2L), (1L, 12L, 1L)).toDF("qid", "nid", "rank")
    val got = graft.operators.Retrieval.rrfFuse(bm, cs, k = 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    // integer RRF: 10 → 1e6/61 + 1e6/62 = 16393 + 16129 = 32522;
    // 12 → 16393; 11 → 16129
    assert(got(10L) == (32522L, 1L))
    assert(got(12L) == (16393L, 2L))
    assert(got(11L) == (16129L, 3L))
  }

  test("rrfFuse caps at k per query and keeps queries independent") {
    val bm = (1L to 30L).map(i => (i % 2 + 1, i, i / 2 + 1)).toDF("qid", "nid", "rank")
    val cs = Seq.empty[(Long, Long, Long)].toDF("qid", "nid", "rank")
    val got = graft.operators.Retrieval.rrfFuse(bm, cs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.count(_._1 == 1L) == 5 && got.count(_._1 == 2L) == 5)
    assert(got.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("dsir importanceWeights favors docs that look like the target") {
    // target dialect: "alpha beta" bigrams; raw pool dialect: "gamma delta"
    val docs = (
      (1L to 5L).map(i => (i, "alpha beta alpha beta", true)) ++
      (6L to 20L).map(i => (i, "gamma delta gamma delta", false)) ++
      Seq((21L, "alpha beta alpha beta", false),   // raw doc matching target
          (22L, "gamma delta gamma delta", false)) // raw doc matching pool
    ).toDF("id", "text", "tgt")
    val w = Dsir.importanceWeights(docs, "id", "text", col("tgt"), 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(21L) > w(22L), s"target-like doc must outweigh pool-like: $w")
    // identical text ⇒ identical weight, regardless of target membership
    assert(w(1L) == w(21L) && w(6L) == w(22L))
  }

  test("dsir importanceWeights: sub-2-token docs are absent; sums are exact") {
    val docs = Seq((1L, "a b c", true), (2L, "solo", false),
      (3L, "", false), (4L, "a b", false)).toDF("id", "text", "tgt")
    val w = Dsir.importanceWeights(docs, "id", "text", col("tgt"), 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!w.contains(2L) && !w.contains(3L))
    assert(w(1L)._1 == 2L && w(4L)._1 == 1L)
  }

  test("winsorizedNormalize clips outliers and hits the [0,10000] rails") {
    // group g: values 1..20 plus outlier 1000; p05/p95 over 1..20,1000
    val df = ((1L to 20L) :+ 1000L).map(v => ("g", v)).toDF("grp", "v")
    val out = Sampling.winsorizedNormalize(df, "grp", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(1000L) == 10000L)        // outlier clipped to the hi rail
    assert(out(1L) == 0L)               // low tail clipped to the lo rail
    assert(out(10L) > 0L && out(10L) < 10000L)
    // monotone in the raw score
    val mids = (2L to 19L).map(out)
    assert(mids == mids.sorted)
  }

  test("leakageSafeSplit: cluster members share a split; singletons match splitLabel") {
    // clusters of 3 near-twins (same key) + singletons, over enough ids
    // that all three splits occur
    val df = (1L to 300L).map(i => (i, s"k${i / 3}")).toDF("id", "ck")
    val out = Sampling.leakageSafeSplit(df, "id", col("ck"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    // every cluster: one split, rep = min id
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._4).distinct.length == 1)
      assert(rows.forall(_._3 == rows.map(_._1).min))
    }
    // all three splits occur across 100 clusters
    assert(out.map(_._4).distinct.sorted.toSeq == Seq("test", "train", "val"))
    // a singleton's split equals the plain id-hash split
    val plain = df.select(col("id"), Sampling.splitLabel(col("id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(r => r._1 == r._3 && out.count(_._2 == r._2) == 1)
      .foreach(r => assert(r._4 == plain(r._1)))
  }

  test("leakageSafeSplit keeps near-twins out of cross-split leakage under repartition") {
    val df = (1L to 90L).map(i => (i, s"c${i % 30}")).toDF("id", "ck")
    val a = Sampling.leakageSafeSplit(df, "id", col("ck"))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.leakageSafeSplit(df.repartition(11), "id", col("ck"))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("winsorizedNormalize: constant group normalizes to 0, groups independent") {
    val df = (Seq.fill(5)(("c", 7L)) ++ (1L to 10L).map(v => ("g", v)))
      .toDF("grp", "v")
    val out = Sampling.winsorizedNormalize(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out(("c", 7L)) == 0L)        // hi_u == lo_u → denominator guard
    assert(out(("g", 10L)) == 10000L)
  }

  test("winsorizedNormalizeWith passes unknown-group rows through with null norm_u") {
    // thresholds cover only group g — a NEW source appearing after the
    // offline percentile run must survive with the explicit
    // no-calibration marker, never be silently dropped (ADVICE r10)
    val df = Seq(("g", 5L), ("g", 9L), ("new", 7L)).toDF("grp", "v")
    val thr = Seq(("g", 50000L, 90000L)).toDF("grp", "lo_u", "hi_u")
    val out = Sampling.winsorizedNormalizeWith(df, "grp", "v", thr)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out.size == 3, "unknown-group row must not be dropped")
    assert(out(("new", 7L)).isEmpty, "unknown group gets null norm_u")
    assert(out(("g", 5L)).contains(0L) && out(("g", 9L)).contains(10000L))
  }

  test("bm25TopK counts a repeated query term once (set-of-terms model)") {
    val docs = Seq(
      (1L, "cat cat filler filler"), (2L, "cat pad"),
      (3L, "dog pad pad")).toDF("id", "text")
    val once = Seq((1L, "cat"), (1L, "dog")).toDF("qid", "term")
    val duped = Seq((1L, "cat"), (1L, "cat"), (1L, "cat"), (1L, "dog"))
      .toDF("qid", "term")
    def rows(q: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(docs, "id", "text", q, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    assert(rows(once) == rows(duped))
  }

  test("queryLikelihoodTopK matches the exact-quantization brute replay") {
    val docs = Seq(
      (1L, "cat cat pad"), (2L, "cat pad pad pad pad pad"),
      (3L, "dog pad"), (4L, "other stuff")).toDF("id", "text")
    // total = 3 + 6 + 2 + 2 = 13; cf(cat) = 3, cf(dog) = 1
    val q = Seq((1L, "cat"), (2L, "dog")).toDF("qid", "term")
    def mU(tf: Long, cf: Long, total: Long, mu: Long = 2000L) =
      math.floor(math.log((mu * cf + tf * total).toDouble /
        (mu * cf).toDouble) * 1e6 + 0.5).toLong
    def dU(dl: Long, mu: Long = 2000L) =
      math.floor(math.log(mu / (dl + mu).toDouble) * 1e6 + 0.5).toLong
    val got = Retrieval.queryLikelihoodTopK(docs, "id", "text", q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 1L)) == mU(2, 3, 13) + 1 * dU(3))
    assert(got((1L, 2L)) == mU(1, 3, 13) + 1 * dU(6))
    assert(got((2L, 3L)) == mU(1, 1, 13) + 1 * dU(2))
    // higher tf + shorter doc outranks; no-term docs absent
    assert(got((1L, 1L)) > got((1L, 2L)))
    assert(!got.contains((1L, 4L)) && !got.contains((2L, 4L)))
  }

  test("queryLikelihoodTopK counts a repeated query term once and caps at k") {
    val docs = (1L to 6L).map(i => (i, "term pad")).toDF("id", "text")
    val once = Seq((1L, "term")).toDF("qid", "term")
    val duped = Seq((1L, "term"), (1L, "term")).toDF("qid", "term")
    def rows(q: org.apache.spark.sql.DataFrame, k: Int) =
      Retrieval.queryLikelihoodTopK(docs, "id", "text", q, k)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    assert(rows(once, 10) == rows(duped, 10))
    // ties (same tf, dl, cf) break by doc id; k caps the list
    assert(rows(once, 3).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("mmrSelect: diversity beats relevance, hand values, ties on nid") {
    // A(1) rel 100, B(2) rel 90, C(3) rel 85; B is near-dup of A
    // (sim 90), C is far (10); sim(B,C) = 20. λ = 0.7:
    // r1: (7·rel)div10 → A 70 | r2: B (630−270)div10=36, C (595−30)
    // div10=56 → C | r3: B maxsim {A,C} = 90 → 36
    val rel = Seq((1L, 1L, 100L), (1L, 2L, 90L), (1L, 3L, 85L))
      .toDF("qid", "nid", "rel_u")
    val simRows = Seq((1L, 2L, 90L), (1L, 3L, 10L), (2L, 3L, 20L))
    val sims = (simRows ++ simRows.map { case (a, b, s) => (b, a, s) })
      .map { case (a, b, s) => (1L, a, b, s) }
      .toDF("qid", "na", "nb", "sim_u")
    val got = Retrieval.mmrSelect(rel, sims, m = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 70L), (2L, 3L, 56L), (3L, 2L, 36L)),
      got.toString)
    // exact mmr ties break on the smaller nid
    val relT = Seq((9L, 5L, 50L), (9L, 4L, 50L)).toDF("qid", "nid", "rel_u")
    val simT = Seq((9L, 4L, 5L, 0L), (9L, 5L, 4L, 0L))
      .toDF("qid", "na", "nb", "sim_u")
    val gt = Retrieval.mmrSelect(relT, simT, m = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(gt == Seq((1L, 4L), (2L, 5L)), gt.toString)
  }

  test("mmrSelect: sparse sims score missing pairs as similarity 0") {
    // C(3) has NO sims row against anything; a dropped candidate would
    // shrink the pool to {B} after round 1 — instead C's maxsim is 0,
    // so it wins round 2 outright: (7·80) div 10 = 56 > B's 36
    val rel = Seq((1L, 1L, 100L), (1L, 2L, 90L), (1L, 3L, 80L))
      .toDF("qid", "nid", "rel_u")
    val sims = Seq((1L, 2L, 1L, 90L), (1L, 1L, 2L, 90L))
      .map { case (q, a, b, s) => (q, a, b, s) }
      .toDF("qid", "na", "nb", "sim_u")
    val got = Retrieval.mmrSelect(rel, sims, m = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 70L), (2L, 3L, 56L), (3L, 2L, 36L)),
      got.toString)
    // single-orientation sims (only na<nb) still find the similarity:
    // B's sim-to-A rides the (na=2, nb=1) row ABOVE; here invert it
    val simsOne = Seq((1L, 2L, 1L, 90L)).toDF("qid", "na", "nb", "sim_u")
    val g1 = Retrieval.mmrSelect(rel, simsOne, m = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(g1 == Seq((1L, 1L, 70L), (2L, 3L, 56L), (3L, 2L, 36L)),
      g1.toString)
  }

  test("rankingMetrics matches hand-computed MRR/DCG/IDCG in micro-units") {
    import graft.operators.Evaluation
    // qid 1: hit at rank 2 of 3 relevant → mrr 1e6/2, dcg = gain(2),
    // idcg = gain(1)+gain(2)+gain(3); qid 2: no hits but 1 relevant;
    // qid 3: retrieved but absent from qrels entirely
    val ranked = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (3L, 30L, 1L)).toDF("qid", "nid", "rank")
    val qrels = Seq((1L, 11L), (1L, 98L), (1L, 99L), (2L, 77L))
      .toDF("qid", "nid")
    def gain(r: Long) =
      math.floor(1e6 * math.log(2.0) / math.log(r + 1.0) + 0.5).toLong
    val got = Evaluation.rankingMetrics(ranked, qrels, k = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) == ((3L, 1L, 500000L, gain(2), gain(1) + gain(2) + gain(3))))
    assert(got(2L) == ((1L, 0L, 0L, 0L, gain(1))))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L)))
    // rank 1 gain is exactly 1e6 (log2(2) = 1) — the unit anchor
    assert(gain(1) == 1000000L)
    // perfect retrieval: dcg == idcg (nDCG exactly 1)
    val perfect = Evaluation.rankingMetrics(
      Seq((9L, 1L, 1L), (9L, 2L, 2L)).toDF("qid", "nid", "rank"),
      Seq((9L, 1L), (9L, 2L)).toDF("qid", "nid"), k = 10)
      .collect().head
    assert(perfect.getLong(4) == perfect.getLong(5))
  }

  test("hardNegatives: non-relevant top ranks only, self and qrels excluded") {
    val ranked = Seq((1L, 1L, 1), (1L, 5L, 2), (1L, 7L, 3), (1L, 8L, 4),
      (2L, 9L, 1)).toDF("qid", "nid", "rank")
    val qrels = Seq((1L, 5L), (1L, 5L)).toDF("qid", "nid") // dup collapses
    val got = Evaluation.hardNegatives(ranked, qrels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 1→1 is self, 1→5 is relevant; 1→7, 1→8 and the qrel-less 2→9 remain
    assert(got == Set((1L, 7L, 3L), (1L, 8L, 4L), (2L, 9L, 1L)), s"got $got")
  }

  test("recallAtK: bp ratios, approx-absent queries report zero, ranks beyond k ignored") {
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (3L, 30L, 1)).toDF("qid", "nid", "rank")
    val approx = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 4)).toDF("qid", "nid", "rank")
    val got = Evaluation.recallAtK(approx, exact, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 3L, 6666L)), s"got $got") // 10,12 hit; 99 miss
    // q2: approx rank 4 for nid 21 is beyond k → only 20 counts
    assert(got(2L) == ((1L, 2L, 5000L)), s"got $got")
    // q3: approx returned nothing → recall 0, still reported
    assert(got(3L) == ((0L, 1L, 0L)), s"got $got")
  }

  test("thresholdSweep: confusion counts, bp ratios, null rows excluded, empty-prediction zero") {
    val scored = Seq(
      (1L, Some(100L), Some(true)), (2L, Some(50L), Some(true)),
      (3L, Some(-10L), Some(false)), (4L, Some(200L), Some(false)),
      (5L, Some(-100L), Some(true)),
      // null score / null label rows must not be misfiled as tn
      (6L, None, Some(true)), (7L, Some(5L), None))
      .toDF("id", "score", "label")
    val got = Evaluation.thresholdSweep(scored, "score", "label", Seq(0L, 1000L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // t=0: pred {1,2,4} → tp=2 fp=1; rest {3,5} → fn=1 tn=1
    assert(got(0L) == ((2L, 1L, 1L, 1L, 6666L, 6666L, 6666L)), s"got $got")
    // t=1000: nothing predicted → zero ratios, never NaN/divide-by-zero
    assert(got(1000L) == ((0L, 0L, 3L, 2L, 0L, 0L, 0L)), s"got $got")
  }

  test("rocAuc: rank-sum with ties, perfect separation, degenerate group, null rows") {
    val scored = Seq(
      // group a: pos at {10, 5, 5}, neg at {5, 1} → U = 5 (one tie pair
      // per pos-at-5), u2 = 10, AUC = 5/6 → 8333 bp
      ("a", Some(10L), Some(true)), ("a", Some(5L), Some(true)),
      ("a", Some(5L), Some(true)), ("a", Some(5L), Some(false)),
      ("a", Some(1L), Some(false)),
      // group b: all positive → AUC undefined, documented 0
      ("b", Some(1L), Some(true)), ("b", Some(2L), Some(true)),
      // group c: perfect separation → 10000 bp
      ("c", Some(100L), Some(true)), ("c", Some(1L), Some(false)),
      // null label / null score rows must be excluded, not counted
      ("a", Some(999L), None), ("a", None, Some(false)))
      .toDF("src", "score", "label")
    val got = Evaluation.rocAuc(scored, "score", "label", Seq("src"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((3L, 2L, 10L, 8333L)), s"got $got")
    assert(got("b") == ((2L, 0L, 0L, 0L)), s"got $got")
    assert(got("c") == ((1L, 1L, 2L, 10000L)), s"got $got")
  }

  test("rocAuc equals brute-force pairwise counting on seeded random frames") {
    // the rank-sum identity u2 = Σ pos·(2·cumneg + neg) must equal the
    // DEFINITION — 2·#{p>n} + #{p==n} over all (pos, neg) pairs — on
    // frames with heavy ties, negatives, and one-sided groups
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 30 + rnd.nextInt(40)
      val rows = (1 to n).map { _ =>
        ("g" + rnd.nextInt(3), rnd.nextInt(11).toLong - 5L, rnd.nextBoolean())
      }
      val got = Evaluation.rocAuc(rows.toDF("g", "score", "label"),
          "score", "label", Seq("g"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val pos = rs.filter(_._3).map(_._2)
        val neg = rs.filterNot(_._3).map(_._2)
        val u2 = (for (p <- pos; q <- neg)
          yield if (p > q) 2L else if (p == q) 1L else 0L).sum
        val aucBp = (u2 * 10000L) / math.max(2L * pos.size * neg.size, 1L)
        assert(got(g) ==
          ((pos.size.toLong, neg.size.toLong, u2, aucBp)),
          s"trial $trial group $g: got ${got(g)}")
      }
    }
  }

  test("calibrationTable: bucket edges (incl. negative truncation), rates, null exclusion") {
    val scored = Seq(
      // bucket 0 (scores 0..9 at width 10): 2 rows, 1 pos
      (Some(0L), Some(true)), (Some(9L), Some(false)),
      // bucket 1: 1 row, 1 pos
      (Some(10L), Some(true)),
      // negative scores: -5 div 10 = 0 under BOTH engines' toward-zero
      // truncation (NOT floor's -1) — pinned here so the oracle
      // convention can never drift
      (Some(-5L), Some(false)),
      // bucket -1: -10 div 10
      (Some(-10L), Some(true)),
      (None, Some(true)), (Some(3L), None))
      .toDF("score", "label")
    val got = Evaluation.calibrationTable(scored, "score", "label", 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((0L, 3L, 1L, 3333L)), s"got $got")
    assert(got(1L) == ((10L, 1L, 1L, 10000L)), s"got $got")
    assert(got(-1L) == ((-10L, 1L, 1L, 10000L)), s"got $got")
    assert(got.size == 3, s"got $got")
  }

  test("pageRankInteger and bpeMergeTable release their iteration caches") {
    // repeated invocations (the --pr-only/--bpe-only ladders run 13+)
    // must not accumulate cached frames for the session's lifetime;
    // each may leave exactly its eager result checkpoint behind
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    assertReleases("pageRankInteger", allowed = 1) {
      Influence.pageRankInteger(edges, 2).count()
    }
    val docs = Seq("low lower lowest", "new newer newest").toDF("text")
    assertReleases("bpeMergeTable", allowed = 1) {
      graft.operators.Tokenizer.bpeMergeTable(docs, "text", 2).count()
    }
  }

  test("hitsInteger matches hand-computed scores on a tiny bipartite graph") {
    // customers 10, 20 → suppliers 1, 2: 10→1, 10→2, 20→1
    val edges = Seq((10L, 1L), (10L, 2L), (20L, 1L)).toDF("src", "dst")
    // iter1 auth: raw s1 = 2e6, s2 = 1e6, max 2e6 → s1 = 1e6, s2 = 5e5
    //       hub: raw c10 = 1.5e6, c20 = 1e6, max 1.5e6
    //            → c10 = 1e6, c20 = 1e12 div 1.5e6 = 666666
    // iter2 auth: raw s1 = 1666666, s2 = 1e6 → s1 = 1e6,
    //            s2 = 1e12 div 1666666 = 600000
    //       hub: raw c10 = 1.6e6, c20 = 1e6 → c10 = 1e6, c20 = 625000
    val got = Influence.hitsInteger(edges, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((1000000L, 0L)), 2L -> ((600000L, 0L)),
      10L -> ((0L, 1000000L)), 20L -> ((0L, 625000L))), s"got $got")
  }

  test("hitsInteger is invariant to partitioning and releases its caches") {
    val e = Seq((1L, 4L), (1L, 5L), (2L, 4L), (3L, 5L), (2L, 6L))
    // two invocations, each leaving only its eager result checkpoint
    assertReleases("hitsInteger x2", allowed = 2) {
      val a = Influence.hitsInteger(e.toDF("src", "dst"), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val b = Influence.hitsInteger(e.toDF("src", "dst").repartition(7), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(a == b)
    }
  }

  test("chiSquaredTokens matches a brute-force 2x2 chi-squared") {
    val docs = Seq(
      (true, "apple apple banana"), (true, "apple cherry"),
      (true, "apple banana"), (false, "banana cherry"),
      (false, "cherry date"), (false, "banana date"))
      .toDF("pos", "text")
    val got = Classifier.chiSquaredTokens(docs, "pos", minCount = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // brute force: presence counts over 6 docs, 3 positive
    def chi(a: Long, c: Long): Long = {
      val (n, np) = (6.0, 3.0)
      val all = a + c
      if (all == 6) 0L
      else {
        val (b, d) = (3.0 - a, 3.0 - c)
        val diff = a * d - b * c
        math.floor(n * diff * diff /
          (np * (n - np) * all * (n - all)) * 1e6 + 0.5).toLong
      }
    }
    // apple: a=3 c=0; banana: a=2 c=2; cherry: a=1 c=2; date: a=0 c=2
    assert(got("apple") == ((3L, 0L, chi(3, 0))), s"got $got")
    assert(got("banana") == ((2L, 2L, chi(2, 2))), s"got $got")
    assert(got("cherry") == ((1L, 2L, chi(1, 2))), s"got $got")
    assert(got("date") == ((0L, 2L, chi(0, 2))), s"got $got")
    // repeated token in one doc counts once (presence, not frequency):
    // apple's a is 3, not 4
    assert(got("apple")._1 == 3L)
  }

  test("chiSquaredTokens guards degenerate margins to zero") {
    // constant label → every chi2 is 0, not NaN/error
    val allPos = Seq((true, "x y"), (true, "x z")).toDF("pos", "text")
    val g1 = Classifier.chiSquaredTokens(allPos, "pos", minCount = 1)
      .collect().map(_.getLong(3)).toSet
    assert(g1 == Set(0L))
    // token present in EVERY doc (x) → 0 via the n_all = n_docs guard
    val mixed = Seq((true, "x a"), (false, "x b")).toDF("pos", "text")
    val g2 = Classifier.chiSquaredTokens(mixed, "pos", minCount = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(g2("x") == 0L)
  }

  test("textRankKeywords ranks hub tokens above leaf tokens") {
    // path graph a–b–c–d from two docs; b and c have degree 2, a and d
    // degree 1 — centrality must put {b, c} strictly above {a, d}
    val docs = Seq("a b c", "b c d").toDF("text")
    val got = graft.operators.Profile.textRankKeywords(docs, "text", 3, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.map(_._1).toSet == Set("a", "b", "c", "d"))
    val rank = got.toMap
    assert(rank("b") > rank("a") && rank("b") > rank("d"), s"got $rank")
    assert(rank("c") > rank("a") && rank("c") > rank("d"), s"got $rank")
    // duplicate adjacency (both orders in text) must not double an edge:
    // symmetric graph keeps b and c tied
    assert(rank("b") == rank("c"), s"got $rank")
  }

  test("degreeDistribution: star graph totals and exact -1 slope, releases") {
    import sqlImplicits._
    // undirected star 1–{2,3,4}, doubled: degrees 1→3, {2,3,4}→1.
    // Levels (deg 3: 1 node) and (deg 1: 3 nodes) are log-log symmetric
    // → OLS slope exactly −1 (−1,000,000 micro)
    val e0 = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val edges = e0
      .union(e0.select($"dst".as("src"), $"src".as("dst")))
      .withColumn("side", org.apache.spark.sql.functions.lit("g"))
    assertReleases("degreeDistribution") {
      val r = Influence.degreeDistribution(edges, "side").collect()
      assert(r.length == 1, r.mkString(";"))
      val row = r.head
      assert((row.getString(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getLong(5)) ==
        (("g", 4L, 6L, 3L, 2L, -1000000L)), row.toString)
    }
  }
}
