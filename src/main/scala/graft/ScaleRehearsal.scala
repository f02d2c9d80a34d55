package graft

import graft.operators.{Dedup, Skew}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial scale rehearsal for the dedup/ANN caps (VERDICT r3 #4):
  * generates a synthetic corpus with PLANTED pathologies — an
  * exact-copy megabucket, a hot boilerplate shingle, a near-dup chain,
  * and a skewed join key — at multiple sizes, runs the capped operators,
  * and prints one JSON line per scale with wall-clock + output
  * cardinalities. The claim under test: pair counts stay bounded
  * (~linear in corpus size, never C(n,2)) and runtime scales ~linearly,
  * because every blowup vector is capped (df cap, bucket caps) and every
  * pair join is keyed. This is the closest a local[32] container gets to
  * rehearsing the 100 TB posture.
  *
  * Run: SPARK_GRAFT_CPUS=32 java -cp "target/scala-2.13/classes:SPARK_JARS"
  *      graft.ScaleRehearsal [nDocs ...]    (default: 15000 50000 150000)
  * where SPARK_JARS globs every jar under /opt/spark/jars.
  *
  * Rung comparability (VERDICT r6 #3): every rung must sit in the SAME
  * cap regime, or the pair counts aren't comparable across scales. The
  * binding constraint is the exact-copy megabucket (n/50 docs) vs the
  * bucket caps (200): n must exceed 10,000 so the megabucket is dropped
  * at EVERY rung (the hot shingle, df ≈ n/20 vs df cap 200, then binds
  * a fortiori). Hence the 15k floor — enforced below.
  */
object ScaleRehearsal {

  /** Deterministic corpus of `n` docs (~62 tokens each) with planted
    * adversaries, disjoint by id residue:
    *  - id % 100 == 1 → near-dup of id-1 (same 60-token base + 2 unique
    *    salt tokens; jaccard ≈ 0.9) — the signal the pipeline must find
    *  - id % 50 == 2 → exact copy of one boilerplate doc (2% of corpus:
    *    identical minhash AND simhash signatures → the megabucket)
    *  - id % 20 == 3 → 13-token shared boilerplate prefix + unique tail
    *    (5% of corpus: hot shingles with df ≈ n/20)
    *  - everything else: unique pseudo-random tokens from a 30k vocab
    */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val fam = when(pmod(col("id"), lit(100)) === 1, col("id") - 1).otherwise(col("id"))
    spark.range(n).select(col("id"), fam.as("fam"))
      .withColumn("base", expr(
        "transform(sequence(0, 59), j -> concat('w', pmod(xxhash64(concat(cast(fam AS string), '_', cast(j AS string))), 30000)))"))
      .withColumn("salt", expr(
        "transform(sequence(0, 1), j -> concat('s', cast(id AS string), '_', cast(j AS string)))"))
      .select(col("id"),
        when(pmod(col("id"), lit(50)) === 2,
          lit("exact copy boilerplate body repeated verbatim across the corpus many times over and over"))
        .when(pmod(col("id"), lit(20)) === 3,
          concat(lit("standard legal disclaimer all rights reserved no warranty of any kind applies "),
            array_join(col("base"), " ")))
        .when(pmod(col("id"), lit(100)) === 1,
          array_join(concat(col("base"), col("salt")), " "))
        .otherwise(array_join(col("base"), " ")).as("text"),
        lit("s").as("source"))
  }

  private def timed(body: => Long): (Double, Long) = {
    System.gc()
    val t0 = System.nanoTime()
    val rows = body
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  /** Median-of-3 wall for shape-vs-shape ladders: single-shot timing on
    * this container cannot distinguish a 2× shape difference from
    * ambient load (measured: the same rung varied 4.7 → 45.9 s across
    * three otherwise-identical runs), the same lesson that moved Bench
    * to per-query medians in r8.
    */
  private def timed3(body: => Long): (Double, Long) = {
    val runs = (1 to 3).map(_ => timed(body)).sortBy(_._1)
    (runs(1)._1, runs(1)._2)
  }

  /** Row count that FORCES evaluation of `forceCol`: a bare count() lets
    * Catalyst prune computed columns the filter doesn't need — for the
    * as-of join that deletes the window carry itself, timing an empty
    * plan (caught red-handed in round 8: "16M-row as-of" in 0.2 s).
    */
  private def forcedRows(df: DataFrame, forceCol: String): Long =
    df.agg(count(lit(1)), sum(col(forceCol).cast("double"))).head().getLong(0)

  def main(args: Array[String]): Unit = {
    val asofOnly = args.contains("--asof-only")
    val segOnly = args.contains("--seg-only")
    val capOnly = args.contains("--cap-only")
    val deconOnly = args.contains("--decon-only")
    val semOnly = args.contains("--sem-only")
    val segDigestOnly = args.contains("--segdigest-only")
    val pqOnly = args.contains("--pq-only")
    val prOnly = args.contains("--pr-only")
    val bpeOnly = args.contains("--bpe-only")
    val posArgs = args.toSeq.filterNot(_.startsWith("--"))
    val scales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
    else Seq(15000L, 50000L, 150000L)
    // the cap-regime floor concerns the DEDUP ladders' planted
    // megabucket; the positional-packing/vector ladders never run the
    // capped operators and take any rung size
    if (!semOnly && !segDigestOnly && !pqOnly && !prOnly && !bpeOnly &&
        !args.contains("--delete-only") && !args.contains("--refresh-only") &&
        !args.contains("--lifecycle-only") && !args.contains("--repair-only"))
      require(scales.forall(_ > 10000L),
      "rungs below 10k docs keep the exact-copy megabucket (n/50 <= cap " +
        "200) while larger rungs drop it — incomparable cap regimes; " +
        s"got ${scales.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Semantic-dedup cell-governance ladder (VERDICT r9 #1): HALF the
    // corpus is ONE exactly-identical embedding — the degenerate
    // quantizer input where every mega doc lands in the SAME cell no
    // matter how many centroids the sample holds (identical vectors give
    // identical distances; the argmin tie-break sends all of them to one
    // cid). The r9 shape (fixed k, no cap) pays (n/2)²/2 cosine pairs in
    // that cell — quadratic by construction; the shipped shape (auto
    // k ≈ √n + cellCap 4096) md5-sub-splits the mega cell into
    // ⌈(n/2)/4096⌉ sub-cells and pays ≤ (n/2)·4096/2 — linear. Odd ids
    // are pseudo-random vectors: the healthy-corpus background both
    // shapes handle identically.
    if (semOnly) {
      import graft.operators.Similarity
      def semCorpus(n: Long) = spark.range(n).select(col("id"),
        expr("""transform(sequence(0, 63), j -> CAST(CASE
          WHEN id % 2 = 0 THEN CASE WHEN j = 0 THEN 1.0 ELSE 0.0 END
          ELSE CAST(pmod(xxhash64(concat(cast(id AS string), '_',
            cast(j AS string))), 1000) AS DOUBLE) / 500.0 - 1.0
          END AS FLOAT))""").as("embedding"))
      val semScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(10000L, 20000L, 40000L)
      locally { // untimed JIT/codegen warmup
        val w = semCorpus(5000L).cache(); w.count()
        Similarity.semanticDedup(w, tau = 0.8, nCentroids = 16,
          cellCap = Int.MaxValue).filter(col("kept")).count()
        Similarity.semanticDedup(w, tau = 0.8).filter(col("kept")).count()
        w.unpersist()
      }
      val ladder = semScales.map { n =>
        val docs = semCorpus(n).cache(); docs.count()
        val (tFix, nFix) = timed3 {
          Similarity.semanticDedup(docs, tau = 0.8, nCentroids = 16,
            cellCap = Int.MaxValue).filter(col("kept")).count()
        }
        // the auto path's corpus.count() for k ≈ √n runs INSIDE the
        // timed window — it is part of the shape's real cost
        val (tAuto, nAuto) = timed3 {
          Similarity.semanticDedup(docs, tau = 0.8)
            .filter(col("kept")).count()
        }
        docs.unpersist()
        f"""{"n_docs":$n,"fixed_k_unguarded":{"sec":$tFix%.2f,"kept":$nFix},"auto_k_capped":{"sec":$tAuto%.2f,"kept":$nAuto}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"sem_cell_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // Shared-span copy detection at scale (r11): the planted corpus is
    // adversarial for a stride-1 gram matcher — the exact-copy family
    // (2% of docs, ALL grams df = n/50) and the boilerplate prefixes
    // (df = n/20) must die at the df cap BEFORE the pair join, leaving
    // the near-dup family (pairs sharing their 60-token base, df = 2)
    // as the signal: ~n/100 spans, so rows AND wall must stay ~linear.
    if (args.contains("--spans-only")) {
      val sScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(50000L, 150000L, 450000L)
      locally { // untimed JIT/codegen warmup
        val w = corpus(spark, 20000L).cache(); w.count()
        Dedup.sharedSpans(w, "id", "text", w = 8, maxGramDf = 50,
          minSpan = 12).count()
        w.unpersist()
      }
      val ladder = sScales.map { n =>
        val docs = corpus(spark, n).cache(); docs.count()
        val (t, r) = timed3 {
          Dedup.sharedSpans(docs, "id", "text", w = 8, maxGramDf = 50,
            minSpan = 12).count()
        }
        docs.unpersist()
        f"""{"n_docs":$n,"spans":{"sec":$t%.2f,"rows":$r}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"spans_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // Mixture-execution skew ladder (r11, q129): the adversary is ONE
    // source holding the whole corpus — a naive per-source running-sum
    // window serializes all n rows into a single task, while
    // mixtureTake's two-phase prefix parallelizes phase 1 over
    // (source, score-bucket) and only prefixes the ~100 bucket TOTALS.
    // Same kept set by construction (spec-pinned); only wall differs.
    if (args.contains("--mix-only")) {
      import graft.operators.Sampling
      import org.apache.spark.sql.expressions.{Window => W}
      def mixCorpus(n: Long) = spark.range(n).select(col("id"),
        lit("s").as("source"),
        (pmod(xxhash64(col("id")), lit(100000000L)) - 50000000L).as("score"),
        (pmod(xxhash64(col("id") + 7), lit(150L)) + 50L).as("nt"))
      def planOf(n: Long) = Seq(("s", 62L * n)).toDF("source", "target_tokens")
      val mixScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(1000000L, 4000000L, 16000000L)
      locally { // untimed JIT/codegen warmup
        val w = mixCorpus(100000L).cache(); w.count()
        forcedRows(Sampling.mixtureTake(w, "source", "id", "nt", "score",
          planOf(100000L)), "offset")
        w.unpersist()
      }
      val ladder = mixScales.map { n =>
        val docs = mixCorpus(n).cache(); docs.count()
        val plan = planOf(n)
        val (tTwo, kTwo) = timed3 {
          forcedRows(Sampling.mixtureTake(docs, "source", "id", "nt",
            "score", plan), "offset")
        }
        val (tOne, kOne) = timed3 {
          val w = W.partitionBy("source")
            .orderBy(col("score").desc, col("id"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
          forcedRows(docs.withColumn("__cum", sum(col("nt")).over(w))
            .join(broadcast(plan), "source")
            .filter(col("__cum") <= col("target_tokens")), "__cum")
        }
        docs.unpersist()
        f"""{"n_docs":$n,"two_phase":{"sec":$tTwo%.2f,"kept":$kTwo},"single_window":{"sec":$tOne%.2f,"kept":$kOne}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"mix_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // Connected-components ladder (r11, q131's dependency): real
    // near-dup clusters are tiny-diameter stars (converge in ~2
    // rounds); the adversary is a long CHAIN, where min-label
    // propagation alone needs O(diameter) rounds — pointer jumping must
    // cut that to O(log diameter). The corpus plants 1024-node chains
    // (0.1% of nodes) in a sea of 5-node stars; rounds are bounded by
    // the chains, wall by the per-round joins over all edges.
    if (args.contains("--cc-only")) {
      val ccScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(1000000L, 4000000L, 16000000L)
      def ccEdges(n: Long) = {
        val stars = spark.range(n).filter(pmod(col("id"), lit(5)) =!= 0)
          .select(col("id").as("id_a"),
            (col("id") - pmod(col("id"), lit(5))).as("id_b"))
        val chainNodes = n / 1000 // 0.1% of ids, re-linked into chains
        val chains = spark.range(chainNodes)
          .filter(pmod(col("id") + 1, lit(1024)) =!= 0)
          .select((col("id") + n).as("id_a"), (col("id") + n + 1).as("id_b"))
        stars.unionByName(chains)
      }
      locally { // untimed JIT/codegen warmup
        val w = ccEdges(50000L).cache(); w.count()
        Dedup.connectedComponents(w).count()
        w.unpersist()
      }
      val ladder = ccScales.map { n =>
        val edges = ccEdges(n).cache()
        val nEdges = edges.count()
        val (t, nodes) = timed {
          Dedup.connectedComponents(edges).count()
        }
        val comps = Dedup.connectedComponents(edges)
          .select(countDistinct(col("comp"))).head().getLong(0)
        edges.unpersist()
        f"""{"n_edges":$nEdges,"cc":{"sec":$t%.2f,"nodes":$nodes,"comps":$comps}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"cc_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // k-core peel ladder (r11, q170): planted dense core (degree-32
    // ring lattice on 1% of nodes) + chain periphery (degree ≤ 2).
    // With k = avg-degree+1 the periphery peels in round 1 and the
    // core is the stable fixpoint, so the claim under test is the
    // OPERATOR's scaling, not the graph's: 4 bounded rounds, each one
    // degree aggregate + two survivor semi-joins over a SHRINKING
    // checkpointed edge list — wall should scale ~linearly with |E|
    // (round 1 dominates; rounds 2-4 run on the core only).
    if (args.contains("--kcore-only")) {
      import graft.operators.Influence
      val scales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(1000000L, 4000000L, 16000000L)
      def kcEdges(n: Long) = {
        val m = math.max(n / 100L, 64L) // core nodes
        val core = spark.range(m).select(col("id"))
          .crossJoin(spark.range(16).select(col("id").as("d")))
          .select(col("id").as("u"),
            (pmod(col("id") + col("d") + 1, lit(m)) + 2000000000L).as("v0"))
          .select((col("u") + 2000000000L).as("u"), col("v0").as("v"))
        val chains = spark.range(n)
          .filter(pmod(col("id") + 1, lit(256)) =!= 0)
          .select(col("id").as("u"), (col("id") + 1).as("v"))
        chains.unionByName(core)
      }
      locally { // untimed JIT/codegen warmup
        val w = kcEdges(50000L).cache(); w.count()
        Influence.kCorePeelProfile(w, 2).collect()
        w.unpersist()
      }
      val ladder = scales.map { n =>
        val edges = kcEdges(n).cache()
        val nEdges = edges.count()
        var prof: Array[org.apache.spark.sql.Row] = null
        val (t, _) = timed {
          prof = Influence.kCorePeelProfile(edges, 4)
            .orderBy("round").collect()
          prof.length.toLong
        }
        edges.unpersist()
        val last = prof.last
        val curve = prof.map(r => s"[${r.getLong(2)},${r.getLong(3)}]")
          .mkString("[", ",", "]")
        f"""{"n_edges":$nEdges,"kcore":{"sec":$t%.2f,"k":${last.getLong(1)},"curve":$curve}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"kcore_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // HITS ladder (r12, VERDICT r11 #8, q151 after the Iterate.Loop
    // fix): planted hub/authority bipartite stars — each non-multiple
    // id points at its block's authority (id − id%100) AND a second,
    // pseudo-randomly chosen block head, so hubs have out-degree 2 and
    // authorities in-degree ~198 — plus a directed chain periphery
    // (1 in / 1 out) that holds near-zero score mass. Two full HITS
    // rounds (the q151 shape). Claim under test: with every half-step
    // checkpointed, wall is ~linear in |E| — per round two edge⋈score
    // shuffle-joins + two hash aggregates, never the 2^(2·iters)
    // re-derivation the lazy plan had. Parity check per rung: the max
    // authority is a planted block head at exactly BaseU, and every
    // node comes back (|rows| = |nodes|).
    // Count-of-counts ladder (r12, the q189/q190/q192/q195/q198/q199
    // family): synthetic docs — each doc ONE token type repeated L
    // times (L = hash mod 97, ~50k types) across 8 sources. Claim under
    // test: the entire cost is the map-side tokenize + ONE combined
    // count aggregate; the quantile/nucleus walks run over
    // distinct-length / count-level frames whose size does NOT grow
    // with the corpus, so wall is ~linear in docs. Parity per rung:
    // lengthQuantiles' p50/p90/p99 for source 0 equal the SORT-based
    // exact quantiles computed independently (a one-off global
    // row_number — the very shape the operator avoids).
    if (args.contains("--quantiles-only")) {
      import graft.operators.Profile
      import org.apache.spark.sql.expressions.Window
      val qScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(1000000L, 4000000L, 16000000L)
      def mkDocs(n: Long) = spark.range(n).select(
        pmod(col("id"), lit(8)).cast("string").as("source"),
        expr("""CASE WHEN pmod(xxhash64(id), 97) = 0 THEN ''
          ELSE repeat(concat('t',
            cast(pmod(xxhash64(id + 7), 50000) as string), ' '),
            cast(pmod(xxhash64(id), 97) as int)) END""").as("text"))
      locally { // untimed JIT/codegen warmup
        val w = mkDocs(50000L).cache(); w.count()
        Profile.lengthQuantiles(w).count()
        Profile.nucleusVocab(w).count()
        w.unpersist()
      }
      val ladder = qScales.map { n =>
        val d = mkDocs(n).cache(); d.count()
        var lq: DataFrame = null
        // medians of 3 with a per-rung untimed warmup: the ops are
        // scan-bound over a multi-GB cached string column, so single
        // shots swing 2-5x on JIT/GC weather (measured before this)
        Profile.lengthQuantiles(d).count()
        val (t1, _) = timed3 { lq = Profile.lengthQuantiles(d); lq.count() }
        val (t2, _) = timed3 { Profile.nucleusVocab(d).count() }
        val got = lq.filter(col("source") === "0").head()
        val (p50, p90, p99) = (got.getLong(2), got.getLong(3), got.getLong(4))
        // independent sort-based reference for source 0
        val lens = d.filter(col("source") === "0").select(coalesce(
          size(graft.functions.TextFunctions.tokens(col("text"))), lit(0))
          .cast("long").as("len"))
        val cnt = lens.count()
        val targets = Seq(50, 90, 99).map(p => (cnt * p + 99) / 100)
        val ref = lens
          .withColumn("i", row_number().over(Window.orderBy("len")))
          .filter(col("i").isin(targets: _*))
          .orderBy("i").collect().map(_.getLong(0))
        val parity = ref.sameElements(Array(p50, p90, p99))
        d.unpersist()
        f"""{"n_docs":$n,"quantiles_sec":$t1%.2f,"nucleus_sec":$t2%.2f,"sort_parity":$parity}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"quantiles_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    if (args.contains("--hits-only")) {
      import graft.operators.Influence
      // scales are NODE counts; edges ≈ 2.23·n (two hub out-edges per
      // non-head node + the chain periphery) → rungs land at ~1M/4M/16M
      // edges, the k-core ladder's rungs
      val scales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(450000L, 1800000L, 7200000L)
      def hitsEdges(n: Long) = {
        val hubs = spark.range(n).filter(pmod(col("id"), lit(100)) =!= 0)
        val local = hubs.select(col("id").as("src"),
          (col("id") - pmod(col("id"), lit(100))).as("dst"))
        val remote = hubs.select(col("id").as("src"),
          (pmod(xxhash64(col("id")), lit(n / 100)) * 100).as("dst"))
        val chains = spark.range(n / 4)
          .filter(pmod(col("id") + 1, lit(512)) =!= 0)
          .select((col("id") + 3000000000L).as("src"),
            (col("id") + 3000000001L).as("dst"))
        local.unionByName(remote).unionByName(chains)
      }
      locally { // untimed JIT/codegen warmup
        val w = hitsEdges(50000L).cache(); w.count()
        Influence.hitsInteger(w, 2).count()
        w.unpersist()
      }
      val ladder = scales.map { n =>
        val edges = hitsEdges(n).cache()
        val nEdges = edges.count()
        var scores: DataFrame = null
        val (t, rows) = timed {
          scores = Influence.hitsInteger(edges, 2)
          scores.count()
        }
        val top = scores.orderBy(col("auth_u").desc, col("node")).head()
        edges.unpersist()
        val topIsHead = top.getLong(0) % 100 == 0 && top.getLong(1) == 1000000L
        f"""{"n_edges":$nEdges,"hits":{"sec":$t%.2f,"nodes":$rows,"top_planted":$topIsHead}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"hits_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // Auto-k past the literal ceiling (r11, VERDICT r10 #6): at
    // n ≥ 1.05M pseudo-random vectors auto-k = ⌈√n⌉ crosses 1024, so
    // the AUTO path now dispatches to the broadcast-join argmin instead
    // of clamping (the pre-r11 behavior, reproduced here as the
    // comparison shape via nCentroids = 1024). Claim under test: the
    // join path's one map-side-collapsed exchange costs about the same
    // as the literal argmin at its ceiling — i.e. un-clamping keeps
    // √n-cell governance with no cliff at the dispatch boundary.
    // dim 16 keeps the rung's cosine volume (Σ|cell|²/2 ≈ n^1.5/2
    // pairs) inside a local-mode budget; the dispatch cost being
    // adjudicated is dimension-independent.
    // SRP binary-code ladder (r12, q181): pseudo-random dim-64 vectors
    // with ONE planted exact copy of each query (id + n). Claim under
    // test: the whole search — 62 literal-hyperplane dots per row for
    // the code, XOR+POPCNT Hamming scan against the broadcast query
    // codes, WindowGroupLimit shortlist, exact rerank — is map-parallel
    // and ~linear in corpus size (no join, no fit; the only exchange
    // carries ≤ k·mult rows per query per partition). Parity per rung:
    // each query's planted copy lands at Hamming 0, rank 1.
    if (args.contains("--srp-only")) {
      import graft.operators.Similarity
      // numeric-only generator (no string concat inside the interpreted
      // HOF lambda), and localCheckpoint instead of cache: the first cut
      // cached the 16M-vector frame, the Hamming-sort memory pressure
      // EVICTED the columnar blocks, and every re-read recomputed the
      // string-hash generator — ~375 µs/row where the search itself is
      // ~4 µs. localCheckpoint blocks spill to DISK on eviction, never
      // recompute.
      def srpVecs(n: Long) = {
        val base = spark.range(n).select(col("id"),
          expr("""transform(sequence(0, 63), j -> CAST(
            CAST(pmod(xxhash64(id * 64 + j), 2001) AS DOUBLE) / 1000.0
            - 1.0 AS FLOAT))""").as("embedding"))
        val copies = spark.range(8).select((col("id") + n).as("id"),
          expr("""transform(sequence(0, 63), j -> CAST(
            CAST(pmod(xxhash64(id * 64 + j), 2001) AS DOUBLE) / 1000.0
            - 1.0 AS FLOAT))""").as("embedding"))
        base.unionByName(copies)
      }
      val scales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(1000000L, 4000000L, 16000000L)
      locally { // untimed JIT/codegen warmup
        val w = srpVecs(30000L).localCheckpoint(true)
        Similarity.srpHammingTopK(w.filter(col("id") < 8), w,
          k = 5, mult = 16, nPlanes = 62, dim = 64).count()
        w.unpersist()
      }
      val ladder = scales.map { n =>
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        val vecs = srpVecs(n).localCheckpoint(true)
        val queries = vecs.filter(col("id") < 8)
        var top: Array[org.apache.spark.sql.Row] = null
        val (t, rows) = timed {
          val r = Similarity.srpHammingTopK(queries, vecs,
            k = 5, mult = 16, nPlanes = 62, dim = 64)
          top = r.filter(col("rank") === 1).collect()
          top.length.toLong
        }
        // release the checkpoint's RDD blocks (df.unpersist() does not
        // reach localCheckpoint storage — the r11 bench-harness lesson)
        (spark.sparkContext.getPersistentRDDs.keySet.toSet -- before)
          .foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
            .foreach(_.unpersist(blocking = false)))
        val planted = top.forall(r =>
          r.getLong(1) == r.getLong(0) + n && r.getLong(2) == 0L)
        f"""{"n_vecs":${n + 8},"srp":{"sec":$t%.2f,"queries":$rows,"planted_rank1":$planted}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"srp_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    if (args.contains("--semk-only")) {
      import graft.operators.Similarity
      def vecs(n: Long) = spark.range(n).select(col("id"),
        expr("""transform(sequence(0, 15), j -> CAST(
          CAST(pmod(xxhash64(concat(cast(id AS string), ':',
            cast(j AS string))), 2001) AS DOUBLE) / 1000.0 - 1.0
          AS FLOAT))""").as("embedding"))
      val kScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(1200000L)
      locally { // untimed JIT/codegen warmup on a small corpus
        val w = vecs(30000L).cache(); w.count()
        Similarity.semanticDedup(w, tau = 0.99).filter(col("kept")).count()
        Similarity.semanticDedup(w, tau = 0.99,
          centroids = Some(Similarity.sampleCentroidsPortable(w, 1030)))
          .filter(col("kept")).count()
        w.unpersist()
      }
      val ladder = kScales.map { n =>
        val docs = vecs(n).cache(); docs.count()
        val autoK = Similarity.autoCentroids(n)
        val (tAuto, nAuto) = timed3 {
          Similarity.semanticDedup(docs, tau = 0.99)
            .filter(col("kept")).count()
        }
        val (tClamp, nClamp) = timed3 {
          Similarity.semanticDedup(docs, tau = 0.99, nCentroids = 1024)
            .filter(col("kept")).count()
        }
        docs.unpersist()
        f"""{"n_vecs":$n,"auto_k":$autoK,"auto_join_path":{"sec":$tAuto%.2f,"kept":$nAuto},"clamped_1024_literal":{"sec":$tClamp%.2f,"kept":$nClamp}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"semk_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // Keep-first DECISION-stage crossover hunt (VERDICT r9 #5): the full
    // hot-segment ladder stopped at 16M docs with the window still ~25%
    // ahead; the two shapes differ only in the first-posting decision,
    // so this ladder feeds synthetic postings straight in (no text
    // generation, no reassembly) and rungs reach 128M docs. Even ids
    // contribute the ONE hot digest plus a unique one, odd ids one
    // unique digest → 1.5n postings, hot df = n/2 (64M postings of one
    // digest through one window task at the top rung).
    if (segDigestOnly) {
      def posts(n: Long) = spark.range(n).select(col("id").as("__id"),
        posexplode(when(pmod(col("id"), lit(2)) === 0,
            array(lit("HOTSEGMENTDIGESTHOTSEGMENTDIGEST"),
              concat(lit("u"), col("id").cast("string"))))
          .otherwise(array(concat(lit("u"), col("id").cast("string")))))
          .as(Seq("__idx", "__h")))
      val dScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(16000000L, 64000000L, 128000000L)
      locally { // untimed JIT/codegen warmup
        val w = posts(1000000L).cache(); w.count()
        Dedup.firstPostingGrouped(w).count()
        Dedup.firstPostingWindowed(w).count()
        w.unpersist()
      }
      val ladder = dScales.map { n =>
        val p = posts(n).cache(); p.count()
        val (tG, nG) = timed3 { Dedup.firstPostingGrouped(p).count() }
        val (tW, nW) = timed3 { Dedup.firstPostingWindowed(p).count() }
        p.unpersist()
        require(nG == nW, s"decision-shape mismatch at $n: $nG vs $nW")
        f"""{"n_docs":$n,"grouped":{"sec":$tG%.2f,"rows":$nG},"windowed":{"sec":$tW%.2f,"rows":$nW}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"seg_digest_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // PQ-vs-exact search ladder: pseudo-random 64-dim vectors, 3 fixed
    // queries; measures (a) one-off encode cost, (b) ADC top-5 over the
    // cached CODE table (8 B/row), (c) exact ‖x‖²−2·q·x top-5 over the
    // cached VECTORS (256 B/row) — the claim is the per-query scan, not
    // the one-off encode: ADC reads 1/32 of the bytes and does 8 integer
    // adds/row vs 64 FMAs/row, so the gap widens with n while recall is
    // reported for honesty (random vectors are PQ's worst case — real
    // corpora cluster, which is what codebooks exploit).
    if (pqOnly) {
      import graft.operators.ProductQuantizer
      import graft.plans.VectorExpressions
      import org.apache.spark.sql.expressions.Window
      def vecs(n: Long) = spark.range(n).select(col("id"),
        expr("""transform(sequence(0, 63), j -> CAST(
          CAST(pmod(xxhash64(concat(cast(id AS string), ':',
            cast(j AS string))), 2001) AS DOUBLE) / 1000.0 - 1.0
          AS FLOAT))""").as("embedding"))
      def exactTopK(v: DataFrame, queries: Seq[(Long, Array[Float])], k: Int) = {
        val scored = queries.map { case (qid, q) =>
          v.select(lit(qid).as("qid"), col("id").as("nid"),
            (VectorExpressions.dotNative(col("embedding"), col("embedding"))
              - lit(2.0) * VectorExpressions.dotNative(col("embedding"), lit(q)))
              .as("d"))
            .where(col("nid") =!= qid)
        }.reduce(_ unionByName _)
        val w = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
        scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      }
      val pScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(200000L, 800000L, 3200000L)
      locally { // untimed JIT/codegen warmup
        val w = vecs(20000L).cache(); w.count()
        val m = ProductQuantizer.fitPortable(w, 64, 8, 16)
        val qs = w.filter(col("id") < 3).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
        val c = ProductQuantizer.encode(w, m).cache(); c.count()
        ProductQuantizer.adcTopK(c, qs, m, 5).count()
        exactTopK(w, qs, 5).count()
        c.unpersist(); w.unpersist()
      }
      val ladder = pScales.map { n =>
        val v = vecs(n).cache(); v.count()
        val model = ProductQuantizer.fitPortable(v, 64, 8, 16)
        val queries = v.filter(col("id") < 3).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
        val (tEnc, _) = timed3 { ProductQuantizer.encode(v, model).count() }
        val codes = ProductQuantizer.encode(v, model).cache(); codes.count()
        val (tAdc, _) = timed3 {
          ProductQuantizer.adcTopK(codes, queries, model, 5).count() }
        val (tExact, _) = timed3 { exactTopK(v, queries, 5).count() }
        val adcIds = ProductQuantizer.adcTopK(codes, queries, model, 5)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val exactIds = exactTopK(v, queries, 5)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (adcIds intersect exactIds).size.toDouble /
          math.max(exactIds.size, 1)
        // r11: the FAISS shortlist-rerank on the same corpus — timed
        // (the rerank adds one broadcast join over 20 ids; the claim is
        // recall recovered at ~ADC cost) and scored like ADC
        val (tRer, _) = timed3 {
          ProductQuantizer.adcTopKRerank(codes, v, queries, model, 5,
            shortlistMult = 4).count() }
        val rerIds = ProductQuantizer.adcTopKRerank(codes, v, queries, model,
            5, shortlistMult = 4)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recallRer = (rerIds intersect exactIds).size.toDouble /
          math.max(exactIds.size, 1)
        codes.unpersist(); v.unpersist()
        // recall on PQ's FAVORABLE regime, sized to EXPOSE the tie-break
        // blind spot (r11): n/10 well-separated clusters of ~10 vectors
        // (center + 5% noise). The exact top-5 are 5 of the query's 9
        // cluster-mates; PQ collapses all 9 to ONE code tuple, so plain
        // ADC must break the tie by id and picks wrong mates (~0.5
        // recall), while the 4k-shortlist holds the whole tie group and
        // the exact rerank reorders it perfectly — the measured claim
        // behind the q118 rerank stage. (With cluster size ≈ k, as this
        // rung used through r10, the 5th neighbor sits in the uniform
        // background and NO shortlist can recover it — recall was a
        // corpus artifact, not a tie-break one.) Timing claims stay on
        // the uniform corpus above.
        val nClusters = math.max(n / 10, 1L)
        val cv = spark.range(n).select(col("id"),
          expr(s"""transform(sequence(0, 63), j -> CAST(
            (CAST(pmod(xxhash64(concat('c', cast(pmod(id, $nClusters) AS string),
               ':', cast(j AS string))), 2001) AS DOUBLE) / 1000.0 - 1.0)
            + (CAST(pmod(xxhash64(concat('n', cast(id AS string), ':',
               cast(j AS string))), 2001) AS DOUBLE) / 1000.0 - 1.0) * 0.05
            AS FLOAT))""").as("embedding")).cache()
        cv.count()
        val cModel = ProductQuantizer.fitPortable(cv, 64, 8, 16)
        val cQueries = cv.filter(col("id") < 3).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
        val cCodes = ProductQuantizer.encode(cv, cModel).cache(); cCodes.count()
        val cAdc = ProductQuantizer.adcTopK(cCodes, cQueries, cModel, 5)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val cExact = exactTopK(cv, cQueries, 5)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recallC = (cAdc intersect cExact).size.toDouble /
          math.max(cExact.size, 1)
        val cRer = ProductQuantizer.adcTopKRerank(cCodes, cv, cQueries,
            cModel, 5, shortlistMult = 4)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recallCRer = (cRer intersect cExact).size.toDouble /
          math.max(cExact.size, 1)
        cCodes.unpersist(); cv.unpersist()
        f"""{"n_vecs":$n,"encode_sec":$tEnc%.2f,"adc_top5_sec":$tAdc%.2f,"adc_rerank_top5_sec":$tRer%.2f,"exact_top5_sec":$tExact%.2f,"recall_at_5_uniform":$recall%.2f,"recall_at_5_uniform_rerank":$recallRer%.2f,"recall_at_5_clustered":$recallC%.2f,"recall_at_5_clustered_rerank":$recallCRer%.2f}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"pq_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // Index-compaction rung (r11, VERDICT r10 #4): a long-lived ingest
    // writes one postings partition per micro-batch; 100 batches later
    // the BM25 read side is file-listing/footer-bound. Measure search
    // wall + data-file count on the 100-partition store, compact (fold
    // all closed batches into the term-partitioned batch=-1 store),
    // re-measure: results identical (spec-pinned), files collapse
    // ~100× and the read wall drops to the single-store cost.
    // Incremental-refresh ladder (r13, q206): prior shards from an
    // n-doc append-ordered stream; the refresh changes the LAST f% and
    // adds f/2% new docs. Full rebuild repacks (and rewrites) the whole
    // stream; incrementalRepack pays a counts-only prefix sum over the
    // corpus plus token materialization and writes for the suffix only
    // — the claim is wall ∝ delta at fixed n, and incremental ≪ full at
    // every n. Outputs both walls plus the kept/rewritten shard split.
    if (args.contains("--refresh-only")) {
      import graft.operators.Packing
      val (cap, cps) = (2048L, 8L)
      val groupOf = substring(col("okey"), 1, 7)
      def stream(n: Long, changedFrom: Long, salt: String) =
        corpus(spark, n).select(
          lpad(col("id").cast("string"), 10, "0").as("okey"),
          expr(s"""CASE WHEN id >= $changedFrom
                   THEN concat(text, ' $salt', cast(id AS string))
                   ELSE text END""").as("text"))
          .select(col("okey"),
            graft.functions.TextFunctions.tokens(col("text")).as("tk"),
            md5(col("text")).as("fp"))
          .withColumn("n_tokens", size(col("tk")).cast("long"))
      val rScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(100000L, 400000L)
      val ladder = rScales.flatMap { n =>
        Seq(100L, 400L, 1600L).map { fBp => // delta in bp of n
          val delta = n * fBp / 10000L
          val dir = java.nio.file.Files
            .createTempDirectory(s"refresh_rung_$n").toString + "/shards"
          val aIn = stream(n, n, "x").cache(); aIn.count()
          val chunksA = Packing.packChunks(aIn, "okey", "tk", cap, groupOf)
          val manifestA = Packing.shardManifest(chunksA, cps)
            .localCheckpoint(true)
          Packing.writeShards(chunksA, dir, cps)
          // new stream: last `delta` docs changed + delta/2 added
          val bIn = stream(n + delta / 2, n - delta, "y").cache(); bIn.count()
          var incResult: org.apache.spark.sql.DataFrame = null
          val (tInc, _) = timed {
            // incrementalRepack materializes eagerly (internal
            // localCheckpoints + the shard writes) — keep the frame so
            // the status histogram reads it without a second repack
            incResult = Packing.incrementalRepack(
              aIn.select("okey", "n_tokens", "fp"), bIn,
              "okey", "tk", "fp", "n_tokens", cap, groupOf, cps, dir,
              manifestA).localCheckpoint(true)
            incResult.count()
          }
          val statuses = incResult
            .groupBy("status").count().collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val fullDir = dir + "_full"
          val (tFull, _) = timed {
            val chunksB = Packing.packChunks(bIn, "okey", "tk", cap, groupOf)
            Packing.writeShards(chunksB, fullDir, cps)
            Packing.shardManifest(chunksB, cps).count()
          }
          aIn.unpersist(); bIn.unpersist()
          f"""{"n":$n,"delta_bp":$fBp,"inc_sec":$tInc%.2f,""" +
            f""""full_sec":$tFull%.2f,"kept":${statuses.getOrElse("kept", 0L)},""" +
            f""""rewritten":${statuses.getOrElse("rewritten", 0L)},""" +
            f""""added":${statuses.getOrElse("added", 0L)}}"""
        }
      }.mkString("[", ",", "]")
      println(s"""{"metric":"refresh_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // Deletion-cost ladder (r14, VERDICT r13 #5): the two physically-
    // rewriting deletion paths vs their full rebuilds.
    //
    //  A. IVF CELL STORE — deletion is partition-pruned to the cells
    //     that contain a deleted id, so rewrite volume ≈ affected_cells
    //     × cell size. Cells scale with the corpus (n/400, capped at
    //     the 1024 literal-assign limit) so cell SIZE is ~constant:
    //     the fixed-absolute-count rung (512 ids) should be ~flat in n
    //     while the fraction rungs scale with n × fraction.
    //  B. SHARD REPACK — concat-and-chunk deletion is POSITIONAL: cost
    //     is the stream suffix from the FIRST deleted doc, not the
    //     deletion count. The honest grid fixes the count (256 docs)
    //     and varies the placement depth (10/50/90% into the stream,
    //     plus uniform-random ≈ worst case): wall + shards rewritten
    //     must track the suffix (affected partitions), and uniform ≈
    //     the head placement ≈ the full repack.
    if (args.contains("--delete-only")) {
      import graft.operators.{Packing, Similarity}
      import graft.functions.TextFunctions
      val dScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(100000L, 400000L)
      def vecs(n: Long) = spark.range(n).select(col("id"),
        expr("""transform(sequence(0, 63), j -> CAST(
          CAST(pmod(xxhash64(concat(cast(id AS string), ':',
            cast(j AS string))), 2001) AS DOUBLE) / 1000.0 - 1.0
          AS FLOAT))""").as("embedding"))
      def randomIds(v: DataFrame, nDel: Long) = v.select("id")
        .orderBy(md5(col("id").cast("string")), col("id")).limit(nDel.toInt)
        .localCheckpoint(true)
      // the store build uses the broadcast-join argmin (the engine's
      // own dispatch for cell counts past the literal-assign limit —
      // hundreds of plan-time literal centroids fall out of codegen
      // and crawl); deleteFromCellStore itself never re-assigns
      def writeStore(v: DataFrame, cents: Seq[(Long, Array[Float])],
          path: String): Unit =
        Similarity.assignCellsJoin(v, cents)
          .write.mode("overwrite").partitionBy("cell").parquet(path)
      val cellLadder = dScales.flatMap { n =>
        val v = vecs(n).localCheckpoint(true)
        val nCents = math.min(1024L, math.max(16L, n / 400L)).toInt
        val cents = Similarity.sampleCentroidsPortable(v, nCents)
        (Seq(10L, 100L, 1000L).map(bp => (s"frac_bp_$bp", n * bp / 10000L)) :+
          ("fixed_abs_512" -> 512L)).map { case (kind, nDel) =>
          val dir = java.nio.file.Files
            .createTempDirectory(s"delcell_$n").toString + "/store"
          writeStore(v, cents, dir)
          val del = randomIds(v, nDel)
          val (tDel, cellsTouched) = timed {
            Similarity.deleteFromCellStore(spark, dir, del) }
          val dir2 = dir + "_full"
          val (tFull, _) = timed {
            writeStore(
              v.join(del.withColumnRenamed("id", "__d"),
                col("id") === col("__d"), "left_anti"), cents, dir2)
            1L
          }
          f"""{"n":$n,"kind":"$kind","n_del":$nDel,"cells_touched":$cellsTouched,""" +
            f""""n_cells":$nCents,"delete_sec":$tDel%.2f,"rebuild_sec":$tFull%.2f}"""
        }
      }.mkString("[", ",", "]")
      val (cap, cps) = (2048L, 8L)
      val groupOf = substring(col("okey"), 1, 7)
      val shardLadder = dScales.flatMap { n =>
        val docs = corpus(spark, n).select(col("id"),
            lpad(col("id").cast("string"), 10, "0").as("okey"),
            TextFunctions.tokens(col("text")).as("tk"))
          .localCheckpoint(true)
        Seq("depth_90" -> (n * 9L / 10L), "depth_50" -> (n / 2L),
          "depth_10" -> (n / 10L), "uniform" -> -1L).map {
          case (kind, firstId) =>
            val dir = java.nio.file.Files
              .createTempDirectory(s"delshard_$n").toString + "/shards"
            val chunks = Packing.packChunks(docs, "okey", "tk", cap, groupOf)
            val manifest = Packing.shardManifest(chunks, cps)
              .localCheckpoint(true)
            Packing.writeShards(chunks, dir, cps)
            val totalShards = manifest.count()
            val del =
              if (firstId >= 0)
                docs.select("id")
                  .filter(col("id") >= firstId && col("id") < firstId + 256L)
                  .localCheckpoint(true)
              else randomIds(docs.select(col("id")), 256L)
            var res: DataFrame = null
            val (tDel, _) = timed {
              res = Packing.deleteAndRepack(docs, "id", "okey", "tk", del,
                cap, groupOf, cps, dir, manifest).localCheckpoint(true)
              res.count()
            }
            val touched = res.filter(col("status") =!= "kept").count()
            val dir2 = dir + "_full"
            val (tFull, _) = timed {
              val survivors = docs.join(del.withColumnRenamed("id", "__d"),
                col("id") === col("__d"), "left_anti")
              val ch = Packing.packChunks(survivors, "okey", "tk", cap, groupOf)
              Packing.writeShards(ch, dir2, cps)
              Packing.shardManifest(ch, cps).count()
            }
            f"""{"n":$n,"kind":"$kind","n_del":256,"shards_touched":$touched,""" +
              f""""n_shards":$totalShards,"delete_sec":$tDel%.2f,"rebuild_sec":$tFull%.2f}"""
        }
      }.mkString("[", ",", "]")
      println(s"""{"metric":"delete_rehearsal","cells":$cellLadder,"shards":$shardLadder}""")
      spark.stop(); return
    }

    // End-to-end lifecycle-cycle ladder (r14): the r13 refresh ladder
    // priced the repack PRIMITIVE; this one prices the whole
    // generation-versioned cycle — docArtifacts on the delta, the
    // global stages, the commit protocol (uncommitted gen dirs, dirty
    // marker + signature aggregate, atomic marker, prune) — against
    // the full prior build of the same target. Claim: refresh wall ∝
    // delta at fixed n AND ~flat in n at fixed absolute delta (the
    // corpus-global stages are counts-only aggregates), with the
    // protocol overhead lost in the noise.
    if (args.contains("--lifecycle-only")) {
      import graft.queries.LifecycleOps
      val lScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(100000L, 400000L)
      val ladder = lScales.flatMap { n =>
        val docs = corpus(spark, n).select(col("id").as("doc_id"),
            col("text"), lit("en").as("lang"))
          .localCheckpoint(true)
        // full-rebuild comparator: the prior build of the TARGET corpus
        val fullDir = java.nio.file.Files
          .createTempDirectory(s"lc_full_$n").toString
        val (tFull, _) = timed {
          LifecycleOps.priorBuild(spark, fullDir, docs); 1L }
        Seq("frac_bp_100" -> (n / 100L), "fixed_abs_1000" -> 1000L).map {
          case (kind, delta) =>
            val base = java.nio.file.Files
              .createTempDirectory(s"lc_cycle_$n").toString
            val a = docs.filter(col("doc_id") < n - delta)
            LifecycleOps.priorBuild(spark, base, a)
            var nDelta = -1L
            val (tRefresh, _) = timed {
              val r = LifecycleOps.refreshTo(spark, base, docs)
                .localCheckpoint(true)
              nDelta = r.select("n_delta").collect()(0).getLong(0)
              r.count()
            }
            // a tail deletion on the refreshed state: the cheap
            // positional case plus the full protocol
            val del = docs.filter(col("doc_id") >= n - 256L)
              .select("doc_id")
            var kept = -1L
            val (tDelete, _) = timed {
              val r = LifecycleOps.deleteDocs(spark, base, del)
                .localCheckpoint(true)
              kept = r.filter(col("status") === "kept").count()
              r.count()
            }
            f"""{"n":$n,"kind":"$kind","n_delta":$nDelta,""" +
              f""""refresh_sec":$tRefresh%.2f,"rebuild_sec":$tFull%.2f,""" +
              f""""delete_tail256_sec":$tDelete%.2f,"shards_kept":$kept}"""
        }
      }.mkString("[", ",", "]")
      println(s"""{"metric":"lifecycle_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // Fsck-repair ladder (r15): prices the repair's two components
    // separately — the unavoidable AUDIT FLOOR (diskManifest reads and
    // fingerprints every shard byte; the pack rederives from the
    // artifact store with no tokenization) and the REWRITE, which must
    // scale with the corrupted shards, not the corpus. Three rungs per
    // scale on one state root: repair of a pristine root (floor), after
    // ONE tail shard destroyed, after ~10% of shards destroyed.
    if (args.contains("--repair-only")) {
      import graft.queries.LifecycleOps
      val rScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(100000L, 400000L)
      def repairGreen(base: String): Double = {
        val (t, _) = timed {
          val r = LifecycleOps.fsckRepair(spark, base)
          require(r.filter(!col("check_name").startsWith("repair_") &&
            col("violations") =!= 0L).count() == 0L,
            s"repair left live violations on $base")
          1L
        }
        t
      }
      val ladder = rScales.map { n =>
        val docs = corpus(spark, n).select(col("id").as("doc_id"),
            col("text"), lit("en").as("lang"))
          .localCheckpoint(true)
        val base = java.nio.file.Files
          .createTempDirectory(s"repair_$n").toString
        LifecycleOps.priorBuild(spark, base, docs)
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def shardIds(): Seq[Long] =
          fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/shards"))
            .toSeq.map(_.getPath.getName)
            .filter(_.startsWith("shard_id="))
            .map(_.stripPrefix("shard_id=").toLong).sorted
        val nShards = shardIds().size
        val tClean = repairGreen(base)
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$base/shards/shard_id=${shardIds().last}"), true)
        val tOne = repairGreen(base)
        val tenPct = shardIds().grouped(10).map(_.head).toSeq
        tenPct.foreach(sid => fs.delete(
          new org.apache.hadoop.fs.Path(s"$base/shards/shard_id=$sid"),
          true))
        val tTen = repairGreen(base)
        f"""{"n":$n,"n_shards":$nShards,"clean_sec":$tClean%.2f,""" +
          f""""one_shard_sec":$tOne%.2f,""" +
          f""""tenpct_shards_sec":$tTen%.2f,"tenpct_count":${tenPct.size}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"repair_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    if (args.contains("--compact-only")) {
      import graft.streaming.{IndexMaintenance, RetrievalStream}
      val dir = java.nio.file.Files.createTempDirectory("compact_rung")
        .toString + "/idx"
      val nBatches = 100
      val docsPerBatch = 500L
      (0 until nBatches).foreach { b =>
        val docs = spark.range(docsPerBatch).select(
          (col("id") + b * docsPerBatch).as("doc_id"),
          expr(s"""concat_ws(' ', transform(sequence(0, 19), j ->
            concat('w', pmod(xxhash64(concat(cast(id AS string), '_$b', '_',
              cast(j AS string))), 5000))))""").as("text"))
        RetrievalStream.indexBatch(docs, b.toLong, "doc_id", "text", dir)
      }
      val q = spark.range(3).select(col("id").as("qid"),
        concat(lit("w"), pmod(xxhash64(col("id")), lit(5000))).as("term"))
      val filesBefore = IndexMaintenance.dataFileCount(spark, s"$dir/postings")
      val (tBefore, rBefore) = timed3 {
        RetrievalStream.bm25OverIndex(spark, dir, q, 10).count() }
      val folded = RetrievalStream.compact(spark, dir, nBatches.toLong)
      val filesAfter = IndexMaintenance.dataFileCount(spark, s"$dir/postings")
      val (tAfter, rAfter) = timed3 {
        RetrievalStream.bm25OverIndex(spark, dir, q, 10).count() }
      require(rBefore == rAfter,
        s"compaction changed search cardinality: $rBefore vs $rAfter")
      println(f"""{"metric":"compact_rehearsal","n_batches":$nBatches,"docs_per_batch":$docsPerBatch,"folded":$folded,"files_before":$filesBefore,"files_after":$filesAfter,"search_sec_before":$tBefore%.2f,"search_sec_after":$tAfter%.2f,"rows":$rBefore}""")
      spark.stop(); return
    }

    // PageRank hub-skew ladder (r10): the social-graph reality is one
    // celebrity node receiving (and emitting) a constant fraction of all
    // edges. The inbound side is SAFE by construction — contributions
    // partial-aggregate map-side, so the hub's sum crosses the exchange
    // as one row per input partition. The rank⋈edges join keys on SRC,
    // where the same skew WOULD serialize one task — but the rank frame
    // is one row per node and broadcasts while it fits (measured: zero
    // uniform-vs-hub gap at every rung, 0.3 s flat to 16M edges,
    // because a broadcast join scans the hub's edges in place across
    // all cached partitions); past broadcastable node counts (~10⁸+)
    // the join degrades to shuffle and AQE's skew split is the guard.
    // Medians are over 3 runs of the same plan. Since r11,
    // pageRankInteger RELEASES its caches when the result materializes
    // (the leak fix), so every run honestly re-pays the edge build +
    // cache fill — the rung prices build+iterations end-to-end, same
    // basis as the q108 bench line; the BENCH phase split is where
    // build and steady-state are separated.
    if (prOnly) {
      import graft.operators.Influence
      // half of all edges point AT node 0 (hub inbound) and originate
      // FROM node 1 (hub outbound — the join-side skew); the rest are
      // pseudo-random among n/100 nodes
      def graph(n: Long, skewed: Boolean) = {
        val nodes = math.max(n / 100, 10L)
        if (skewed) spark.range(n).select(
          when(pmod(col("id"), lit(2)) === 0, lit(1L))
            .otherwise(pmod(xxhash64(col("id"), lit("s")), lit(nodes))).as("src"),
          when(pmod(col("id"), lit(2)) === 0, lit(0L))
            .otherwise(pmod(xxhash64(col("id"), lit("d")), lit(nodes))).as("dst"))
        else spark.range(n).select(
          pmod(xxhash64(col("id"), lit("s")), lit(nodes)).as("src"),
          pmod(xxhash64(col("id"), lit("d")), lit(nodes)).as("dst"))
      }
      val prScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(1000000L, 4000000L, 16000000L)
      locally { // untimed JIT/codegen warmup
        Influence.pageRankInteger(graph(200000L, skewed = true), 3).count()
      }
      val ladder = prScales.map { n =>
        val (tU, nU) = timed3 {
          Influence.pageRankInteger(graph(n, skewed = false), 3).count() }
        val (tS, nS) = timed3 {
          Influence.pageRankInteger(graph(n, skewed = true), 3).count() }
        f"""{"n_edges":$n,"uniform":{"sec":$tU%.2f,"nodes":$nU},"hub_skew":{"sec":$tS%.2f,"nodes":$nS}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"pagerank_rehearsal","scales":$ladder}""")
      spark.stop(); return
    }

    // BPE training ladder (r10): two axes. (a) corpus axis — rows at
    // 250k/1M/4M (4 words each, pool = n/4 distinct), 3 merges:
    // per-round cost is one pair-count agg over the persisted words
    // frame, expected ~linear. (b) merge-depth axis at fixed 250k rows,
    // lazy (checkpointEvery = 0) vs checkpointed (default 4): each round
    // references the previous frame twice, so the lazy plan holds
    // 2^rounds copies of the base chain — the first depth-8 lazy run
    // had to be killed after 15+ minutes, which is the measurement that
    // makes periodic localCheckpoint the default, not advice.
    if (bpeOnly) {
      import graft.operators.Tokenizer
      // 4 words per row, each drawn from a pool of n/4 distinct ~8-char
      // hex words (avg freq ≈ 16) — duplication exercises the
      // freq-weighted pair counts, pool size scales the distinct-word
      // frame with the rung
      def words(n: Long) = {
        val pool = math.max(n / 4, 100L)
        spark.range(n).select(
          expr(s"""concat_ws(' ', transform(sequence(1, 4), w ->
            substring(lower(hex(xxhash64(cast(pmod(xxhash64(id * 7 + w),
              $pool) AS string)))), 1, 8)))""").as("text"))
      }
      val bScales = if (posArgs.nonEmpty) posArgs.map(_.toLong)
      else Seq(250000L, 1000000L, 4000000L)
      locally { Tokenizer.bpeMergeTable(words(50000L), "text", 2).count() }
      val corpusLadder = bScales.map { n =>
        val (t, r) = timed3 { Tokenizer.bpeMergeTable(words(n), "text", 3).count() }
        f"""{"n_rows":$n,"merges3":{"sec":$t%.2f,"rows":$r}}"""
      }.mkString("[", ",", "]")
      val depthLadder = Seq(2, 4, 6).map { m =>
        val (tL, rL) = timed {
          Tokenizer.bpeMergeTable(words(250000L), "text", m,
            checkpointEvery = 0).count() }
        val (tC, rC) = timed {
          Tokenizer.bpeMergeTable(words(250000L), "text", m).count() }
        require(rL == rC, s"depth-shape mismatch at $m merges: $rL vs $rC")
        f"""{"merges":$m,"lazy":{"sec":$tL%.2f},"ckpt4":{"sec":$tC%.2f},"rows":$rC}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"bpe_rehearsal","corpus":$corpusLadder,"depth":$depthLadder}""")
      spark.stop(); return
    }

    // BPE recount-vs-delta adjudication (r11, VERDICT r10 #3): fixed 1M-
    // row corpus (250k distinct words), growing merge depth. The recount
    // path pays one full-vocabulary pair aggregate per round; the delta
    // path aggregates only words containing the merged pair — expected:
    // recount wall ~linear in merges with a full-size slope, delta's
    // per-round cost FALLING as merges descend the frequency curve (at
    // the cost of ~4 fixed-overhead jobs per round, so tiny corpora
    // favor recount — this rung is the crossover evidence).
    if (args.contains("--bpedelta-only")) {
      import graft.operators.Tokenizer
      def words(n: Long) = {
        val pool = math.max(n / 4, 100L)
        spark.range(n).select(
          expr(s"""concat_ws(' ', transform(sequence(1, 4), w ->
            substring(lower(hex(xxhash64(cast(pmod(xxhash64(id * 7 + w),
              $pool) AS string)))), 1, 8)))""").as("text"))
      }
      locally {
        Tokenizer.bpeMergeTable(words(50000L), "text", 2).count()
        Tokenizer.bpeMergeTableDelta(words(50000L), "text", 2).count()
      }
      val n = 1000000L
      val ladder = Seq(4, 16, 64).map { m =>
        val (tR, rR) = timed {
          Tokenizer.bpeMergeTable(words(n), "text", m).count() }
        val (tD, rD) = timed {
          Tokenizer.bpeMergeTableDelta(words(n), "text", m).count() }
        require(rR == rD, s"delta-shape mismatch at $m merges: $rR vs $rD")
        f"""{"merges":$m,"recount_ckpt4":{"sec":$tR%.2f},"delta":{"sec":$tD%.2f},"rows":$rD}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"bpe_delta_rehearsal","n_rows":$n,"depth":$ladder}""")
      spark.stop(); return
    }

    val out = (if (asofOnly || segOnly || capOnly || deconOnly) Seq.empty[Long] else scales).map { n =>
      val docs = corpus(spark, n).cache()
      docs.count() // materialize outside every timed window

      // hot-shingle adversary: df cap prunes the boilerplate postings
      val (tJac, nJac) = timed {
        Dedup.ngramJaccardPairs(docs, "id", "text", "source", maxShingleDf = 200)
          .filter(col("jaccard") >= 0.8).count()
      }
      // megabucket adversary: band-bucket cap drops the exact-copy cluster
      val (tMh, nMh) = timed {
        Dedup.minhashCandidates(docs, "id", "text",
          bands = 8, rowsPerBand = 2, maxBucketSize = 200).count()
      }
      // identical-signature megabucket through the simhash chunk cap
      val (tSh, nSh) = timed {
        Dedup.simhashCandidates(docs, "id", "text", maxBucketSize = 200).count()
      }
      // candidates → clusters (pointer-jumping label propagation)
      val (tCc, nCc) = timed {
        Dedup.connectedComponents(
          Dedup.minhashCandidates(docs, "id", "text",
            bands = 8, rowsPerBand = 2, maxBucketSize = 200)).count()
      }
      // winnowing containment: rolling-hash local fingerprints; the
      // boilerplate families' hot fingerprints are df-capped, the
      // near-dup/exact families still pair through their rare ones.
      // k=16 (~3 synthetic words per gram): at the default k=8 a gram
      // spans ~1.5 words of the 30k-word vocabulary and cross-doc random
      // gram collisions grow ∝ n²/|vocab|² — measured 6→32→82 s across
      // the ladder with pair rows still exactly linear. Longer grams put
      // the collision space at |vocab|³ and restore ~linear wall, which
      // is also how winnowing is parameterized on real text (gram length
      // well above the word scale).
      val (tWin, nWin) = timed {
        Dedup.winnowContainmentPairs(docs, "id", "text", k = 16,
          maxFpDf = 200, minContainment = 0.5).count()
      }
      // segment-level dedup: the exact-copy family floods single digests
      // (n/50 postings per shared segment hash) — the keep/drop stage is
      // a digest-only groupBy-min(struct) with map-side partial agg (the
      // r9 rewrite; the dedicated hot-segment ladder below measures the
      // removed window ceiling), so wall must stay ~linear
      val (tSeg, nSeg) = timed {
        // force the REASSEMBLED text, not just the keep decision — summing
        // only n_kept would let Catalyst prune the map-side re-slicing
        // (the same pruned-plan trap the as-of rung hit earlier this round)
        forcedRows(Dedup.segmentDedup(docs, "id", "text", width = 16)
          .withColumn("__text_len", length(col("kept_text"))), "__text_len")
      }
      // concat-and-chunk placement: the two-phase prefix sum (a global
      // window here would serialize the whole rung through one task)
      val (tPack, nPack) = timed {
        val counts = docs.select(col("id"),
          size(Dedup.tokens(col("text"))).cast("long").as("nt"))
        forcedRows(graft.operators.Packing.concatChunkPlacement(
          counts, "id", "nt", capacity = 256, groupOf = expr("id div 2048")),
          "offset")
      }
      // mergeable CMS heavy hitters over token occurrences (~62n rows):
      // per-batch sketch agg + union + exact-top-k certificate join
      val (tCms, nCms) = timed {
        val toks = docs.select(explode(Dedup.tokens(col("text"))).as("tk"),
          pmod(col("id"), lit(8)).as("b"))
        graft.operators.HeavyHitters.cmsTopKCertificate(
          toks, "tk", "b", k = 20, eps = 0.002, confidence = 0.99, seed = 17)
          .count()
      }
      // skewed join: 30% of probe rows on one key, 1000-key build side
      val probe = spark.range(n).select(
        when(pmod(col("id"), lit(10)) < 3, 0L).otherwise(pmod(col("id"), lit(1000))).as("k"),
        col("id").as("v")).cache()
      probe.count()
      val build = spark.range(1000).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("payload")).cache()
      build.count()
      val (tSalted, nSalted) = timed {
        Skew.saltedJoin(probe, build, "k", salts = 32).count()
      }
      // as-of join: n probes over 1000 keys against n/10 deduped updates —
      // the union+window must stay ~linear (rows out = n exactly)
      val (tAsof, nAsof) = timed {
        val ap = spark.range(n).select(pmod(col("id"), lit(1000)).as("k"),
          pmod(col("id") * 7, lit(100000L)).as("t"), col("id").as("pid"))
        val ab = spark.range(n / 10).select(pmod(col("id"), lit(1000)).as("bk"),
          pmod(col("id") * 70, lit(100000L)).as("bt"), col("id").as("bv"))
          .groupBy("bk", "bt").agg(max("bv").as("v"))
        forcedRows(graft.operators.AsofJoin.asofJoin(ap, "k", "t", ab, "bk", "bt", Seq("v")), "v")
      }
      // as-of under KEY SKEW: same volumes as above but 50% of probes
      // (and ~50% of build updates) land on ONE key — the operator's
      // documented ceiling (Window.partitionBy puts a key's whole history
      // in one task). The measurement quantifies how far the wall curve
      // departs from the uniform rung as the hot key's slice grows.
      val (tAsofSkew, nAsofSkew) = timed {
        val hot = (c: org.apache.spark.sql.Column) =>
          when(pmod(c, lit(2)) === 0, lit(0L)).otherwise(pmod(c, lit(1000)))
        val ap = spark.range(n).select(hot(col("id")).as("k"),
          pmod(col("id") * 7, lit(100000L)).as("t"), col("id").as("pid"))
        val ab = spark.range(n / 10).select(hot(col("id")).as("bk"),
          pmod(col("id") * 70, lit(100000L)).as("bt"), col("id").as("bv"))
          .groupBy("bk", "bt").agg(max("bv").as("v"))
        forcedRows(graft.operators.AsofJoin.asofJoin(ap, "k", "t", ab, "bk", "bt", Seq("v")), "v")
      }
      // range join: n probes vs n/100 width-50 intervals on a 100k axis,
      // bucket 64 — matches ~ n × (intervals-per-key × 50/100000)
      val (tRange, nRange) = timed {
        val rp = spark.range(n).select(pmod(col("id"), lit(1000)).as("k"),
          pmod(col("id") * 7, lit(100000L)).as("t"), col("id").as("pid"))
        val iv = spark.range(n / 100).select(pmod(col("id"), lit(1000)).as("rk"),
          pmod(col("id") * 131, lit(100000L)).as("s"))
          .withColumn("e", col("s") + 50)
        graft.operators.RangeJoin.bucketedRangeJoin(
          rp, "k", "t", iv, "rk", "s", "e", bucketWidth = 64).count()
      }
      probe.unpersist(); docs.unpersist(); build.unpersist()

      (n, Map(
        "ngram_jaccard" -> (tJac, nJac),
        "minhash_lsh" -> (tMh, nMh),
        "simhash" -> (tSh, nSh),
        "cluster" -> (tCc, nCc),
        "winnow_containment" -> (tWin, nWin),
        "segment_dedup" -> (tSeg, nSeg),
        "packing_prefix_sum" -> (tPack, nPack),
        "cms_heavy_hitters" -> (tCms, nCms),
        "salted_join" -> (tSalted, nSalted),
        "asof_join" -> (tAsof, nAsof),
        "asof_join_skewed" -> (tAsofSkew, nAsofSkew),
        "range_join" -> (tRange, nRange)))
    }

    val json = out.map { case (n, ops) =>
      val fields = ops.toSeq.sortBy(_._1).map { case (k, (t, r)) =>
        f"""\"$k\":{\"sec\":$t%.2f,\"rows\":$r}"""
      }.mkString(",")
      s"""{"n_docs":$n,$fields}"""
    }.mkString("[", ",", "]")
    if (!asofOnly) println(s"""{"metric":"scale_rehearsal","scales":$json}""")

    if (!segOnly && !capOnly) {
    // Dedicated as-of SKEW ladder at row counts where the single-task-
    // per-key ceiling can actually bind (at the doc-ladder scales the hot
    // key's 75k-row slice sorts in milliseconds and skew is invisible).
    // 50% of probes and build updates land on ONE key: the uniform twin
    // spreads the same volume over 1000 keys / all cores, the skewed run
    // serializes half the data through one core — the measured gap IS the
    // operator's documented skew ceiling (AsofJoin scaladoc).
    val asofScales = Seq(1000000L, 4000000L, 16000000L)
    // untimed warmup: JIT + codegen caches, so the first rung isn't
    // measuring compilation (first run showed 12 s for work later rungs
    // do in 2-3 s)
    locally {
      val wp = spark.range(500000L).select(pmod(col("id"), lit(1000)).as("k"),
        pmod(col("id") * 7, lit(100000L)).as("t"), col("id").as("pid"))
      val wb = spark.range(50000L).select(pmod(col("id"), lit(1000)).as("bk"),
        pmod(col("id") * 70, lit(100000L)).as("bt"), col("id").as("bv"))
        .groupBy("bk", "bt").agg(max("bv").as("v"))
      forcedRows(graft.operators.AsofJoin.asofJoin(wp, "k", "t", wb, "bk", "bt", Seq("v")), "v")
    }
    val asofOut = asofScales.map { n =>
      def probeBuild(skewed: Boolean) = {
        val key = (c: org.apache.spark.sql.Column) =>
          if (skewed) when(pmod(c, lit(2)) === 0, lit(0L)).otherwise(pmod(c, lit(1000)))
          else pmod(c, lit(1000))
        val ap = spark.range(n).select(key(col("id")).as("k"),
          pmod(col("id") * 7, lit(100000L)).as("t"), col("id").as("pid"))
        val ab = spark.range(n / 10).select(key(col("id")).as("bk"),
          pmod(col("id") * 70, lit(100000L)).as("bt"), col("id").as("bv"))
          .groupBy("bk", "bt").agg(max("bv").as("v"))
        (ap, ab)
      }
      val (tU, nU) = timed {
        val (ap, ab) = probeBuild(skewed = false)
        forcedRows(graft.operators.AsofJoin.asofJoin(ap, "k", "t", ab, "bk", "bt", Seq("v")), "v")
      }
      val (tS, nS) = timed {
        val (ap, ab) = probeBuild(skewed = true)
        forcedRows(graft.operators.AsofJoin.asofJoin(ap, "k", "t", ab, "bk", "bt", Seq("v")), "v")
      }
      // the mitigation under the same skew: time axis is [0, 100000);
      // width 512 spreads the hot key over ~195 buckets
      val (tB, nB) = timed {
        val (ap, ab) = probeBuild(skewed = true)
        forcedRows(graft.operators.AsofJoin.bucketedAsofJoin(
          ap, "k", "t", ab, "bk", "bt", Seq("v"), bucketWidth = 512), "v")
      }
      f"""{"n_rows":$n,"uniform":{"sec":$tU%.2f,"rows":$nU},"hot50":{"sec":$tS%.2f,"rows":$nS},"hot50_bucketed":{"sec":$tB%.2f,"rows":$nB}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"asof_skew_rehearsal","scales":$asofOut}""")
    }

    // Cap-shape adjudication (VERDICT r9 #2): the df cap as
    // count-over-window vs groupBy.count+join, on a corpus where EVERY
    // doc shares a 4-token prefix — the pure-prefix shingles' df = n, the
    // planted mega-df key. Both shapes run the FULL ngramJaccardPairs
    // (the cap's cost only matters in situ: the window rides the pair
    // join's exchange, the groupBy pays an extra join — isolating the cap
    // stage would hide exactly that difference).
    if (!asofOnly && !segOnly && !deconOnly) {
      def megaCorpus(n: Long) = corpus(spark, n).select(col("id"),
        concat(lit("omni present header tokens "), col("text")).as("text"),
        col("source"))
      locally { // untimed JIT/codegen warmup
        Dedup.ngramJaccardPairs(megaCorpus(20000L), "id", "text", "source",
          maxShingleDf = 200).count()
      }
      val capLadder = Seq(50000L, 150000L, 450000L).map { n =>
        // corpus cached OUTSIDE the timed window: generation is string-
        // heavy and identical for both shapes — timing it would dilute
        // the very difference under adjudication
        val docs = megaCorpus(n).cache()
        docs.count()
        val (tWin, nWin) = timed3 {
          Dedup.ngramJaccardPairs(docs, "id", "text", "source",
            maxShingleDf = 200).count()
        }
        val (tGrp, nGrp) = timed3 {
          Dedup.ngramJaccardPairsGroupCap(docs, "id", "text", "source",
            maxShingleDf = 200).count()
        }
        docs.unpersist()
        require(nWin == nGrp, s"cap-shape mismatch at $n: $nWin vs $nGrp")
        f"""{"n_docs":$n,"window_cap":{"sec":$tWin%.2f,"rows":$nWin},"group_cap":{"sec":$tGrp%.2f,"rows":$nGrp}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"cap_shape_rehearsal","scales":$capLadder}""")
    }

    if (capOnly) { spark.stop(); return }

    // Decontamination screen ladder (r9): the EXACT full-postings path
    // vs the Bloom literal-screen path against a FIXED 200-item
    // benchmark as the corpus grows. This is the asymmetry the bloom
    // path exists for — the exact path exchanges every distinct corpus
    // (id, gram) posting to df-cap it (work ∝ corpus), the bloom path
    // drops non-benchmark grams at the scan and exchanges only the
    // might-be-benchmark residue (work ∝ benchmark + fpp·corpus). At
    // sf0.1 (1.5k docs) the filter build dominates and bloom LOSES
    // (2.8 vs 2.0 s, PERF_NOTES r9); this ladder locates the crossover.
    // Benchmark = middle half of every corpus doc with id < 200 (the
    // q73 construction), so flags exist at every rung and both paths
    // must return identical rows.
    if (!asofOnly && !segOnly) {
      import graft.operators.Decontamination
      def benchOf(docs: DataFrame) = docs.filter(col("id") < 200)
        .select(col("id").as("bench_id"), expr(
          "array_join(slice(split(text, ' '), cast(size(split(text, ' '))/4 as int) + 1, " +
            "greatest(cast(size(split(text, ' '))/2 as int), 1)), ' ')").as("btext"))
      locally { // untimed JIT/codegen warmup
        val w = corpus(spark, 20000L).cache(); w.count()
        val bw = benchOf(w).cache(); bw.count()
        Decontamination.benchmarkContainment(w, "id", "text", bw, "bench_id", "btext").count()
        Decontamination.benchmarkContainmentBloom(w, "id", "text", bw, "bench_id", "btext").count()
        bw.unpersist(); w.unpersist()
      }
      val deconLadder = Seq(50000L, 150000L, 450000L).map { n =>
        val docs = corpus(spark, n).cache(); docs.count()
        val bench = benchOf(docs).cache(); bench.count()
        val (tEx, nEx) = timed3 {
          Decontamination.benchmarkContainment(docs, "id", "text",
            bench, "bench_id", "btext").count()
        }
        val (tBl, nBl) = timed3 {
          Decontamination.benchmarkContainmentBloom(docs, "id", "text",
            bench, "bench_id", "btext").count()
        }
        bench.unpersist(); docs.unpersist()
        require(nEx == nBl, s"decon mismatch at $n: $nEx vs $nBl")
        f"""{"n_docs":$n,"exact":{"sec":$tEx%.2f,"rows":$nEx},"bloom":{"sec":$tBl%.2f,"rows":$nBl}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"decon_shape_rehearsal","scales":$deconLadder}""")
    }

    if (deconOnly) { spark.stop(); return }

    // Hot-SEGMENT dedup ladder (VERDICT r9 #1): ONE width-16 boilerplate
    // segment planted in HALF the docs — the adversary segment dedup
    // exists for. Under the round-8 row_number window, every one of those
    // n/2 postings lands in a single task's sort; the groupBy-min(struct)
    // rewrite partial-aggregates them map-side (one row per input
    // partition survives the map side). Both shapes run on the same
    // generated corpus (generation cost is identical and parallel), so
    // the measured gap — and its growth down the ladder — IS the removed
    // ceiling. Even ids: [hot seg][unique seg]; odd ids: one unique seg.
    if (!asofOnly) {
      val hotSeg = (0 until 16).map(j => s"boiler$j").mkString(" ")
      def segCorpus(n: Long) = spark.range(n).select(col("id"),
        concat(
          when(pmod(col("id"), lit(2)) === 0, lit(hotSeg + " ")).otherwise(lit("")),
          expr("concat_ws(' ', transform(sequence(0, 15), " +
            "j -> concat('u', cast(id AS string), '_', cast(j AS string))))"))
          .as("text"))
      def run(dedup: (DataFrame, String, String, Int) => DataFrame,
          docs: DataFrame) =
        timed3 {
          // force the reassembled text (the pruned-plan trap, see forcedRows)
          forcedRows(dedup(docs, "id", "text", 16)
            .withColumn("__tl", length(col("kept_text"))), "__tl")
        }
      locally { // untimed JIT/codegen warmup
        val w = segCorpus(500000L).cache(); w.count()
        timed(forcedRows(Dedup.segmentDedup(w, "id", "text", 16)
          .withColumn("__tl", length(col("kept_text"))), "__tl"))
        w.unpersist()
      }
      val segLadder = Seq(1000000L, 4000000L, 16000000L).map { n =>
        // cache the corpus OUTSIDE the timed window — generating tens of
        // millions of token strings inside it swamped the shape difference
        val docs = segCorpus(n).cache()
        docs.count()
        val (tFix, nFix) = run(Dedup.segmentDedup, docs)
        val (tWin, nWin) = run(Dedup.segmentDedupWindowed, docs)
        docs.unpersist()
        require(nFix == nWin, s"shape mismatch at $n: $nFix vs $nWin")
        f"""{"n_docs":$n,"grouped":{"sec":$tFix%.2f,"rows":$nFix},"windowed":{"sec":$tWin%.2f,"rows":$nWin}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"segment_hot_rehearsal","scales":$segLadder}""")
    }
    spark.stop()
  }
}
