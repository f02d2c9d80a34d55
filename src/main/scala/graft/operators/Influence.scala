package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank over an interaction graph, in exact integer
  * arithmetic — the "KOL influence" notion done as graph centrality
  * instead of the reference's per-entity engagement ratios (its trust /
  * success scores at `dwh/serving/score_api.py` and
  * `batch/etl/feature_engineering.py` rank each KOL from its OWN
  * counters; PageRank ranks an entity by WHO interacts with it,
  * recursively — the standard influence measure the reference stops
  * short of; Page et al. 1999).
  *
  * Shape (the classic Spark formulation, DataFrame-native):
  *  - the static per-edge frame `(src, dst, outdeg)` is built ONCE
  *    (edges ⋈ out-degrees) and cached — it is re-read every iteration;
  *  - each iteration shuffle-joins the current rank frame (one row per
  *    node) against it on `src`, floor-divides rank mass across
  *    out-edges, and hash-aggregates contributions by `dst`:
  *    rank′ = base·(1−d) + d·Σ contrib, with d = 0.85;
  *  - nodes with no inbound edges fall back to the teleport term via a
  *    left join against the node frame (no row is ever lost).
  *
  * At 100 TB / 10⁹ nodes: the edge frame is the big side — pre-partition
  * it by `src` once (the cache here is that, locally) so only the small
  * rank frame (one row per node) moves per iteration; every join and
  * aggregate is keyed on node ids, so AQE handles hub skew (a celebrity
  * node is exactly a skewed-join key). Lineage grows linearly with
  * iterations — for tens of rounds, `localCheckpoint` the rank frame
  * every few iterations (the q55 label-propagation pattern,
  * [[Dedup]]); at 3 rounds the plain chain is cheaper.
  *
  * Portability (why integer): parallel double summation is
  * order-dependent, so float PageRank can differ per partitioning. Here
  * rank is held in micro-units (base = 10⁶) and every step is exact
  * BIGINT arithmetic — `contrib = rank div outdeg`, damping
  * `(contrib · 850000) div 10⁶` applied per edge BEFORE the sum — so any
  * engine, any partitioning, any iteration order produces bit-identical
  * ranks. Overflow bound: the per-edge intermediate is
  * `(rank_u div outdeg) · 850000`, so the math is exact while
  * `max(rank_u/outdeg) < 2⁶³/850000 ≈ 1.08·10¹³` micro-units (~10⁷ rank
  * units concentrated on one low-outdeg node). Per-node rank is bounded
  * by total mass ≈ N·10⁶, so a UNIFORM graph is safe past 10¹² nodes,
  * but a hub holding a constant fraction of all mass with outdeg 1
  * crosses the bound near N ≈ 10⁷/fraction — past that, divide the
  * damping before multiplying (`(rank_u div outdeg) div 10⁶ · 850000`
  * loses 6 digits; the decimal path keeps them) or damp in smaller
  * units. (The DuckDB oracle sums in HUGEINT either way.)
  */
object Influence {

  val BaseU: Long = 1000000L    // rank unit: 1.0 == 1,000,000 micro-units
  val TeleportU: Long = 150000L // (1 - 0.85) * BaseU
  val DampNum: Long = 850000L   // 0.85 * BaseU

  /** Distinct node frame (`node`) of an edge list. */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()

  /** `iters` rounds of damped integer PageRank over `edges(src, dst)`.
    * Returns one row per node: (node, rank_u). Every node starts at
    * [[BaseU]]; dangling nodes (no out-edges) simply contribute nothing
    * (their mass leaks — the standard simplification; the oracle replays
    * it identically).
    *
    * The returned frame is EAGERLY materialized (`localCheckpoint`) so
    * the iteration caches can be released before returning — a session
    * running PageRank repeatedly must not accumulate cached edge frames
    * (the r10 leak finding). The one-row-per-node result is the smallest
    * frame in the computation; materializing it costs one pass the
    * caller's first action would have paid anyway.
    */
  def pageRankInteger(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    Iterate.loop(edges.sparkSession) { l =>
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      // static across iterations: pin the partitioned edge+degree frame
      // AND the node frame — every iteration's rank rebuild references
      // both, and without the materialization each of the ~2·iters
      // references re-derives the edge build from the source scans (the
      // first plan audit showed 40 parquet scans for a 3-iteration run)
      val linked = l.pin(edges.join(outdeg, "src"))
      val allNodes = l.pin(nodes(edges))
      var rank = allNodes.withColumn("rank_u", lit(BaseU))
      for (_ <- 1 to iters) {
        l.next()
        val contribs = linked
          .join(rank.withColumnRenamed("node", "src"), "src")
          .select(col("dst"),
            // damp per edge, in integers: ((rank div outdeg) * d) in
            // micro-units. SQL `div` is exact integral division — a double
            // `/` + cast would silently lose bits past 2^53 micro-units
            expr(s"((rank_u div outdeg) * $DampNum) div $BaseU").as("c"))
          .groupBy("dst").agg(sum("c").as("in_u"))
        rank = l.ckpt(allNodes
          .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (lit(TeleportU) + coalesce(col("in_u"), lit(0L))).as("rank_u")))
      }
      l.finishKeepCurrent(rank)
    }
  }

  /** `iters` rounds of PERSONALIZED PageRank (Page et al. 1999 §6;
    * Haveliwala, "Topic-Sensitive PageRank", WWW'02): the teleport
    * mass concentrates on a SEED set instead of spreading uniformly,
    * so ranks measure proximity-weighted influence relative to the
    * seeds — the curation use is domain-trust propagation (seed the
    * known-good domains/authors, rank everything by how much trusted
    * mass flows to it) and seed-conditioned recommendation.
    *
    * Integer kernel, same discipline as [[pageRankInteger]]: total
    * teleport mass is conserved at `0.15·N·10⁶` micro-units but paid
    * only to seeds — each seed receives `(150000·N) div nS` per round
    * (the div remainder leaks, deterministically — same class as the
    * documented dangling-mass leak). Rank starts at `(10⁶·N) div nS`
    * on seeds, 0 elsewhere. Non-seed nodes can only hold flowed-in
    * mass; a node unreachable from every seed ranks exactly 0.
    *
    * Shape: identical to [[pageRankInteger]] plus one broadcast join
    * of the seed flag onto the node frame — the seed/count frames are
    * 1-row or ≤N-row, never corpus-sized. Result eagerly materialized,
    * caches released.
    *
    * Overflow: seed ranks start at `10⁶·N/nS`, so the per-edge
    * intermediate bound tightens to `(10⁶·N/nS) · 850000 < 2⁶³` for a
    * seed with outdeg 1 holding all mass — safe while
    * `N/nS ≲ 1.08·10¹³/10⁶ ≈ 10⁷` (a million-node graph with ONE seed
    * is fine; a 10⁹-node graph needs ≥100 seeds or smaller damp units).
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    Iterate.loop(edges.sparkSession) { l =>
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val linked = l.pin(edges.join(outdeg, "src"))
      val allNodes = l.pin(nodes(edges))
      // seeds outside the graph are ignored (they could neither receive
      // nor pass mass); nS counts in-graph seeds only so no teleport mass
      // silently vanishes on a stale seed list
      val seedSet = seeds.select(col("node")).distinct().join(allNodes, "node")
      // teleport per node: (150000 * N) div nS to seeds, 0 elsewhere —
      // N and nS ride 1-row broadcast frames, never the driver
      val counts = allNodes.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(seedSet.agg(count(lit(1)).as("n_seeds")))
      val tele = l.pin(allNodes
        .join(seedSet.withColumn("__seed", lit(1L)), Seq("node"), "left")
        .crossJoin(broadcast(counts))
        .select(col("node"),
          when(col("__seed").isNotNull,
            expr(s"($TeleportU * n_nodes) div n_seeds")).otherwise(0L)
            .as("tele_u"),
          when(col("__seed").isNotNull,
            expr(s"($BaseU * n_nodes) div n_seeds")).otherwise(0L)
            .as("rank0_u")))
      var rank = tele.select(col("node"), col("rank0_u").as("rank_u"))
      for (_ <- 1 to iters) {
        l.next()
        val contribs = linked
          .join(rank.withColumnRenamed("node", "src"), "src")
          .select(col("dst"),
            expr(s"((rank_u div outdeg) * $DampNum) div $BaseU").as("c"))
          .groupBy("dst").agg(sum("c").as("in_u"))
        rank = l.ckpt(tele
          .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (col("tele_u") + coalesce(col("in_u"), lit(0L))).as("rank_u")))
      }
      l.finishKeepCurrent(rank)
    }
  }

  /** Exact triangle counts + local clustering coefficients over an
    * UNDIRECTED edge list `(u, v)` — the graph-structure statistic next
    * to the centralities: a node embedded in a tight community (high
    * clustering) versus a pure broker (low clustering at equal degree).
    * On a co-purchase graph: products bought in cohesive baskets vs
    * products bridging unrelated ones.
    *
    * Algorithm: degree orientation (Schank & Wagner 2005; the
    * MapReduce formulation of Suri & Vassilvitskii, WWW'11 — "the curse
    * of the last reducer"). Each edge orients from the (deg, id)-lower
    * endpoint to the higher; every triangle then has exactly ONE vertex
    * with two out-edges into it, so wedges (pairs of out-neighbors)
    * joined against the canonical edge set count each triangle once.
    * The payoff at scale: a hub's OUT-degree under this orientation is
    * bounded (only neighbors of even higher degree), so wedge fan-out
    * is Σ outdeg² = O(m^1.5) total and no single reducer sees a hub's
    * full neighborhood quadratic.
    *
    * Plan shape: two hash joins (degree attach), one self-join on the
    * wedge source, one semi-shaped join against the edge set keyed on
    * the canonical pair, one explode-to-3 + hash aggregate for
    * per-node counts. All keys are node ids / id pairs — AQE absorbs
    * residual skew. The canonical edge list and the degree table are
    * cached for the computation (four and three consumers respectively
    * — uncached, each re-derives the caller's edge construction from
    * the source scans) and released once the per-node result is
    * eagerly materialized.
    *
    * Output: (node, degree, n_tri, cc_bp) — clustering coefficient in
    * exact basis points, `2·t·10⁴ div (d·(d−1))`, 0 for degree < 2.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    // the canonical edge list is referenced by FOUR consumers (degree
    // count, orientation, the triangle-closing join, and transitively
    // the wedge build) — without the cache each consumer re-derives the
    // upstream edge construction (for a co-purchase graph: the order
    // self-join + distinct, the expensive part) from the source scans,
    // the same re-derivation class the r11 connectedComponents fix
    // closed. Released before returning; the per-node result is eagerly
    // materialized so the release is safe (the r10 PageRank discipline).
    val und = edges
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .persist()
    // degree table is read three times (both orientation attaches + the
    // final rollup); one row per node, cheap to hold
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .persist()
    // degree attaches BROADCAST the ≤|V|-row deg side under the session
    // budget (the wedgeTriangles rule: the planner cannot size an
    // aggregate output) so the m-row edge list is never exchanged at
    // all for the orientation; past the budget, hash-build deg so the
    // edge list is at least never SORTED (the r12 allocation-variance
    // argument)
    val degSide = degAttachSide(deg)
    val dir = und
      .join(degSide(deg.select(col("node").as("a"), col("deg").as("da"))),
        "a")
      .join(degSide(deg.select(col("node").as("b"), col("deg").as("db"))),
        "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst"))
    val tris = wedgeTriangles(dir, und)
    val perNode = tris
      .select(explode(array(col("src"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    val out = deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_bp",
        expr("CASE WHEN degree < 2 THEN 0 " +
          "ELSE (2 * n_tri * 10000) div (degree * (degree - 1)) END"))
      .localCheckpoint(true)
    und.unpersist()
    deg.unpersist()
    out
  }

  /** Build wedges from the degree-oriented edge list and close them
    * against the canonical edges — the shared core of [[triangleStats]]
    * and [[triangleCountApprox]]. The close is a SHUFFLE-HASH join, not
    * sort-merge: the wedge frame is the O(m^1.5) side and SMJ must
    * externally SORT it — the dominant allocation of the whole operator
    * and the source of its 2× GC/spill wall-clock swings at sf0.1
    * (VERDICT r12 watch item). Hashing the m-row edge side per
    * partition costs O(m/parts) memory and streams the wedges through
    * untouched; results are identical (LinkageSpec pins the strategy).
    */
  /** Join-side chooser for the degree attaches: broadcast the ≤|V|-row
    * persisted deg frame when it fits the session broadcast budget
    * (counted, not estimated — 32 B/row against
    * autoBroadcastJoinThreshold, −1 disabling), else hash-build it so
    * the m-row edge side is streamed, never sorted. The count triggers
    * deg's persist, which its later consumers reuse.
    */
  private def degAttachSide(deg: DataFrame): DataFrame => DataFrame = {
    val bc = deg.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val nNodes = deg.count()
    if (bc > 0 && nNodes <= bc / 32) df => broadcast(df)
    else df => df.hint("shuffle_hash")
  }

  private[graft] def wedgeTriangles(dir: DataFrame, und: DataFrame): DataFrame = {
    // when node ids fit 31 bits (checked on the — typically cached —
    // canonical edges: one 1-row aggregate), pack the (x, y) close key
    // into ONE BIGINT: the wedge exchange carries two longs instead of
    // three (−33% of the operator's dominant byte volume) and the close
    // probes a single-key hash map. Ids outside [0, 2³¹) keep the
    // two-column path — identical results either way.
    val stats = und.agg(min("a").as("lo"), max("b").as("hi"),
      count(lit(1)).as("m")).collect()(0)
    val packable = !stats.isNullAt(0) && stats.getLong(0) >= 0 &&
      stats.getLong(1) < (1L << 31)
    // broadcast BOTH fan-out sides (the wedge build's right copy of
    // `dir` and the close's edge list) when the canonical edge list
    // fits the session's broadcast budget — conservative 32 B/edge
    // against spark.sql.autoBroadcastJoinThreshold, −1 disabling
    // exactly like the planner's knob (guide §3.1: pick the strategy
    // deliberately; the planner cannot, because both sides derive from
    // aggregates with unknown size estimates). Under the budget the
    // O(m^1.5) wedge frame never enters ANY exchange: wedges generate
    // map-side and probe the broadcast edge hash in the same stage.
    // Past it (the 100 TB regime) the shuffled-hash path is the shape
    // that scales — wedges stream through one hash exchange, never an
    // external sort (the r12 variance fix; LinkageSpec pins both).
    val bcBytes = und.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val m = stats.getLong(2)
    val small = bcBytes > 0 && m <= bcBytes / 32
    def fanSide(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df.hint("shuffle_hash")
    val wedges = dir.select(col("src"), col("dst").as("x"))
      .join(fanSide(dir.select(col("src"), col("dst").as("y"))),
        "src")
      .where(col("x") < col("y"))
    if (packable) {
      val p = 1L << 31
      val undP = und.select((col("a") * p + col("b")).as("ab"))
      wedges
        .select(col("src"), (col("x") * p + col("y")).as("xy"))
        .join(fanSide(undP), col("xy") === col("ab"))
        .select(col("src"), expr(s"xy div $p").as("x"),
          pmod(col("xy"), lit(p)).as("y"))
    } else {
      wedges
        .join(fanSide(und),
          wedges("x") === und("a") && wedges("y") === und("b"))
        .select(col("src"), col("x"), col("y"))
    }
  }

  /** DOULION edge-sampled triangle estimate (Tsourakakis, Kang, Miller
    * & Faloutsos, KDD'09) — the at-scale answer when even the
    * degree-oriented exact count's O(m^1.5) is too hot: keep each
    * canonical edge with probability p, count triangles EXACTLY on the
    * sampled graph (the same orientation pipeline as [[triangleStats]]),
    * and scale by 1/p³ (each surviving triangle needed all three edges
    * kept — the estimator is unbiased, variance shrinks as sampled
    * triangles grow). Sampling is the engine-portable md5 threshold on
    * the canonical "a:b" pair (the [[Sampling.hashBucket]] convention):
    * deterministic, replayable by any engine, no RNG.
    *
    * `pBp` = keep probability in basis points (2500 = 0.25 → 64×
    * scale-up). Returns ONE row: (n_sampled_tri, n_est) with
    * `n_est = n_sampled_tri · 10¹² div pBp³` — exact BIGINT while
    * n_sampled_tri < 9.2·10⁶ (at p = 0.25 that is ~5.9·10⁸ true
    * triangles; past it, ladder the scale-up per factor — the
    * pmiCollocations documented-bound convention). The exactness audit
    * against [[triangleStats]] is q207.
    */
  def triangleCountApprox(edges: DataFrame, pBp: Int): DataFrame = {
    require(pBp >= 1 && pBp <= 10000, s"pBp must be in [1,10000], got $pBp")
    val und = edges
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .filter(Sampling.hashBucket(concat_ws(":",
        col("a").cast("string"), col("b").cast("string")), 10000) < pBp)
      .persist()
    // same physical machine as [[triangleStats]]: deg persisted (two
    // attaches), attaches broadcast-or-hash-building the small deg side
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .persist()
    val degSide = degAttachSide(deg)
    val dir = und
      .join(degSide(deg.select(col("node").as("a"), col("deg").as("da"))),
        "a")
      .join(degSide(deg.select(col("node").as("b"), col("deg").as("db"))),
        "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst"))
    val nSamp = wedgeTriangles(dir, und)
      .agg(count(lit(1)).as("n_sampled_tri"))
    val out = nSamp
      .select(col("n_sampled_tri"),
        expr(s"(n_sampled_tri * 1000000000000) div " +
          s"(cast($pBp as bigint) * $pBp * $pBp)").as("n_est"))
      .localCheckpoint(true)
    und.unpersist()
    deg.unpersist()
    out
  }

  /** `rounds` of k-core peeling (Seidman 1983; the distributed
    * formulation of Montresor et al., "Distributed k-Core
    * Decomposition", PODC'11) over an UNDIRECTED edge list `(u, v)`:
    * repeatedly remove nodes of degree < k along with their edges. The
    * k-core is the standard "dense cohesive backbone" extractor — on a
    * co-purchase graph it isolates the always-bought-together cluster
    * from the long tail the centralities smear over.
    *
    * Semantics are BOUNDED-ROUND (exactly `rounds` peels, a
    * deterministic function of the input at any scale factor), not
    * run-to-fixpoint — the returned profile shows convergence when the
    * counts stop moving. `k` self-scales to `(2·|E| div |V|) + 1`
    * (strictly above the average degree) unless overridden, so the
    * peel stays informative as the graph densifies with corpus scale.
    *
    * Returns the peel curve: one row per round —
    * (round, k, n_nodes, n_edges) with counts AFTER that round's peel.
    *
    * Shape: per round one degree aggregate (node-keyed) and two
    * semi-joins of the edge list against the ≤|V|-row survivor frame;
    * the k threshold rides a 1-row broadcast (never a driver value).
    * The surviving edge list is eagerly checkpointed each round —
    * the loop re-reads it twice per subsequent round, and an un-truncated
    * chain re-derives all prior peels per reference (the BPE
    * checkpoint-every-round lesson; peeled frames shrink
    * monotonically, so each checkpoint is cheaper than the last).
    * Per-round 1-row count frames union into the ≤rounds-row result.
    */
  def kCorePeelProfile(edges: DataFrame, rounds: Int,
      kOverride: Option[Long] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    Iterate.loop(edges.sparkSession) { l =>
      val und0 = l.pin(edges
        .select(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b"))
        .where(col("a") =!= col("b"))
        .distinct())
      val kFrame = l.pin(kOverride match {
        case Some(k) =>
          und0.sparkSession.range(1).select(lit(k).as("k"))
        case None =>
          val nN = nodes(und0.select(col("a").as("src"), col("b").as("dst")))
            .agg(count(lit(1)).as("n_nodes"))
          val nE = und0.agg(count(lit(1)).as("n_edges"))
          nE.crossJoin(nN)
            .select(expr("(2 * n_edges) div n_nodes + 1").as("k"))
      })
      var cur = und0
      var profile: DataFrame = null
      for (r <- 1 to rounds) {
        l.next()
        val deg = cur.select(col("a").as("node"))
          .union(cur.select(col("b").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        // surv feeds THREE consumers (both edge semi-joins + the round's
        // node count); un-materialized, each re-runs the degree aggregate
        // over the full edge list — measured 6× super-linear wall at the
        // 18.5M-edge ladder rung before this checkpoint. The survivor
        // frame is ≤|V| single-long rows: cheapest thing in the loop.
        val surv = l.ckpt(deg.crossJoin(broadcast(kFrame))
          .filter(col("deg") >= col("k"))
          .select("node"))
        cur = l.ckpt(cur
          .join(surv.withColumnRenamed("node", "a"), "a")
          .join(surv.withColumnRenamed("node", "b"), "b")
          .select("a", "b"))
        // the 1-row profile row references this round's surv/cur — pin
        // it (eager) so releasing them two rounds on cannot orphan it
        val row = l.pin(surv.agg(count(lit(1)).as("n_nodes"))
          .crossJoin(cur.agg(count(lit(1)).as("n_edges")))
          .crossJoin(broadcast(kFrame))
          .select(lit(r.toLong).as("round"), col("k"),
            col("n_nodes"), col("n_edges")))
        profile = if (profile == null) row else profile.unionByName(row)
      }
      l.finish(profile)
    }
  }

  /** `iters` rounds of HITS (Kleinberg, "Authoritative Sources in a
    * Hyperlinked Environment", JACM 1999) over DIRECTED `edges(src,
    * dst)`, in exact integer arithmetic: authority(v) = Σ hub(u) over
    * in-edges, hub(u) = Σ authority(v) over out-edges, each half
    * renormalized so the maximum score is [[BaseU]] — the mutual
    * reinforcement PageRank's single score collapses (a great CURATOR
    * and a great AUTHORITY are different roles; on a purchase graph:
    * discerning buyers vs sought-after suppliers).
    *
    * Returns one row per node: (node, auth_u, hub_u).
    *
    * Shape: per iteration, two shuffle-joins of a one-row-per-node score
    * frame against the static checkpointed edge frame and two hash
    * aggregates keyed by node — identical scale posture to
    * [[pageRankInteger]] (the score side broadcasts at ~10⁸ nodes; AQE
    * absorbs hub skew); the max-renormalizer is a 1-row broadcast
    * computed off the MATERIALIZED raw frame.
    *
    * Materialization ([[Iterate.Loop]]): this loop is the canonical
    * diamond case — `raw` feeds two consumers inside each renorm (the
    * max aggregate + the score select) and each half-step's score frame
    * feeds the next half-step AND the final auth⋈hub join, so left
    * lazy the plan re-derives the corpus-sized edge join ~2^(2·iters)
    * times (q151 measured 43.5 s at sf0.1 vs same-graph PageRank's
    * 6.5 s). Each half-step eagerly checkpoints `raw` and its score
    * frame and releases the blocks two half-steps back; the returned
    * join is the only storage left behind.
    *
    * Portability: max-normalization in integers —
    * `score = (raw · 10⁶) div max(raw)` — keeps every step exact BIGINT,
    * so any partitioning replays bit-identically. Overflow bound: raw
    * sums of ≤10⁶-unit scores times the 10⁶ renormalizer need
    * `max(indeg)·10¹² < 2⁶³`, i.e. degrees to ~9·10⁶; past that,
    * pre-divide raw by its own unit before renormalizing (one decimal
    * digit of the statistic per 10× of degree headroom).
    */
  def hitsInteger(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    Iterate.loop(edges.sparkSession) { l =>
      val e = l.pin(edges.select("src", "dst").distinct())
      val allNodes = l.pin(nodes(e))
      def renorm(raw0: DataFrame, key: String, out: String): DataFrame = {
        val raw = l.ckpt(raw0)
        val mx = raw.agg(max("raw").as("mx"))
        allNodes
          .join(raw.withColumnRenamed(key, "node"), Seq("node"), "left")
          .crossJoin(broadcast(mx))
          .select(col("node"),
            coalesce(expr("(raw * 1000000) div mx"), lit(0L)).as(out))
      }
      var hub = l.ckpt(allNodes.withColumn("hub_u", lit(BaseU)))
      var auth: DataFrame = null
      for (_ <- 1 to iters) {
        // keep=2 half-steps of history: the final join reads the last
        // auth (one generation older than the last hub)
        l.next(keep = 2)
        auth = l.ckpt(renorm(
          e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy("dst").agg(sum("hub_u").as("raw")),
          "dst", "auth_u"))
        l.next(keep = 2)
        hub = l.ckpt(renorm(
          e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src").agg(sum("auth_u").as("raw")),
          "src", "hub_u"))
      }
      l.finish(auth.join(hub, "node"))
    }
  }

  /** Per-group degree-distribution profile with a power-law tail fit —
    * the graph DATASHEET next to the centralities: node/edge-end
    * counts, the maximum degree (the hub that decides skew-join
    * behavior), and the log-log OLS slope of the degree histogram
    * (Barabási & Albert 1999; Clauset, Shalizi & Newman, SIAM Rev.
    * 2009 use MLE — the OLS slope is the standard quick diagnostic). A
    * slope near −2..−3 says scale-free (expect hubs, plan for salting
    * / AQE skew handling); a collapsing slope says the graph is
    * near-regular and plain hash joins are fine. Read this BEFORE
    * running PageRank/HITS at a new scale.
    *
    * `edges(groupCol, src, dst)` is treated as already-oriented edge
    * ENDS (pass each undirected edge in both directions, as the
    * centrality queries do); `groupCol` partitions the profile (e.g.
    * the side of a bipartite graph).
    *
    * Shape: the count-of-counts discipline — one degree aggregate
    * keyed on (group, node) (the only corpus-sized exchange), then the
    * ≤distinct-degree level frame (materialized once for its two
    * consumers) carries the totals and the exact-integer micro-nat OLS
    * ([[Profile.olsSlopeMicroSql]], engine-identical arithmetic).
    *
    * Output: (groupCol, n_nodes, n_edge_ends, max_degree, n_levels,
    * slope_micro).
    */
  def degreeDistribution(edges: DataFrame, groupCol: String): DataFrame =
    Iterate.loop(edges.sparkSession) { l =>
      val deg = edges.groupBy(col(groupCol), col("src"))
        .agg(count(lit(1)).as("deg"))
      val levels = l.pin(deg.groupBy(groupCol, "deg")
        .agg(count(lit(1)).as("n_nodes")))
      val tot = levels.groupBy(groupCol)
        .agg(sum("n_nodes").as("n_nodes"),
          sum(expr("deg * n_nodes")).as("n_edge_ends"),
          max("deg").as("max_degree"))
      val fit = levels.selectExpr(groupCol,
          "CAST(floor(ln(CAST(deg AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x",
          "CAST(floor(ln(CAST(n_nodes AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y")
        .groupBy(groupCol)
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
        .selectExpr(groupCol, "n AS n_levels",
          Profile.olsSlopeMicroSql("slope_micro"))
      l.finish(tot.join(fit, groupCol))
    }
}
