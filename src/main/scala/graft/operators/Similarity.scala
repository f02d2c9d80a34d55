package graft.operators

import graft.functions.VectorFunctions
import graft.plans.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three tiers, per the training-data-pipeline charter:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus; one pass, no shuffle of the corpus, ranked
  *    with a per-query window. The correctness baseline.
  *  - [[lshTopK]] — random-hyperplane LSH: bucket both sides on sign-bit
  *    signatures and only score within a bucket. The scale path — at 100 TB
  *    the bucket join shuffles ids+buckets, never the full pairwise product.
  *    Planes are literal weight arrays built once at plan time
  *    ([[VectorFunctions.hyperplaneWeights]]): deterministic across
  *    executors with no RNG state, no broadcast model, and no per-row hash
  *    derivation.
  *  - [[ivfTopK]] — IVF coarse quantizer. The centroid set IS the model (a
  *    few hundred vectors): it is collected to the driver once and baked
  *    into the plan as literals, so cell assignment is a per-row argmin
  *    with NO join, NO window, NO shuffle of the corpus — the corpus moves
  *    exactly once, on the (cell) candidates join.
  */
object Similarity {

  /** Exact top-k neighbors per query. `queries`/`corpus`: (id, embedding).
    * Self-matches (same id) are excluded; ties broken by neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("embedding").as("qe"))
    val c = corpus.select(col("id").as("nid"), col("embedding").as("ne"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", VectorExpressions.cosineNative(col("qe"), col("ne")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "cosine", "rank")
  }

  /** Approximate top-k: only candidates sharing the query's LSH bucket are
    * scored. Recall is tunable via nPlanes (fewer planes → bigger buckets).
    * `dim` is the embedding width (planes are plan-time literals).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("embedding").as("qe"),
      VectorFunctions.lshBucket(col("embedding"), nPlanes, dim).as("bucket"))
    val c = corpus.select(col("id").as("nid"), col("embedding").as("ne"),
      VectorFunctions.lshBucket(col("embedding"), nPlanes, dim).as("bucket"))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", VectorExpressions.cosineNative(col("qe"), col("ne")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "bucket", "nid", "cosine", "rank")
  }

  /** Binary-code ANN (Charikar SimHash, STOC 2002): SRP codes
    * ([[graft.functions.VectorFunctions.srpCode]]) rank the corpus by
    * XOR-popcount Hamming distance, the top `k·mult` shortlist is
    * reranked by EXACT cosine, top `k` returned — the binary sibling of
    * the PQ/ADC + exact-rerank pipeline (q118), trading PQ's 256-way
    * per-byte resolution for a sketch that needs no codebook fit and
    * scores with two ALU ops.
    *
    * Scale shape: codes are a pure map-side projection (plan-time
    * literal planes, no fit, no join); the Hamming scan reads 8 bytes
    * per corpus vector instead of the 256-byte embedding — at 100 TB
    * the code column is ~3% of the vector bytes, the same compression
    * argument as PQ codes, and the scan is one XOR + POPCNT per row
    * inside whole-stage codegen. The per-query shortlist passes through
    * a partial WindowGroupLimit (≤ k·mult rows per partition per query
    * cross the exchange); only the ≤ |q|·k·mult shortlist rows ever
    * touch raw embeddings again (the rerank joins them back by nid).
    *
    * Determinism: Hamming ties (common at 32 bits) break on nid ASC;
    * the rerank's exact-cosine ties break on nid ASC — both totally
    * ordered on every engine.
    */
  def srpHammingTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      mult: Int = 4, nPlanes: Int = 32, dim: Int = 64): DataFrame = {
    require(k >= 1 && mult >= 1, s"k and mult must be >= 1, got $k, $mult")
    // Two scale lessons the --srp-only ladder taught, both baked in:
    // (1) codes-only through the Hamming scan and its shortlist sort —
    // the first cut carried BOTH embeddings through the |corpus|·|q|-row
    // sort (~550 bytes/row, 70 GB of sorter traffic at the 16M rung);
    // with (qid, nid, hamming) rows the sort moves ~24 bytes/row and
    // raw vectors are touched again only for the ≤ |q|·k·mult shortlist
    // (the q118 rerank discipline). (2) the code frame is MATERIALIZED
    // before the join — left lazy, the 62-dot projection fuses under
    // the BroadcastNestedLoopJoin, which is not whole-stage-codegen'd,
    // so every dot runs INTERPRETED (measured ~170 s for 100k rows vs
    // ~1 s codegen'd); materializing 16-byte (nid, ncode) rows is also
    // the honest at-rest design — codes are an index artifact computed
    // once, not per query batch.
    Iterate.loop(corpus.sparkSession) { l =>
      val qc = l.pin(queries.select(col("id").as("qid"),
        VectorFunctions.srpCode(col("embedding"), nPlanes, dim).as("qcode")))
      val cc = l.pin(corpus.select(col("id").as("nid"),
        VectorFunctions.srpCode(col("embedding"), nPlanes, dim).as("ncode")))
      val wh = Window.partitionBy("qid")
        .orderBy(col("hamming").asc, col("nid").asc)
      val cand = broadcast(qc).crossJoin(cc)
        .filter(col("qid") =!= col("nid"))
        .withColumn("hamming", expr("bit_count(qcode ^ ncode)").cast("long"))
        .select("qid", "nid", "hamming")
        .withColumn("__hrank", row_number().over(wh))
        .filter(col("__hrank") <= k * mult)
      val w = Window.partitionBy("qid")
        .orderBy(col("cosine").desc, col("nid").asc)
      l.finish(cand
        .join(corpus.select(col("id").as("nid"), col("embedding").as("ne")), "nid")
        .join(broadcast(queries.select(col("id").as("qid"),
          col("embedding").as("qe"))), "qid")
        .withColumn("cosine",
          VectorExpressions.cosineNative(col("qe"), col("ne")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("qid", "nid", "hamming", "cosine", "rank"))
    }
  }

  /** One struct per centroid, ranking by squared-l2-equivalent distance:
    * argmin_c ‖x−c‖² = argmin_c (‖c‖² − 2·x·c), so per centroid we emit
    * struct(‖c‖² − 2·x·c AS d, cid) — one fused codegen'd dot per centroid,
    * ties broken by smaller cid via struct ordering.
    */
  private def centroidRanks(cents: Seq[(Long, Array[Float])], vec: Column): Column =
    array(cents.map { case (cid, ce) =>
      val normSq = ce.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      struct(
        (lit(normSq) - lit(2.0) * VectorExpressions.dotNative(vec, lit(ce))).as("d"),
        lit(cid).as("cid"))
    }: _*)

  /** Deterministic coarse-quantizer init: `nCentroids` pseudo-randomly
    * sampled corpus vectors (hash-ordered — no RNG state), collected once
    * to the driver. The model is driver-sized by definition.
    */
  def sampleCentroids(corpus: DataFrame, nCentroids: Int): Seq[(Long, Array[Float])] =
    corpus
      .select(col("id"), col("embedding"))
      .orderBy(xxhash64(col("id")).asc)
      .limit(nCentroids)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq

  /** [[sampleCentroids]] with an md5-based pseudo-random order — same
    * determinism, but reproducible by any engine with md5 (the q56 IVF
    * oracle recomputes the identical centroid set in SQL).
    */
  def sampleCentroidsPortable(corpus: DataFrame, nCentroids: Int): Seq[(Long, Array[Float])] =
    corpus
      .select(col("id"), col("embedding"))
      .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
      .limit(nCentroids)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq

  /** Lloyd refinement of the coarse quantizer: each round assigns every
    * vector to its nearest centroid (pure-projection literal argmin — no
    * shuffle) and recomputes per-cell means with ONE aggregation keyed on
    * (cell, dim-position); only k·dim averages come back to the driver per
    * round. Empty cells keep their previous centroid. The k-means
    * objective (within-cluster sum of squares) is non-increasing per
    * round — the spec asserts exactly that invariant.
    */
  def kmeansRefine(corpus: DataFrame, init: Seq[(Long, Array[Float])],
      iters: Int): Seq[(Long, Array[Float])] = {
    var cs = init
    for (_ <- 0 until iters) {
      val means = corpus
        .select(col("embedding"),
          array_min(centroidRanks(cs, col("embedding"))).getField("cid").as("cell"))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg("x").as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat)
        }
      cs = cs.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cs
  }

  /** Mean squared distance to the assigned centroid — the k-means
    * objective, for convergence checks and quantizer quality monitoring.
    */
  def quantizerMse(corpus: DataFrame, cents: Seq[(Long, Array[Float])]): Double =
    corpus
      .select(array_min(centroidRanks(cents, col("embedding"))).getField("d").as("d"),
        VectorExpressions.dotNative(col("embedding"), col("embedding")).as("xx"))
      // centroidRanks.d = ‖c‖² − 2·x·c, so true ‖x−c‖² = d + ‖x‖²
      .agg(avg(col("d") + col("xx")))
      .head().getDouble(0)

  /** IVF-style ANN: a coarse quantizer of `nCentroids` deterministically
    * sampled vectors (optionally Lloyd-refined with `refineIters` rounds)
    * partitions the corpus into cells; queries probe the `nProbe` nearest
    * cells and only score candidates there. Better recall than sign-bit
    * LSH when the data is clustered; the corpus is shuffled exactly once
    * (on the candidates join key) — assignment is a pure per-row argmin
    * over plan-time literal centroids.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, refineIters: Int = 0,
      centroids: Option[Seq[(Long, Array[Float])]] = None): DataFrame = {
    val cents0 = centroids.getOrElse(sampleCentroids(corpus, nCentroids))
    val cents = if (refineIters > 0) kmeansRefine(corpus, cents0, refineIters) else cents0
    val assigned = corpus.select(
      col("id").as("nid"), col("embedding").as("ne"),
      array_min(centroidRanks(cents, col("embedding"))).getField("cid").as("cell"))
    val probes = queries
      .select(col("id").as("qid"), col("embedding").as("qe"),
        explode(slice(array_sort(centroidRanks(cents, col("embedding"))), 1, nProbe)).as("pc"))
      .select(col("qid"), col("qe"), col("pc.cid").as("cell"))
    val scored = broadcast(probes).join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", VectorExpressions.cosineNative(col("qe"), col("ne")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cell", "nid", "cosine", "rank")
  }

  /** Persist the corpus as a CELL-PARTITIONED parquet vector store —
    * hive partition column = the frozen quantizer's cell id — the
    * AT-REST form of the IVF index. An IVF search's probed cells then
    * become PARTITION PRUNING at the scan: unprobed cells' files are
    * never opened (zero I/O, not merely zero compute). At 100 TB the
    * vector store is the dominant byte volume and nProbe/k of it is
    * what a search should READ — this layout is what makes that true
    * on disk, the same argument as the term-partitioned compacted
    * inverted index ([[graft.streaming.IndexMaintenance]]).
    */
  def writeCellStore(corpus: DataFrame,
      centroids: Seq[(Long, Array[Float])], path: String): Unit =
    assignCellsLiteral(corpus.select(col("id"), col("embedding")), centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** IVF top-k over a [[writeCellStore]] store: probe cells come from
    * the SAME frozen centroids ([[centroidRanks]], plan-time literals),
    * and the UNION of probed cells lands in the scan as one literal
    * `isin` — a PartitionFilter, so pruning happens at file-listing
    * time (per-query routing stays the cell equi-join). The probe-cell
    * collect is ≤ |q|·nProbe longs — queries are the broadcast-sized
    * side by the [[ivfTopK]] contract. Results are identical to
    * [[ivfTopK]] over the same corpus + centroids (spec-pinned): the
    * store changes WHERE bytes live, never what the search returns.
    */
  def searchCellStore(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nProbe: Int, cents: Seq[(Long, Array[Float])]): DataFrame = {
    val probes = queries
      .select(col("id").as("qid"), col("embedding").as("qe"),
        explode(slice(array_sort(centroidRanks(cents, col("embedding"))),
          1, nProbe)).as("pc"))
      .select(col("qid"), col("qe"), col("pc.cid").as("cell"))
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val store = spark.read.parquet(path)
      .filter(col("cell").isin(probedCells: _*))
      .select(col("id").as("nid"), col("embedding").as("ne"), col("cell"))
    val scored = broadcast(probes).join(store, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", VectorExpressions.cosineNative(col("qe"), col("ne")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cell", "nid", "cosine", "rank")
  }

  /** Delete vectors from a [[writeCellStore]] store by id — the
    * targeted PHYSICAL rewrite (VERDICT r12 #1): only the cells that
    * actually contain a deleted id are rewritten; every other cell's
    * files are never opened for writing (and the locating scan reads
    * only the (id, cell) columns — column-pruned, partition-wide).
    * Steps:
    *
    *  1. locate affected cells: semi-join (id, cell) against the
    *     deleted ids, collect the ≤|cells| distinct cell ids;
    *  2. one dynamic-partition-overwrite write of the affected cells'
    *     SURVIVING rows — the scan carries `cell IN (...)` as a
    *     PartitionFilter, so unaffected cells contribute zero I/O;
    *  3. cells left EMPTY by the deletion (dynamic overwrite never
    *     touches a partition absent from the output) have their
    *     directories removed explicitly.
    *
    * The quantizer stays frozen (cell assignment is per-vector and
    * independent), so the post-delete store is row-identical to
    * [[writeCellStore]] over the surviving corpus with the same
    * centroids — q205's rebuild oracle pins it. Returns the number of
    * cells rewritten or removed.
    */
  def deleteFromCellStore(spark: SparkSession, path: String,
      ids: DataFrame, idCol: String = "id"): Long = {
    val del = ids.select(col(idCol).as("__del_id")).distinct()
    val store = spark.read.parquet(path)
    val affected = store.select(col("id"), col("cell"))
      .join(del, col("id") === col("__del_id"), "left_semi")
      .select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (affected.isEmpty) return 0L
    // eager materialization BEFORE the overwrite (the repo's
    // read-then-overwrite discipline): survivors lazily reads the very
    // parquet path the write below replaces, and persist() alone would
    // leave correctness resting on dynamic-overwrite staging order.
    // Checkpoint blocks live OUTSIDE the cache manager, so they are
    // released by the frame's OWN handle once both consumers have run
    // (Eager — a registry-keySet diff here would capture a concurrent
    // query's RDDs, ADVICE r14)
    val (survivors, releaseSurvivors) = graft.operators.Eager.checkpoint(
      store
        .filter(col("cell").isin(affected: _*))
        .join(del, col("id") === col("__del_id"), "left_anti"))
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(path)
    val nonEmpty = survivors.select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    releaseSurvivors()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.filterNot(nonEmpty).foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/cell=$c"), true)
    }
    affected.length.toLong
  }

  /** Auto-scaled centroid count for [[semanticDedup]]: k = ⌈√n⌉ (≥ 1),
    * UNCLAMPED. SemDeDup's candidate volume is Σ|cell|² — with a FIXED
    * k it is quadratic in corpus size no matter how good the quantizer
    * is (the paper runs 10⁴–10⁵ clusters for billions of docs for exactly
    * this reason); k ∝ √n keeps expected cell size ≈ √n and candidate
    * volume ≈ n^1.5 at EVERY scale. How the k centroids are ASSIGNED is
    * a dispatch concern, not a rule concern: up to
    * [[LiteralAssignLimit]] they ship as plan-time literals
    * ([[centroidRanks]], shuffle-free); beyond it (n > ~10⁶ docs)
    * [[semanticDedup]] routes through [[assignCellsJoin]]'s
    * broadcast-join argmin — same ‖c‖²−2·x·c rule, one map-side-collapsed
    * exchange. (Before r11 the AUTO path clamped at 1024, so expected
    * cell size grew linearly again past ~10⁶ docs and the cellCap
    * sub-split started costing recall; the clamp was the dispatch limit
    * leaking into the scaling rule.)
    */
  def autoCentroids(n: Long): Int =
    math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Largest centroid count assigned via plan-time literals; beyond it
    * [[semanticDedup]] switches to the broadcast-join argmin.
    */
  val LiteralAssignLimit = 1024

  /** Literal-path cell assignment — the public face of the
    * [[centroidRanks]] argmin: (id, embedding, cell) with centroids as
    * plan-time literals, a PURE STATELESS PROJECTION (no join, no
    * shuffle, no state) — which is what makes it legal on a structured
    * STREAM ([[graft.streaming.SemanticStream]] assigns arriving
    * vectors with it). Capped at [[LiteralAssignLimit]]; beyond that
    * use [[assignCellsJoin]] (batch-only: it aggregates).
    */
  def assignCellsLiteral(corpus: DataFrame,
      cents: Seq[(Long, Array[Float])]): DataFrame = {
    require(cents.nonEmpty, "assignCellsLiteral needs at least one centroid")
    require(cents.size <= LiteralAssignLimit,
      s"${cents.size} centroids exceed the literal-assignment limit " +
        s"$LiteralAssignLimit — use assignCellsJoin")
    corpus.select(col("id"), col("embedding"),
      array_min(centroidRanks(cents, col("embedding"))).getField("cid").as("cell"))
  }

  /** Cell assignment via a broadcast centroid JOIN — the beyond-
    * [[LiteralAssignLimit]] path: the same ‖c‖² − 2·x·c argmin with the
    * same smallest-cid tie-break, but centroids live in a broadcast
    * FRAME instead of the plan, so k scales to real SemDeDup cluster
    * counts (10⁴–10⁵) without growing a codegen expression. Cost
    * relative to the literal path: the corpus crosses ONE argmin
    * exchange — each vector's k candidate rows collapse map-side
    * (partial `min(struct)`, broadcast join never shuffles the corpus)
    * to a single row before it. Spec-pinned cell-identical to the
    * literal path.
    *
    * Output: (id, embedding, cell) — [[semanticDedup]]'s assignment
    * contract.
    */
  def assignCellsJoin(corpus: DataFrame,
      cents: Seq[(Long, Array[Float])]): DataFrame = {
    require(cents.nonEmpty, "assignCellsJoin needs at least one centroid")
    val spark = corpus.sparkSession
    import spark.implicits._
    val centFrame = cents.map { case (cid, ce) =>
      val normSq = ce.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      (cid, ce.toSeq, normSq)
    }.toDF("__cid", "__ce", "__cnorm")
    corpus.select(col("id"), col("embedding"))
      .join(broadcast(centFrame))
      .select(col("id"), col("embedding"),
        struct(
          (col("__cnorm") - lit(2.0) *
            VectorExpressions.dotNative(col("embedding"), col("__ce"))).as("d"),
          col("__cid").as("cid")).as("__rank"))
      .groupBy("id")
      .agg(first("embedding").as("embedding"),
        min(col("__rank")).getField("cid").as("cell"))
  }

  /** Embedding-distribution DRIFT via frozen-cell occupancy — the
    * population-stability pattern lifted to embedding space: assign two
    * corpus snapshots to the SAME frozen coarse cells (fit once, e.g.
    * on the reference snapshot via [[sampleCentroidsPortable]]) and
    * compare per-cell population shares in basis points. A new crawl
    * whose topical mix shifted shows up as mass moving between cells
    * long before any per-dimension moment moves — the embedding
    * analogue of the q99 source-mix drift report.
    *
    * Scale shape: assignment is the pure-projection literal argmin (or
    * the broadcast-join argmin past [[LiteralAssignLimit]] — same
    * dispatch as [[semanticDedup]]); each snapshot collapses to ≤k
    * count rows map-side before any join, and everything after is
    * ≤k-row arithmetic. Exact integer shares (`·10⁴ div total`), so
    * the report replays bit-identically on any engine.
    *
    * Output: (cell, n_a, n_b, share_bp_a, share_bp_b, delta_bp), one
    * row per centroid (cells empty on both sides included — an
    * emptied-out cell IS drift signal).
    */
  def cellOccupancyDrift(a: DataFrame, b: DataFrame,
      cents: Seq[(Long, Array[Float])]): DataFrame = {
    require(cents.nonEmpty, "cellOccupancyDrift needs at least one centroid")
    val spark = a.sparkSession
    import spark.implicits._
    val assign: DataFrame => DataFrame =
      if (cents.size <= LiteralAssignLimit) assignCellsLiteral(_, cents)
      else assignCellsJoin(_, cents)
    def counts(df: DataFrame, as: String) =
      assign(df).groupBy("cell").agg(count(lit(1)).as(as))
    val joined = cents.map(_._1).toDF("cell")
      .join(counts(a, "__na"), Seq("cell"), "left")
      .join(counts(b, "__nb"), Seq("cell"), "left")
      .select(col("cell"), coalesce(col("__na"), lit(0L)).as("n_a"),
        coalesce(col("__nb"), lit(0L)).as("n_b"))
    val tot = joined.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"))
    joined.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_a"), col("n_b"),
        expr("(n_a * 10000) div greatest(__ta, 1)").as("share_bp_a"),
        expr("(n_b * 10000) div greatest(__tb, 1)").as("share_bp_b"),
        abs(expr("(n_a * 10000) div greatest(__ta, 1)") -
          expr("(n_b * 10000) div greatest(__tb, 1)")).as("delta_bp"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space with the coarse quantizer, then drop —
    * WITHIN each cluster only — every vector that has ANY smaller-id
    * neighbor at cosine ≥ `tau`. This is the paper's upper-triangular
    * rule, decided by one self-join: a vector is dropped even when that
    * smaller-id neighbor was itself dropped, so along a chain A~B, B~C,
    * A≁C only A survives (true greedy-against-kept would also keep C;
    * near-dup sets are near-cliques in practice so the two rarely
    * differ, and the one-join rule needs no iterative propagation —
    * contrast [[graft.operators.Dedup.dedupByPairs]], the
    * connected-components policy used when pairs are verified near-dups
    * from text).
    *
    * Scale shape: assignment is the pure-projection literal-centroid
    * argmin (no shuffle); `nCentroids = 0` (the default) auto-scales the
    * quantizer with the corpus ([[autoCentroids]], k ≈ √n) so candidate
    * volume grows ~n^1.5, never n² — a fixed k is quadratic by
    * construction. Degenerate cells (a mega-cluster of near-identical
    * web pages the quantizer can't separate — many sampled centroids
    * land inside it and still each inherit O(n) members) are bounded by
    * `cellCap`: every cell is deterministically sub-split into
    * ⌈size/cellCap⌉ sub-cells by md5 id-hash (identity for cells within
    * the cap — one sub-cell), and candidates pair only within a
    * sub-cell. The documented trade: near-dup pairs STRADDLING sub-cells
    * of an over-cap cell are not compared (recall loss confined to
    * degenerate cells, where members are near-identical and transitively
    * caught through same-sub-cell representatives in practice), in
    * exchange for a hard O(cellCap) bound on any cell's per-task pair
    * work. The split runs unconditionally so an oracle can replay it as
    * plain SQL with no conditional branch.
    *
    * Exchanges: one broadcast of the ≤k-row cell-size table, one
    * (cell, subcell) repartition shared by both self-join sides.
    *
    * Output: (id, cell, kept) for every input vector.
    */
  def semanticDedup(corpus: DataFrame, tau: Double, nCentroids: Int = 0,
      centroids: Option[Seq[(Long, Array[Float])]] = None,
      cellCap: Int = 4096): DataFrame = {
    val assigned = assignedSubcells(corpus, nCentroids, centroids, cellCap)
    val dropped = subcellPairs(assigned, tau)
      .select(col("id_b").as("id")).distinct()
    assigned
      .join(dropped.withColumn("__dropped", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(col("__dropped"), lit(false)).unary_!.as("kept"))
  }

  /** The [[semanticDedup]] candidate structure as PAIRS — for the
    * cluster-then-keep-BEST policy ([[graft.operators.Dedup
    * .dedupByPairsBest]]) instead of the upper-triangular drop: returns
    * every within-(cell, subcell) pair at cosine ≥ `tau` with
    * `id_a < id_b`. Same auto-scaled quantizer, same cellCap sub-split,
    * same ~n^1.5 candidate bound; the caller owns the cluster policy.
    */
  def semanticNearDupPairs(corpus: DataFrame, tau: Double,
      nCentroids: Int = 0,
      centroids: Option[Seq[(Long, Array[Float])]] = None,
      cellCap: Int = 4096): DataFrame =
    subcellPairs(assignedSubcells(corpus, nCentroids, centroids, cellCap), tau)

  /** Shared assignment stage: cells from the (auto-scaled) coarse
    * quantizer, deterministically sub-split at `cellCap`, repartitioned
    * on (cell, subcell) so both self-join sides reuse one exchange.
    */
  private def assignedSubcells(corpus: DataFrame, nCentroids: Int,
      centroids: Option[Seq[(Long, Array[Float])]],
      cellCap: Int): DataFrame = {
    require(cellCap > 0, s"cellCap must be positive, got $cellCap")
    val cents = centroids.getOrElse {
      val k = if (nCentroids > 0) nCentroids else autoCentroids(corpus.count())
      sampleCentroidsPortable(corpus, k)
    }
    val sized =
      if (cents.size <= LiteralAssignLimit) assignCellsLiteral(corpus, cents)
      else assignCellsJoin(corpus, cents)
    val sizes = sized.groupBy("cell").agg(count(lit(1)).as("__sz"))
    sized.join(broadcast(sizes), Seq("cell"))
      .withColumn("subcell",
        pmod(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long"),
          ceil(col("__sz").cast("double") / cellCap).cast("long")))
      .drop("__sz")
      .repartition(col("cell"), col("subcell"))
  }

  /** Within-(cell, subcell) cosine-threshold pairs, id_a < id_b. */
  private def subcellPairs(assigned: DataFrame, tau: Double): DataFrame = {
    val a = assigned.as("a")
    val b = assigned.as("b")
    a.join(b,
        col("a.cell") === col("b.cell") &&
        col("a.subcell") === col("b.subcell") && col("a.id") < col("b.id") &&
        VectorExpressions.cosineNative(col("a.embedding"), col("b.embedding")) >= tau)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH-blocked:
    * the dedup formulation of similarity search (pairs, not top-k).
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    // one exchange on the bucket key shared by both self-join sides (the
    // two sides are identical subtrees; without the exchange each would
    // re-run the scan + hyperplane projection)
    val b = df.select(col("id"), col("embedding"),
      VectorFunctions.lshBucket(col("embedding"), nPlanes, dim).as("bucket"))
      .repartition(col("bucket"))
    val a = b.as("a")
    val c = b.as("b")
    a.join(c, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine", VectorExpressions.cosineNative(col("a.embedding"), col("b.embedding")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  /** Per-label centroids in exact integer micro-units — the model half
    * of Rocchio nearest-centroid classification (Manning, Raghavan &
    * Schütze ch. 14), the standard cheap pseudo-labeler a curation
    * pipeline uses to propagate a small labeled set over an unlabeled
    * corpus. Each component is quantized to micro-units BEFORE
    * aggregation (the q105 convention — floor(v·10⁶ + 0.5), exact on
    * any engine) and the centroid component is the truncating integer
    * division `Σu div n` — so the model is bit-portable, no float mean
    * ever materializes.
    *
    * Scale shape: posexplode + one hash aggregate on (label, pos) —
    * partial aggregation collapses each map partition to
    * |labels|·dim rows before the shuffle — then |labels| rows out.
    *
    * Output: (label, cu: array<long>) — one row per label present in
    * `train`, components ordered by position.
    */
  def labelCentroidsMicro(train: DataFrame, labelCol: String,
      vecCol: String): DataFrame =
    train.select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * 1e6 + 0.5).cast("long"))
        .as("su"), count(lit(1)).as("n"))
      .withColumn("cu", expr("su div n"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cu)))," +
        " s -> s.cu)").as("cu"))

  /** Assign every vector to its nearest [[labelCentroidsMicro]] centroid
    * by exact integer squared L2 in micro-units — the apply half of the
    * pseudo-labeler. The whole ≤|labels|-row model rides ONE broadcast
    * row (an array of (label, centroid) structs); the argmin is a pure
    * higher-order-function projection — `array_min` over per-centroid
    * (d2, label) structs, so ties break to the smaller label — with NO
    * join explosion, NO window, NO shuffle of the corpus: pure
    * scan-rate work at any corpus size. Exact while
    * dim·(2·10⁶·max|v|)² < 2⁶³ — e.g. 64 dims at |v| ≤ 150.
    *
    * Adds `pred_label` and `d2` (micro² squared distance).
    */
  def nearestCentroidAssign(vecs: DataFrame, centroids: DataFrame,
      vecCol: String): DataFrame = {
    val one = centroids
      .agg(collect_list(struct(col("label"), col("cu"))).as("__cents"))
    vecs.crossJoin(broadcast(one))
      .withColumn("__xu", expr(s"transform($vecCol, v -> " +
        "cast(floor(cast(v as double) * 1000000.0 + 0.5) as bigint))"))
      .withColumn("__best", expr(
        "array_min(transform(__cents, c -> struct(" +
          "aggregate(zip_with(__xu, c.cu, (a, b) -> (a - b) * (a - b)), " +
          "cast(0 as bigint), (acc, v) -> acc + v) as d2, " +
          "c.label as label)))"))
      .withColumn("pred_label", col("__best.label"))
      .withColumn("d2", col("__best.d2"))
      .drop("__cents", "__xu", "__best")
  }

  /** Pairwise cosine between per-label centroids — the class
    * CONFUSABILITY matrix: which label pairs occupy the same region of
    * embedding space. The aggregate-level complement of q147's per-vector
    * confusion matrix (a high-cosine centroid pair predicts where the
    * pseudo-labeler bleeds) and the label-space twin of q132's
    * per-source embedding PSI.
    *
    * Arithmetic: centroids come from [[labelCentroidsMicro]] (exact
    * BIGINT micro-unit means), the dot product and both squared norms
    * are exact BIGINT sums over the ≤|labels|·dim relational centroid
    * frame, and only the final `dot / (√na·√nb)` runs in doubles — all
    * exactly-rounded IEEE ops on exact integer inputs, so both engines
    * produce the identical `floor(·10⁶ + 0.5)` micro-cosine. A
    * zero-norm centroid (a label whose mean rounds to the origin)
    * reports cos_u 0 rather than a NaN.
    *
    * Shape: ONE corpus-sized exchange (the centroid fit's
    * (label, pos) aggregate, inside [[labelCentroidsMicro]]); the
    * centroid frame is materialized once for its three consumers
    * (both pair sides + the norms) and every downstream join is keyed
    * or broadcast — |labels|²/2 result rows, never a corpus product.
    *
    * Output: (label_a, label_b, dot, cos_u), label_a < label_b.
    */
  def centroidCosineMatrix(vecs: DataFrame, labelCol: String,
      vecCol: String): DataFrame =
    Iterate.loop(vecs.sparkSession) { l =>
      val pos = l.pin(labelCentroidsMicro(vecs, labelCol, vecCol)
        .select(col("label"), posexplode(col("cu")))
        .withColumnRenamed("col", "u"))
      val norms = pos.groupBy("label")
        .agg(sum(col("u") * col("u")).as("n2"))
      val pairs = pos
        .select(col("label").as("label_a"), col("pos"), col("u").as("ua"))
        .join(pos.select(col("label").as("label_b"), col("pos"),
          col("u").as("ub")), "pos")
        .where(col("label_a") < col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(sum(col("ua") * col("ub")).as("dot"))
      l.finish(pairs
        .join(broadcast(norms.select(col("label").as("label_a"),
          col("n2").as("na"))), "label_a")
        .join(broadcast(norms.select(col("label").as("label_b"),
          col("n2").as("nb"))), "label_b")
        .select(col("label_a"), col("label_b"), col("dot"),
          when(col("na") > 0L && col("nb") > 0L,
            floor(col("dot").cast("double") /
              (sqrt(col("na").cast("double")) *
                sqrt(col("nb").cast("double"))) * 1e6 + 0.5).cast("long"))
            .otherwise(0L).as("cos_u")))
    }

  /** Margin-based uncertainty sampling (Lewis & Gale, SIGIR'94; Settles,
    * "Active Learning Literature Survey", 2009 §3.1): the k vectors
    * whose nearest-centroid decision is CLOSEST — smallest gap between
    * the best and second-best centroid distances — are where a labeling
    * budget buys the most. The active-learning face of the q147
    * pseudo-labeler: q147 spreads labels, this picks what a human
    * should label next.
    *
    * Same execution shape as [[nearestCentroidAssign]]: the whole
    * ≤|labels|-row centroid model rides ONE broadcast row; per vector a
    * single higher-order-function projection computes every centroid
    * distance in exact micro² BIGINT, `array_sort` over (d2, label)
    * structs picks best and runner-up (ties to the smaller label on
    * both engines), and only the (margin, id)-ordered top-k leaves the
    * scan — a TakeOrdered, never a global sort. Requires ≥ 2 labels.
    *
    * Output: (idCol, label, pred_label, second_label, d2_best,
    * d2_second, margin), ordered margin asc / id asc, k rows.
    */
  def uncertaintyMarginTopK(vecs: DataFrame, idCol: String,
      labelCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    Iterate.loop(vecs.sparkSession) { l =>
      l.finish(centroidDecisionFrame(l, vecs, idCol, labelCol, vecCol)
        .orderBy(col("margin").asc, col(idCol).asc)
        .limit(k))
    }
  }

  /** Confident-label-noise detection (the margin form of Northcutt et
    * al., "Confident Learning", JAIR 2021): the k vectors whose
    * assigned label DISAGREES with the nearest centroid by the WIDEST
    * margin — deep inside another class's region, confidently
    * mislabeled rather than merely ambiguous. The complement of
    * [[uncertaintyMarginTopK]]: that op surfaces what a human should
    * label NEXT, this one what a human should RE-label first; together
    * they are the label-hygiene loop over the q147 pseudo-labeler's
    * geometry.
    *
    * Same broadcast-model HOF scan; the disagreement filter runs
    * map-side before the TakeOrdered, so only ≤k rows ever leave.
    *
    * Output: (idCol, label, pred_label, second_label, d2_best,
    * d2_second, margin), ordered margin desc / id asc, ≤k rows.
    */
  def labelNoiseTopK(vecs: DataFrame, idCol: String,
      labelCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    Iterate.loop(vecs.sparkSession) { l =>
      l.finish(centroidDecisionFrame(l, vecs, idCol, labelCol, vecCol)
        .where(col("label") =!= col("pred_label"))
        .orderBy(col("margin").desc, col(idCol).asc)
        .limit(k))
    }
  }

  /** Per-vector nearest-centroid decision record shared by
    * [[uncertaintyMarginTopK]] and [[labelNoiseTopK]]: best and
    * second-best centroid by exact micro² L2 (array_sort over
    * (d2, label) structs — ties to the smaller label) plus the margin
    * between them. The ≤|labels|-row model is pinned on the caller's
    * loop and rides one broadcast row; everything else is a map-side
    * projection.
    */
  private def centroidDecisionFrame(l: Iterate.Loop, vecs: DataFrame,
      idCol: String, labelCol: String, vecCol: String): DataFrame = {
    val cents = l.pin(labelCentroidsMicro(vecs, labelCol, vecCol))
    // the "Requires >= 2 labels" doc contract, ENFORCED: with one label
    // __d[1] is null, so second_label/margin go null and rows sort
    // nulls-first into the top-k (or crash callers on getLong) instead
    // of failing clearly (ADVICE r12). The pinned frame is ≤|labels|
    // rows — the count is free.
    require(cents.count() >= 2,
      "uncertaintyMarginTopK/labelNoiseTopK need >= 2 distinct labels " +
        "(margin is the best-vs-second-centroid gap)")
    val one = cents
      .agg(collect_list(struct(col("label"), col("cu"))).as("__cents"))
    vecs.crossJoin(broadcast(one))
      .withColumn("__xu", expr(s"transform($vecCol, v -> " +
        "cast(floor(cast(v as double) * 1000000.0 + 0.5) as bigint))"))
      .withColumn("__d", expr(
        "array_sort(transform(__cents, c -> struct(" +
          "aggregate(zip_with(__xu, c.cu, (a, b) -> (a - b) * (a - b)), " +
          "cast(0 as bigint), (acc, v) -> acc + v) as d2, " +
          "c.label as label)))"))
      .select(col(idCol), col(labelCol).as("label"),
        expr("__d[0].label").as("pred_label"),
        expr("__d[1].label").as("second_label"),
        expr("__d[0].d2").as("d2_best"),
        expr("__d[1].d2").as("d2_second"))
      .withColumn("margin", col("d2_second") - col("d2_best"))
  }
}
