package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top principal component of an embedding collection by POWER ITERATION
  * (von Mises & Pollaczek-Geiringer 1929; PCA per Pearson 1901) — the
  * direction of maximum variance, the building block of embedding
  * whitening/compression diagnostics (a collection whose mass collapses
  * onto few directions is exactly where PQ codebooks and cosine scores
  * degrade — see the r10 ADC ladder's clustered-vs-uniform gap).
  *
  * All arithmetic is EXACT INTEGER so any engine, any partitioning, any
  * iteration order replays bit-identically (the PageRank/HITS
  * discipline, applied to linear algebra):
  *  - embeddings quantize once to milli-units
  *    (`xq_i = floor(x_i·10³ + 0.5)` BIGINT);
  *  - the matvec runs in two exact steps per iteration: per-row score
  *    `s = Σ_i xq_i·v_i` (a fold over one array — order-free), then
  *    per-dimension `w_i = Σ_rows (xq_i·s) div 1024` — the div-1024
  *    damping is applied PER ROW (deterministic under any partitioning)
  *    and keeps the running sums inside 2⁶³;
  *  - renormalization `v'_i = (w_i·10³) div max(|w|)` pins ‖v‖∞ at 10³
  *    milli-units.
  *
  * Only the 64-element `v` crosses the driver between iterations (the
  * bounded-collect convention of the ADC LUT builds: O(dim), never
  * O(rows)). Overflow bound: with |x| ≤ 8 (milli 8·10³) and dim 64,
  * per-row |xq_i·s| div 1024 ≤ ~2·10⁹, so the per-dimension sum is
  * exact to ~4·10⁹ rows; past that raise the damping shift.
  *
  * Scale shape: one quantization scan (cached across iterations), per
  * iteration one map-side fold for `s` and one posexplode +
  * hash-aggregate into ≤ dim rows (partial aggregation collapses each
  * partition to dim rows before the shuffle). Nothing corpus-sized ever
  * sits in one task.
  */
object Pca {

  private def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  /** (id, xq array<bigint>) — embeddings quantized to exact milli-units. */
  def quantized(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("id"),
      expr(s"transform($vecCol, e -> " +
        "CAST(floor(CAST(e AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))").as("xq"))

  /** The shared power-iteration loop over a prepared (id, xq) frame —
    * the caller owns the frame's lifecycle (persist/unpersist).
    */
  private def iterate(q: DataFrame, iters: Int): Array[Long] = {
    val dim = q.select(size(col("xq"))).first().getInt(0)
    var v = Array.fill(dim)(1000L)
    for (_ <- 1 to iters) {
      val w = q
        .withColumn("s", dotLong(col("xq"), typedLit(v.toSeq)))
        .select(posexplode(col("xq")).as(Seq("i", "e")), col("s"))
        .groupBy("i").agg(sum(expr("(e * s) div 1024")).as("w"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val mx = math.max(v.indices.map(i => math.abs(w.getOrElse(i, 0L))).max, 1L)
      v = v.indices.map(i => w.getOrElse(i, 0L) * 1000L / mx).toArray
    }
    v
  }

  /** The top component after `iters` power iterations, as a milli-unit
    * integer vector (‖v‖∞ = 1000; sign follows the iteration from the
    * all-ones start — deterministic, not canonicalized). Driver-side
    * result is O(dim).
    */
  def topComponentVector(corpus: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Long] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val q = quantized(corpus, idCol, vecCol).persist()
    try iterate(q, iters) finally q.unpersist()
  }

  /** The SECOND principal direction by exact deflation then power
    * iteration (Hotelling deflation): with v₁ fixed, every row projects
    * to its orthogonal residual `r = ‖v₁‖²·x − (x·v₁)·v₁` — exact
    * BIGINT, and EXACTLY orthogonal (r·v₁ = 0 with no rounding, because
    * the projection is scaled by ‖v₁‖² instead of divided by it) — then
    * scales back by an elementwise `div ‖v₁‖²` so the residual frame
    * re-enters the iteration at the original milli-unit magnitude (the
    * one truncation in the pipeline, per-element and
    * partitioning-independent). Power iteration on the residuals
    * converges to the second component.
    *
    * Returns (v1, v2) — both milli-unit integer vectors. The residual
    * truncation means v2 is the exact second component of the TRUNCATED
    * residual frame (the oracle replays the same truncation); its
    * alignment with v₁ is near-zero but not identically zero, which
    * [[secondComponentWithAlignment]] surfaces as a row.
    */
  def deflatedComponents(corpus: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): (Array[Long], Array[Long]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // the result is driver-side — every frame this builds (including
    // the residual checkpoint, which used to linger) must release
    Iterate.loop(corpus.sparkSession) { l =>
      val q = quantized(corpus, idCol, vecCol).persist()
      try {
        val v1 = iterate(q, iters)
        val vn = v1.foldLeft(0L)((acc, x) => acc + x * x)
        val v1Sql = s"array(${v1.mkString("L,") + "L"})"
        val r = l.pin(q
          .withColumn("s", dotLong(col("xq"), typedLit(v1.toSeq)))
          .select(col("id"),
            expr(s"zip_with(xq, $v1Sql, (x, v) -> ($vn * x - s * v) div $vn)")
              .as("xq")))
        val v2 = iterate(r, iters)
        l.releaseAll()
        (v1, v2)
      } finally q.unpersist()
    }
  }

  /** (kind, key, value) frame: 64 'component2' rows (the deflated
    * second direction, milli-units) plus one 'alignment' row — the
    * exact integer dot v₁·v₂, whose smallness certifies the deflation
    * (≈0; bounded by the residual truncation, not by float noise).
    */
  def secondComponentWithAlignment(corpus: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (v1, v2) = deflatedComponents(corpus, iters, idCol, vecCol)
    val align = v1.zip(v2).foldLeft(0L) { case (acc, (a, b)) => acc + a * b }
    (v2.zipWithIndex.map { case (vi, i) => ("component2", (i + 1).toLong, vi) }
      :+ (("alignment", 0L, align))).toSeq
      .toDF("kind", "key", "value")
      .orderBy(col("kind"), col("key"))
  }

  /** Explained-variance ratios for the top-2 components — the "is this
    * embedding space compressible" readout that decides PQ subspace
    * budgets (q106/q124) and whether IVF cells will be anisotropic:
    * per component, the energy captured along the axis over the total
    * energy, in exact basis points. UNCENTERED, matching the power
    * iteration's own convention (the matvec runs on raw milli-units) —
    * both ratios measure against the same total, and v₂'s ratio is
    * computed against the ORIGINAL vectors (its residual-truncation
    * misalignment with v₁ is bounded and tiny, q160's alignment row).
    *
    * All integer: per-vector projection energy `s² div ‖v‖²` (divide
    * BEFORE the corpus sum — the per-vector bound is dim·max|x|²·10⁶,
    * the summed bound n·that; shift units past ~10⁹ rows), total
    * energy Σ‖x‖², `ratio_bp = (projE · 10⁴) div totE`.
    *
    * Output: (component, v_norm2, proj_e, tot_e, ratio_bp) — 2 rows.
    */
  def explainedVarianceBp(corpus: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (v1, v2) = deflatedComponents(corpus, iters, idCol, vecCol)
    val q = quantized(corpus, idCol, vecCol).persist()
    try {
      def energies(v: Array[Long], comp: Long): DataFrame = {
        val vn = v.foldLeft(0L)((acc, x) => acc + x * x)
        q.withColumn("s", dotLong(col("xq"), typedLit(v.toSeq)))
          .agg(sum(expr(s"(s * s) div $vn")).as("proj_e"),
            sum(dotLong(col("xq"), col("xq"))).as("tot_e"))
          .select(lit(comp).as("component"), lit(vn).as("v_norm2"),
            col("proj_e"), col("tot_e"),
            expr("(proj_e * 10000) div tot_e").as("ratio_bp"))
      }
      energies(v1, 1L).unionByName(energies(v2, 2L))
        .orderBy("component")
        .localCheckpoint(true)
    } finally q.unpersist()
  }

  /** One frame holding the component AND the extreme projections:
    * (kind, key, value) — kind 'component' rows carry (dimension 1-based,
    * v_milli); kind 'projection' rows the top-`k` vectors by absolute
    * projection `Σ xq_i·v_i` (micro-scale: milli·milli), ties to the
    * smaller id. The projections are the "what lies along this axis"
    * readout — at 100 TB a pure scan over the quantized frame under a
    * dim-sized literal, then a TakeOrdered k.
    */
  def topComponentWithProjections(corpus: DataFrame, iters: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val v = topComponentVector(corpus, iters, idCol, vecCol)
    val comp = v.zipWithIndex
      .map { case (vi, i) => ("component", (i + 1).toLong, vi) }.toSeq
      .toDF("kind", "key", "value")
    val proj = quantized(corpus, idCol, vecCol)
      .select(lit("projection").as("kind"), col("id").as("key"),
        dotLong(col("xq"), typedLit(v.toSeq)).as("value"))
      .orderBy(abs(col("value")).desc, col("key"))
      .limit(k)
    comp.unionByName(proj).orderBy(col("kind"), col("key"))
  }
}
