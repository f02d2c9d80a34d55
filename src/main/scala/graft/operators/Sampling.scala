package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.TopNAgg

/** Deterministic sampling for training-data pipelines.
  *
  * Everything keys on a hash of the record id, never an RNG: assignments
  * are reproducible across engines, reruns, cluster sizes, and
  * repartitioning (Spark's `sample`/`randomSplit` are none of those —
  * seed + partition layout dependent). The bucket function is the
  * md5-prefix form any engine can recompute, so splits and mixes are
  * oracle-checkable.
  */
object Sampling {

  /** Engine-portable deterministic bucket in [0, buckets): first 8 md5
    * hex chars of the id as a long.
    */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Reproducible train/val/test assignment by id hash. */
  def splitLabel(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Leakage-safe train/val/test assignment: hash the near-dup CLUSTER
    * representative, not the document id, so no two near-duplicates ever
    * straddle a split boundary (a val doc whose near-twin sits in train
    * silently inflates eval scores — the split-level cousin of q73's
    * benchmark decontamination). `clusterKey` is any engine-portable
    * grouping of near-duplicates — a normalized-text fingerprint
    * ([[graft.functions.TextFunctions.fingerprint]]), a bag-of-words
    * md5, or a connected-component label from
    * [[Dedup.connectedComponents]] over LSH pairs.
    *
    * The representative is `min(id)` per cluster via one keyed window —
    * a single shuffle on the cluster key (clusters are small by
    * construction; a degenerate mega-cluster means the near-dup KEY is
    * wrong, not this operator). Returns the input plus `rep` and
    * `split`, recomputable by any engine from the md5 convention.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusterKey: Column,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val byCluster = org.apache.spark.sql.expressions.Window.partitionBy("__ck")
    df.withColumn("__ck", clusterKey)
      .withColumn("rep", min(col(idCol)).over(byCluster))
      .withColumn("split", splitLabel(col("rep"), trainPct, valPct))
      .drop("__ck")
  }

  /** Deterministic source mixing toward target weights: every source's
    * keep-fraction is scaled so the binding (most over-weighted relative
    * to its volume) source keeps 100% and the kept mix matches `weights`
    * in expectation. Membership is the id hash against a per-source
    * threshold — one tiny count aggregate, then a narrow filter pass, no
    * sampling shuffle. All sources in `weights` must be present.
    */
  def mixBySource(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double]): DataFrame = {
    // a zero weight would silently discard its source (threshold 0) and an
    // all-zero map would keep nothing (floor(NaN) → 0) — fail fast instead
    requirePositive(weights)
    val inScope = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
    val counts = inScope.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mixWithCounts(inScope, sourceCol, idCol, weights, counts)
  }

  /** Precomputed-counts overload: pipelines that already track per-source
    * volumes (catalog stats, a prior aggregation) pass them here and skip
    * the counting scan — the counting variant reads a 100 TB input twice
    * (once to count, once to filter); this one reads it once.
    */
  def mixBySource(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double], counts: Map[String, Long]): DataFrame = {
    requirePositive(weights)
    val inScope = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
    mixWithCounts(inScope, sourceCol, idCol, weights, counts)
  }

  private def requirePositive(weights: Map[String, Double]): Unit =
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must all be positive, got $weights")

  private def mixWithCounts(inScope: DataFrame, sourceCol: String,
      idCol: String, weights: Map[String, Double],
      counts: Map[String, Long]): DataFrame = {
    require(weights.keySet.subsetOf(counts.keySet),
      s"missing sources: ${weights.keySet -- counts.keySet}")
    require(weights.keySet.forall(counts(_) > 0),
      s"zero-count sources: ${weights.keySet.filter(counts(_) == 0)}")
    val c = weights.map { case (s, w) => counts(s) / w }.min
    val thresholds = weights.map { case (s, w) =>
      s -> math.floor(c * w / counts(s) * 1000000).toLong
    }
    val thrCol = weights.keys.foldLeft(lit(-1L)) { (acc, s) =>
      when(col(sourceCol) === s, lit(thresholds(s))).otherwise(acc)
    }
    inScope.filter(hashBucket(col(idCol), 1000000) < thrCol)
  }

  /** Per-group score-percentile gate: keep rows whose `scoreCol` is at or
    * above the group's `pct` quantile (e.g. top quarter of quality per
    * language — the standard post-scoring curation cut).
    *
    * `exact = true` uses interpolated `percentile` (≡ DuckDB
    * `quantile_cont` — the oracle twin), which buffers every value of a
    * group in one ObjectHashAggregate buffer: fine for the per-language
    * threshold table (values per group bounded by corpus partitioning),
    * the wrong default at unbounded group sizes. `exact = false` (the
    * 100 TB path) uses the `approx_percentile` sketch — bounded memory,
    * partial-aggregated — at the cost of a threshold within the sketch's
    * rank error (the gate then keeps ~pct of each group rather than
    * exactly). Same trade, same defaults, as `Serving.percentiles`.
    *
    * The threshold table is one row per group — always broadcast.
    */
  def percentileGate(df: DataFrame, groupCol: String, scoreCol: String,
      pct: Double, exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(pct > 0 && pct < 1, s"pct must be in (0,1), got $pct")
    val thrExpr =
      if (exact) expr(s"percentile($scoreCol, $pct)")
      else expr(s"approx_percentile($scoreCol, $pct, $accuracy)")
    val thr = df.groupBy(groupCol).agg(thrExpr.as("__thr"))
    df.join(broadcast(thr), groupCol)
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Per-domain document cap: keep at most `cap` documents per URL domain
    * (smallest ids win — deterministic, rerun-stable), dropping blocklisted
    * domains entirely. The standard web-corpus guard against one crawler
    * trap or SEO farm dominating the training mix.
    *
    * The kept-id set per domain comes from [[graft.plans.TopNAgg]]'s
    * bounded-heap aggregate, NOT `row_number()` — a hot domain with 10⁸
    * pages would otherwise sort all its rows in one window task (the same
    * hot-key wall as segment dedup's old keep-first window, VERDICT r8).
    * With the bounded aggregate the exchange carries at most `cap` ids per
    * input partition per domain and no task sorts more than `cap` values.
    * The exploded keep-list (≤ cap rows per domain) then semi-joins back
    * on the unique id — broadcast-able while #domains·cap fits, a plain
    * shuffle semi-join beyond.
    */
  def domainCap(df: DataFrame, urlCol: String, idCol: String, cap: Int,
      blocklist: Seq[String] = Nil): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val dom = lower(regexp_extract(col(urlCol), "^https?://([^/]+)", 1))
    val scoped =
      if (blocklist.isEmpty) df.withColumn("__domain", dom)
      else df.withColumn("__domain", dom)
        .filter(!col("__domain").isin(blocklist: _*))
    val keep = scoped.groupBy("__domain")
      .agg(TopNAgg.topnMinAgg(col(idCol), cap).as("__keep"))
      .select(explode(col("__keep")).as("__keep_id"))
    scoped
      .join(keep, col(idCol) === col("__keep_id"), "left_semi")
      .drop("__domain")
  }

  /** Temperature-flattened source resampling at T = 2 (the multilingual-
    * LM "sqrt smoothing": sample share ∝ √(natural share), so dominant
    * sources shrink and rare ones gain relative weight). Downsample-only:
    * the SMALLEST source keeps everything and every other source keeps
    * `√(n_min/n_s)` of its rows, chosen by the deterministic id-hash
    * threshold (same primitive as [[mixBySource]] — reproducible across
    * engines, reruns, and repartitioning; an epoch re-draw is a different
    * `salt`).
    *
    * T = 2 is hard-wired because √ is the one exponent with a bitwise
    * cross-engine guarantee: IEEE 754 sqrt is correctly rounded, so the
    * per-source rate — and therefore membership — is identical wherever
    * the counts are (general `pow` differs in ULPs between libms, which
    * would flip hash-boundary rows). Fully declarative: counts, the
    * 1-row minimum, rates, and the filter are one plan — no driver
    * round-trip, composable downstream.
    */
  def sqrtTemperatureSample(df: DataFrame, sourceCol: String,
      idCol: String, salt: String = ""): DataFrame =
    df.join(broadcast(sqrtTemperatureRates(df, sourceCol)
        .select(col(sourceCol), col("__thr"))), sourceCol)
      .filter(hashBucket(concat(col(idCol).cast("string"), lit(salt)),
        1000000) < col("__thr"))
      .drop("__thr")

  /** Mixture-weight solver — the PLANNING half of the mixing family
    * ([[sqrtTemperatureSample]]/[[mixBySource]] execute rates;
    * [[epochUpsample]] executes epochs; this computes them): given the
    * per-group token inventory, a target weight per group, and a total
    * token budget, emit each group's target token count and the
    * repetition factor that realizes it — `epochs_bp` =
    * target·10⁴ div available, read as basis points of one epoch:
    * below 10⁴ it is the subsample RATE for [[mixBySource]]'s hash
    * threshold, above it the epoch count for [[epochUpsample]]
    * (⌈epochs_bp/10⁴⌉ full passes, remainder as a partial-epoch rate).
    * The standard mixture bookkeeping of pretraining recipes (the
    * Pile/LLaMA-style "weight × budget vs available, repeat the small
    * sets" tables), as one exact-integer frame.
    *
    * Inputs: `counts` (groupCol, tokensCol — one row per group, e.g. a
    * [[graft.operators.Profile.corpusDatasheet]] slice) and `weights`
    * (groupCol, weight_bp); groups missing from either side are
    * dropped — the caller decides what an unweighted source means.
    * Everything is `div` arithmetic on BIGINTs over ≤|groups| rows:
    * broadcast-sized at any corpus scale, replayable by any engine.
    *
    * Output: (groupCol, available_tokens, weight_bp, target_tokens,
    * epochs_bp, mode ∈ upsample|subsample) — `mode` = upsample iff
    * epochs_bp > 10⁴ (target exceeds inventory).
    */
  def mixtureSolve(counts: DataFrame, groupCol: String, tokensCol: String,
      weights: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    counts.select(col(groupCol), col(tokensCol).cast("long").as("available_tokens"))
      .join(weights.select(col(groupCol), col("weight_bp").cast("long").as("weight_bp")),
        groupCol)
      .withColumn("target_tokens",
        expr(s"($budgetTokens * weight_bp) div 10000"))
      .withColumn("epochs_bp",
        expr("(target_tokens * 10000) div greatest(available_tokens, 1)"))
      .withColumn("mode",
        when(col("epochs_bp") > 10000L, lit("upsample")).otherwise(lit("subsample")))
  }

  /** Execute a mixture plan's SUBSAMPLE side quality-first — the
    * greedy-by-score realization of [[mixtureSolve]]'s `target_tokens`
    * (DataComp-style "keep the best documents until the budget"): per
    * group, rank documents by (`scoreCol` desc, `idCol` asc) and keep
    * exactly those whose token prefix fits the group's budget (a doc
    * straddling the boundary is dropped, not split — the
    * [[Packing.takeTokenBudget]] convention, but with PER-GROUP budgets
    * from the plan frame instead of one constant).
    *
    * Scale shape: the prefix sum is [[Packing.runningOffset]]'s
    * two-phase form under the composite order — phase 1 parallelizes
    * over (group, score-bucket), so one giant source never serializes
    * into a single window partition; the plan joins by broadcast
    * (≤|groups| rows). `groupOf` coarse-buckets the score
    * NON-DECREASINGLY along the ranking (default: million-unit
    * floor-division buckets of the integer score, monotone by
    * construction — exact for any BIGINT, unlike a double divide).
    *
    * Output: every input column + `offset` (the doc's token offset in
    * its group's quality-ordered stream) and `target_tokens`.
    */
  def mixtureTake(docs: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, scoreCol: String, plan: DataFrame,
      groupOf: Option[Column] = None): DataFrame = {
    val bucket = groupOf.getOrElse(
      -expr(s"(($scoreCol - pmod($scoreCol, 1000000)) div 1000000)"))
    graft.operators.Packing.runningOffset(docs,
        Seq(col(scoreCol).desc, col(idCol).asc), tokensCol, bucket,
        Seq(groupCol))
      .join(broadcast(plan.select(col(groupCol),
        col("target_tokens").cast("long").as("target_tokens"))), Seq(groupCol))
      .filter(col("offset") + col(tokensCol) <= col("target_tokens"))
  }

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement, k items,
    * deterministic: each row draws its uniform from the md5 id-hash
    * (`u = (h + 0.5) / 2³²` — never exactly 0 or 1), and the k rows with
    * the largest `u^(1/w)` — compared as `ln(u)/w`, the monotone form
    * that avoids cross-libm `pow` — are the sample. This is the one
    * scheme where per-row INDEPENDENT keys give an exact without-
    * replacement weighted sample (Efraimidis & Spirakis 2006), which is
    * what makes it distributed-friendly: no sequential state, no
    * rejection loop, just a global top-k.
    *
    * The top-k plans as `TakeOrderedAndProject` — per-partition bounded
    * heaps, one k-row merge — never a global sort. Reruns, repartitions,
    * and engines agree on the sample because the only inputs are the id
    * and the weight. Ties are broken by id ascending so the selected SET
    * is stable even on a (astronomically unlikely) equal key; rows with
    * null or non-positive weight are excluded up front (a zero weight
    * has selection probability 0; a negative one is a caller bug made
    * loud by exclusion rather than NaN ordering).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = col(weightCol).cast("double")
    val h = conv(substring(md5(concat(lit(seed), lit(":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val u = (h.cast("double") + 0.5) / 4294967296.0
    df.filter(w.isNotNull && w > 0)
      .withColumn("__es", log(u) / w)
      .orderBy(col("__es").desc, col(idCol).asc)
      .limit(k)
      .drop("__es")
  }

  /** Stratified deterministic sample: exactly `nPer` documents per group
    * (fewer if the group is smaller), selected in md5 id-hash order — a
    * seeded pseudo-random draw any engine can replay. Selection runs on
    * [[graft.plans.TopNAgg]]'s bounded heap over `hash·2³¹ + id` (hash
    * from 7 md5 hex chars = 28 bits, so the packed long is exact and its
    * ordering is (hash, id) lexicographic — the id bits double as the
    * tie-break), NOT `row_number()`: a hot stratum never sorts in one
    * window task, the exchange carries ≤ nPer packed longs per input
    * partition per group. Same keep-N shape as [[domainCap]]; ids must
    * be in [0, 2³¹), enforced per row. The keep-set semi-join keys on
    * (group, id) — an id value reused across strata selects only in the
    * stratum that drew it. (Duplicate rows sharing an id WITHIN one
    * stratum would all be kept; the exact-quota guarantee assumes ids are
    * unique within each stratum.)
    */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
      nPer: Int, seed: String = ""): DataFrame = {
    require(nPer > 0, s"nPer must be positive, got $nPer")
    val id = col(idCol).cast("long")
    val h = conv(substring(md5(concat(lit(seed), lit(":"),
      col(idCol).cast("string"))), 1, 7), 16, 10).cast("long")
    val packed = when(id >= 0 && id < (1L << 31), h * (1L << 31) + id)
      .otherwise(expr(
        "assert_true(false, 'stratifiedSample requires 0 <= id < 2^31')")
        .cast("long"))
    val keep = df.groupBy(groupCol)
      .agg(TopNAgg.topnMinAgg(packed, nPer).as("__keep"))
      .select(col(groupCol).as("__keep_grp"),
        explode(col("__keep")).as("__packed"))
      .select(col("__keep_grp"), (col("__packed") % (1L << 31)).as("__keep_id"))
    df.join(keep,
      col(groupCol) === col("__keep_grp") && id === col("__keep_id"),
      "left_semi")
  }

  /** Epoch up-sampling — the other half of data mixing ([[mixBySource]] /
    * [[sqrtTemperatureSample]] only ever DOWN-sample): replicate each
    * source's documents `epochs(source)` times, the way LM training
    * mixes repeat rare high-quality sources for several epochs while
    * web crawl runs under one. Fractional epochs are deterministic:
    * ⌊e⌋ full copies for every row, plus one extra copy for exactly the
    * id-hash fraction e − ⌊e⌋ of rows (same md5 threshold primitive as
    * every sampler here — reproducible across engines, reruns, and
    * repartitioning). e < 1 therefore degenerates to a downsample
    * filter, and sources absent from the map pass through once — one
    * operator covers the whole mixing axis.
    *
    * Output: every input column + `epoch` (0-based replica index).
    * Downstream training order should key on (id, epoch) — the q81
    * seeded shuffle spreads replicas across the stream for free when
    * its key is md5(seed:id:epoch).
    *
    * Scale shape: a when-chain of per-source literals (thresholds
    * computed driver-side from the map) and one generator explode — a
    * pure map-side operator, no join, no shuffle, output rows ∝
    * Σ nₛ·eₛ.
    */
  def epochUpsample(df: DataFrame, sourceCol: String, idCol: String,
      epochs: Map[String, Double]): DataFrame = {
    require(epochs.values.forall(e => e > 0 && e.isFinite),
      s"epochs must all be positive and finite, got $epochs")
    val full = epochs.map { case (s, e) => s -> math.floor(e).toLong }
    val thr = epochs.map { case (s, e) =>
      s -> math.floor((e - math.floor(e)) * 1000000).toLong
    }
    val fullCol = epochs.keys.foldLeft(lit(1L)) { (acc, s) =>
      when(col(sourceCol) === s, lit(full(s))).otherwise(acc)
    }
    val thrCol = epochs.keys.foldLeft(lit(0L)) { (acc, s) =>
      when(col(sourceCol) === s, lit(thr(s))).otherwise(acc)
    }
    val copies = fullCol +
      when(hashBucket(col(idCol), 1000000) < thrCol, 1L).otherwise(0L)
    // sequence(0, -1) would generate a DESCENDING series, not an empty
    // one — rows with zero copies (e < 1, hash above the threshold) must
    // explode an empty array instead
    df.withColumn("epoch", explode(
      when(copies > 0, sequence(lit(0L), copies - 1))
        .otherwise(array().cast("array<long>"))))
  }

  /** The rate table behind [[sqrtTemperatureSample]]: one row per source
    * with its count `__n` and keep-threshold `__thr` out of 10⁶ (the
    * smallest source reads exactly 10⁶ = keep-everything). Exposed so
    * pipelines can log/audit the realized mix without re-deriving it.
    */
  def sqrtTemperatureRates(df: DataFrame, sourceCol: String): DataFrame = {
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min("__n").as("__n_min"))
    counts.crossJoin(broadcast(nMin))
      .withColumn("__thr",
        floor(sqrt(col("__n_min").cast("double") / col("__n").cast("double"))
          * 1000000.0).cast("long"))
      .select(col(sourceCol), col("__n"), col("__thr"))
  }

  /** Winsorized min-max score normalization per group: clip `scoreCol`
    * to the group's [pLo, pHi] percentile band, then rescale the band to
    * [0, 10000] integer units. The robust-scaling step quality pipelines
    * run before mixing scores from different sources (a source whose
    * raw score range is wider would otherwise dominate any combined
    * gate); winsorizing first makes the range immune to outlier docs.
    *
    * Same relational shape as [[percentileGate]]: a per-group threshold
    * table (two percentiles — exact by default here, because the q111
    * oracle replays `quantile_cont`; pass `exact = false` for the
    * 100 TB sketch path), always broadcast, then one map-side clip +
    * rescale. Portability: the percentile doubles are quantized to
    * 1e-4 units BEFORE the clip, so clip and rescale are exact BIGINT
    * arithmetic (`div`) — order-free on any engine. `scoreCol` must be
    * integer-valued (it is cast to long); pre-quantize fractional scores
    * to integer units first (the micro-unit convention).
    *
    * Returns the input plus `norm_u` ∈ [0, 10000] (constant-score
    * groups, hi_u = lo_u, normalize to 0 via the `greatest(…, 1)`
    * denominator guard).
    */
  def winsorizedNormalize(df: DataFrame, groupCol: String, scoreCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    winsorizedNormalizeWith(df, groupCol, scoreCol,
      winsorThresholds(df, groupCol, scoreCol, pLo, pHi, exact, accuracy))
  }

  /** The threshold half of [[winsorizedNormalize]]: one row per group,
    * (groupCol, lo_u, hi_u) in 1e-4 units. Exposed so a STREAMING gate
    * can clip arriving documents against offline-computed thresholds
    * (percentiles are unaggregatable mid-stream; the split is the same
    * train-offline/score-in-engine architecture as [[Classifier]]).
    */
  def winsorThresholds(df: DataFrame, groupCol: String, scoreCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    def pct(p: Double) =
      if (exact) expr(s"percentile($scoreCol, $p)")
      else expr(s"approx_percentile($scoreCol, $p, $accuracy)")
    df.groupBy(groupCol).agg(
      floor(pct(pLo) * 10000.0 + 0.5).cast("long").as("lo_u"),
      floor(pct(pHi) * 10000.0 + 0.5).cast("long").as("hi_u"))
  }

  /** The scoring half of [[winsorizedNormalize]]: clip + rescale against
    * a PROVIDED (groupCol, lo_u, hi_u) frame — always broadcast, works
    * identically on a batch frame and a stream (stream-static join plus
    * pure projections).
    *
    * Rows whose group is ABSENT from `thresholds` pass through with
    * `norm_u` null — a LEFT join, never an inner one: offline thresholds
    * can lag the live stream (a brand-new source appears mid-stream
    * before the next offline percentile run), and an inner join would
    * silently delete every such document rather than gate it. Null
    * `norm_u` is the explicit "no calibration yet" marker a downstream
    * policy can route on (hold, pass-raw, or default-band — its
    * decision, not this operator's). Batch≡stream parity holds for any
    * coverage because both sides apply the same left join.
    */
  def winsorizedNormalizeWith(df: DataFrame, groupCol: String,
      scoreCol: String, thresholds: DataFrame): DataFrame =
    df.join(broadcast(thresholds.withColumnRenamed("lo_u", "__lo_u")
        .withColumnRenamed("hi_u", "__hi_u")), Seq(groupCol), "left")
      .withColumn("__clip_u",
        least(greatest(col(scoreCol).cast("long") * 10000L, col("__lo_u")),
          col("__hi_u")))
      .withColumn("norm_u",
        expr("((__clip_u - __lo_u) * 10000) div greatest(__hi_u - __lo_u, 1)"))
      .drop("__lo_u", "__hi_u", "__clip_u")

  /** Half-sample bootstrap confidence interval for a per-group mean
    * (McCarthy, "Pseudo-replication: half samples", 1969; the
    * hash-replica family of Chamandy et al., "Estimating Uncertainty
    * for Massive Data Streams", Google TR 2012): a metric without an
    * error bar is half a metric — a 2-point quality-score drop between
    * corpus drops is either noise or a regression, and this is the
    * number that says which.
    *
    * `replicas` pseudo-replicas are carved by the BITS of the portable
    * md5 id hash (replica b keeps the rows whose bit b is set — each an
    * independent-ish half-sample); the CI half-width comes from the
    * spread of the replica means: Var(half-sample mean) ≈ 2·Var(full
    * mean), so se = sd(replica means)/√2 and the 95% half-width is
    * `1.96·√(B·Σm² − (Σm)²) / (B·√2)` — exact BIGINT sums up to the one
    * final sqrt (identical IEEE text on both engines).
    *
    * Scale shape (the q176 pivot discipline): NO row multiplication —
    * all `replicas` conditional sums+counts ride ONE hash aggregate
    * (map-side combined), and the replica means / variance close as a
    * pure HOF projection over the ≤|groups|-row frame. An exploded
    * (row × replica) formulation would be 32× the shuffle for the same
    * answer.
    *
    * Output: (groupCol, n_docs, mean_u, ci95_halfwidth_u,
    * replica_min_u, replica_max_u). An empty replica (never at corpus
    * scale; guarded for tiny groups) contributes mean 0.
    */
  def halfSampleCI(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, replicas: Int = 32): DataFrame = {
    require(replicas >= 2 && replicas <= 32,
      s"replicas must be in [2, 32] (id-hash bits), got $replicas")
    val b = replicas
    val aggs = (0 until b).flatMap { i =>
      val bit = expr(s"(__h div ${1L << i}) % 2 = 1")
      Seq(sum(when(bit, col(scoreCol))).as(s"__s$i"),
        sum(when(bit, 1L).otherwise(0L)).as(s"__n$i"))
    }
    // raw 32-bit hash (no modulo): replica b reads BIT b, and bits of
    // a reduced value would not be the bits of the hash
    df.withColumn("__h",
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col(scoreCol)).as("__stot") +: aggs): _*)
      .withColumn("__su",
        array((0 until b).map(i => coalesce(col(s"__s$i"), lit(0L))): _*))
      .withColumn("__nu", array((0 until b).map(i => col(s"__n$i")): _*))
      .withColumn("__means", expr(
        "zip_with(__su, __nu, (a, c) -> a div greatest(c, CAST(1 AS BIGINT)))"))
      .withColumn("__sx", expr(
        "aggregate(__means, CAST(0 AS BIGINT), (acc, m) -> acc + m)"))
      .withColumn("__sxx", expr(
        "aggregate(__means, CAST(0 AS BIGINT), (acc, m) -> acc + m * m)"))
      .select(col(groupCol), col("n_docs"),
        expr("__stot div n_docs").as("mean_u"),
        expr(s"CAST(floor(1.96 * sqrt(CAST($b * __sxx - __sx * __sx " +
          s"AS DOUBLE)) / ($b * sqrt(2.0)) + 0.5) AS BIGINT)")
          .as("ci95_halfwidth_u"),
        expr("array_min(__means)").as("replica_min_u"),
        expr("array_max(__means)").as("replica_max_u"))
  }
}
