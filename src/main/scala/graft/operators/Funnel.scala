package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-lifecycle analytics over an event stream table: ordered-step
  * conversion funnels and cohort retention — the two classic
  * product-analytics readouts the reference's engagement counters stop
  * short of (its serving layer aggregates per-entity totals, e.g.
  * `dwh/ddl/kol_complete_ddl.sql` `agg_platform_kpi`; a funnel asks
  * whether ONE user progressed through an ordered sequence).
  *
  * Portability: event times become exact epoch-microsecond BIGINTs
  * (`unix_micros`) before any comparison or difference, so stage lags
  * and cohort buckets are integer arithmetic on both engines; raw
  * timestamps never reach the output (the QueryDef convention).
  */
object Funnel {

  /** Ordered-step conversion funnel: stage 1 is each user's EARLIEST
    * `steps(0)` event; stage k+1 their earliest `steps(k)` event
    * STRICTLY AFTER their stage-k time (the sequenced-funnel semantic —
    * a purchase before the click does not convert). One output row per
    * stage: (stage, step, n_users, sum_lag_us) with the lag measured
    * from each user's stage-1 time — mean time-to-convert is
    * `sum_lag_us / n_users`, exact because the sum is integral.
    *
    * Shape: one filtered scan per step (the type filter pushes to the
    * scan) and one join per step keyed on the user — every shuffle is
    * on the user key and the surviving frame shrinks monotonically;
    * per-stage totals are 1-row aggregates unioned at the end. Steps
    * are few by construction (a funnel is 3–6 stages), so this is S
    * pushed scans, never a per-user window over the whole event log.
    */
  def stages(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps in $steps")
    def stageAgg(cur: DataFrame, stage: Int, step: String) = cur
      .agg(count(lit(1)).as("n_users"),
        coalesce(sum(col("tk") - col("t1")), lit(0L)).as("sum_lag_us"))
      .select(lit(stage.toLong).as("stage"), lit(step).as("step"),
        col("n_users"), col("sum_lag_us"))
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("user"))
      .agg(min(unix_micros(col(tsCol))).as("t1"))
      .withColumn("tk", col("t1"))
    var out = stageAgg(cur, 1, steps.head)
    for ((st, idx) <- steps.tail.zipWithIndex) {
      val ev = events.filter(col(typeCol) === st)
        .select(col(userCol).as("user"), unix_micros(col(tsCol)).as("te"))
      cur = ev.join(cur, "user")
        .where(col("te") > col("tk"))
        .groupBy("user", "t1")
        .agg(min("te").as("tk"))
      out = out.unionByName(stageAgg(cur, idx + 2, st))
    }
    out.orderBy("stage")
  }

  /** Cohort retention triangle: each user's cohort is the integral time
    * bucket of their FIRST event (default bucket one week =
    * 604,800,000,000 µs); for every (cohort, offset) pair, how many of
    * that cohort's users were active `offset` buckets later. Output:
    * (cohort_w, week_offset, n_users).
    *
    * Shape: one distinct over (user, bucket) — corpus-sized but
    * map-side-combined on the (user, bucket) key; one per-user min; one
    * join back on the user key (same partitioning, exchange reused);
    * one hash aggregate on the tiny (cohort, offset) key space.
    */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts",
      bucketUs: Long = 604800000000L): DataFrame = {
    require(bucketUs > 0, s"bad bucketUs=$bucketUs")
    val w = events.select(col(userCol).as("user"),
        expr(s"unix_micros($tsCol) div $bucketUs").as("w"))
      .distinct()
    val cohort = w.groupBy("user").agg(min("w").as("cohort_w"))
    w.join(cohort, "user")
      .groupBy(col("cohort_w"), (col("w") - col("cohort_w")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-group CUSUM drift statistics (Page, Biometrika 1954) over
    * bucketed event volumes — the sequential change detector the
    * point-in-time drift views (q99/q132) cannot be: a slow sustained
    * shift never trips a per-snapshot share threshold, but its
    * cumulative deviation grows linearly. The curation use: flag a
    * source whose ingest volume regime-shifted mid-crawl (scraper
    * breakage, upstream format change) before it poisons the mix.
    *
    * Exact integers throughout: per (group, bucket) counts; the group
    * reference level is `total div n_buckets` (micro-precision via
    * `CUSUM_t = Σ (n·x_i − total)` — the sum of n·deviations, so no
    * per-bucket division remainder accumulates); reported are the max
    * positive and max negative excursions and the bucket index of the
    * FIRST |excursion| maximum (earliest on ties). Empty buckets
    * between a group's first and last active bucket count as zero
    * volume (a silent scraper IS the signal), materialized per group
    * via a bucket-range join against a sequence frame.
    *
    * Shape: one (group, bucket) hash aggregate over the events; the
    * gap fill joins each group's ≤span-row bucket range (sequence() on
    * the ≤|groups|-row bounds frame — never corpus-sized); the running
    * sum windows partition by group. Output: one row per group.
    */
  def cusumDrift(events: DataFrame, groupCol: String, tsCol: String,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, s"bad bucketUs=$bucketUs")
    // the ONLY corpus-scan aggregate; every downstream frame is
    // bucket-grained (≤ groups·span rows). Cached so the span bounds,
    // the gap-fill join, the totals and both excursion consumers don't
    // each re-run the event scan; released once the per-group result
    // is eagerly materialized (the r10 PageRank discipline).
    val counts = events
      .select(col(groupCol).as("grp"),
        expr(s"unix_micros($tsCol) div $bucketUs").as("b"))
      .groupBy("grp", "b").agg(count(lit(1)).as("x"))
      .persist()
    // fill silent buckets with 0 across each group's active span
    val spans = counts.groupBy("grp")
      .agg(min("b").as("b0"), max("b").as("b1"))
    val filled = spans
      .select(col("grp"), col("b0"),
        explode(expr("sequence(b0, b1)")).as("b"))
      .join(counts, Seq("grp", "b"), "left")
      .select(col("grp"), (col("b") - col("b0")).as("t"),
        coalesce(col("x"), lit(0L)).as("x"))
    val totals = filled.groupBy("grp")
      .agg(count(lit(1)).as("n_buckets"), sum("x").as("total"))
    val w = Window.partitionBy("grp").orderBy("t")
    val cusum = filled.join(totals, "grp")
      .withColumn("dev", col("x") * col("n_buckets") - col("total"))
      .withColumn("s", sum("dev").over(w))
    val stats = cusum.groupBy("grp")
      .agg(max("n_buckets").as("n_buckets"), max("total").as("total"),
        greatest(max("s"), lit(0L)).as("max_pos"),
        greatest(-min("s"), lit(0L)).as("max_neg"),
        max(abs(col("s"))).as("__mxs"))
    val peak = cusum
      .join(stats.select(col("grp"), col("__mxs")), "grp")
      .filter(abs(col("s")) === col("__mxs"))
      .groupBy("grp").agg(min("t").as("peak_t"))
    val out = stats.join(peak, "grp")
      .select(col("grp").as(groupCol), col("n_buckets"), col("total"),
        col("max_pos"), col("max_neg"), col("peak_t"))
      .localCheckpoint(true)
    counts.unpersist()
    out
  }

  /** First-order Markov transition matrix over per-entity event
    * sequences — which event type follows which, row-normalized: the
    * behavioral fingerprint behind funnel design (q157 checks ONE
    * prescribed path; this reads the empirical graph the users actually
    * walk) and a drift signal (a release that reorders the journey
    * shows up as moved transition mass before any conversion metric
    * moves).
    *
    * Determinism: successor order is (orderCols…) per entity — the
    * caller supplies a total order (timestamp + a unique tie-break), so
    * both engines pair identical consecutive events. Probabilities are
    * exact micro-units (`n·10⁶ div row-total`).
    *
    * Shape: ONE lag window PARTITIONED by the entity key (parallel by
    * construction — per-entity sequences are short at any corpus size,
    * so no partition outgrows an executor), one (from, to) hash
    * aggregate, a broadcast row-totals join over the ≤|types|² frame.
    *
    * Output: (from_type, to_type, n, p_u).
    */
  def transitionMatrix(events: DataFrame, keyCol: String,
      orderCols: Seq[Column], typeCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must supply a total order")
    Iterate.loop(events.sparkSession) { l =>
      val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      val counts = l.pin(events
        .withColumn("__next", lead(col(typeCol), 1).over(w))
        .where(col("__next").isNotNull)
        .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
        .agg(count(lit(1)).as("n")))
      val tot = counts.groupBy("from_type").agg(sum("n").as("tot"))
      l.finish(counts.join(broadcast(tot), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          expr("n * 1000000 div tot").as("p_u")))
    }
  }

  /** RFM segmentation (Hughes, "Strategic Database Marketing", 1994; the
    * standard recency/frequency/monetary customer partition) with EXACT
    * tertile cuts — no `ntile` window over all customers, no float
    * percentiles: each dimension's cut points come from the
    * count-of-values histogram by integer prefix-sum (the q189
    * discipline), so the segmentation is bit-identical on any engine
    * and never sorts the customer population.
    *
    * Per customer: r = last-activity epoch DAY (higher = more recent),
    * f = event count, m = value in exact cents
    * (`floor(value·100 + 0.5)`, the double is read identically by any
    * IEEE engine). Cut k/3: the smallest v with `3·cum ≥ k·n`; tier =
    * 1 + (v > cut1) + (v > cut2), so ties share a tier and tiers are
    * labeled in VALUE order (r_tier 3 = most recent, m_tier 3 =
    * highest spend).
    *
    * Shape: one corpus exchange to the per-customer frame (pinned: it
    * feeds three histograms and the final tiering), three
    * distinct-value histogram walks (≤ distinct values each), one 1-row
    * broadcast of all six cuts, one ≤27-row rollup.
    *
    * Output: (r_tier, f_tier, m_tier, n_customers, m_cents).
    */
  def rfmSegments(df: DataFrame, custCol: String, tsCol: String,
      valueCol: String): DataFrame =
    Iterate.loop(df.sparkSession) { l =>
      // the TIMESTAMP cast normalizes TIMESTAMP_NTZ parquet columns
      // (identity under the UTC session timezone)
      val per = l.pin(df.groupBy(col(custCol))
        .agg(max(expr(
            s"unix_micros(cast($tsCol as timestamp)) div 86400000000"))
          .as("r"),
          count(lit(1)).as("f"),
          sum(floor(col(valueCol) * 100.0 + 0.5).cast("long")).as("m")))
      val n = per.agg(count(lit(1)).as("n"))
      def cuts(c: String): DataFrame = {
        val hist = per.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        hist.withColumn("cum",
            sum("cnt").over(Window.orderBy("v")))
          .crossJoin(broadcast(n))
          .agg(min(when(col("cum") * 3 >= col("n"), col("v")))
              .as(s"${c}_cut1"),
            min(when(col("cum") * 3 >= col("n") * 2, col("v")))
              .as(s"${c}_cut2"))
      }
      // each cut frame is 1 row; the broadcast hints keep the lint-
      // forbidden CartesianProductExec out of the plan (BNLJ instead)
      val allCuts = cuts("r").crossJoin(broadcast(cuts("f")))
        .crossJoin(broadcast(cuts("m")))
      def tier(c: String) =
        (lit(1) + when(col(c) > col(s"${c}_cut1"), 1).otherwise(0)
          + when(col(c) > col(s"${c}_cut2"), 1).otherwise(0))
          .cast("long").as(s"${c}_tier")
      l.finish(per.crossJoin(broadcast(allCuts))
        .select(col("m"), tier("r"), tier("f"), tier("m"))
        .groupBy("r_tier", "f_tier", "m_tier")
        .agg(count(lit(1)).as("n_customers"), sum("m").as("m_cents")))
    }
}
