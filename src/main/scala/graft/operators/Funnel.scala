package graft.operators

import org.apache.spark.sql.DataFrame
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
}
