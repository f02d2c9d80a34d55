package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scoring formulas as native Catalyst column expressions.
  *
  * Every one of these is a Python UDF (or driver-side Python) in the
  * reference; re-expressing them as built-in column functions keeps them
  * inside whole-stage codegen — the single biggest idiomatic win of the
  * Scala rewrite (SURVEY.md §4). Constants pinned to the reference:
  *
  *  - trending: `streaming/spark_jobs/trending_stream.py:145-292`
  *    (k=0.8, threshold=2.0, weights 0.5/0.3/0.2, labels 80/60/40/25)
  *  - trust heuristic: `batch/etl/silver_to_gold.py:211-230`
  *  - KOL tier: `silver_to_gold.py:233-240`
  *  - success rule: `serving/api/routers/predict.py:796-803`
  *  - composite: `serving/api/routers/scores.py:164-186` (0.4/0.35/0.25)
  *  - time decay / engagement weight: `models/trending/trending_score_v2.py:52-102`
  *  - count-string parse: `batch/etl/tiktok_bronze_to_silver.py:60-77`
  */
object Scores {

  // -------------------------------------------------------------------
  // U1 — count-string parsing ("852.3K", "1.2M", "3B", "1,024" → long)
  // -------------------------------------------------------------------

  /** Parse a human count string to a long, 0 on anything unparseable —
    * exactly the reference semantics: strip/uppercase/drop commas, optional
    * K/M/B suffix, `int(float(x))` truncation toward zero, errors → 0.
    * Pure `when`/`regexp` chain: codegen-friendly, no UDF.
    */
  def parseCountString(c: Column): Column = {
    val s = upper(trim(regexp_replace(c, ",", "")))
    val valid = s.rlike("^-?([0-9]+\\.?[0-9]*|\\.[0-9]+)[KMB]?$")
    val num = regexp_extract(s, "^(-?([0-9]+\\.?[0-9]*|\\.[0-9]+))", 1).cast("double")
    val mult = when(s.endsWith("B"), 1e9)
      .when(s.endsWith("M"), 1e6)
      .when(s.endsWith("K"), 1e3)
      .otherwise(1.0)
    when(c.isNull || !valid, 0L).otherwise((num * mult).cast("long"))
  }

  // -------------------------------------------------------------------
  // U2 — trending score (velocity → sigmoid → label)
  // -------------------------------------------------------------------

  /** Engagement velocity: eng/min boosted by event frequency.
    * `velocity = total_engagement / window_minutes * (1 + 0.1 * log1p(event_count))`
    */
  def velocity(eventCount: Column, totalEngagement: Column, windowMinutes: Double = 5.0): Column =
    totalEngagement / lit(windowMinutes) * (lit(1.0) + lit(0.1) * log1p(eventCount))

  /** Sigmoid-normalized trending score in [0,100].
    * `raw = 0.5·(v/baseline) + 0.3·(v/globalAvg) + 0.2·(1+momentum)`;
    * `score = 100 / (1 + exp(-k·(raw - threshold)))`; baselines floored at 1.
    */
  def trendingScore(vel: Column, baseline: Column, globalAvg: Column,
      momentum: Column, k: Double = 0.8, threshold: Double = 2.0): Column = {
    val b = greatest(baseline, lit(1.0))
    val g = greatest(globalAvg, lit(1.0))
    val raw = lit(0.5) * (vel / b) + lit(0.3) * (vel / g) + lit(0.2) * (lit(1.0) + momentum)
    val score = lit(100.0) / (lit(1.0) + exp(lit(-k) * (raw - lit(threshold))))
    greatest(least(score, lit(100.0)), lit(0.0))
  }

  /** Label buckets: Viral≥80, Hot≥60, Warm≥40, Normal≥25, else Cold. */
  def trendingLabel(score: Column): Column =
    when(score >= 80, "Viral")
      .when(score >= 60, "Hot")
      .when(score >= 40, "Warm")
      .when(score >= 25, "Normal")
      .otherwise("Cold")

  /** Momentum vs a previous-window engagement value: (cur−prev)/prev,
    * 0 when prev is null/≤0 (the reference stubs prev to None in-stream).
    */
  def momentum(current: Column, prev: Column): Column =
    when(prev.isNotNull && prev > 0, (current - prev) / prev).otherwise(lit(0.0))

  // -------------------------------------------------------------------
  // U4 — trust heuristic (0–100, additive components, clamped)
  // -------------------------------------------------------------------

  /** verified +20, profile image +10, account age ≤20, follower/following
    * ratio ≤20, trust label ±(20/−30); rounded to 1dp then clamped [0,100].
    */
  def trustScore(verified: Column, hasProfileImage: Column, accountAgeDays: Column,
      followers: Column, following: Column, isUntrustworthy: Column): Column = {
    val total =
      when(verified, 20.0).otherwise(0.0) +
        when(hasProfileImage, 10.0).otherwise(0.0) +
        least(coalesce(accountAgeDays, lit(0)) / lit(365.0) * 20.0, lit(20.0)) +
        least(coalesce(followers, lit(0L)) /
          greatest(coalesce(following, lit(1L)), lit(1L)) / lit(10.0) * 20.0, lit(20.0)) +
        when(isUntrustworthy === 0, 20.0).when(isUntrustworthy === 1, -30.0).otherwise(0.0)
    greatest(least(round(total, 1), lit(100.0)), lit(0.0))
  }

  /** Follower-count tier: Mega≥1M, Macro≥100K, Micro≥10K, Nano≥1K, Rising. */
  def kolTier(followers: Column): Column =
    when(followers >= 1000000L, "Mega")
      .when(followers >= 100000L, "Macro")
      .when(followers >= 10000L, "Micro")
      .when(followers >= 1000L, "Nano")
      .otherwise("Rising")

  // -------------------------------------------------------------------
  // U5 — success rule score
  // -------------------------------------------------------------------

  /** min(30, views/50k·30) + min(30, engRate·300) + min(20, ctr·200)
    * + min(20, engagement/5000·20); High when ≥50.
    */
  def successScore(views: Column, engRate: Column, ctr: Column, engagement: Column): Column =
    least(lit(30.0), views / lit(50000.0) * 30.0) +
      least(lit(30.0), engRate * 300.0) +
      least(lit(20.0), ctr * 200.0) +
      least(lit(20.0), engagement / lit(5000.0) * 20.0)

  def successLabel(score: Column): Column =
    when(score >= 50, "High").otherwise("Not-High")

  // -------------------------------------------------------------------
  // U6 — composite
  // -------------------------------------------------------------------

  /** `0.4·trending + 0.35·success + 0.25·trust`. */
  def compositeScore(trending: Column, success: Column, trust: Column): Column =
    lit(0.4) * trending + lit(0.35) * success + lit(0.25) * trust

  // -------------------------------------------------------------------
  // U8 — offline v2 weights
  // -------------------------------------------------------------------

  /** Exponential half-life decay: `exp(-ln2/halfLifeDays · Δdays)`,
    * future events (negative Δ) get full weight.
    */
  def timeDecayWeight(deltaDays: Column, halfLifeDays: Double = 7.0): Column =
    exp(lit(-math.log(2.0) / halfLifeDays) * greatest(deltaDays, lit(0.0)))

  /** Log-scaled engagement weight normalized to [0.1, 1]:
    * `0.1 + 0.9·min(log1p(views/avg)/log1p(100), 1)`; views≤0 → 0.1.
    */
  def engagementWeight(views: Column, globalAvgViews: Column): Column =
    when(views <= 0, 0.1).otherwise(
      lit(0.1) + lit(0.9) * least(
        log1p(views / globalAvgViews) / lit(math.log1p(100.0)), lit(1.0)))
}
