package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL join: conversion attribution at ingest — every
  * click joined to the same user's views from the preceding `horizonSec`
  * seconds, emitted as soon as both sides have arrived. The twelfth-plus
  * ingest-time face, and the one Structured Streaming operator class the
  * other faces don't exercise: two UNBOUNDED streams joined with
  * watermark-bounded state (`StreamingSymmetricHashJoinExec`), where the
  * reference's lambda architecture would run a periodic batch join over
  * a landing table (its trending/feature streams at
  * `streaming/spark_jobs/trending_stream.py` never join two live
  * streams).
  *
  * Why the interval condition matters at scale: a stream-stream join
  * without a time bound must hold EVERY past row of both sides in state
  * forever. The `click_ts BETWEEN view_ts AND view_ts + horizon` range
  * plus watermarks on BOTH event-time columns lets Spark evict a view
  * row once the click watermark passes `view_ts + horizon` (and vice
  * versa), so state is bounded by horizon × arrival rate per key —
  * the standard impressions⋈clicks shape (Spark SS programming guide,
  * "Inner Joins with optional Watermarking"; Armbrust et al.,
  * SIGMOD'18 §4.3).
  *
  * Batch parity: `withWatermark` is a no-op on batch frames, so the SAME
  * builder runs as the batch twin (q197's oracle-checked face) — the
  * batch≡stream spec convention every face in this repo follows. Join
  * keys are (user, time-range): Spark shuffles both streams by user_id,
  * so hot users are the skew risk — the state-store partition count is
  * the knob, and AQE does not apply to streaming state (size the
  * shuffle-partition count at job start, it is fixed into the
  * checkpoint).
  *
  * Output: (user_id, view_id, click_id, lag_s) — epoch math only, no
  * raw timestamps (the cross-engine convention).
  */
object AttributionStream {

  /** All (view, click) pairs per user with
    * `view_ts ≤ click_ts ≤ view_ts + horizonSec`. Streaming when both
    * inputs are streaming (inner interval join, append mode); identical
    * batch semantics when they are not. `watermarkDelay` bounds how
    * late either side may arrive before its state is evicted.
    */
  def viewClickPairs(views: DataFrame, clicks: DataFrame,
      horizonSec: Long = 3600,
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    require(horizonSec > 0, s"horizonSec must be positive, got $horizonSec")
    require(joinType == "inner" || joinType == "leftOuter",
      s"joinType must be inner or leftOuter, got $joinType")
    val v = views.select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermarkDelay)
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    v.join(c, expr(
        "user_id = click_user AND click_ts >= view_ts AND " +
          s"click_ts <= view_ts + interval $horizonSec seconds"), joinType)
      .select(col("user_id"), col("view_id"), col("click_id"),
        expr("(unix_micros(click_ts) - unix_micros(view_ts)) div 1000000")
          .as("lag_s"))
  }

  /** [[viewClickPairs]] with LEFT-OUTER semantics: a view that never
    * converts still emits ONE row (null click_id/lag_s) — but only once
    * the watermark has passed `view_ts + horizon + delay`, i.e. once no
    * in-horizon click can still arrive. This is the streaming-only
    * subtlety the inner face hides: outer results are withheld until
    * state eviction proves their absence, so a stalled stream delays
    * the "did not convert" signal by exactly the watermark delay — the
    * operational reason attribution watermarks are kept tight.
    */
  def viewClickPairsOuter(views: DataFrame, clicks: DataFrame,
      horizonSec: Long = 3600,
      watermarkDelay: String = "10 minutes"): DataFrame =
    viewClickPairs(views, clicks, horizonSec, watermarkDelay, "leftOuter")
}
