package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CTR/CVR metric stream (T3): tumbling-window sums with post-agg rates.
  *
  * Reference: `streaming/spark_jobs/features_stream.py:38-47` (schema),
  * `:91-121` (10-min watermark, 5-min tumbling window by kol+campaign,
  * CTR = clicks/impressions, CVR = conversions/clicks, window start/end
  * projected). Divide-by-zero guarded with `greatest(x, 1)` like the
  * reference's post-agg expressions.
  */
object FeaturesStream {

  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_time", TimestampType),
    StructField("kol_id", StringType),
    StructField("campaign_id", StringType),
    StructField("impressions", LongType),
    StructField("clicks", LongType),
    StructField("conversions", LongType),
    StructField("spend", DoubleType)))

  val WindowSize = "5 minutes"
  val WatermarkDelay = "10 minutes"

  /** Works on both a stream (update mode) and a bounded frame. */
  def ctrCvrAggregate(events: DataFrame,
      windowSize: String = WindowSize,
      watermark: String = WatermarkDelay): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowSize), col("kol_id"), col("campaign_id"))
      .agg(
        sum(coalesce(col("impressions"), lit(0L))).as("impressions"),
        sum(coalesce(col("clicks"), lit(0L))).as("clicks"),
        sum(coalesce(col("conversions"), lit(0L))).as("conversions"),
        sum(coalesce(col("spend"), lit(0.0))).as("spend"))
      .withColumn("ctr",
        round(col("clicks") / greatest(col("impressions"), lit(1L)), 6))
      .withColumn("cvr",
        round(col("conversions") / greatest(col("clicks"), lit(1L)), 6))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("kol_id"), col("campaign_id"),
        col("impressions"), col("clicks"), col("conversions"),
        round(col("spend"), 2).as("spend"), col("ctr"), col("cvr"))
}
