package graft.streaming

import graft.functions.Scores
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The hot path (SURVEY.md §3.1): Kafka video events → windowed engagement
  * aggregation → trending score → top-k sink.
  *
  * Structured as composable DataFrame → DataFrame stages so the exact same
  * plan runs as a stream (readStream + watermark + update mode) and as a
  * bounded batch replay (T11, `hot_path_scoring.py:581-597`). All scoring
  * is native column expressions — no UDF, the whole pipeline stays inside
  * whole-stage codegen; at scale the only shuffle is the windowed groupBy,
  * keyed on (window, username, platform).
  *
  * Reference: `streaming/spark_jobs/trending_stream.py:410-509`; config
  * constants `:90-107` (5-min window, 1-min slide, 5-min watermark, 30-s
  * trigger, baseline/global 100.0).
  */
object TrendingStream {

  val WindowSize = "5 minutes"
  val SlideInterval = "1 minute"
  val WatermarkDelay = "5 minutes"
  val TriggerInterval = "30 seconds"

  /** Kafka wire bytes → typed columns: CAST(value AS STRING), from_json
    * with the topic schema, flatten, keep the Kafka ingest timestamp as
    * `kafka_ts` (P2/P4; `trending_stream.py:437-449`).
    */
  def parseKafka(raw: DataFrame, schema: StructType): DataFrame =
    raw.selectExpr("CAST(value AS STRING) AS json", "timestamp AS kafka_ts")
      .select(from_json(col("json"), schema).as("data"), col("kafka_ts"))
      .select(col("data.*"), col("kafka_ts"))

  /** Engagement derivation + null hygiene (`trending_stream.py:451-455`):
    * drop rows without a key, engagement = likes + comments + shares with
    * per-column null defaulting.
    */
  def withEngagement(events: DataFrame): DataFrame =
    events
      .filter(col("username").isNotNull && col("username") =!= "")
      .withColumn("engagement",
        coalesce(col("video_likes"), lit(0L)) +
          coalesce(col("video_comments"), lit(0L)) +
          coalesce(col("video_shares"), lit(0L)))

  /** Watermarked sliding-window aggregation (T1/T2): counts, engagement and
    * view sums, engagement avg per (window, username, platform).
    */
  def windowedAggregate(events: DataFrame,
      timeCol: String = "kafka_ts",
      windowSize: String = WindowSize,
      slide: String = SlideInterval,
      watermark: String = WatermarkDelay): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(
        window(col(timeCol), windowSize, slide),
        col("username"), col("platform"))
      .agg(
        count(lit(1)).as("event_count"),
        sum("engagement").as("total_engagement"),
        sum(coalesce(col("video_views"), lit(0L))).as("total_views"),
        avg("engagement").as("avg_engagement"))

  /** Score the windowed aggregates (U2) with native expressions; output
    * mirrors the reference UDF's struct fields, flattened
    * (`trending_stream.py:473-492`), rounded as the reference rounds.
    */
  def scored(windowed: DataFrame,
      baselineVelocity: Double = 100.0,
      globalAvgVelocity: Double = 100.0): DataFrame = {
    val v = Scores.velocity(col("event_count"), col("total_engagement"))
    val score = Scores.trendingScore(
      col("velocity"), lit(baselineVelocity), lit(globalAvgVelocity), lit(0.0))
    windowed
      .withColumn("velocity", v)
      .withColumn("trending_score", round(score, 2))
      .withColumn("trending_label", Scores.trendingLabel(col("trending_score")))
      .withColumn("velocity", round(col("velocity"), 4))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("username"), col("platform"),
        col("event_count"), col("total_engagement"), col("total_views"),
        round(col("avg_engagement"), 4).as("avg_engagement"),
        col("velocity"), col("trending_score"), col("trending_label"))
  }

  /** Full pipeline from a raw Kafka-shaped frame (streaming or batch). */
  def pipeline(raw: DataFrame): DataFrame =
    scored(windowedAggregate(withEngagement(parseKafka(raw, EventSchemas.video))))

  /** The MOMENTUM-FED hot path — the pipeline the reference stubbed
    * (`trending_stream.py:479` passes `prev=None`, so its momentum term
    * is always 0): parse → engagement → per-key prev-value state
    * ([[StatefulVelocity.velocityStream]], checkpointed state store, no
    * external KV round-trip) → trending score with the REAL momentum in
    * the sigmoid. Batch twin with the same lag/momentum/score algebra:
    * q71 (oracle-verified); stream↔batch momentum parity is pinned by
    * StatefulVelocitySpec. Output feeds [[Sinks.momentumKvSink]].
    *
    * Keys are `username|platform` ('|' never appears in either — the
    * reference's own Redis key convention), split back after the state
    * stage so the sink sees the original columns.
    */
  def momentumPipeline(raw: DataFrame,
      baselineVelocity: Double = 100.0, globalAvgVelocity: Double = 100.0,
      stateTtlMs: Option[Long] = Some(StatefulVelocity.StateTtlMs)): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val keyed = withEngagement(parseKafka(raw, EventSchemas.video))
      .select(
        concat_ws("|", col("username"), col("platform")).as("key"),
        col("engagement").cast("double").as("metric"),
        (col("kafka_ts").cast("double") * 1000).cast("long").as("eventTimeMs"))
      .as[StatefulVelocity.KeyedMetric]
    StatefulVelocity.velocityStream(keyed, stateTtlMs).toDF()
      .withColumn("username", substring_index(col("key"), "|", 1))
      .withColumn("platform", substring_index(col("key"), "|", -1))
      .withColumn("trending_score", round(Scores.trendingScore(
        col("velocity"), lit(baselineVelocity), lit(globalAvgVelocity),
        col("momentum")), 2))
      .withColumn("trending_label", Scores.trendingLabel(col("trending_score")))
      .select(col("username"), col("platform"),
        col("metric").as("engagement"), col("prev").as("prev_engagement"),
        round(col("velocity"), 4).as("velocity"),
        round(col("momentum"), 4).as("momentum"),
        col("trending_score"), col("trending_label"))
  }

  /** Session-window engagement aggregation (beyond the reference, which
    * has no session windows — SURVEY §2.8 T9): one row per burst of
    * activity per key, session closing after `gap` of inactivity. Batch
    * twin: the gaps-and-islands q45.
    */
  def sessionAggregate(events: DataFrame, timeCol: String = "kafka_ts",
      gap: String = "30 minutes", watermark: String = WatermarkDelay): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(session_window(col(timeCol), gap), col("username"), col("platform"))
      .agg(count(lit(1)).as("event_count"),
        sum("engagement").as("total_engagement"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("username"), col("platform"), col("event_count"), col("total_engagement"))

  /** Watermark-bounded streaming dedupe by event id (the reference relies
    * on batch dropDuplicates only; streaming exactly-once per event id
    * needs state bounded by the watermark or it grows forever).
    */
  def dedupedEvents(events: DataFrame, timeCol: String = "kafka_ts",
      watermark: String = WatermarkDelay): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming source (S1): subscribe to a topic with earliest/latest
    * offsets, lossy-broker tolerance, optional per-trigger rate limit (S2).
    */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame =
    spark.readStream.format("kafka")
      .options(KafkaIO.sourceOptions(bootstrap, topic, startingOffsets, maxOffsetsPerTrigger))
      .load()

  /** Bounded batch read of the same topic (S3) — batch-replay mode T11. */
  def kafkaBatchSource(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.read.format("kafka")
      .options(KafkaIO.batchSourceOptions(bootstrap, topic))
      .load()
}
