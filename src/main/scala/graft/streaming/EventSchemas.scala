package graft.streaming

import org.apache.spark.sql.types._

/** Explicit schemas for the five Kafka event topics (FIXTURES.md §1,
  * derived from the reference's StructTypes):
  *
  *  - video:     `streaming/spark_jobs/trending_stream.py:115-125`
  *  - profile:   `dwh/streaming/spark_jobs/hot_path_scoring.py:107-129`
  *  - product:   `batch/etl/kafka_to_bronze_tiktok.py:85-111`
  *  - comment:   `batch/etl/kafka_to_bronze_tiktok.py:74-83`
  *  - discovery: `batch/etl/kafka_to_bronze_tiktok.py:113-133`
  *
  * Shared between streaming and batch-replay exactly as the reference
  * shares them (`hot_path_scoring.py:581-597`). Timestamps arrive as ISO
  * strings and are parsed downstream — matching the reference's
  * strings-on-the-wire convention (SURVEY.md §1.2).
  */
object EventSchemas {

  val video: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_time", StringType),
    StructField("platform", StringType),
    StructField("username", StringType),
    StructField("video_id", StringType),
    StructField("video_views", LongType),
    StructField("video_likes", LongType),
    StructField("video_comments", LongType),
    StructField("video_shares", LongType)))

  val profile: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_time", StringType),
    StructField("event_type", StringType),
    StructField("platform", StringType),
    StructField("username", StringType),
    StructField("nickname", StringType),
    StructField("followers_raw", StringType),
    StructField("following_raw", StringType),
    StructField("likes_raw", StringType),
    StructField("followers_count", LongType),
    StructField("following_count", LongType),
    StructField("verified", BooleanType),
    StructField("bio", StringType),
    StructField("avatar_url", StringType),
    StructField("profile_url", StringType)))

  val product: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_time", StringType),
    StructField("platform", StringType),
    StructField("username", StringType),
    StructField("video_id", StringType),
    StructField("video_views", LongType),
    StructField("video_likes", LongType),
    StructField("video_comments", LongType),
    StructField("video_shares", LongType),
    StructField("product_id", StringType),
    StructField("product_title", StringType),
    StructField("seller_id", StringType),
    StructField("price", DoubleType),
    StructField("currency", StringType),
    StructField("product_url", StringType),
    StructField("keyword", StringType),
    StructField("sold_count", LongType),
    StructField("sold_count_raw", StringType),
    StructField("sold_delta", LongType),
    StructField("engagement_total", LongType),
    StructField("engagement_rate", DoubleType),
    StructField("est_clicks", LongType),
    StructField("est_ctr", DoubleType)))

  val comment: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_time", StringType),
    StructField("event_type", StringType),
    StructField("platform", StringType),
    StructField("video_id", StringType),
    StructField("video_url", StringType),
    StructField("username", StringType),
    StructField("comment_text", StringType)))

  val discovery: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("event_time", StringType),
    StructField("platform", StringType),
    StructField("username", StringType),
    StructField("nickname", StringType),
    StructField("followers", LongType),
    StructField("following", LongType),
    StructField("likes_total", LongType),
    StructField("bio", StringType),
    StructField("avatar_url", StringType),
    StructField("verified", BooleanType),
    StructField("discovered_from", StringType),
    StructField("discovery_score", DoubleType),
    StructField("predicted_niche", StringType),
    StructField("discovery_round", LongType),
    StructField("sample_video_id", StringType),
    StructField("sample_video_views", LongType),
    StructField("sample_video_engagement", DoubleType)))

  /** The canonical bronze envelope (`batch/etl/load_bronze_data.py:22-28`):
    * semi-structured payload carried as a JSON string inside a structured row.
    */
  val bronzeEnvelope: StructType = StructType(Seq(
    StructField("kol_id", StringType),
    StructField("platform", StringType),
    StructField("source", StringType),
    StructField("payload", StringType),
    StructField("ingest_ts", StringType)))

  /** twitter_human_bots bronze payload — the labeled trust-training source
    * (`batch/etl/bronze_to_silver.py:385-427` reads these paths off the
    * inferred envelope): nested profile / derived_features / trust_label
    * structs. Timestamps are dirty strings parsed downstream.
    */
  val twitterTrust: StructType = StructType(Seq(
    StructField("profile", StructType(Seq(
      StructField("screen_name", StringType),
      StructField("description", StringType),
      StructField("default_profile", BooleanType),
      StructField("default_profile_image", BooleanType),
      StructField("has_url", BooleanType),
      StructField("verified", BooleanType),
      StructField("followers_count", LongType),
      StructField("friends_count", LongType),
      StructField("statuses_count", LongType),
      StructField("favourites_count", LongType),
      StructField("created_at", StringType)))),
    StructField("derived_features", StructType(Seq(
      StructField("followers_friends_ratio", DoubleType)))),
    StructField("trust_label", StructType(Seq(
      StructField("is_bot", IntegerType),
      StructField("is_human", IntegerType),
      StructField("account_type", StringType))))))
}
