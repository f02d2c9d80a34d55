package graft.etl

import graft.functions.Scores
import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bronze → Silver cleaning (SURVEY.md §3.2 step 2, `bronze_to_silver.py`).
  *
  * Per-source select/clean with the reference's null-hygiene discipline
  * (`coalesce` defaults on nearly every column — §7.4 hard-part 2), K/M/B
  * count parsing as native expressions, multi-source `unionByName` with
  * schema reconciliation, deterministic dedupe by business key, then the
  * multi-measure engagement aggregation (A1).
  *
  * Everything is narrow (projection/filter) until the final groupBy — on a
  * cluster the only shuffles are the dedupe and the engagement rollup,
  * both keyed on (kol_id, platform).
  */
object BronzeToSilver {

  /** Clean one platform's profile events into the silver `kol_profiles`
    * shape (`bronze_to_silver.py:146-241`): parse raw counts, derive
    * username from profile_url when missing, default nulls, drop keyless
    * rows, dedupe latest by (username, platform).
    */
  def cleanProfiles(profiles: DataFrame): DataFrame = {
    val parsed = profiles
      .withColumn("username",
        lower(coalesce(
          col("username"),
          regexp_extract(col("profile_url"), "@([A-Za-z0-9_.]+)", 1))))
      .filter(col("username").isNotNull && col("username") =!= "")
      .withColumn("followers_count",
        coalesce(col("followers_count"), Scores.parseCountString(col("followers_raw"))))
      .withColumn("following_count",
        coalesce(col("following_count"), Scores.parseCountString(col("following_raw"))))
      .withColumn("likes_total", Scores.parseCountString(col("likes_raw")))
      .withColumn("verified", coalesce(col("verified"), lit(false)))
      .withColumn("bio", coalesce(col("bio"), lit("")))
      .withColumn("bio_length", length(col("bio")))
      .withColumn("has_profile_image",
        col("avatar_url").isNotNull && col("avatar_url") =!= "")
      .withColumn("processed_at", current_timestamp())
    Dedup.latestPerKey(parsed, Seq("username", "platform"),
      Seq(col("event_time").desc_nulls_last, col("event_id").desc))
      .select("username", "platform", "nickname", "followers_count",
        "following_count", "likes_total", "verified", "bio", "bio_length",
        "has_profile_image", "event_time", "processed_at")
  }

  /** Clean video events into silver `kol_content`
    * (`bronze_to_silver.py:262-347`): engagement measures with coalesce-0
    * discipline, rate guarded by greatest(views,1), synthetic content id
    * fallback, dedupe by (content_id, platform).
    */
  def cleanContent(videos: DataFrame): DataFrame = {
    val cleaned = videos
      .filter(col("username").isNotNull && col("username") =!= "")
      .withColumn("content_id",
        coalesce(col("video_id"), concat(lit("gen_"), monotonically_increasing_id())))
      .withColumn("views", coalesce(col("video_views"), lit(0L)))
      .withColumn("likes", coalesce(col("video_likes"), lit(0L)))
      .withColumn("comments", coalesce(col("video_comments"), lit(0L)))
      .withColumn("shares", coalesce(col("video_shares"), lit(0L)))
      .withColumn("engagement_total", col("likes") + col("comments") + col("shares"))
      .withColumn("engagement_rate",
        round(col("engagement_total") / greatest(col("views"), lit(1L)) * 100.0, 4))
      .withColumn("processed_at", current_timestamp())
    Dedup.latestPerKey(cleaned, Seq("content_id", "platform"),
      Seq(col("event_time").desc_nulls_last, col("event_id").desc))
      .select("content_id", "platform", "username", "views", "likes",
        "comments", "shares", "engagement_total", "engagement_rate",
        "event_time", "processed_at")
  }

  /** Clean comment events (`kafka_to_bronze_tiktok.py:74-83` wire shape)
    * into silver `kol_comments`: keyed rows only, trimmed text, exact
    * duplicates collapsed per (platform, video_id, username, text) keeping
    * the latest observation, derived comment_length.
    */
  def cleanComments(comments: DataFrame): DataFrame = {
    val cleaned = comments
      .filter(col("video_id").isNotNull && col("username").isNotNull)
      .withColumn("comment_text", trim(coalesce(col("comment_text"), lit(""))))
      .filter(col("comment_text") =!= "")
      .withColumn("comment_length", length(col("comment_text")))
      .withColumn("processed_at", current_timestamp())
    Dedup.latestPerKey(cleaned,
      Seq("platform", "video_id", "username", "comment_text"),
      Seq(col("event_time").desc_nulls_last, col("event_id").desc))
      .select("platform", "video_id", "video_url", "username", "comment_text",
        "comment_length", "event_time", "processed_at")
  }

  /** Clean discovery events (`kafka_to_bronze_tiktok.py:113-133` wire
    * shape) into silver `kol_discovery`: the latest discovery round wins
    * per (username, platform); count/score/niche coalesce defaults.
    */
  def cleanDiscovery(discovery: DataFrame): DataFrame = {
    val cleaned = discovery
      .filter(col("username").isNotNull && col("username") =!= "")
      .withColumn("followers", coalesce(col("followers"), lit(0L)))
      .withColumn("following", coalesce(col("following"), lit(0L)))
      .withColumn("likes_total", coalesce(col("likes_total"), lit(0L)))
      .withColumn("verified", coalesce(col("verified"), lit(false)))
      .withColumn("discovery_score", coalesce(col("discovery_score"), lit(0.0)))
      .withColumn("discovery_round", coalesce(col("discovery_round"), lit(0L)))
      .withColumn("predicted_niche", coalesce(col("predicted_niche"), lit("unknown")))
      .withColumn("processed_at", current_timestamp())
    Dedup.latestPerKey(cleaned, Seq("username", "platform"),
      Seq(col("discovery_round").desc, col("event_time").desc_nulls_last,
        col("event_id").desc))
      .select("username", "platform", "nickname", "followers", "following",
        "likes_total", "verified", "discovered_from", "discovery_score",
        "predicted_niche", "discovery_round", "event_time", "processed_at")
  }

  /** Clean product events (`kafka_to_bronze_tiktok.py:85-111` wire shape)
    * into silver `kol_products`: sold_count with the U1 raw-string
    * fallback, engagement measures with coalesce-0 discipline and the
    * guarded rate, price/currency defaults, latest per (product_id,
    * platform).
    */
  def cleanProducts(products: DataFrame): DataFrame = {
    val cleaned = products
      .filter(col("product_id").isNotNull && col("product_id") =!= "")
      .withColumn("sold_count",
        coalesce(col("sold_count"), Scores.parseCountString(col("sold_count_raw"))))
      .withColumn("price", coalesce(col("price"), lit(0.0)))
      .withColumn("currency", coalesce(col("currency"), lit("USD")))
      .withColumn("views", coalesce(col("video_views"), lit(0L)))
      .withColumn("likes", coalesce(col("video_likes"), lit(0L)))
      .withColumn("comments", coalesce(col("video_comments"), lit(0L)))
      .withColumn("shares", coalesce(col("video_shares"), lit(0L)))
      .withColumn("engagement_total",
        coalesce(col("engagement_total"), col("likes") + col("comments") + col("shares")))
      .withColumn("engagement_rate",
        coalesce(col("engagement_rate"),
          round(col("engagement_total") / greatest(col("views"), lit(1L)) * 100.0, 4)))
      .withColumn("processed_at", current_timestamp())
    Dedup.latestPerKey(cleaned, Seq("product_id", "platform"),
      Seq(col("event_time").desc_nulls_last, col("event_id").desc))
      .select("product_id", "platform", "username", "product_title", "seller_id",
        "price", "currency", "keyword", "sold_count", "views", "likes",
        "comments", "shares", "engagement_total", "engagement_rate",
        "event_time", "processed_at")
  }

  /** Parse the twitter_human_bots envelope payload into its nested struct
    * (the reference reads the same paths off a schema-inferred frame,
    * `bronze_to_silver.py:385`): keeps `payload` as one struct column so
    * [[trustFeaturesSilver]] can use the reference's `payload.profile.*`
    * access pattern (P3).
    */
  def parseTwitterTrust(envelope: DataFrame): DataFrame =
    envelope
      .filter(col("source") === "twitter_human_bots")
      .select(col("kol_id"),
        from_json(col("payload"), graft.streaming.EventSchemas.twitterTrust).as("payload"))

  /** Silver `kol_trust_features` (`bronze_to_silver.py:360-466`) — the
    * labeled trust-training table, incl. the dirty-string-timestamp hard
    * part (SURVEY §7.4 #2, `:438-456`):
    *
    *  - `account_age_days`: `to_date(created_at, "yyyy-MM-dd HH:mm:ss")` +
    *    `datediff(asOf, _)`; a NULL created_at → 0, but a malformed non-null
    *    string parses to null and survives as a NULL age (the reference's
    *    exact when/otherwise reach) — the gold bridge coalesces it later.
    *    `try_to_date` keeps that null-on-malformed contract under ANSI mode
    *    (the reference runs ANSI-off Spark 3 where `to_date` is lenient).
    *  - `posts_per_day = round(post_count/age, 2)` only when age > 0; a
    *    null or negative age (clock skew) falls to 0.0.
    *  - every other column carries the reference's coalesce defaults, incl.
    *    the `default_profile_image == true → false` inversion for
    *    has_profile_image (null → true there, matching `:399-400`).
    *
    * `asOf` defaults to `current_date()` like the reference; oracle-checked
    * queries pin it for determinism. Pure narrow projection — scan-speed at
    * any scale.
    */
  def trustFeaturesSilver(twitter: DataFrame, asOf: Column = current_date()): DataFrame = {
    def p(f: String): Column = col("payload.profile." + f)
    twitter
      .select(
        col("kol_id"),
        lit("twitter").as("platform"),
        p("screen_name").as("username"),
        when(p("default_profile_image") === true, false).otherwise(true).as("has_profile_image"),
        when(p("description").isNotNull && length(p("description")) > 0, true)
          .otherwise(false).as("has_bio"),
        coalesce(length(p("description")), lit(0)).as("bio_length"),
        coalesce(p("has_url"), lit(false)).as("has_url"),
        coalesce(p("verified"), lit(false)).as("verified"),
        coalesce(p("followers_count"), lit(0L)).as("followers_count"),
        coalesce(p("friends_count"), lit(0L)).as("following_count"),
        coalesce(p("statuses_count"), lit(0L)).as("post_count"),
        coalesce(p("favourites_count"), lit(0L)).as("favorites_count"),
        coalesce(col("payload.derived_features.followers_friends_ratio"), lit(0.0))
          .as("followers_following_ratio"),
        p("created_at").as("account_created_at"),
        coalesce(p("default_profile"), lit(false)).as("default_profile"),
        coalesce(p("default_profile_image"), lit(false)).as("default_profile_image"),
        coalesce(col("payload.trust_label.is_bot"), lit(0)).as("is_untrustworthy"),
        coalesce(col("payload.trust_label.is_human"), lit(0)).as("is_trustworthy"),
        coalesce(col("payload.trust_label.account_type"), lit("unknown")).as("account_type"),
        lit("twitter_human_bots").as("source"),
        current_timestamp().as("processed_at"))
      .withColumn("account_age_days",
        when(col("account_created_at").isNotNull,
          datediff(asOf, try_to_date(col("account_created_at"), "yyyy-MM-dd HH:mm:ss")))
          .otherwise(lit(0)))
      .withColumn("posts_per_day",
        when(col("account_age_days") > 0,
          round(col("post_count") / col("account_age_days"), 2))
          .otherwise(lit(0.0)))
  }

  /** O4: reconcile per-platform silver frames that may carry different
    * column subsets (`unionByName(allowMissingColumns=true)`).
    */
  def reconcile(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** A1/A6: per-KOL engagement rollup (`bronze_to_silver.py:552-580`):
    * sums, counts, averages, extremes + post-agg derived measures.
    */
  def engagementMetrics(content: DataFrame): DataFrame =
    content
      .groupBy("platform", "username")
      .agg(
        sum("views").as("total_views"),
        sum("likes").as("total_likes"),
        sum("comments").as("total_comments"),
        sum("shares").as("total_shares"),
        count(lit(1)).as("content_count"),
        avg("engagement_rate").as("avg_engagement_rate_raw"),
        avg("views").as("avg_views_raw"),
        max("views").as("max_views"),
        min("views").as("min_views"),
        first("processed_at").as("processed_at"))
      .withColumn("avg_engagement_rate", round(col("avg_engagement_rate_raw"), 4))
      .withColumn("avg_views_per_content", round(col("avg_views_raw"), 2))
      .withColumn("total_engagement",
        col("total_likes") + col("total_comments") + col("total_shares"))
      .drop("avg_engagement_rate_raw", "avg_views_raw")

  /** O5 idempotent refresh done deterministically: replace `platform`'s
    * rows with `fresh`, keep everything else, dedupe by business key with
    * a recency tie-break (SURVEY §7.4 hard-part 3 — the reference's
    * filter-out-then-union keeps an arbitrary row on conflict).
    */
  def upsertPlatform(existing: DataFrame, fresh: DataFrame, platform: String,
      keys: Seq[String], recency: String): DataFrame = {
    val kept = existing.filter(col("platform") =!= platform)
    Dedup.latestPerKey(
      kept.unionByName(fresh, allowMissingColumns = true),
      keys, Seq(col(recency).desc_nulls_last))
  }
}
