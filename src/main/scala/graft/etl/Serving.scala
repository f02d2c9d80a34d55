package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-query layer (SURVEY.md §2.10 Q1–Q9): the API's Trino SQL
  * re-hosted as Spark over the gold tables. Each method is one query
  * shape; the metric/order whitelists mirror the reference's sanitization
  * (`trino_client.py:112-139`, `:323-364`) so arbitrary column injection
  * is impossible. Registered views let the same surface be `spark.sql`'d.
  */
object Serving {

  val OrderableColumns: Set[String] =
    Set("followers_count", "following_count", "likes_total", "bio_length",
      "total_views", "total_likes", "trust_score")

  val TopKMetrics: Set[String] =
    Set("followers_count", "total_views", "total_likes", "trust_score",
      "avg_engagement_rate")

  def registerViews(spark: SparkSession, tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }

  /** Q1: filtered, ordered, paginated listing. */
  def listKols(dimKol: DataFrame, platform: Option[String], orderBy: String,
      descending: Boolean, limit: Int, offset: Int): DataFrame = {
    require(OrderableColumns.contains(orderBy), s"unorderable column: $orderBy")
    val filtered = platform.fold(dimKol)(p => dimKol.filter(col("platform") === p))
    val ord = if (descending) col(orderBy).desc else col(orderBy).asc
    filtered.orderBy(ord, col("username").asc).offset(offset).limit(limit)
  }

  /** Q2: point lookups. */
  def byUsername(dimKol: DataFrame, username: String, platform: Option[String]): DataFrame = {
    val base = dimKol.filter(col("username") === username)
    platform.fold(base)(p => base.filter(col("platform") === p)).limit(1)
  }

  /** Q3: substring search over username/nickname, ordered by followers. */
  def searchKols(dimKol: DataFrame, q: String, limit: Int = 50): DataFrame = {
    val needle = q.toLowerCase.replace("%", "").replace("_", "")
    dimKol
      .filter(lower(col("username")).contains(needle) ||
        lower(coalesce(col("nickname"), lit(""))).contains(needle))
      .orderBy(col("followers_count").desc, col("username").asc)
      .limit(limit)
  }

  /** Q4: global stats. */
  def globalStats(dimKol: DataFrame): DataFrame =
    dimKol.agg(
      count(lit(1)).as("total_kols"),
      countDistinct("platform").as("n_platforms"),
      sum("followers_count").as("total_followers"),
      round(avg("followers_count"), 2).as("avg_followers"),
      sum(when(col("verified"), 1L).otherwise(0L)).as("verified_count"))

  /** Q5: per-platform breakdown ordered by KOL count. */
  def platformBreakdown(dimKol: DataFrame): DataFrame =
    dimKol.groupBy("platform")
      .agg(count(lit(1)).as("kol_count"),
        sum("followers_count").as("total_followers"),
        round(avg("followers_count"), 2).as("avg_followers"),
        max("followers_count").as("max_followers"))
      .orderBy(col("kol_count").desc, col("platform").asc)

  /** Q6: top-k by whitelisted metric. */
  def topK(dimKol: DataFrame, metric: String, k: Int): DataFrame = {
    require(TopKMetrics.contains(metric), s"unrankable metric: $metric")
    dimKol.orderBy(col(metric).desc, col("username").asc).limit(k)
  }

  /** Q7: per-KOL content feed, newest first, capped at 100. */
  def contentFeed(content: DataFrame, username: String, limit: Int): DataFrame =
    content.filter(col("username") === username)
      .orderBy(col("event_time").desc, col("content_id").asc)
      .limit(math.min(limit, 100))

  /** Q8: faceted search with dynamically assembled predicates. */
  def facetedSearch(dimKol: DataFrame, q: Option[String], platform: Option[String],
      minFollowers: Option[Long], maxFollowers: Option[Long],
      verifiedOnly: Boolean, limit: Int = 50): DataFrame = {
    val preds = Seq(
      q.map(s => lower(col("username")).contains(s.toLowerCase)),
      platform.map(p => col("platform") === p),
      minFollowers.map(m => col("followers_count") >= m),
      maxFollowers.map(m => col("followers_count") <= m),
      if (verifiedOnly) Some(col("verified") === true) else None).flatten
    preds.foldLeft(dimKol)((df, p) => df.filter(p))
      .orderBy(col("followers_count").desc, col("username").asc)
      .limit(limit)
  }

  /** Q9: label-bucket statistics over a scored frame. The average is left
    * unrounded (`avg_score_raw`) — scores are usually pre-rounded 2dp
    * values whose bucket average can terminate exactly one digit past any
    * rounding scale, so the caller picks the cross-engine-safe rounding
    * (see TextFunctions.round4hu).
    */
  def labelBucketStats(scored: DataFrame, labelCol: String, scoreCol: String): DataFrame =
    scored.groupBy(labelCol)
      .agg(count(lit(1)).as("n"),
        round(min(scoreCol), 2).as("min_score"),
        round(max(scoreCol), 2).as("max_score"),
        avg(scoreCol).as("avg_score_raw"))
}
