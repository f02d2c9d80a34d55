package graft.streaming

import graft.functions.Scores
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._
import scala.collection.concurrent.TrieMap

/** U3 — the hot-path scoring pipeline twin
  * (`dwh/streaming/spark_jobs/hot_path_scoring.py`): Kafka profile events →
  * parse (numeric-else-raw count discipline) → per-row enrichment against a
  * scoring service → flatten to the 15-column score record → dual sink
  * (Kafka JSON topic + KV cache), assembled as `foreachBatch`.
  *
  * Design (vs the reference's per-row `requests.post` inside a Python UDF,
  * `:290-424`): enrichment is `mapPartitions` over a typed Dataset with a
  * per-partition [[Scorer]] factory — the seam where an HTTP client and its
  * connection pool are built ONCE per task rather than per row. Everything
  * else (parse, flatten, sinks) stays declarative columns. On a cluster the
  * only materialization is the bounded per-micro-batch collect in the sink
  * adapters, same contract as the reference's `foreachBatch`.
  */
object HotPathScoring {

  /** kol.profiles.raw wire schema (`hot_path_scoring.py:107-129`): numeric
    * counts AND raw scraper strings, either may be absent.
    */
  val profileSchema: StructType = StructType(Seq(
    StructField("event_id", StringType), StructField("event_time", StringType),
    StructField("event_type", StringType), StructField("platform", StringType),
    StructField("username", StringType), StructField("user_id", StringType),
    StructField("followers_count", LongType), StructField("following_count", LongType),
    StructField("post_count", LongType), StructField("favorites_count", LongType),
    StructField("followers_raw", StringType), StructField("following_raw", StringType),
    StructField("likes_raw", StringType),
    StructField("verified", BooleanType), StructField("bio", StringType),
    StructField("profile_url", StringType), StructField("nickname", StringType),
    StructField("signature", StringType), StructField("avatar_url", StringType)))

  /** Parsed profile event — the scorer's input contract. */
  final case class ProfileIn(kol_id: String, platform: String,
      followers_count: Long, following_count: Long, post_count: Long,
      favorites_count: Long, verified: Boolean, bio: String)

  /** The scoring API's response contract (`hot_path_scoring.py:333-348`,
    * UDF struct `:390-404`): 14 fields, scores nullable (API down ⇒ null
    * score + error note, never a dropped row).
    */
  final case class ScoreResult(
      trust_score: Option[Double], trust_label: String, trust_confidence: Double,
      success_score: Option[Double], success_label: String, success_confidence: Double,
      trending_score: Option[Double], trending_label: String, trending_growth: Double,
      latency_ms: Int, model_version_trust: String, model_version_success: String,
      error: Option[String])

  final case class ScoredProfile(kol_id: String, platform: String,
      trust_score: Option[Double], trust_label: String, trust_confidence: Double,
      success_score: Option[Double], success_label: String, success_confidence: Double,
      trending_score: Option[Double], trending_label: String, trending_growth: Double,
      latency_ms: Int, model_version_trust: String, model_version_success: String,
      error: Option[String])

  /** One scoring client per partition; `score` per row. Implementations
    * own their transport (HTTP pool, timeouts, retry) — the engine never
    * sees it.
    */
  trait Scorer extends Serializable { def score(p: ProfileIn): ScoreResult }

  /** Deterministic local scorer standing in for the HTTP call: trust via
    * the U4 heuristic with the hot path's fixed assumptions
    * (`call_scoring_api:313-331`: account_age_days=365,
    * has_profile_image=true, label unknown→0), risk labels via the serving
    * API's thresholds (`serving/api/routers/predict.py:401-410`),
    * confidence = max(p, 1−p) on trust/100 (`:453`), success/trending left
    * at the reference's not-yet-deployed defaults (`:377-378`). Rounding
    * uses the same shortest-decimal-string HALF_UP as Spark's `round`.
    */
  object LocalHeuristicScorer extends Scorer {
    def score(p: ProfileIn): ScoreResult = {
      val total = (if (p.verified) 20.0 else 0.0) + 10.0 +
        math.min(365.0 / 365.0 * 20.0, 20.0) +
        math.min(math.max(p.followers_count, 0L).toDouble /
          math.max(p.following_count, 1L) / 10.0 * 20.0, 20.0) +
        20.0
      val trust = math.max(math.min(
        BigDecimal(total).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble,
        100.0), 0.0)
      val p1 = trust / 100.0
      val conf = BigDecimal(math.max(p1, 1.0 - p1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val risk =
        if (trust >= 80) "low" else if (trust >= 60) "moderate"
        else if (trust >= 40) "elevated" else "high"
      ScoreResult(Some(trust), risk, conf,
        None, "Unknown", 0.0, None, "Unknown", 0.0,
        0, "local-heuristic-v1", "unknown", None)
    }
  }

  /** Parse kafka-shaped profile events (`hot_path_scoring.py:228-263`):
    * CAST value to string, from_json with the explicit schema, prefer the
    * numeric count else parse the raw scraper string (U1), coalesce
    * defaults, drop keyless rows.
    */
  def parseProfileEvents(raw: DataFrame): DataFrame =
    raw
      .selectExpr("CAST(value AS STRING) AS json_str", "timestamp AS kafka_timestamp")
      .select(from_json(col("json_str"), profileSchema).as("data"), col("kafka_timestamp"))
      .select(
        col("data.username").as("kol_id"),
        col("data.platform"),
        when(col("data.followers_count").isNotNull, col("data.followers_count"))
          .otherwise(Scores.parseCountString(col("data.followers_raw")))
          .as("followers_count"),
        when(col("data.following_count").isNotNull, col("data.following_count"))
          .otherwise(Scores.parseCountString(col("data.following_raw")))
          .as("following_count"),
        coalesce(col("data.post_count"), lit(0L)).as("post_count"),
        when(col("data.favorites_count").isNotNull, col("data.favorites_count"))
          .otherwise(Scores.parseCountString(col("data.likes_raw")))
          .as("favorites_count"),
        coalesce(col("data.verified"), lit(false)).as("verified"),
        col("data.bio"),
        // carried but unused downstream — the reference's parse keeps
        // signature as its own column too (`:261`) and its scorer also
        // only reads bio; kept for record-shape parity
        col("data.signature"),
        col("kafka_timestamp"))
      .filter(col("kol_id").isNotNull)

  /** The enrichment stage: one [[Scorer]] per partition (client/connection
    * reuse), one call per row, typed end to end. The batch twin of the
    * reference's `scored_df = batch_df.withColumn("scores", score_udf(...))`
    * (`:456-467`) minus the per-row client setup.
    */
  def enrich(profiles: DataFrame, scorerFactory: () => Scorer): Dataset[ScoredProfile] = {
    val ds = profiles
      .select("kol_id", "platform", "followers_count", "following_count",
        "post_count", "favorites_count", "verified", "bio")
      .as[ProfileIn](Encoders.product[ProfileIn])
    ds.mapPartitions { iter =>
      val client = scorerFactory()
      iter.map { p =>
        val r = client.score(p)
        ScoredProfile(p.kol_id, p.platform,
          r.trust_score, r.trust_label, r.trust_confidence,
          r.success_score, r.success_label, r.success_confidence,
          r.trending_score, r.trending_label, r.trending_growth,
          r.latency_ms, r.model_version_trust, r.model_version_success, r.error)
      }
    }(Encoders.product[ScoredProfile])
  }

  /** The reference's flattened output record (`hot_path_scoring.py:469-486`):
    * kol_id, platform, wall-clock timestamp string, then the 12 score
    * fields — `error` deliberately not part of the outbound record.
    */
  def flatten(scored: Dataset[ScoredProfile]): DataFrame =
    scored.toDF().select(
      col("kol_id"), col("platform"),
      current_timestamp().cast("string").as("timestamp"),
      col("trust_score"), col("trust_label"), col("trust_confidence"),
      col("success_score"), col("success_label"), col("success_confidence"),
      col("trending_score"), col("trending_label"), col("trending_growth"),
      col("latency_ms"), col("model_version_trust"), col("model_version_success"))

  /** In-JVM stand-ins for the two hot-path sinks: the Kafka scores topic
    * (key/value records, `:488-498`) and the Redis score cache
    * (`kol:score:{id}` → summary json fields, `:508-536`).
    */
  final class TopicBuffer extends Serializable {
    val records = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
  }
  final class ScoreCache extends Serializable {
    val store: TrieMap[String, Map[String, String]] = TrieMap.empty
  }

  /** The assembled hot path (`run_hot_path_scoring`, `:540-607`): parse →
    * watermark → foreachBatch(enrich → flatten → Kafka topic + KV cache).
    * Both sink writes are bounded per micro-batch (the reference collects
    * the same frame for Redis).
    */
  def pipeline(kafkaShaped: DataFrame, scorerFactory: () => Scorer,
      topic: TopicBuffer, cache: ScoreCache,
      watermarkDelay: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      checkpoint: Option[String] = None): DataStreamWriter[Row] = {
    val w = parseProfileEvents(kafkaShaped)
      .withWatermark("kafka_timestamp", watermarkDelay)
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val out = flatten(enrich(batch, scorerFactory)).cache()
        try {
          Sinks.toKafkaJson(out, "kol_id").collect() // bounded per micro-batch
            .foreach(r => topic.records.add((r.getString(0), r.getString(1))))
          out.select("kol_id", "trust_score", "trust_label", "success_score",
            "trending_score", "timestamp").collect()
            .foreach { r =>
              cache.store.put("kol:score:" + r.getAs[String]("kol_id"), Map(
                "trust_score" -> String.valueOf(r.getAs[Any]("trust_score")),
                "trust_label" -> r.getAs[String]("trust_label"),
                "success_score" -> String.valueOf(r.getAs[Any]("success_score")),
                "trending_score" -> String.valueOf(r.getAs[Any]("trending_score")),
                "timestamp" -> r.getAs[String]("timestamp")))
            }
        } finally out.unpersist()
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c))
  }
}
