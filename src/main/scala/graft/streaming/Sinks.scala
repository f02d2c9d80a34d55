package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import scala.collection.concurrent.TrieMap

/** Sink adapters (SURVEY.md §2.2).
  *
  * The reference fans each micro-batch out to Redis hashes + sorted sets
  * (K5, `trending_stream.py:298-363`) and to Kafka as JSON (K4,
  * `hot_path_scoring.py:488-498`). Correctness only needs the *semantics*:
  * a last-write-wins KV view and a per-metric top-k leaderboard. Those are
  * modeled by [[KeyValueTopK]], an in-JVM store fed from `foreachBatch`;
  * swapping in a real Redis/Cassandra client is a sink-local change.
  */
object Sinks {

  /** Last-write-wins KV + top-k leaderboard semantics of the reference's
    * Redis hashes (`trending:{platform}:{kol}`) and sorted sets
    * (`ranking:{platform}:{metric}`). Thread-safe; keyed overwrite matches
    * ZADD's update-in-place.
    */
  final class KeyValueTopK extends Serializable {
    val store: TrieMap[String, Map[String, String]] = TrieMap.empty
    val ranking: TrieMap[String, Double] = TrieMap.empty

    def upsert(platform: String, key: String, fields: Map[String, String],
        score: Double): Unit = {
      store.put(s"trending:$platform:$key", fields)
      ranking.put(s"$platform:$key", score)
    }

    def topK(platform: String, k: Int): Seq[(String, Double)] =
      ranking.toSeq
        .filter(_._1.startsWith(platform + ":"))
        .sortBy { case (key, score) => (-score, key) }
        .take(k)
  }

  /** foreachBatch writer: upsert every row of the scored trending frame
    * into the KV/top-k view (update output mode → last window state wins).
    */
  def trendingKvSink(df: DataFrame, kv: KeyValueTopK,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(TrendingStream.TriggerInterval))
      : DataStreamWriter[Row] = {
    val w = df.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.select(
          col("platform"), col("username"), col("trending_score"),
          col("trending_label"), col("total_engagement"), col("event_count"))
          .collect() // bounded: one row per (key, window) in the micro-batch
        rows.foreach { r =>
          kv.upsert(
            r.getAs[String]("platform"),
            r.getAs[String]("username"),
            Map(
              "trending_score" -> r.getAs[Double]("trending_score").toString,
              "trending_label" -> r.getAs[String]("trending_label"),
              "total_engagement" -> r.getAs[Long]("total_engagement").toString,
              "event_count" -> r.getAs[Long]("event_count").toString),
            r.getAs[Double]("trending_score"))
        }
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c))
  }

  /** foreachBatch writer for [[TrendingStream.momentumPipeline]]'s output
    * — same KV/top-k view as [[trendingKvSink]], with the momentum-fed
    * score ranking and the state columns (prev/velocity/momentum) stored
    * alongside, so a reader can audit WHY a key ranks where it does.
    */
  def momentumKvSink(df: DataFrame, kv: KeyValueTopK,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(TrendingStream.TriggerInterval))
      : DataStreamWriter[Row] = {
    val w = df.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect() // bounded: one row per active key
        rows.foreach { r =>
          kv.upsert(
            r.getAs[String]("platform"),
            r.getAs[String]("username"),
            Map(
              "trending_score" -> r.getAs[Double]("trending_score").toString,
              "trending_label" -> r.getAs[String]("trending_label"),
              "engagement" -> r.getAs[Double]("engagement").toString,
              "prev_engagement" -> r.getAs[Double]("prev_engagement").toString,
              "velocity" -> r.getAs[Double]("velocity").toString,
              "momentum" -> r.getAs[Double]("momentum").toString),
            r.getAs[Double]("trending_score"))
        }
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c))
  }

  /** Kafka JSON sink shape (K4): key = kol id, value = full row as JSON. */
  def toKafkaJson(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Console/debug sink (K7). */
  def consoleSink(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.outputMode("update").format("console")
      .option("truncate", "false")

  /** In-engine top-k view over a batch/gold frame — replaces the
    * reference's Redis ZREVRANGE read path (O3) with a plain Spark query.
    */
  def topKView(df: DataFrame, metricCol: String, k: Int, tieBreak: String): DataFrame =
    df.orderBy(col(metricCol).desc, col(tieBreak).asc).limit(k)
}
