package graft.streaming

/** Pure option-map assembly for the Kafka reader/writer paths (S1–S3, K4).
  *
  * No broker exists in this container, so the execution of these paths is
  * env-blocked — but the option plumbing itself is the reference-parity
  * surface and IS unit-testable. Each builder returns exactly the options
  * the reference passes:
  *
  *  - [[sourceOptions]] — streaming reader. Trending uses
  *    `startingOffsets=earliest` with no rate limit
  *    (`trending_stream.py:394-404`); hot-path scoring uses
  *    `startingOffsets=latest` with `maxOffsetsPerTrigger = BATCH_SIZE*10`
  *    (`hot_path_scoring.py:195-206`). Both set `failOnDataLoss=false`
  *    (lossy-broker tolerance).
  *  - [[batchSourceOptions]] — bounded batch read, earliest→latest
  *    (`kafka_to_bronze_tiktok.py:159-177`).
  *  - [[sinkOptions]] — JSON producer to an output topic
  *    (`hot_path_scoring.py:488-498`).
  */
object KafkaIO {

  def sourceOptions(bootstrap: String, topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "false") ++
      maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)

  def batchSourceOptions(bootstrap: String, topic: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> "earliest",
      "endingOffsets" -> "latest")

  def sinkOptions(bootstrap: String, topic: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "topic" -> topic)
}
