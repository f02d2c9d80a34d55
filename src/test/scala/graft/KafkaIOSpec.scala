package graft

import graft.streaming.KafkaIO
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity pins for the Kafka option assembly (S1–S3, K4). The
  * broker itself is env-blocked in this container, so the testable residue
  * is exactly these option maps — each assertion mirrors a reference
  * reader/writer block line by line.
  */
class KafkaIOSpec extends AnyFunSuite {

  test("S1 trending stream reader: earliest, lossy-tolerant, no rate limit") {
    // trending_stream.py:394-404
    assert(KafkaIO.sourceOptions("redpanda:9092", "kol.videos.raw",
      startingOffsets = "earliest") == Map(
      "kafka.bootstrap.servers" -> "redpanda:9092",
      "subscribe" -> "kol.videos.raw",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false"))
  }

  test("S2 hot-path scoring reader: latest + maxOffsetsPerTrigger = BATCH_SIZE*10") {
    // hot_path_scoring.py:195-206 (Config.BATCH_SIZE default 100 → 1000)
    assert(KafkaIO.sourceOptions("redpanda:9092", "kol.profiles.raw",
      startingOffsets = "latest", maxOffsetsPerTrigger = Some(100L * 10)) == Map(
      "kafka.bootstrap.servers" -> "redpanda:9092",
      "subscribe" -> "kol.profiles.raw",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "1000"))
  }

  test("S3 bounded batch reader: earliest -> latest") {
    // kafka_to_bronze_tiktok.py:159-177
    assert(KafkaIO.batchSourceOptions("redpanda:9092", "tiktok.video.raw") == Map(
      "kafka.bootstrap.servers" -> "redpanda:9092",
      "subscribe" -> "tiktok.video.raw",
      "startingOffsets" -> "earliest",
      "endingOffsets" -> "latest"))
  }

  test("K4 JSON producer: bootstrap + output topic only") {
    // hot_path_scoring.py:488-498
    assert(KafkaIO.sinkOptions("redpanda:9092", "kol.scores.realtime") == Map(
      "kafka.bootstrap.servers" -> "redpanda:9092",
      "topic" -> "kol.scores.realtime"))
  }
}
