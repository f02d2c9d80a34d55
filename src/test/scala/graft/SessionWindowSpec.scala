package graft

import java.sql.Timestamp
import graft.streaming.TrendingStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Session windows and watermark-bounded dedupe (beyond-reference
  * streaming ops).
  */
class SessionWindowSpec extends SparkSpec {
  import sqlImplicits._

  case class KafkaLike(value: String, timestamp: Timestamp)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(user: String, likes: Long, id: String): String =
    s"""{"event_id":"$id","platform":"tiktok","username":"$user","video_id":"v_$id",
       |"video_views":100,"video_likes":$likes,"video_comments":0,"video_shares":0}"""
      .stripMargin.replace("\n", "")

  test("session_window: bursts split on the 30-minute gap and merge within it") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[KafkaLike]
    val parsed = TrendingStream.withEngagement(
      TrendingStream.parseKafka(source.toDF(), graft.streaming.EventSchemas.video))
    // session windows only support append mode: sessions emit once the
    // watermark passes their end, so a late flush event closes them out
    val out = TrendingStream.sessionAggregate(parsed)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      source.addData(
        KafkaLike(ev("kol_a", 10, "e1"), ts("2024-01-01 10:00:00")),
        KafkaLike(ev("kol_a", 20, "e2"), ts("2024-01-01 10:10:00")), // same session
        KafkaLike(ev("kol_a", 30, "e3"), ts("2024-01-01 11:30:00"))) // gap > 30m → new
      q.processAllAvailable()
      source.addData(KafkaLike(ev("kol_z", 1, "flush"), ts("2024-01-01 13:00:00")))
      q.processAllAvailable() // watermark → 12:55 > both session ends
      val rows = spark.table("sess_out").filter($"username" === "kol_a").collect()
      assert(rows.length == 2, s"expected 2 sessions, got ${rows.length}")
      val first = rows.minBy(_.getAs[Timestamp]("session_start").getTime)
      assert(first.getAs[Long]("event_count") == 2)
      assert(first.getAs[Long]("total_engagement") == 30)
      assert(first.getAs[Timestamp]("session_end") == ts("2024-01-01 10:40:00")) // last + gap
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps one row per event_id") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[KafkaLike]
    val parsed = TrendingStream.withEngagement(
      TrendingStream.parseKafka(source.toDF(), graft.streaming.EventSchemas.video))
    val out = TrendingStream.dedupedEvents(parsed)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      source.addData(
        KafkaLike(ev("kol_a", 10, "dup1"), ts("2024-01-01 10:00:00")),
        KafkaLike(ev("kol_a", 10, "dup1"), ts("2024-01-01 10:00:30")), // retransmit
        KafkaLike(ev("kol_a", 99, "e2"), ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      source.addData(
        KafkaLike(ev("kol_a", 10, "dup1"), ts("2024-01-01 10:02:00"))) // cross-batch dup
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[String].collect().sorted
      assert(ids.sameElements(Array("dup1", "e2")), s"got ${ids.mkString(",")}")
    } finally q.stop()
  }
}
