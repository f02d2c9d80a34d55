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

  import SessionWindowSpec.Ev

  test("stream-stream interval join: batch ≡ stream, horizon and user exclusions, cross-batch match") {
    import graft.streaming.AttributionStream
    val views = Seq(
      Ev(1L, 1L, ts("2024-01-01 10:00:00")),  // v1
      Ev(2L, 1L, ts("2024-01-01 11:00:00")))  // v2
    val clicks = Seq(
      Ev(10L, 1L, ts("2024-01-01 09:00:00")), // before any view → no pair
      Ev(11L, 1L, ts("2024-01-01 10:30:00")), // v1 + 1800 s
      Ev(12L, 1L, ts("2024-01-01 11:30:00")), // v2 + 1800; v1 + 5400 > 1h
      Ev(13L, 2L, ts("2024-01-01 10:10:00"))) // user 2 never views
    val expect = Set((1L, 1L, 11L, 1800L), (1L, 2L, 12L, 1800L))
    // batch face (withWatermark is a no-op on batch frames)
    val batch = AttributionStream.viewClickPairs(
        views.toDF(), clicks.toDF(), horizonSec = 3600)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch == expect, batch.toString)
    // streaming face: two live MemoryStreams, clicks arriving a batch
    // AFTER their views (state must hold the views across batches)
    implicit val ctx = spark.sqlContext
    val vs = MemoryStream[Ev]
    val cs = MemoryStream[Ev]
    val out = AttributionStream.viewClickPairs(
      vs.toDF(), cs.toDF(), horizonSec = 3600)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      vs.addData(views: _*)
      q.processAllAvailable()
      cs.addData(clicks: _*)
      q.processAllAvailable()
      val got = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expect, got.toString)
      // the plan really is the symmetric-hash stream-stream join
      assert(q.asInstanceOf[org.apache.spark.sql.execution.streaming
          .runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
        .contains("StreamingSymmetricHashJoin"), "plan")
    } finally q.stop()
  }

  test("stream-stream interval join state survives restart from checkpoint") {
    import graft.streaming.AttributionStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val ctx = spark.sqlContext
    val checkpoint =
      java.nio.file.Files.createTempDirectory("ckpt_attr").toString
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    val vs = MemoryStream[Ev]
    val cs = MemoryStream[Ev]
    val out = AttributionStream.viewClickPairs(
      vs.toDF(), cs.toDF(), horizonSec = 3600)
    def run(): Unit = {
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => results.add(
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
        }
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(60000) finally q.stop()
    }
    // incarnation 1: only the view arrives — no pair yet, but the view
    // row enters the join state store
    vs.addData(Ev(1L, 1L, ts("2024-01-01 10:00:00")))
    run()
    assert(results.isEmpty, s"premature pair: $results")
    // incarnation 2 (fresh query object, same checkpoint): the click
    // must join against the RESTORED view state
    cs.addData(Ev(11L, 1L, ts("2024-01-01 10:30:00")))
    run()
    val got = results.toArray(Array.empty[(Long, Long, Long, Long)]).toSet
    assert(got == Set((1L, 1L, 11L, 1800L)),
      s"join state not recovered: $got")
  }

  test("stream-stream LEFT OUTER interval join: unconverted view emits null only after eviction") {
    import graft.streaming.AttributionStream
    implicit val ctx = spark.sqlContext
    val vs = MemoryStream[Ev]
    val cs = MemoryStream[Ev]
    val out = AttributionStream.viewClickPairsOuter(
      vs.toDF(), cs.toDF(), horizonSec = 3600, watermarkDelay = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("attr_outer").start()
    try {
      // v1 (user 1) never converts; the user-2 click only seeds the
      // click-side watermark
      vs.addData(Ev(1L, 1L, ts("2024-01-01 10:00:00")))
      cs.addData(Ev(90L, 2L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // not yet emitted: a click for v1 may arrive until the watermark
      // passes 11:00 (horizon) + 10 min (delay)
      assert(spark.table("attr_outer").isEmpty, "premature outer emission")
      // advance BOTH watermarks far past 11:10, twice (eviction runs a
      // batch after the watermark update)
      vs.addData(Ev(2L, 3L, ts("2024-01-01 14:00:00")))
      cs.addData(Ev(91L, 2L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      vs.addData(Ev(3L, 3L, ts("2024-01-01 14:30:00")))
      cs.addData(Ev(92L, 2L, ts("2024-01-01 14:30:00")))
      q.processAllAvailable()
      val rows = spark.table("attr_outer").collect()
      val v1 = rows.filter(_.getLong(1) == 1L)
      assert(v1.length == 1 && v1.head.isNullAt(2) && v1.head.isNullAt(3),
        rows.mkString(";"))
      // the 14:00+ views are unmatched but NOT yet evictable → absent
      assert(!rows.exists(r => r.getLong(1) == 2L || r.getLong(1) == 3L),
        rows.mkString(";"))
    } finally q.stop()
    // batch face: the same builder degrades to a plain left join — the
    // unconverted view appears immediately with nulls
    val batch = AttributionStream.viewClickPairsOuter(
        Seq(Ev(1L, 1L, ts("2024-01-01 10:00:00"))).toDF(),
        Seq(Ev(90L, 2L, ts("2024-01-01 10:05:00"))).toDF())
      .collect()
    assert(batch.length == 1 && batch.head.isNullAt(2), batch.mkString(";"))
  }

  private def evRow(u: Long, t: String, tpe: String) = (u, ts(t), tpe)

  test("transitionMatrix: hand transitions, out-of-order input, releases") {
    // u1 walks view→click→purchase (rows arrive SHUFFLED — the order
    // columns must reconstruct the sequence); u2 walks click→click
    val events = Seq(
      (1L, "2024-01-01 10:02:00", "purchase", 3L),
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 10:01:00", "click", 2L),
      (2L, "2024-01-01 09:00:00", "click", 10L),
      (2L, "2024-01-01 09:05:00", "click", 11L))
      .map { case (u, t, tp, id) => (u, ts(t), tp, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
    assertReleases("transitionMatrix") {
      val got = graft.operators.Funnel.transitionMatrix(
          events, "user_id",
          Seq(org.apache.spark.sql.functions.col("ts"),
            org.apache.spark.sql.functions.col("event_id")),
          "event_type")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      assert(got == Map(
        ("view", "click") -> ((1L, 1000000L)),
        ("click", "purchase") -> ((1L, 500000L)),
        ("click", "click") -> ((1L, 500000L))), got.toString)
    }
  }

  test("rfmSegments: hand tertiles, tied frequencies share a tier, releases") {
    // six customers, one per day; r and m are 6 distinct values (cuts
    // at the 2nd and 4th), f is {1,1,2,1,2,2} (both cuts land so f only
    // spans tiers 1-2 — the tie-sharing case)
    val orders = Seq(
      (1L, "2024-01-01 00:00:00", 1.00),
      (2L, "2024-01-02 00:00:00", 2.00),
      (3L, "2024-01-03 00:00:00", 1.50), (3L, "2024-01-03 00:00:00", 1.50),
      (4L, "2024-01-04 00:00:00", 4.00),
      (5L, "2024-01-05 00:00:00", 2.50), (5L, "2024-01-05 00:00:00", 2.50),
      (6L, "2024-01-06 00:00:00", 3.00), (6L, "2024-01-06 00:00:00", 3.00))
      .map { case (c, t, v) => (c, ts(t), v) }
      .toDF("cust", "ots", "val")
    assertReleases("rfmSegments") {
      val got = graft.operators.Funnel
        .rfmSegments(orders, "cust", "ots", "val").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      assert(got == Map(
        (1L, 1L, 1L) -> ((2L, 300L)),   // c1, c2
        (2L, 1L, 2L) -> ((1L, 400L)),   // c4: recent-ish, single order
        (2L, 2L, 2L) -> ((1L, 300L)),   // c3
        (3L, 2L, 3L) -> ((2L, 1100L))), // c5, c6
        got.toString)
    }
  }

  test("funnel stages: sequenced conversion, out-of-order events don't convert") {
    import org.apache.spark.sql.functions._
    val events = Seq(
      // u1 converts fully: view 10:00, click 10:01, purchase 10:03
      evRow(1, "2024-01-01 10:00:00", "view"),
      evRow(1, "2024-01-01 10:01:00", "click"),
      evRow(1, "2024-01-01 10:03:00", "purchase"),
      // u2's click PRECEDES their first view → stops at stage 1
      evRow(2, "2024-01-01 09:00:00", "click"),
      evRow(2, "2024-01-01 10:00:00", "view"),
      evRow(2, "2024-01-01 09:30:00", "purchase"),
      // u3: purchase before click ignored; later purchase converts
      evRow(3, "2024-01-01 10:00:00", "view"),
      evRow(3, "2024-01-01 10:05:00", "purchase"),
      evRow(3, "2024-01-01 10:02:00", "click"),
      evRow(3, "2024-01-01 10:06:00", "purchase"),
      // u4 never views → absent from every stage
      evRow(4, "2024-01-01 10:00:00", "click"))
      .toDF("user_id", "ts", "event_type")
    val got = graft.operators.Funnel
      .stages(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("view", 3L, 0L)), s"got $got")
    // u1 lag 60 s, u3 lag 120 s (µs units)
    assert(got(2L) == (("click", 2L, 180000000L)), s"got $got")
    // u1 purchase at +180 s; u3's qualifying purchase is 10:05 (+300 s)
    // — strictly after the 10:02 click, the 10:06 one is not needed
    assert(got(3L) == (("purchase", 2L, 480000000L)), s"got $got")
  }

  test("funnel stages: empty downstream stage reports zero, not a crash") {
    val events = Seq(evRow(1, "2024-01-01 10:00:00", "view"))
      .toDF("user_id", "ts", "event_type")
    val got = graft.operators.Funnel
      .stages(events, Seq("view", "click"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((1L, "view", 1L, 0L), (2L, "click", 0L, 0L)), s"$got")
  }

  test("retentionCohorts: first-bucket cohorts and offset counts") {
    // 1-second buckets so the arithmetic is readable
    val events = Seq(
      evRow(1, "2024-01-01 00:00:00.1", "view"), // u1 cohort b0
      evRow(1, "2024-01-01 00:00:01.5", "view"), // active b1
      evRow(1, "2024-01-01 00:00:03.0", "view"), // active b3
      evRow(2, "2024-01-01 00:00:01.2", "view"), // u2 cohort b1
      evRow(2, "2024-01-01 00:00:01.9", "view"), // same bucket — once
      evRow(2, "2024-01-01 00:00:02.0", "view")) // active b2
      .toDF("user_id", "ts", "event_type")
    val got = graft.operators.Funnel
      .retentionCohorts(events, bucketUs = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cohorts are ABSOLUTE epoch buckets (2024-01-01 = 1704067200 s)
    val b = 1704067200L
    assert(got == Map((b, 0L) -> 1L, (b, 1L) -> 1L, (b, 3L) -> 1L,
      (b + 1, 0L) -> 1L, (b + 1, 1L) -> 1L), s"got $got")
  }
}

object SessionWindowSpec {
  // top-level so the streaming deserializer can construct it without an
  // outer-instance scope
  case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
}
