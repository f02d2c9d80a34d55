package graft

import java.nio.file.Files
import graft.streaming.{Sinks, StatefulVelocity, TrendingStream}
import graft.sources.Bronze
import graft.streaming.EventSchemas
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** T6 — checkpointing: stateful streaming state must survive a query
  * restart from the same checkpoint directory (the reference relies on
  * per-query checkpoint dirs, `trending_stream.py:374-376`; its actual
  * prev-value state lived in Redis — ours lives in the checkpointed state
  * store, so recovery is what replaces the Redis TTL semantics).
  * Plus K8 DDL registration round-trip.
  */
class RecoverySpec extends SparkSpec {
  import sqlImplicits._

  test("T6 mapGroupsWithState state survives restart from checkpoint") {
    implicit val ctx = spark.sqlContext
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val results = new java.util.concurrent.ConcurrentLinkedQueue[StatefulVelocity.VelocityOut]()

    // one source across both incarnations: the checkpoint tracks its
    // offsets, so the restarted query resumes exactly after batch 0
    val source = MemoryStream[StatefulVelocity.KeyedMetric]
    def run(): Unit = {
      val out = StatefulVelocity.velocityStream(source.toDS(), stateTtlMs = None)
      val q = out.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulVelocity.VelocityOut], _: Long) =>
          batch.collect().foreach(results.add)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      // stop() even if awaitTermination times out: a still-running
      // incarnation superseded by the next run() NPEs during planning
      // once its session state is torn down (SparkPlan.session == null)
      try q.awaitTermination(60000) finally q.stop()
    }

    source.addData(StatefulVelocity.KeyedMetric("k1", 1000.0, 1L))
    run() // first incarnation: prev = cur → velocity 0
    source.addData(StatefulVelocity.KeyedMetric("k1", 1600.0, 2L))
    run() // fresh query object, same checkpoint: must see prev=1000
    val recovered = results.toArray(Array.empty[StatefulVelocity.VelocityOut])
      .find(_.metric == 1600.0)
    assert(recovered.isDefined, s"second run emitted nothing; got ${results}")
    assert(recovered.get.prev == 1000.0,
      s"state not recovered from checkpoint: prev=${recovered.get.prev}")
    assert(recovered.get.velocity == 600.0)
  }

  test("T6+ state survives restart under RocksDB state store (100 TB backend)") {
    // HDFS-backed state is executor-heap-bound; RocksDB is the production
    // store for large keyed state. Same recovery contract must hold.
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val checkpoint = Files.createTempDirectory("ckpt-rocks").toString
      val results = new java.util.concurrent.ConcurrentLinkedQueue[StatefulVelocity.VelocityOut]()
      val source = MemoryStream[StatefulVelocity.KeyedMetric]
      def run(): Unit = {
        val q = StatefulVelocity.velocityStream(source.toDS(), stateTtlMs = None)
          .writeStream.outputMode("update")
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulVelocity.VelocityOut], _: Long) =>
            batch.collect().foreach(results.add)
          }
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination(60000) finally q.stop()
      }
      source.addData(StatefulVelocity.KeyedMetric("k1", 500.0, 1L))
      run()
      source.addData(StatefulVelocity.KeyedMetric("k1", 900.0, 2L))
      run()
      val recovered = results.toArray(Array.empty[StatefulVelocity.VelocityOut])
        .find(_.metric == 900.0)
      assert(recovered.isDefined && recovered.get.prev == 500.0,
        s"RocksDB state not recovered: $results")
      assert(recovered.get.velocity == 400.0)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("T7 on transformWithState: native-TTL value state, recovery, RocksDB") {
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val checkpoint = Files.createTempDirectory("ckpt-tws").toString
      val results = new java.util.concurrent.ConcurrentLinkedQueue[StatefulVelocity.VelocityOut]()
      val source = MemoryStream[StatefulVelocity.KeyedMetric]
      def run(expect: StatefulVelocity.VelocityOut => Boolean): Unit = {
        val q = StatefulVelocity.velocityStreamTws(source.toDS())
          .writeStream.outputMode("update")
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulVelocity.VelocityOut], _: Long) =>
            batch.collect().foreach(results.add)
          }
          .trigger(Trigger.AvailableNow())
          .start()
        // TTL'd TWS state runs in TimeMode.ProcessingTime, which keeps
        // scheduling no-data batches — AvailableNow never self-terminates,
        // so poll for the expected output instead of a blind 60s wait,
        // give the batch commit a short grace, then ALWAYS stop: a
        // still-running incarnation superseded by the next run() NPEs
        // during planning once its session state is torn down
        try {
          val deadline = System.nanoTime() + 60L * 1000000000L
          while (!results.toArray(Array.empty[StatefulVelocity.VelocityOut])
              .exists(expect) && System.nanoTime() < deadline)
            Thread.sleep(100)
          q.awaitTermination(2000)
        } finally q.stop()
      }
      source.addData(StatefulVelocity.KeyedMetric("k1", 100.0, 1L))
      run(_.metric == 100.0) // first sighting: prev = cur → velocity 0
      source.addData(StatefulVelocity.KeyedMetric("k1", 250.0, 2L))
      run(_.metric == 250.0) // restarted query object: ValueState must survive
      val out = results.toArray(Array.empty[StatefulVelocity.VelocityOut])
      assert(out.exists(r => r.metric == 100.0 && r.velocity == 0.0), s"got $out")
      val second = out.find(_.metric == 250.0)
      assert(second.isDefined && second.get.prev == 100.0 && second.get.velocity == 150.0,
        s"TWS state not recovered: $out")
      // the recovered prev feeds the q71 momentum algebra: (250−100)/100
      assert(second.get.momentum == 1.5,
        s"momentum must come from the RECOVERED prev: ${second.get}")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("T7+ transformWithState TimeMode.None: RocksDB restart without TTL machinery") {
    // the TTL-less TWS path plans TimeMode.None (no processing-time
    // timers at all) — its state layout differs from the TTL'd path, so
    // the restart contract is pinned separately; AvailableNow terminates
    // normally here (no no-data batches)
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val checkpoint = Files.createTempDirectory("ckpt-tws-nottl").toString
      val results = new java.util.concurrent.ConcurrentLinkedQueue[StatefulVelocity.VelocityOut]()
      val source = MemoryStream[StatefulVelocity.KeyedMetric]
      def run(): Unit = {
        val q = StatefulVelocity.velocityStreamTws(source.toDS(), ttl = None)
          .writeStream.outputMode("update")
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulVelocity.VelocityOut], _: Long) =>
            batch.collect().foreach(results.add)
          }
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination(60000) finally q.stop()
      }
      source.addData(StatefulVelocity.KeyedMetric("k1", 200.0, 1L))
      run()
      source.addData(StatefulVelocity.KeyedMetric("k1", 300.0, 2L))
      run()
      val second = results.toArray(Array.empty[StatefulVelocity.VelocityOut])
        .find(_.metric == 300.0)
      assert(second.isDefined && second.get.prev == 200.0 &&
        second.get.velocity == 100.0 && second.get.momentum == 0.5,
        s"TimeMode.None TWS state not recovered: $results")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("K8 DDL registration: StructType -> CREATE TABLE -> queryable") {
    val loc = Files.createTempDirectory("tbl").toString
    val df = Seq(("kol_a", "tiktok", "videos", "{}", "2025-01-01")).toDF(
      "kol_id", "platform", "source", "payload", "ingest_ts")
    df.write.mode("overwrite").parquet(loc)
    Bronze.registerTable(spark, "bronze_envelope_test", EventSchemas.bronzeEnvelope, loc)
    val got = spark.sql("SELECT kol_id, platform FROM bronze_envelope_test").collect()
    assert(got.length == 1 && got.head.getString(0) == "kol_a")
    spark.sql("DROP TABLE bronze_envelope_test")
  }
}
