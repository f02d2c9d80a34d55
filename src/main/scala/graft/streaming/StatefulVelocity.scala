package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Previous-value state done natively (SURVEY.md §7.4 hard-part 4).
  *
  * The reference externalizes prev-window state to Redis inside
  * `foreachBatch` — collect each micro-batch to the driver, HGET the prior
  * value, velocity = max(0, cur − prev), HSET back
  * (`streaming/spark_jobs/kafka_profile_stream.py:111-185`). That
  * driver-side loop caps throughput at one Redis round-trip per row.
  *
  * Here the state lives in the checkpointed state store via
  * `mapGroupsWithState`, partitioned by key — no driver involvement, no
  * external KV on the hot path, horizontally scalable. State TTL mirrors
  * the reference's 1 h Redis TTL (`trending_stream.py:96`) via processing-
  * time timeout.
  */
object StatefulVelocity {

  case class KeyedMetric(key: String, metric: Double, eventTimeMs: Long)
  case class VelocityOut(key: String, metric: Double, prev: Double,
      velocity: Double, momentum: Double)
  case class PrevState(metric: Double)

  val StateTtlMs: Long = 3600L * 1000 // = reference Redis TTL

  /** metric stream keyed by `key` → (metric, prev, velocity, momentum) per
    * group per micro-batch; update semantics (latest per key wins).
    *
    * `stateTtlMs = Some(ttl)` evicts idle keys like the reference's Redis
    * TTL. Note ProcessingTimeTimeout makes the query schedule continuous
    * no-data micro-batches to evaluate timeouts — correct in production,
    * but `processAllAvailable()` then never observes quiescence, so tests
    * (and bounded replays) pass `None`.
    */
  def velocityStream(input: Dataset[KeyedMetric],
      stateTtlMs: Option[Long] = Some(StateTtlMs)): Dataset[VelocityOut] = {
    import input.sparkSession.implicits._
    val timeoutConf = if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    input
      .groupByKey(_.key)
      .flatMapGroupsWithState[PrevState, VelocityOut](OutputMode.Update, timeoutConf) {
        (key: String, rows: Iterator[KeyedMetric], state: GroupState[PrevState]) =>
          if (state.hasTimedOut) {
            // TTL expiry evicts state and emits NOTHING — the reference's
            // Redis TTL expiry is silent too; a synthetic row here would
            // refresh last-write-wins sinks with stale data every idle hour
            state.remove()
            Iterator.empty
          } else {
            // latest event in the batch wins (ZADD-overwrite semantics, K5)
            val cur = rows.maxBy(_.eventTimeMs).metric
            val prev = state.getOption.map(_.metric).getOrElse(cur)
            val velocity = math.max(0.0, cur - prev)
            val momentum = if (prev > 0) (cur - prev) / prev else 0.0
            state.update(PrevState(cur))
            stateTtlMs.foreach(state.setTimeoutDuration)
            Iterator.single(VelocityOut(key, cur, prev, velocity, momentum))
          }
      }
  }

  /** [[velocityStream]] on Spark 4's `transformWithState` — the modern
    * arbitrary-state API. Differences that matter at scale:
    *
    *  - TTL is a per-value property of the state ([[TTLConfig]]), enforced
    *    silently by the state store — exactly the reference's Redis-TTL
    *    semantics, with no ProcessingTimeTimeout machinery, no continuous
    *    no-data micro-batches, and no synthetic expiry rows.
    *  - requires the RocksDB state-store provider (the large-state
    *    backend; see RecoverySpec's RocksDB test).
    */
  class VelocityProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, KeyedMetric, VelocityOut] {
    @transient private var prev: org.apache.spark.sql.streaming.ValueState[Double] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      prev = getHandle.getValueState[Double]("prev",
        org.apache.spark.sql.Encoders.scalaDouble,
        if (ttl == null) org.apache.spark.sql.streaming.TTLConfig.NONE
        else org.apache.spark.sql.streaming.TTLConfig(ttl))
    override def handleInputRows(key: String, rows: Iterator[KeyedMetric],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[VelocityOut] = {
      val cur = rows.maxBy(_.eventTimeMs).metric
      val p = if (prev.exists()) prev.get() else cur
      prev.update(cur)
      Iterator.single(VelocityOut(key, cur, p,
        math.max(0.0, cur - p), if (p > 0) (cur - p) / p else 0.0))
    }
  }

  def velocityStreamTws(input: Dataset[KeyedMetric],
      ttl: Option[java.time.Duration] = Some(java.time.Duration.ofMillis(StateTtlMs)))
      : Dataset[VelocityOut] = {
    import input.sparkSession.implicits._
    // TTL'd state requires ProcessingTime mode; unlike the old
    // ProcessingTimeTimeout, it does NOT schedule continuous no-data
    // batches — bounded drives terminate normally
    val timeMode =
      if (ttl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    input
      .groupByKey(_.key)
      .transformWithState(new VelocityProcessor(ttl.orNull), timeMode, OutputMode.Update())
  }

  /** Batch twin of [[velocityStream]] over an ordered history — same
    * velocity definition via `lag`, used by the oracle-checked q28.
    */
  def velocityBatch(df: DataFrame, keyCols: Seq[String], orderCol: String,
      metricCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("prev", lag(col(metricCol), 1).over(w))
      .withColumn("velocity",
        when(col("prev").isNull, 0.0)
          .otherwise(greatest(col(metricCol) - col("prev"), lit(0.0))))
      .withColumn("momentum",
        when(col("prev").isNotNull && col("prev") > 0,
          (col(metricCol) - col("prev")) / col("prev")).otherwise(lit(0.0)))
  }

  val outputMode: OutputMode = OutputMode.Update()
}
