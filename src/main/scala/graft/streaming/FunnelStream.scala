package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.operators.Funnel.stages]]: per-user funnel
  * progression tracked incrementally with `flatMapGroupsWithState` — the
  * stage a user has reached is a few-fields state row, so a live
  * conversion dashboard needs no replay of the event log (the same
  * hot/cold split as the reference's velocity stream,
  * `streaming/spark_jobs/kafka_profile_stream.py`, applied to the
  * funnel).
  *
  * Semantics: within each micro-batch a user's events are processed in
  * EVENT-TIME order (sorted per group — out-of-order arrivals inside a
  * batch cannot mis-sequence the funnel), and a stage advances exactly
  * when the batch operator would advance it: the first `steps(k)` event
  * strictly after the stage-k time. On fully in-order input the emitted
  * transitions equal the batch funnel row-for-row (spec-pinned); a
  * CROSS-batch late event cannot retroactively improve an
  * already-advanced stage — the documented divergence of the
  * arrival-order family (the q129 streaming admission gate makes the
  * same trade), bounded by the source's out-of-orderness across batch
  * boundaries.
  *
  * State per user: (stage, t1Us, tkUs) — three longs and an int;
  * partitioned by user key, no driver involvement, no unbounded growth
  * (one row per user regardless of event volume).
  */
object FunnelStream {

  final case class FunnelEvent(userId: Long, tsUs: Long, eventType: String)
  final case class FunnelState(stage: Int, t1Us: Long, tkUs: Long)
  /** One row per stage TRANSITION: user reached `stage` (1-based) via
    * `step` at `tkUs`; `lagUs` = tkUs − t1Us (0 at stage 1).
    */
  final case class StageOut(userId: Long, stage: Int, step: String,
      t1Us: Long, tkUs: Long, lagUs: Long)

  implicit private val stateEnc: Encoder[FunnelState] = Encoders.product
  implicit private val outEnc: Encoder[StageOut] = Encoders.product

  /** Advance one user's funnel over a batch of their events (event-time
    * sorted), returning the transitions — shared verbatim by the stream
    * and any batch replay.
    */
  def advance(steps: Seq[String], st0: FunnelState,
      events: Seq[FunnelEvent]): (FunnelState, Seq[StageOut]) = {
    var st = st0
    val out = Seq.newBuilder[StageOut]
    events.sortBy(e => (e.tsUs, e.eventType)).foreach { e =>
      if (st.stage < steps.length && e.eventType == steps(st.stage) &&
        (st.stage == 0 || e.tsUs > st.tkUs)) {
        val t1 = if (st.stage == 0) e.tsUs else st.t1Us
        st = FunnelState(st.stage + 1, t1, e.tsUs)
        out += StageOut(0L, st.stage, e.eventType, t1, e.tsUs, e.tsUs - t1)
      }
    }
    (st, out.result())
  }

  /** The stateful stream: one [[StageOut]] per stage transition, Update
    * mode (a user's rows are independent appends — each transition
    * emits once).
    */
  def funnelStream(input: Dataset[FunnelEvent],
      steps: Seq[String]): Dataset[StageOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import input.sparkSession.implicits._
    input.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, StageOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val st0 = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
          val (st, out) = advance(steps, st0, rows.toSeq)
          if (st != st0) state.update(st)
          out.map(_.copy(userId = user)).iterator
      }
  }
}
