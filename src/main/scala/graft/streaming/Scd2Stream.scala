package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.operators.Snapshot.scd2Intervals]]: the
  * SCD Type-2 dimension maintained incrementally with
  * `flatMapGroupsWithState` — the OPEN version per key is a
  * few-fields state row, each attribute change emits the CLOSED
  * interval exactly once, so the dimension table appends forever
  * without replaying the change log (the warehouse twin of the
  * reference's latest-state overwrite tables, kept historical).
  *
  * Semantics: within each micro-batch a key's events collapse per
  * same-µs timestamp by MIN attr (non-null before null — the batch
  * operator's collision rule verbatim) and then fold in EVENT-TIME
  * order, so out-of-order arrivals inside a batch cannot mis-sequence
  * versions. On a full in-order replay the emitted closed intervals
  * equal the batch operator's closed rows row-for-row, and state holds
  * the batch's open version (both spec-pinned). A CROSS-batch late
  * event (ts ≤ the open version's last-seen ts) cannot be sequenced
  * retroactively and is dropped — the documented arrival-order trade
  * of this family ([[FunnelStream]], the q129 admission gate), bounded
  * by the source's out-of-orderness across batch boundaries.
  *
  * State per key: (version, value, fromUs, lastUs, nRows) — one row
  * per key regardless of event volume, partitioned by key, no driver
  * involvement.
  */
object Scd2Stream {

  final case class AttrEvent(key: Long, tsUs: Long, attr: String)
  final case class OpenVersion(version: Long, value: String,
      fromUs: Long, lastUs: Long, nRows: Long, defined: Boolean)
  /** One row per CLOSED interval — `[fromUs, toUs)`, the batch
    * operator's closed-row schema.
    */
  final case class ClosedInterval(key: Long, version: Long, value: String,
      fromUs: Long, toUs: Long, nRows: Long)

  implicit private val stateEnc: Encoder[OpenVersion] = Encoders.product
  implicit private val outEnc: Encoder[ClosedInterval] = Encoders.product

  private val Empty = OpenVersion(0L, null, 0L, Long.MinValue, 0L,
    defined = false)

  /** Fold one key's batch of events (collision-collapsed, time-sorted)
    * into the open-version state, returning closed intervals — shared
    * verbatim by the stream and the spec's batch replay.
    */
  def advance(st0: OpenVersion,
      events: Seq[AttrEvent]): (OpenVersion, Seq[ClosedInterval]) = {
    // per-µs collision collapse: min non-null attr, null only if all null
    val collapsed = events.groupBy(_.tsUs).toSeq.map { case (ts, g) =>
      val nn = g.map(_.attr).filter(_ != null)
      AttrEvent(g.head.key, ts, if (nn.isEmpty) null else nn.min)
    }.sortBy(_.tsUs)
    var st = st0
    val out = Seq.newBuilder[ClosedInterval]
    collapsed.foreach { e =>
      if (e.tsUs > st.lastUs) {
        if (!st.defined) {
          st = OpenVersion(1L, e.attr, e.tsUs, e.tsUs, 1L, defined = true)
        } else if (st.value == e.attr) { // null-safe: both-null continues
          st = st.copy(lastUs = e.tsUs, nRows = st.nRows + 1L)
        } else {
          out += ClosedInterval(e.key, st.version, st.value, st.fromUs,
            e.tsUs, st.nRows)
          st = OpenVersion(st.version + 1L, e.attr, e.tsUs, e.tsUs, 1L,
            defined = true)
        }
      } // else: cross-batch late event — unsequenceable, dropped
    }
    (st, out.result())
  }

  /** The stateful stream: one [[ClosedInterval]] per version close,
    * Update mode (each closed interval emits exactly once).
    */
  def scd2Stream(input: Dataset[AttrEvent]): Dataset[ClosedInterval] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.key)
      .flatMapGroupsWithState[OpenVersion, ClosedInterval](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[AttrEvent], state: GroupState[OpenVersion]) =>
          val st0 = state.getOption.getOrElse(Empty)
          val (st, out) = advance(st0, rows.toSeq)
          if (st != st0) state.update(st)
          out.map(_.copy(key = key)).iterator
      }
  }
}
