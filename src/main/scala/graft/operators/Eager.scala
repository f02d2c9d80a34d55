package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Eager materialization with a DIRECT release handle (ADVICE r14).
  *
  * The repo's read-then-overwrite discipline eagerly
  * `localCheckpoint(true)`s any frame that lazily reads a path about to
  * be overwritten. Checkpoint blocks live OUTSIDE the cache manager, so
  * they must be released by RDD id once consumed — and the pre-r15
  * tracking (diffing `sc.getPersistentRDDs.keySet` around the
  * checkpoint call) would capture and later unpersist ANY RDD persisted
  * concurrently by another query in the same SparkSession, destroying
  * that query's only lineage. The writer lease serializes writers on a
  * STORE; it cannot serialize session-level concurrency. This helper
  * instead pulls the checkpointed RDD straight off the returned frame's
  * plan (a `localCheckpoint` frame is a `LogicalRDD` leaf over exactly
  * the persisted RDD), so release touches nothing but its own blocks.
  */
object Eager {

  /** `df.localCheckpoint(eager = true)` plus a release thunk that
    * unpersists exactly the checkpointed RDD backing the returned
    * frame. Idempotent; releasing while a consumer still needs the
    * frame makes it unrecoverable (checkpointing truncates lineage), so
    * release only after every consumer has run.
    */
  def checkpoint(df: DataFrame): (DataFrame, () => Unit) = {
    val ck = df.localCheckpoint(true)
    (ck, () => release(ck))
  }

  /** Unpersist the checkpointed RDD backing an ALREADY-checkpointed
    * frame (a no-op on frames that are not checkpoint leaves) — for
    * releasing a frame some callee checkpointed and handed back.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }
      .foreach(_.unpersist(blocking = false))
}
