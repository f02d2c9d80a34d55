package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The iterative-operator materialization discipline, factored ONCE.
  *
  * Rule (PERF_NOTES r11, measured three times at real cost — k-core
  * 127.5→55 s, q131 CC 14.25→4.9 s, q151 HITS 43.5 s): ANY frame with
  * more than one consumer inside an iterative operator must be EAGERLY
  * materialized, however small. A lazy frame consumed twice inside a
  * loop body re-derives its whole subtree per consumer per round —
  * 2^rounds plan growth when round r's output feeds round r+1 — so the
  * loop that "works at sf0.01" is non-terminating at corpus scale.
  *
  * Two mechanics make the rule non-trivial to apply by hand, which is
  * why every new iterative operator has rediscovered it:
  *
  *   1. `Dataset.localCheckpoint(eager = true)` truncates lineage and
  *      parks blocks OUTSIDE the cache manager — `Dataset.unpersist`
  *      and `catalog.clearCache` never free them, so a loop that
  *      checkpoints per round pins up to `rounds` node-sized frames in
  *      executor storage until driver GC happens to run the
  *      ContextCleaner (the r10 leak finding). Release must be by
  *      tracked RDD id.
  *   2. Release order matters: a checkpointed RDD cannot be recomputed
  *      (its lineage is gone), so a round's blocks may only be dropped
  *      AFTER everything derived from them has itself been
  *      materialized.
  *
  * [[Iterate.Loop]] encodes both: `ckpt` eagerly checkpoints into the
  * current GENERATION, `next()` closes a generation and releases all
  * but the newest `keep` closed ones (safe because by then the newer
  * generation is materialized), `pin` checkpoints loop-lifetime frames
  * (static edge lists, per-round accumulator rows), and
  * `finish`/`finishKeepCurrent` release every block the loop created
  * except the ones backing the returned result. A loop on this helper
  * is safe by construction: constant lineage depth, bounded storage
  * (≤ keep+1 generations + pins), and exactly one result checkpoint
  * left behind — the contract the `assertReleases` specs pin.
  */
object Iterate {

  final class Loop(spark: SparkSession) {
    private val sc = spark.sparkContext
    private var cur: Set[Int] = Set.empty
    private var closed: List[Set[Int]] = Nil // newest first
    private var pinnedIds: Set[Int] = Set.empty

    private def tracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint(true)
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }

    private def release(ids: Iterable[Int]): Unit =
      ids.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

    /** Eagerly checkpoint `df` into the current generation. Use for
      * every per-round frame with >1 consumer (including the next
      * round itself).
      */
    def ckpt(df: DataFrame): DataFrame = {
      val (o, ids) = tracked(df)
      cur ++= ids
      o
    }

    /** Eagerly checkpoint `df` OUTSIDE the generations — for static
      * frames every round re-reads (edge lists, node universes) and
      * for small per-round accumulator rows that must outlive their
      * round (a profile row referencing that round's frames must be
      * materialized before `next` can release them). Freed by
      * [[finish]]/[[finishKeepCurrent]].
      */
    def pin(df: DataFrame): DataFrame = {
      val (o, ids) = tracked(df)
      pinnedIds ++= ids
      o
    }

    /** Close the current generation; release all but the newest `keep`
      * closed generations. Call at the TOP of each round: by then the
      * previous round's outputs are materialized and nothing can reach
      * the rounds before it.
      */
    def next(keep: Int = 1): Unit = {
      closed = cur :: closed
      val (kept, dropped) = closed.splitAt(keep)
      dropped.foreach(release)
      closed = kept
      cur = Set.empty
    }

    /** Materialize the loop's final output (derived from live
      * generation/pinned frames), then release EVERY block this loop
      * created. The output's own checkpoint is the only storage left
      * behind.
      */
    def finish(out: DataFrame): DataFrame = {
      val (o, _) = tracked(out)
      releaseAll()
      o
    }

    /** Like [[finish]] for a result that already IS a current-generation
      * checkpoint: releases everything else without re-copying the
      * result's blocks.
      */
    def finishKeepCurrent(out: DataFrame): DataFrame = {
      closed.foreach(release)
      release(pinnedIds)
      closed = Nil
      pinnedIds = Set.empty
      cur = Set.empty // the result's blocks — now owned by the caller
      out
    }

    /** Release everything tracked (generations + pins). Use on error
      * paths or when the loop's result has been reduced to the driver.
      */
    def releaseAll(): Unit = {
      (cur :: closed).foreach(release)
      release(pinnedIds)
      cur = Set.empty
      closed = Nil
      pinnedIds = Set.empty
    }
  }

  /** Scoped loop: the helper is created, used, and (on exceptions)
    * drained inside `body` — no storage can leak past a throw.
    */
  def loop[A](spark: SparkSession)(body: Loop => A): A = {
    val l = new Loop(spark)
    try body(l)
    catch { case t: Throwable => l.releaseAll(); throw t }
  }

  /** The common single-state shape: `rounds` applications of `round`,
    * each round's state eagerly checkpointed and the previous round's
    * blocks released once it is. Returns the final state's checkpoint —
    * the only storage left behind.
    */
  def materializedIterate(init: DataFrame, rounds: Int)(
      round: (DataFrame, Int) => DataFrame): DataFrame =
    loop(init.sparkSession) { l =>
      var state = l.ckpt(init)
      for (r <- 1 to rounds) {
        l.next()
        state = l.ckpt(round(state, r))
      }
      l.finishKeepCurrent(state)
    }
}
