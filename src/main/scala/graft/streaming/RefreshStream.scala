package graft.streaming

import graft.operators.{Eager, Generations}
import graft.queries.LifecycleOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The micro-batch REFRESH face (VERDICT r14 #3): `foreachBatch`
  * driving one lifecycle cycle per micro-batch, with per-batch atomic
  * commit — the face that aligns the streaming layer with the
  * generation protocol. Every other streamed face owns its own
  * batch-partitioned index root; this one owns a lifecycle state root,
  * and crosses that line BY the rules: each micro-batch acquires the
  * writer lease (inside priorBuild/refreshTo), sweeps uncommitted
  * debris, and commits one generation, so a concurrent batch
  * maintenance cycle on the same base serializes on the lease instead
  * of interleaving (cf. reference `streaming/spark_jobs/
  * trending_stream.py:143`'s foreachBatch shape — there sinking scores,
  * here driving corpus maintenance).
  *
  * Events are UPSERT/DELETE rows against a bronze snapshot the face
  * maintains alongside (`bronzeDir/b=<batchId>` — one immutable
  * directory per applied batch, resolved by `_SUCCESS`, pruned to a
  * two-deep history). Folding a batch is idempotent (upsert = replace
  * by id, delete = drop id) and the driven refresh is `skipIfNoop`, so
  * the face is REPLAY-CONVERGENT under foreachBatch's at-least-once
  * contract: a batch redelivered after a crash anywhere — mid-bronze
  * write, mid-cycle, after commit but before the batch marker — folds
  * the same bronze again, finds an empty corpus diff, and mints NO
  * second generation. Stream ≡ batch parity on any replayed prefix is
  * the same discipline every other face pins (RefreshStreamSpec; q213's
  * oracle is the from-scratch rebuild of the final arrival state).
  *
  * Scale posture: the delete set and upsert set ride the micro-batch
  * (small); the bronze fold is one anti-join + union writing a new
  * snapshot directory; the refresh cycle's tokenization is ∝ the
  * batch's effective delta (LifecycleOps.refreshTo's contract). The
  * bronze rewrite itself is corpus-sized per batch — at 100 TB the
  * bronze of record is an external table and [[applyBatch]] would take
  * its snapshot reference instead; the FACE (fold → lease → cycle →
  * marker) is unchanged.
  */
object RefreshStream {

  /** One arrival: `op` ∈ upsert | delete | forget (text/lang ignored
    * for the last two). `delete` is SNAPSHOT removal — the doc leaves
    * the corpus but a later upsert re-admits it. `forget` is
    * right-to-be-forgotten: a durable tombstone is written into the
    * state root BEFORE the cycle, so this and every later refresh
    * masks the id — a later upsert of a forgotten doc stays out
    * (RefreshStreamSpec pins non-resurrection and parity with the
    * batch deleteDocs chain).
    */
  case class DocEvent(doc_id: Long, text: String, lang: String, op: String)

  /** Marker under the state root recording the highest APPLIED batch id
    * — the guard that refuses out-of-order manual re-drives. Written
    * atomically AFTER the cycle commits; the crash window between
    * commit and marker is covered by noop-skip convergence, not by the
    * marker.
    */
  private[graft] val BatchMarker = "_STREAM_BATCH"

  private val BronzeCols = Seq("doc_id", "text", "lang")

  /** Attach the face to an event stream (doc_id, text, lang, op). */
  def attach(events: DataFrame, base: String, bronzeDir: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, base, bronzeDir)
      }
      .start()

  /** Applied-batch bronze versions under `bronzeDir`, ascending —
    * directories `b=<id>` whose parquet write completed (`_SUCCESS`);
    * a crash mid-write leaves no `_SUCCESS` and the replay overwrites
    * the same directory.
    */
  private def bronzeVersions(s: SparkSession, bronzeDir: String): Seq[Long] = {
    val root = new Path(bronzeDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("b="))
      .flatMap(n => scala.util.Try(n.stripPrefix("b=").toLong).toOption)
      .filter(v => fs.exists(new Path(s"$bronzeDir/b=$v/_SUCCESS")))
      .sorted
  }

  /** The current bronze snapshot (highest complete version, or empty). */
  def readBronze(s: SparkSession, bronzeDir: String): DataFrame =
    bronzeVersions(s, bronzeDir).lastOption match {
      case Some(v) => s.read.parquet(s"$bronzeDir/b=$v")
        .select(BronzeCols.map(col): _*)
      case None =>
        import s.implicits._
        Seq.empty[(Long, String, String)].toDF(BronzeCols: _*)
    }

  /** Fold one micro-batch and drive one lifecycle cycle. Idempotent per
    * batch id; batches at or below the applied marker are skipped.
    */
  def applyBatch(batch: DataFrame, batchId: Long, base: String,
      bronzeDir: String): Unit = {
    val s = batch.sparkSession
    val markerPath = s"$base/$BatchMarker"
    if (Generations.readMarker(s, markerPath).map(_.toLong)
        .exists(batchId <= _)) return
    val evs = batch.select(col("doc_id").cast("long").as("doc_id"),
      col("text"), col("lang"), col("op"))
    // one event per doc per batch: two events for one id in one
    // micro-batch have no defined order (micro-batch rows are a set) —
    // refuse loudly rather than pick one silently
    val dup = evs.groupBy("doc_id").count().filter(col("count") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"micro-batch $batchId carries doc_id ${dup.headOption.map(_.getLong(0))
        .getOrElse(-1L)} more than once — per-batch events must be " +
        "unique per doc_id")
    // right-to-be-forgotten events: the durable tombstone is the FIRST
    // write (same discipline as LifecycleOps.deleteDocs — a crash
    // anywhere later leaves the record in place; the replay re-writes
    // the same ids, and tombstone anti-joins are duplicate-tolerant).
    // The cycle below then sees the ids as removed AND masks them out
    // of every later snapshot.
    val forgets = evs.filter(col("op") === "forget").select("doc_id")
    if (forgets.limit(1).count() > 0L)
      IndexMaintenance.writeTombstones(forgets, "doc_id", base,
        LifecycleOps.nextTombstoneBatch(s, base))
    val prior = readBronze(s, bronzeDir)
    // fold: touched ids out, upserts back in (delete/forget = not
    // re-added)
    val (next, releaseNext) = Eager.checkpoint(
      prior.join(evs.select(col("doc_id").as("__ev_id")),
          col("doc_id") === col("__ev_id"), "left_anti")
        .unionByName(evs.filter(col("op") === "upsert")
          .select(BronzeCols.map(col): _*)))
    next.write.mode("overwrite").parquet(s"$bronzeDir/b=$batchId")
    val bronze = readBronze(s, bronzeDir)
    if (Generations.current(s, base).isEmpty)
      LifecycleOps.priorBuild(s, base, bronze)
    else
      LifecycleOps.refreshTo(s, base, bronze, skipIfNoop = true)
    releaseNext()
    // prune bronze history (keep the applied version + its predecessor)
    val fs = new Path(bronzeDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    bronzeVersions(s, bronzeDir).dropRight(2)
      .foreach(v => fs.delete(new Path(s"$bronzeDir/b=$v"), true))
    Generations.writeMarker(s, markerPath, batchId.toString)
  }
}
