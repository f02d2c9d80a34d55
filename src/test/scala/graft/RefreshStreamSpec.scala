package graft

import java.nio.file.Files
import graft.operators.Generations
import graft.queries.LifecycleOps
import graft.streaming.RefreshStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The micro-batch refresh face (VERDICT r14 #3): stream ≡ batch on any
  * replayed prefix — the same parity discipline every other streamed
  * face pins — plus replay convergence (a redelivered micro-batch mints
  * no second generation) and the bronze fold's event semantics.
  */
class RefreshStreamSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.documents(spark, sf("sf0.001"))
      .filter(col("doc_id") < 300).select("doc_id", "text", "lang")

  private def events(df: DataFrame, op: String): Seq[RefreshStream.DocEvent] =
    df.select("doc_id", "text", "lang").collect().toSeq.map(r =>
      RefreshStream.DocEvent(r.getLong(0), r.getString(1), r.getString(2), op))

  private def eventsDf(evs: Seq[RefreshStream.DocEvent]): DataFrame = {
    import sqlImplicits._
    evs.toDF()
  }

  /** All committed generations' tiny frames as comparable row sets. */
  private def generationState(base: String): Seq[(Long, Set[String], Set[String])] =
    Generations.committed(spark, base).map { g =>
      val gd = Generations.dir(base, g)
      def rows(path: String, cols: Seq[String]): Set[String] =
        spark.read.parquet(path)
          .select(concat_ws(":", cols.map(col): _*).as("r"))
          .collect().map(_.getString(0)).toSet
      (g,
        rows(s"$gd/pack_input", Seq("okey", "n_tokens", "fp", "raw_fp")),
        rows(s"$gd/manifest",
          Seq("shard_id", "n_chunks", "n_tokens", "shard_fp")))
    }

  // three arrivals: build, change-some + delete-some, append a tail
  private def arrivals: (Seq[RefreshStream.DocEvent],
      Seq[RefreshStream.DocEvent], Seq[RefreshStream.DocEvent]) = {
    val all = docs
    val s0 = all.filter(col("doc_id") < 200)
    val changed = all.filter(col("doc_id") < 200 &&
        pmod(col("doc_id"), lit(11)) === 4)
      .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
        col("lang"))
    // disjoint from the changed set: one event per doc per batch
    val deleted = all.filter(col("doc_id") < 200 &&
      pmod(col("doc_id"), lit(13)) === 6 &&
      pmod(col("doc_id"), lit(11)) =!= 4)
    val tail = all.filter(col("doc_id") >= 200)
    (events(s0, "upsert"),
      events(changed, "upsert") ++
        deleted.select("doc_id").collect().toSeq
          .map(r => RefreshStream.DocEvent(r.getLong(0), "", "", "delete")),
      events(tail, "upsert"))
  }

  test("streamed refresh ≡ the batch chain, per generation, on every prefix") {
    val (b0, b1, b2) = arrivals
    // the stream side
    val base = Files.createTempDirectory("rs_stream").toString
    val bronze = Files.createTempDirectory("rs_bronze").toString
    val ckpt = Files.createTempDirectory("rs_ckpt").toString
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlImplicits._
    val source = MemoryStream[RefreshStream.DocEvent]
    val q = RefreshStream.attach(source.toDF(), base, bronze, ckpt)
    try {
      source.addData(b0); q.processAllAvailable()
      source.addData(b1); q.processAllAvailable()
      source.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // the batch side: the same cumulative snapshots, applied directly
    val refBase = Files.createTempDirectory("rs_batch").toString
    def fold(prior: DataFrame, evs: Seq[RefreshStream.DocEvent]): DataFrame = {
      val e = eventsDf(evs)
      prior.join(e.select(col("doc_id").as("__e")),
          col("doc_id") === col("__e"), "left_anti")
        .unionByName(e.filter(col("op") === "upsert")
          .select("doc_id", "text", "lang"))
        .localCheckpoint(true)
    }
    val s0 = fold(eventsDf(Nil).select("doc_id", "text", "lang"), b0)
    val s1 = fold(s0, b1)
    val s2 = fold(s1, b2)
    LifecycleOps.priorBuild(spark, refBase, s0)
    LifecycleOps.refreshTo(spark, refBase, s1)
    LifecycleOps.refreshTo(spark, refBase, s2)

    val got = generationState(base)
    val want = generationState(refBase)
    assert(got.map(_._1) == Seq(0L, 1L, 2L), s"generations: ${got.map(_._1)}")
    // any replayed prefix: generation g is the state after batch g, so
    // per-generation equality IS prefix parity for every prefix
    assert(got == want, "streamed generations diverge from the batch chain")
    // the face released its lease and recorded the last batch
    assert(Generations.leaseHolder(spark, base).isEmpty)
    assert(Generations.readMarker(spark,
      s"$base/${RefreshStream.BatchMarker}").contains("2"))
  }

  test("a redelivered micro-batch mints no second generation") {
    val (b0, b1, _) = arrivals
    val base = Files.createTempDirectory("rs_replay").toString
    val bronze = Files.createTempDirectory("rs_replay_bronze").toString
    RefreshStream.applyBatch(eventsDf(b0), 0L, base, bronze)
    RefreshStream.applyBatch(eventsDf(b1), 1L, base, bronze)
    val gens = Generations.committed(spark, base)
    assert(gens == Seq(0L, 1L))
    val state = generationState(base)
    // marker-guarded redelivery: skipped outright
    RefreshStream.applyBatch(eventsDf(b1), 1L, base, bronze)
    assert(generationState(base) == state)
    // the crash window: commit landed but the batch marker write did
    // not — roll the marker back and redeliver. The fold is idempotent
    // and the refresh diff is empty, so NO generation is minted.
    Generations.writeMarker(spark, s"$base/${RefreshStream.BatchMarker}", "0")
    RefreshStream.applyBatch(eventsDf(b1), 1L, base, bronze)
    assert(generationState(base) == state,
      "a replayed batch after a marker-write crash changed state")
    assert(Generations.readMarker(spark,
      s"$base/${RefreshStream.BatchMarker}").contains("1"))
  }

  test("a forgotten doc cannot resurrect through a later upsert, and the " +
      "streamed forget ≡ the batch deleteDocs chain per generation") {
    val all = docs
    val s0 = all.filter(col("doc_id") < 200)
    val forgetIds = s0.filter(pmod(col("doc_id"), lit(13)) === 6)
    val forgotten = forgetIds.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(forgotten.nonEmpty)
    val b0 = events(s0, "upsert")
    val b1 = forgotten.toSeq.sorted
      .map(id => RefreshStream.DocEvent(id, "", "", "forget"))
    // batch 2 re-upserts the forgotten docs (plus the fresh tail): the
    // resurrection attempt right-to-be-forgotten must survive
    val b2 = events(all.filter(col("doc_id") >= 200)
      .unionByName(s0.join(eventsDf(b1.toSeq).select("doc_id"),
        Seq("doc_id"), "left_semi")), "upsert")

    val base = Files.createTempDirectory("rs_forget").toString
    val bronze = Files.createTempDirectory("rs_forget_bronze").toString
    RefreshStream.applyBatch(eventsDf(b0), 0L, base, bronze)
    RefreshStream.applyBatch(eventsDf(b1), 1L, base, bronze)
    RefreshStream.applyBatch(eventsDf(b2), 2L, base, bronze)
    // no forgotten id in the final packing input
    val packedIds = LifecycleOps.currentPackInput(spark, base)
      .select(col("okey").cast("long")).collect().map(_.getLong(0)).toSet
    assert(packedIds.intersect(forgotten).isEmpty,
      "a forgotten doc resurrected through a later upsert")
    // parity: the batch chain is build(S0) → deleteDocs(forgotten) →
    // refreshTo(final bronze) — tombstones mask the re-upserts there too
    val refBase = Files.createTempDirectory("rs_forget_ref").toString
    LifecycleOps.priorBuild(spark, refBase, s0)
    LifecycleOps.deleteDocs(spark, refBase, forgetIds.select("doc_id"))
    LifecycleOps.refreshTo(spark, refBase,
      RefreshStream.readBronze(spark, bronze))
    assert(generationState(base) == generationState(refBase),
      "streamed forget diverges from the batch deleteDocs chain")
  }

  test("duplicate doc_id within one micro-batch is refused loudly") {
    val (b0, _, _) = arrivals
    val base = Files.createTempDirectory("rs_dup").toString
    val bronze = Files.createTempDirectory("rs_dup_bronze").toString
    val dup = b0 ++ b0.take(1)
    val e = intercept[IllegalArgumentException] {
      RefreshStream.applyBatch(eventsDf(dup), 0L, base, bronze)
    }
    assert(e.getMessage.contains("more than once"))
  }
}
