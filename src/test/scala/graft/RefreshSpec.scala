package graft

import java.nio.file.Files
import graft.operators.Packing
import graft.queries.LifecycleOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The refresh cycle is DURABLE: each [[LifecycleOps.refreshTo]] writes
  * its merged artifacts / packing input / manifest back, so consecutive
  * refreshes chain — and every cycle's outcome still hash-matches a
  * from-scratch rebuild of that snapshot (the q206 contract, iterated).
  */
class RefreshSpec extends SparkSpec {

  private def fromScratchManifest(docs: DataFrame) = {
    val (pack, _) = LifecycleOps.globalStages(LifecycleOps.docArtifacts(docs))
    Packing.shardManifest(
        Packing.packChunks(pack, "okey", "tk", 256,
          substring(col("okey"), 1, 8)), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq
  }

  private def manifestOf(result: DataFrame) = result
    .filter(col("status") =!= "removed")
    .select("shard_id", "n_chunks", "n_tokens", "shard_fp")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).sortBy(_._1).toSeq

  test("two consecutive refreshes each equal a from-scratch rebuild") {
    val all = Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text", "lang")
    val ids = all.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut1 = ids(ids.length * 8 / 10)
    val cut2 = ids(ids.length * 9 / 10)
    val a = all.filter(col("doc_id") < cut1)
    // B: growth + one tail change
    val b = all.filter(col("doc_id") < cut2)
      .select(col("doc_id"),
        when(col("doc_id") === cut1 - 1, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"), col("lang"))
    // C: full corpus, one doc from B removed, another changed again
    val c = all.filter(col("doc_id") =!= cut1 - 2)
      .select(col("doc_id"),
        when(col("doc_id") === cut2 - 1, concat(col("text"), lit(" v3")))
          .otherwise(col("text")).as("text"), col("lang"))

    val base = Files.createTempDirectory("refreshcycle").toString
    LifecycleOps.priorBuild(spark, base, a)
    val r1 = LifecycleOps.refreshTo(spark, base, b)
    assert(manifestOf(r1) == fromScratchManifest(b), "cycle 1 != rebuild(B)")
    // the SECOND cycle consumes cycle 1's written-back state
    val r2 = LifecycleOps.refreshTo(spark, base, c)
    assert(manifestOf(r2) == fromScratchManifest(c), "cycle 2 != rebuild(C)")
    // the delta stays a delta: cycle 2 reprocessed only C's changes vs B
    val n2 = r2.select("n_delta", "n_removed").collect()(0)
    assert(n2.getLong(0) >= 1 && n2.getLong(0) < ids.length / 2,
      s"cycle-2 delta not delta-sized: ${n2.getLong(0)}")
    assert(n2.getLong(1) == 1L, s"cycle-2 removed ${n2.getLong(1)}")
    // and the on-disk shards audit clean against the committed manifest
    val audit = Packing.auditShards(spark, s"$base/shards",
      LifecycleOps.currentManifest(spark, base))
    assert(audit.filter(!col("fp_match") || !col("chunks_match") ||
      !col("tokens_match")).count() == 0L)
  }

  test("streamed tombstones fold at the next refresh (stream ≡ batch)") {
    implicit val ctx = spark.sqlContext
    import sqlImplicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.RetrievalStream
    val all = Tables.documents(spark, sf("sf0.001"))
      .filter(col("doc_id") % 2 === 1).select("doc_id", "text", "lang")
    val ids = all.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 8 / 10)
    val a = all.filter(col("doc_id") < cut)
    val base = Files.createTempDirectory("streamtomb").toString
    LifecycleOps.priorBuild(spark, base, a)
    // the deletion STREAM records tombstones per micro-batch (the same
    // generic face the index stores use — cheap, replay-idempotent);
    // the PHYSICAL fold is deferred to the next refresh cycle, the
    // maintenance split a per-batch repack could never afford at 100 TB
    val del = ids.filter(_ % 19 == 3).filter(_ < cut)
    val source = MemoryStream[Long]
    val sq = RetrievalStream.deletionIngest(
      source.toDF().select(col("value").as("doc_id")), "doc_id", base)
    try {
      source.addData(del.take(del.length / 2): _*)
      sq.processAllAvailable()
      source.addData(del.drop(del.length / 2): _*) // second micro-batch
      sq.processAllAvailable()
    } finally sq.stop()
    // the next refresh targets the FULL corpus (which still contains
    // every streamed id) and must fold the stream's deletions
    val r = LifecycleOps.refreshTo(spark, base, all)
    val survivors = all.filter(!col("doc_id").isin(del: _*))
    assert(manifestOf(r) == fromScratchManifest(survivors),
      "refresh after a tombstone stream != rebuild(snapshot minus stream)")
    assert(r.select("n_masked").collect()(0).getLong(0) == del.length.toLong)
  }

  test("a case-only edit repacks its shard (raw diff key, ADVICE r13)") {
    val all = Tables.documents(spark, sf("sf0.001"))
      .filter(col("doc_id") % 2 === 0).select("doc_id", "text", "lang")
    val base = Files.createTempDirectory("caseonly").toString
    LifecycleOps.priorBuild(spark, base, all)
    // flip the case of one MID-STREAM doc that actually PACKED (a
    // gate/mix-dropped doc would make the check vacuous) and whose
    // text has case to flip: the normalized fingerprint and token
    // count are both unchanged, so a normalized diff key would
    // classify the doc as unchanged and leave its stale shard on
    // disk; the raw md5(text) key must catch it
    val packed = LifecycleOps.currentPackInput(spark, base)
      .select(col("okey").cast("long").as("doc_id"))
      .join(all.filter(col("text") =!= upper(col("text"))), Seq("doc_id"),
        "left_semi")
      .collect().map(_.getLong(0)).sorted
    val target = packed(packed.length / 2)
    val b = all.select(col("doc_id"),
      when(col("doc_id") === target, upper(col("text")))
        .otherwise(col("text")).as("text"), col("lang"))
    val r = LifecycleOps.refreshTo(spark, base, b)
    assert(manifestOf(r) == fromScratchManifest(b),
      "case-only edit left a stale shard (diff key missed it)")
    // the edit was detected as exactly one delta doc...
    assert(r.select("n_delta").collect()(0).getLong(0) == 1L)
    // ...and at least one shard actually rewrote (the upper-cased
    // chunk's fingerprint differs even though every position matches)
    assert(r.filter(col("status") === "rewritten").count() >= 1L)
    // the disk matches, not just the manifest arithmetic
    val audit = Packing.auditShards(spark, s"$base/shards",
      LifecycleOps.currentManifest(spark, base))
    assert(audit.filter(!col("fp_match") || !col("chunks_match") ||
      !col("tokens_match")).count() == 0L)
  }
}
