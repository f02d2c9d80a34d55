package graft

import java.nio.file.Files
import graft.operators.{Generations, Packing}
import graft.queries.LifecycleOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Versioned rollback (VERDICT r13 #1): after two refreshes the state
  * can roll back to EITHER prior generation and hash-match that
  * snapshot's from-scratch rebuild; a rollback fed the wrong snapshot
  * aborts loudly BEFORE any shard is touched; and right-to-be-
  * forgotten survives rollback — a tombstoned doc never resurrects,
  * even when the rollback target predates the deletion.
  */
class RollbackSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.documents(spark, sf("sf0.001"))
      .filter(pmod(col("doc_id"), lit(2)) === 0)
      .select("doc_id", "text", "lang")

  private def fromScratchManifest(d: DataFrame) = {
    val (pack, _) = LifecycleOps.globalStages(LifecycleOps.docArtifacts(d))
    Packing.shardManifest(
        Packing.packChunks(pack, "okey", "tk", 256,
          substring(col("okey"), 1, 8)), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq
  }

  private def committedManifest(base: String) =
    LifecycleOps.currentManifest(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq

  test("rollback after two refreshes reaches either generation") {
    val all = docs
    val ids = all.select("doc_id").collect().map(_.getLong(0)).sorted
    val (cut1, cut2) = (ids(ids.length * 7 / 10), ids(ids.length * 85 / 100))
    val a = all.filter(col("doc_id") < cut1)
    val b = all.filter(col("doc_id") < cut2)
    val c = all

    val base = Files.createTempDirectory("rollback2").toString
    LifecycleOps.priorBuild(spark, base, a)      // gen 0
    LifecycleOps.refreshTo(spark, base, b)       // gen 1
    LifecycleOps.refreshTo(spark, base, c)       // gen 2

    // back to the MIDDLE generation
    LifecycleOps.rollbackTo(spark, base, 1L, b)  // gen 3 ≡ gen 1
    assert(committedManifest(base) == fromScratchManifest(b),
      "rollback to generation 1 != rebuild(B)")
    // then all the way back to the first
    LifecycleOps.rollbackTo(spark, base, 0L, a)  // gen 4 ≡ gen 0
    assert(committedManifest(base) == fromScratchManifest(a),
      "rollback to generation 0 != rebuild(A)")
    // history only moves forward, and every step committed
    assert(Generations.committed(spark, base) == Seq(0L, 1L, 2L, 3L, 4L))
    // the disk shards audit clean against the rolled-back manifest
    val audit = Packing.auditShards(spark, s"$base/shards",
      LifecycleOps.currentManifest(spark, base))
    assert(audit.filter(!col("fp_match") || !col("chunks_match") ||
      !col("tokens_match")).count() == 0L)
  }

  test("rollback with the wrong snapshot aborts before touching shards") {
    val all = docs
    val ids = all.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 8 / 10)
    val a = all.filter(col("doc_id") < cut)
    val base = Files.createTempDirectory("rollback_wrong").toString
    LifecycleOps.priorBuild(spark, base, a)
    LifecycleOps.refreshTo(spark, base, all)
    val before = committedManifest(base)
    val filesBefore = graft.streaming.IndexMaintenance
      .dataFileCount(spark, s"$base/shards")
    // "roll back to generation 0" but hand it the WRONG snapshot
    val e = intercept[IllegalArgumentException] {
      LifecycleOps.rollbackTo(spark, base, 0L,
        all.filter(col("doc_id") < ids(ids.length / 2)))
    }
    assert(e.getMessage.contains("not that generation's snapshot"))
    // nothing committed, nothing rewritten
    assert(Generations.committed(spark, base) == Seq(0L, 1L))
    assert(committedManifest(base) == before)
    assert(graft.streaming.IndexMaintenance
      .dataFileCount(spark, s"$base/shards") == filesBefore)
    // and an unknown generation is refused outright
    val e2 = intercept[IllegalArgumentException] {
      LifecycleOps.rollbackTo(spark, base, 7L, a)
    }
    assert(e2.getMessage.contains("not committed"))
  }

  test("right-to-be-forgotten survives rollback across a deletion") {
    val all = docs
    val ids = all.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 8 / 10)
    val a = all.filter(col("doc_id") < cut)
    val base = Files.createTempDirectory("rollback_rtbf").toString
    LifecycleOps.priorBuild(spark, base, a)                  // gen 0
    val del = a.filter(pmod(col("doc_id"), lit(19)) === 3).select("doc_id")
    LifecycleOps.deleteDocs(spark, base, del)                // gen 1
    // rolling back to the PRE-deletion generation must not resurrect:
    // the contract degrades to ≡ rebuild of (snapshot minus tombstones)
    LifecycleOps.rollbackTo(spark, base, 0L, a)              // gen 2
    val aSurvivors = a.join(del, Seq("doc_id"), "left_anti")
    assert(committedManifest(base) == fromScratchManifest(aSurvivors),
      "rollback across deletion != rebuild(snapshot minus tombstones)")
    // no tombstoned okey in the restored packing input
    val packed = LifecycleOps.currentPackInput(spark, base)
      .join(del.select(lpad(col("doc_id").cast("string"), 10, "0")
        .as("okey")), Seq("okey"), "left_semi").count()
    assert(packed == 0L, "tombstoned doc resurrected by rollback")
  }
}
