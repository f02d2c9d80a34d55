package graft

import java.nio.file.Files
import graft.operators.{Dedup, Packing, Retrieval, Similarity}
import graft.streaming.{IndexMaintenance, RetrievalStream, StreamingDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Targeted deletion / right-to-be-forgotten across every persisted
  * store (VERDICT r12 #1). The contract, per store:
  *
  *  - post-delete reads hash-match a FROM-SCRATCH rebuild on the
  *    surviving corpus (the q205 oracle pins the same at sf0.01);
  *  - a deleted doc can never be emitted as a search hit, a candidate
  *    pair side, a seen digest, a vector-store hit, or a shard member;
  *  - deletion is idempotent and compaction applies it physically;
  *  - everything the deletion did NOT change stays untouched on disk
  *    (file-level pin for the cell store and shard dirs).
  */
class DeletionSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    (1L, "spark shuffles data between stages"),
    (2L, "a hash join builds a table"),
    (3L, "spark spark spark join"),
    (4L, "the join key decides the shuffle"),
    (5L, "windows order rows within partitions"),
    (6L, "a hash join builds a table quickly"))
  private def docsDF = docs.toDF("doc_id", "text")
  private val deleted = Seq(2L, 3L)
  private def survivorsDF = docsDF.filter(!col("doc_id").isin(deleted: _*))
  private def delDF = deleted.toDF("doc_id")

  private def bm25Rows(df: DataFrame) = df
    .select("qid", "doc", "score_u", "rnk").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    .sortBy(t => (t._1, t._4)).toSeq

  test("retrieval index: delete ≡ rebuild, deleted never a hit, compaction physical") {
    val dir = Files.createTempDirectory("delidx").toString
    val q = Seq((1L, "spark"), (2L, "join"), (2L, "table")).toDF("qid", "term")
    RetrievalStream.indexBatch(docsDF.filter(col("doc_id") <= 3), 0L,
      "doc_id", "text", dir)
    RetrievalStream.indexBatch(docsDF.filter(col("doc_id") > 3), 1L,
      "doc_id", "text", dir)
    RetrievalStream.deleteDocs(delDF, "doc_id", dir, batchId = 0L)
    val expect = bm25Rows(Retrieval.bm25TopK(survivorsDF, "doc_id", "text", q, 10))
    val got = bm25Rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10))
    assert(got == expect && got.nonEmpty)
    assert(!got.exists(r => deleted.contains(r._2)), "deleted doc surfaced")
    // idempotent replay of the deletion batch
    RetrievalStream.deleteDocs(delDF, "doc_id", dir, batchId = 0L)
    assert(bm25Rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10)) == expect)
    // compaction folds history minus the tombstoned rows — physically
    assert(RetrievalStream.compact(spark, dir, upToBatch = 2L) == 2L)
    assert(bm25Rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10)) == expect)
    val onDisk = spark.read.parquet(s"$dir/postings")
      .select("doc").distinct().collect().map(_.getLong(0)).toSet
    assert(deleted.forall(d => !onDisk.contains(d)),
      s"tombstoned docs still on disk after compaction: $onDisk")
  }

  test("minhash screen: deleted doc never a candidate side; screen ≡ rebuilt index") {
    val dir = Files.createTempDirectory("delminhash").toString
    val dirRebuild = Files.createTempDirectory("delminhashrb").toString
    // ingest full corpus in two batches, then delete
    StreamingDedup.screenAndIndexBatch(docsDF.filter(col("doc_id") <= 3), 0L,
      "doc_id", "text", dir).collect()
    StreamingDedup.screenAndIndexBatch(docsDF.filter(col("doc_id") > 3), 1L,
      "doc_id", "text", dir).collect()
    StreamingDedup.deleteDocs(delDF, "doc_id", dir, batchId = 0L)
    // rebuild baseline: survivors only
    StreamingDedup.screenAndIndexBatch(survivorsDF, 0L, "doc_id", "text",
      dirRebuild).collect()
    // probe: near-copies of docs 2 (deleted) and 6 (survivor)
    val probe = Seq((102L, "a hash join builds a table"),
      (106L, "a hash join builds a table quickly")).toDF("doc_id", "text")
    def cands(idxDir: String, batchId: Long) = StreamingDedup
      .screenAndIndexBatch(probe, batchId, "doc_id", "text", idxDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val got = cands(dir, 2L)
    val expect = cands(dirRebuild, 1L)
    assert(got == expect, s"got $got expect $expect")
    assert(!got.exists(p => deleted.contains(p._1) || deleted.contains(p._2)),
      s"deleted doc emitted as candidate: $got")
    // the survivor twin still collides; the deleted twin is forgotten
    assert(got.exists(p => p._1 == 6L || p._2 == 6L))
    // compaction applies tombstones physically (probe batches replayable)
    assert(StreamingDedup.compactIndex(spark, dir, upToBatch = 2L) >= 1L)
    val onDisk = spark.read.parquet(dir).filter(col("batch_id") === -1L)
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(deleted.forall(d => !onDisk.contains(d)), onDisk.toString)
  }

  test("segment screen: a deleted doc's content becomes unseen unless shared") {
    val dir = Files.createTempDirectory("delseg").toString
    val dirRebuild = Files.createTempDirectory("delsegrb").toString
    val w = 4 // 4-token segments
    StreamingDedup.screenSegmentsBatch(docsDF.filter(col("doc_id") <= 3), 0L,
      "doc_id", "text", dir, w).collect()
    StreamingDedup.screenSegmentsBatch(docsDF.filter(col("doc_id") > 3), 1L,
      "doc_id", "text", dir, w).collect()
    StreamingDedup.deleteDocs(delDF, "doc_id", dir, batchId = 0L)
    StreamingDedup.screenSegmentsBatch(survivorsDF, 0L, "doc_id", "text",
      dirRebuild, w).collect()
    // re-ingest the DELETED doc 2's text under a new id: its segments
    // must be unseen again — except any shared with survivor doc 6
    val probe = Seq((202L, "a hash join builds a table")).toDF("doc_id", "text")
    def screen(idxDir: String, batchId: Long) = StreamingDedup
      .screenSegmentsBatch(probe, batchId, "doc_id", "text", idxDir, w)
      .select("doc_id", "n_segs", "n_kept", "kept_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    val got = screen(dir, 2L)
    val expect = screen(dirRebuild, 1L)
    assert(got == expect, s"got $got expect $expect")
    // doc 6 = doc 2's text + "quickly": with w=4 their FIRST segment
    // ("a hash join builds") is shared and stays seen via the survivor;
    // the second ("a table") was doc 2's alone (doc 6 has "a table
    // quickly") and must be kept again after deletion
    assert(got.head._3 == 1L && got.head._4 == "a table", got.toString)
  }

  test("cell store: targeted rewrite ≡ rebuild; untouched cells' files unmodified") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id").as("id"), col("embedding"))
    val cents = Similarity.sampleCentroidsPortable(emb, 6)
    val dir = Files.createTempDirectory("delcell").toString + "/store"
    val dirRebuild = Files.createTempDirectory("delcellrb").toString + "/store"
    Similarity.writeCellStore(emb, cents, dir)
    // choose ids: all of one cell (forces directory removal) + one more
    val byCell = spark.read.parquet(dir)
      .select(col("id"), col("cell").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val (fullCell, fullCellIds) = byCell.groupBy(_._2).view
      .mapValues(_.map(_._1).toSeq).minBy(_._2.size)
    val extra = byCell.map(_._1).filterNot(fullCellIds.contains).head
    val extraCell = byCell.find(_._1 == extra).get._2
    val delIds = (fullCellIds :+ extra).toDF("id")
    // both affected cells (emptied + partially-deleted) are excluded
    val untouched = new java.io.File(dir).listFiles
      .filter(f => f.getName.startsWith("cell=") &&
        f.getName != s"cell=$fullCell" && f.getName != s"cell=$extraCell")
      .flatMap(_.listFiles).map(f => f.getPath -> f.lastModified).toMap
    val nTouched = Similarity.deleteFromCellStore(spark, dir, delIds)
    assert(nTouched >= 2L)
    // the emptied cell's directory is gone
    assert(!new java.io.File(s"$dir/cell=$fullCell").exists)
    // rebuild parity: same rows, same search results
    Similarity.writeCellStore(
      emb.join(delIds, Seq("id"), "left_anti"), cents, dirRebuild)
    def rows(d: String) = spark.read.parquet(d)
      .select(col("id"), col("cell").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    assert(rows(dir) == rows(dirRebuild))
    val q = emb.filter(col("id") < 3).join(delIds, Seq("id"), "left_anti")
    def hits(d: String) = Similarity.searchCellStore(spark, d, q, 3, 3, cents)
      .select(col("qid"), col("nid"), col("rank").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    val gotHits = hits(dir)
    assert(gotHits == hits(dirRebuild) && gotHits.nonEmpty)
    val delSet = (fullCellIds :+ extra).toSet
    assert(!gotHits.exists(h => delSet.contains(h._2)), "deleted vector surfaced")
    // cells without a deleted id: same files, same mtimes (never opened
    // for writing)
    untouched.foreach { case (path, mtime) =>
      val f = new java.io.File(path)
      assert(f.exists && f.lastModified == mtime, s"untouched file rewritten: $path")
    }
  }

  test("shards: deleteAndRepack ≡ full repack; prefix shards untouched on disk") {
    val sfDocs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("tk"))
    val dir = Files.createTempDirectory("delshard").toString + "/shards"
    val groupOf = expr("doc_id div 8")
    val (cap, cps) = (64L, 4L)
    val chunks = Packing.packChunks(sfDocs, "doc_id", "tk", cap, groupOf)
    val manifest = Packing.shardManifest(chunks, cps).localCheckpoint(true)
    Packing.writeShards(chunks, dir, cps)
    // delete two docs from the back half so a real prefix survives
    val ids = sfDocs.select("doc_id").collect().map(_.getLong(0)).sorted
    val toDelete = Seq(ids(ids.length * 3 / 4), ids(ids.length - 2))
    val delIds = toDelete.toDF("doc_id")
    val before = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("shard_id="))
      .flatMap(_.listFiles).map(f => f.getPath -> f.lastModified).toMap
    val result = Packing.deleteAndRepack(sfDocs, "doc_id", "doc_id", "tk",
      delIds, cap, groupOf, cps, dir, manifest).localCheckpoint(true)
    // parity with a from-scratch repack of the survivors
    val survivors = sfDocs.filter(!col("doc_id").isin(toDelete: _*))
    val expectManifest = Packing
      .shardManifest(Packing.packChunks(survivors, "doc_id", "tk", cap, groupOf), cps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val gotManifest = result.filter(col("status") =!= "removed")
      .select("shard_id", "n_chunks", "n_tokens", "shard_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(gotManifest == expectManifest)
    // disk state audits clean against the post-delete manifest
    val audit = Packing.auditShards(spark, dir,
      result.filter(col("status") =!= "removed")
        .select("shard_id", "n_chunks", "n_tokens", "shard_fp"))
    assert(audit.filter(!col("chunks_match") || !col("tokens_match") ||
      !col("fp_match")).count() == 0L)
    // kept shards were not rewritten; some shard WAS kept and some changed
    val statuses = result.select("shard_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(statuses.values.exists(_ == "kept") &&
      statuses.values.exists(s => s == "rewritten" || s == "removed"), statuses.toString)
    before.foreach { case (path, mtime) =>
      val sid = path.replaceAll(".*shard_id=([0-9]+).*", "$1").toLong
      if (statuses.get(sid).contains("kept")) {
        val f = new java.io.File(path)
        assert(f.exists && f.lastModified == mtime, s"kept shard rewritten: $path")
      }
    }
    // deleting an id absent from the corpus changes nothing
    val noop = Packing.deleteAndRepack(sfDocs, "doc_id", "doc_id", "tk",
      Seq(999999L).toDF("doc_id"), cap, groupOf, cps, dir, manifest)
    assert(noop.filter(col("status") =!= "kept").count() == 0L)
  }

  test("tombstone writes refuse renumbered/folded deletion batches") {
    // a deletion stream restarted with a lost checkpoint would renumber
    // from 0 and its overwrite would RESURRECT previously deleted docs —
    // the guard must stop it loudly (the index-side renumbered-restart
    // contract, mirrored onto the tombstone store)
    val dir = Files.createTempDirectory("deltombguard").toString
    RetrievalStream.indexBatch(docsDF, 0L, "doc_id", "text", dir)
    RetrievalStream.deleteDocs(Seq(2L).toDF("doc_id"), "doc_id", dir, 5L)
    // same id replays fine (idempotent); a LOWER id is refused
    RetrievalStream.deleteDocs(Seq(2L).toDF("doc_id"), "doc_id", dir, 5L)
    val e = intercept[IllegalArgumentException] {
      RetrievalStream.deleteDocs(Seq(9L).toDF("doc_id"), "doc_id", dir, 0L)
    }
    assert(e.getMessage.contains("renumbered"), e.getMessage)
    // after folding, a replay of the folded id is refused too
    assert(IndexMaintenance.compactTombstones(spark, dir, upToBatch = 6L) == 1L)
    val e2 = intercept[IllegalArgumentException] {
      RetrievalStream.deleteDocs(Seq(9L).toDF("doc_id"), "doc_id", dir, 5L)
    }
    assert(e2.getMessage.contains("compacted"), e2.getMessage)
  }

  test("semantic cell index: deleted vector never a historical candidate") {
    import graft.streaming.SemanticStream
    val emb = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id").as("id"), col("embedding"))
    val cents = Similarity.sampleCentroidsPortable(emb, 4)
    val dir = Files.createTempDirectory("delsem").toString
    val dirRebuild = Files.createTempDirectory("delsemrb").toString
    val delIds = emb.filter(expr("id % 7 = 3")).select("id")
    val delSet = delIds.collect().map(_.getLong(0)).toSet
    val hist = emb.filter(col("id") >= 10)
    val probe = emb.filter(col("id") < 10)
    SemanticStream.screenAndIndexBatch(hist, 0L, "id", "embedding",
      dir, cents, tau = -1.0).count()
    SemanticStream.deleteDocs(delIds, "id", dir, 0L)
    SemanticStream.screenAndIndexBatch(
      hist.join(delIds, Seq("id"), "left_anti"), 0L, "id", "embedding",
      dirRebuild, cents, tau = -1.0).count()
    def pairs(d: String, b: Long) = SemanticStream.screenAndIndexBatch(
        probe.join(delIds, Seq("id"), "left_anti"), b, "id", "embedding",
        d, cents, tau = -1.0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val got = pairs(dir, 1L)
    assert(got == pairs(dirRebuild, 1L) && got.nonEmpty)
    assert(!got.exists(p => delSet.contains(p._1) || delSet.contains(p._2)),
      "deleted vector surfaced as candidate")
    // compaction applies tombstones physically
    assert(SemanticStream.compactIndex(spark, dir, upToBatch = 2L) >= 1L)
    val onDisk = spark.read.parquet(dir).filter(col("batch_id") === -1L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(onDisk.intersect(delSet).isEmpty, onDisk.toString)
  }

  test("incrementalRepack: refresh ≡ rebuild; kept prefix untouched on disk") {
    val dir = Files.createTempDirectory("increpack").toString + "/shards"
    val groupOf = substring(col("okey"), 1, 8)
    val (cap, cps) = (8L, 2L)
    def input(rows: Seq[(String, String)]) = rows.toDF("okey", "text")
      .select(col("okey"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"),
        md5(col("text")).as("fp"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
    // prior stream: 6 docs of 8 tokens → 6 chunks → 3 shards
    def tok8(seed: String) = (1 to 8).map(i => s"$seed$i").mkString(" ")
    val aRows = (1 to 6).map(i => f"k$i%03d" -> tok8(s"a$i"))
    val aIn = input(aRows)
    val chunksA = Packing.packChunks(aIn, "okey", "tk", cap, groupOf)
    val manifestA = Packing.shardManifest(chunksA, cps).localCheckpoint(true)
    Packing.writeShards(chunksA, dir, cps)
    val before = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("shard_id="))
      .flatMap(_.listFiles).map(f => f.getPath -> f.lastModified).toMap
    // new stream: doc 5 changed, doc 6 removed, doc 7 added — the first
    // difference sits at position 4*8, i.e. shard 2; shards 0-1 keep
    val bRows = aRows.take(4) ++ Seq("k005" -> tok8("c5"), "k007" -> tok8("a7"))
    val bIn = input(bRows)
    val result = Packing.incrementalRepack(
        aIn.select("okey", "n_tokens", "fp"), bIn,
        "okey", "tk", "fp", "n_tokens", cap, groupOf, cps, dir, manifestA)
      .localCheckpoint(true)
    val statuses = result.select("shard_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(statuses == Map(0L -> "kept", 1L -> "kept", 2L -> "rewritten"),
      statuses.toString)
    // the post-refresh disk state audits clean against a from-scratch
    // repack of the new stream
    val expect = Packing
      .shardManifest(Packing.packChunks(bIn, "okey", "tk", cap, groupOf), cps)
      .collect().map(r => (r.getLong(0), r.getString(3))).sortBy(_._1).toSeq
    val got = result.filter(col("status") =!= "removed")
      .select("shard_id", "shard_fp")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == expect)
    val audit = Packing.auditShards(spark, dir,
      result.filter(col("status") =!= "removed")
        .select("shard_id", "n_chunks", "n_tokens", "shard_fp"))
    assert(audit.filter(!col("fp_match")).count() == 0L)
    // kept shard files untouched
    before.foreach { case (path, mtime) =>
      val sid = path.replaceAll(".*shard_id=([0-9]+).*", "$1").toLong
      if (statuses.get(sid).contains("kept")) {
        val f = new java.io.File(path)
        assert(f.exists && f.lastModified == mtime, s"kept shard rewritten: $path")
      }
    }
    // identical streams → every shard kept, nothing written
    val noop = Packing.incrementalRepack(
      bIn.select("okey", "n_tokens", "fp"), bIn,
      "okey", "tk", "fp", "n_tokens", cap, groupOf, cps, dir,
      result.filter(col("status") =!= "removed")
        .select("shard_id", "n_chunks", "n_tokens", "shard_fp"))
    assert(noop.filter(col("status") =!= "kept").count() == 0L)
  }

  test("streaming deletion face: tombstone stream ≡ batch deleteDocs") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("delstream").toString
    val q = Seq((1L, "spark"), (2L, "join")).toDF("qid", "term")
    RetrievalStream.indexBatch(docsDF, 0L, "doc_id", "text", dir)
    val source = MemoryStream[Long]
    val sq = RetrievalStream.deletionIngest(
      source.toDF().select(col("value").as("doc_id")), "doc_id", dir)
    try {
      source.addData(deleted: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    val got = bm25Rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10))
    val expect = bm25Rows(Retrieval.bm25TopK(survivorsDF, "doc_id", "text", q, 10))
    assert(got == expect && got.nonEmpty)
    // tombstones are partition-per-batch: the IndexMaintenance store is
    // visible as an explicit path, invisible to the index read
    assert(IndexMaintenance.tombstoneIds(spark, dir).get.count() == deleted.size)
    // folding the tombstone store changes nothing a reader sees
    assert(IndexMaintenance.compactTombstones(spark, dir, upToBatch = 1L) == 1L)
    assert(IndexMaintenance.tombstoneIds(spark, dir).get.count() == deleted.size)
    assert(bm25Rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10)) == expect)
  }
}
