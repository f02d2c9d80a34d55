package graft

import graft.streaming.{IndexMaintenance, SemanticStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantic screening: arriving embeddings assigned to frozen
  * cells by a stateless literal projection, screened against the
  * growing cell index — cross-micro-batch near-dups caught in the batch
  * they arrive in, replay/compaction under the house conventions.
  */
class SemanticStreamSpec extends SparkSpec {
  import sqlImplicits._

  // two frozen, well-separated cells; vectors are unit-ish dim-4 floats
  private val centroids: Seq[(Long, Array[Float])] = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0f, 1f, 0f, 0f)))

  private def vecA(eps: Float) = Array(1f, eps, 0f, 0f)   // cell 0 family
  private def vecB(eps: Float) = Array(eps, 1f, 0f, 0f)   // cell 1 family
  private val novel = Array(0.6f, 0.6f, 0.52f, 0f)        // same cell as A/B
                                                          // but cosine < tau

  private def df(rows: (Long, Array[Float])*) =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>"))

  private def pairs(d: org.apache.spark.sql.DataFrame) =
    d.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cross-batch near-dups caught on arrival; novel vectors pass; replay and compaction safe") {
    val dir = java.nio.file.Files.createTempDirectory("semstream")
      .toFile.getAbsolutePath + "/index"
    def screen(batch: Seq[(Long, Array[Float])], id: Long) =
      pairs(SemanticStream.screenAndIndexBatch(df(batch: _*), id,
        "id", "embedding", dir, centroids, tau = 0.95))

    // batch 0: one vector per cell — nothing to pair
    assert(screen(Seq((1L, vecA(0.01f)), (2L, vecB(0.01f))), 0L) == Set())
    // batch 1: a near-copy of 1 (cross-batch hit) + a novel same-cell
    // vector below tau + a within-batch near-dup pair (10, 11)
    val got1 = screen(Seq((10L, vecA(0.02f)), (11L, vecA(0.03f)),
      (12L, novel)), 1L)
    assert(got1 == Set((1L, 10L), (1L, 11L), (10L, 11L)), s"got $got1")
    // batch 2: near-copy of the cell-1 seed — only that pair
    assert(screen(Seq((20L, vecB(0.02f))), 2L) == Set((2L, 20L)))

    // replay of batch 2 (restart re-delivery): identical candidates,
    // index state unchanged (partition overwrite)
    assert(screen(Seq((20L, vecB(0.02f))), 2L) == Set((2L, 20L)))

    // compaction folds batches 0-1; a later batch screens identically
    val filesBefore = IndexMaintenance.dataFileCount(spark, dir)
    assert(SemanticStream.compactIndex(spark, dir, upToBatch = 2,
      targetPartitions = 1) == 2L)
    assert(IndexMaintenance.dataFileCount(spark, dir) < filesBefore)
    val got3 = screen(Seq((30L, vecA(0.01f))), 3L)
    assert(got3 == Set((1L, 30L), (10L, 30L), (11L, 30L)), s"got $got3")
    // a replay of a FOLDED batch id is refused loudly
    intercept[IllegalArgumentException] {
      screen(Seq((1L, vecA(0.01f)), (2L, vecB(0.01f))), 0L)
    }
  }

  test("streaming face: stateless plan, candidates equal the sequential batch replay") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("semstream2")
      .toFile.getAbsolutePath + "/index"
    val source = MemoryStream[(Long, Seq[Float])]
    val seen = scala.collection.concurrent.TrieMap[Long, Set[(Long, Long)]]()
    val docs = source.toDF.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>"))
    val q = SemanticStream.screeningIngest(docs, "id", "embedding", dir,
      centroids, tau = 0.95) { (cands, batchId) =>
      seen(batchId) = cands.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    try {
      source.addData((1L, vecA(0.01f).toSeq), (2L, vecB(0.01f).toSeq))
      q.processAllAvailable()
      source.addData((10L, vecA(0.02f).toSeq), (12L, novel.toSeq))
      q.processAllAvailable()
      source.addData((20L, vecB(0.02f).toSeq))
      q.processAllAvailable()
      assert(seen(0L) == Set())
      assert(seen(1L) == Set((1L, 10L)))
      assert(seen(2L) == Set((2L, 20L)))
      // the persisted index equals the one-shot literal assignment of
      // every vector ingested (cell integrity across batches)
      val persisted = spark.read.parquet(dir).select("id", "cell")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = graft.operators.Similarity.assignCellsLiteral(
          df((1L, vecA(0.01f)), (2L, vecB(0.01f)), (10L, vecA(0.02f)),
            (12L, novel), (20L, vecB(0.02f))), centroids)
        .select("id", "cell")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(persisted == expect)
    } finally q.stop()
  }
}
