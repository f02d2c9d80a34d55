package graft

import java.nio.file.Files
import graft.operators.Retrieval
import graft.streaming.RetrievalStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class IndexDoc(doc_id: Long, text: String)

/** The streamed inverted index must answer BM25 queries identically to
  * batch retrieval over the union of everything ingested, across
  * micro-batch boundaries, empty docs included; a replayed batch must
  * be a no-op (partition overwrite idempotence).
  */
class RetrievalStreamSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    IndexDoc(1L, "spark shuffles data between stages"),
    IndexDoc(2L, "a hash join builds a table"),
    IndexDoc(3L, ""),                       // token-less: counts toward N
    IndexDoc(4L, "spark spark spark"),
    IndexDoc(5L, "the join key decides the shuffle"))

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("qid", "doc", "score_u", "rnk").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    .sortBy(t => (t._1, t._4)).toSeq

  test("streamed index answers BM25 identically to batch; replay is a no-op") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("bm25idx").toString
    val q = Seq((1L, "spark"), (2L, "join"), (2L, "shuffle")).toDF("qid", "term")

    val source = MemoryStream[IndexDoc]
    val sq = RetrievalStream.indexIngest(source.toDF(), "doc_id", "text", dir)
    try {
      source.addData(docs.take(3): _*); sq.processAllAvailable()
      source.addData(docs.drop(3): _*); sq.processAllAvailable()
    } finally sq.stop()

    val expect = rows(Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
      "doc_id", "text", q, 10))
    val got = rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10))
    assert(got == expect)
    assert(got.nonEmpty)

    // replay batch 0 (restart re-delivery): same partition, same rows
    RetrievalStream.indexBatch(docs.take(3).toDF("doc_id", "text"), 0L,
      "doc_id", "text", dir)
    assert(rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10)) == expect)
  }

  test("compaction preserves search, keeps replay safe, and shrinks files") {
    import graft.streaming.IndexMaintenance
    val dir = Files.createTempDirectory("bm25cmp").toString
    val q = Seq((1L, "spark"), (2L, "join"), (2L, "shuffle")).toDF("qid", "term")
    // one doc per micro-batch → 5 batch partitions per store
    docs.zipWithIndex.foreach { case (d, i) =>
      RetrievalStream.indexBatch(Seq(d).toDF("doc_id", "text"), i.toLong,
        "doc_id", "text", dir)
    }
    val before = rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10))
    assert(before.nonEmpty)
    val filesBefore = IndexMaintenance.dataFileCount(spark, s"$dir/postings")
    // fold the closed batches 0–3 (4 stays open); search is unchanged
    assert(RetrievalStream.compact(spark, dir, upToBatch = 4,
      targetPartitions = 1) == 4L)
    assert(rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10)) == before)
    // same bound again: nothing left to fold
    assert(RetrievalStream.compact(spark, dir, upToBatch = 4) == 0L)
    // replaying the still-open batch stays idempotent after compaction
    RetrievalStream.indexBatch(Seq(docs(4)).toDF("doc_id", "text"), 4L,
      "doc_id", "text", dir)
    assert(rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10)) == before)
    // a second compaction folds the remainder into the same store
    assert(RetrievalStream.compact(spark, dir, upToBatch = 5,
      targetPartitions = 1) == 1L)
    assert(rows(RetrievalStream.bm25OverIndex(spark, dir, q, 10)) == before)
    assert(IndexMaintenance.dataFileCount(spark, s"$dir/postings") < filesBefore)
    // a replay of a FOLDED batch (lost checkpoint) is refused loudly
    intercept[IllegalArgumentException] {
      RetrievalStream.indexBatch(Seq(docs(0)).toDF("doc_id", "text"), 0L,
        "doc_id", "text", dir)
    }
  }

  test("quality-probe ticks equal batch rankingMetrics on every ingested prefix") {
    import graft.operators.Evaluation
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("bm25probe").toString
    val mdir = s"$dir/metrics"
    val q = Seq((1L, "spark"), (2L, "join"), (2L, "shuffle")).toDF("qid", "term")
    val qrels = Seq((1L, 1L), (1L, 4L), (2L, 2L), (2L, 5L)).toDF("qid", "nid")

    val source = MemoryStream[IndexDoc]
    val sq = RetrievalStream.indexIngestWithProbe(source.toDF(), "doc_id",
      "text", s"$dir/idx", q, qrels, k = 10, metricsDir = mdir)
    try {
      source.addData(docs.take(3): _*); sq.processAllAvailable()
      source.addData(docs.drop(3): _*); sq.processAllAvailable()
    } finally sq.stop()

    def metricRows(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "n_rel", "n_hits", "mrr_u", "dcg_u", "idcg_u").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    def expect(prefix: Seq[IndexDoc]) = metricRows(Evaluation.rankingMetrics(
      Retrieval.bm25TopK(prefix.toDF("doc_id", "text"), "doc_id", "text", q, 10)
        .select(col("qid"), col("doc").as("nid"), col("rnk").as("rank")),
      qrels, k = 10))

    // tick 0 reads the index THROUGH batch 0 only; tick 1 the full corpus
    val tick0 = metricRows(spark.read.parquet(s"$mdir/batch=0"))
    val tick1 = metricRows(spark.read.parquet(s"$mdir/batch=1"))
    assert(tick0 == expect(docs.take(3)), tick0.toString)
    assert(tick1 == expect(docs), tick1.toString)
    assert(tick0 != tick1, "the probe must see the index grow")
    // the scoped read the probe is built on: through-batch-0 search
    // equals batch search over the first prefix
    assert(rows(RetrievalStream.bm25OverIndex(spark, s"$dir/idx", q, 10,
        upToBatch = Some(0L)))
      == rows(Retrieval.bm25TopK(docs.take(3).toDF("doc_id", "text"),
        "doc_id", "text", q, 10)))
    // a replayed batch overwrites its own tick with identical rows
    RetrievalStream.probeBatch(spark, s"$dir/idx", q, qrels, 10, mdir, 0L)
    assert(metricRows(spark.read.parquet(s"$mdir/batch=0")) == tick0)
  }

  test("token-less docs reach the doc stats but not the postings") {
    val dir = Files.createTempDirectory("bm25idx2").toString
    RetrievalStream.indexBatch(docs.toDF("doc_id", "text"), 0L,
      "doc_id", "text", dir)
    val d = spark.read.parquet(s"$dir/docs")
    val p = spark.read.parquet(s"$dir/postings")
    assert(d.count() == 5L)
    assert(d.filter(col("doc") === 3L).head().getAs[Long]("dl") == 0L)
    assert(p.filter(col("doc") === 3L).count() == 0L)
  }
}
