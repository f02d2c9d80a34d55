package graft

import graft.operators.Sampling
import graft.streaming.CurationStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Curation-at-ingest: the streamed quality gate must emit EXACTLY the
  * rows the batch operator keeps, scores and all — stateless by
  * construction, so micro-batch boundaries cannot change results.
  */
case class CurationDoc(doc_id: Long, source: String, text: String)

class CurationStreamSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    CurationDoc(1L, "a", "the data of a model is that it can learn and the loss goes down"),
    CurationDoc(2L, "a", "spam spam spam spam spam spam spam spam spam spam spam spam"),
    CurationDoc(3L, "b", "a table scan that is pruned by the filter reads less of the file"),
    CurationDoc(4L, "b", "x x x x x x x x x x x x x x x x x x x x x x"),
    CurationDoc(5L, "a", "it is the case that an index helps when the query is selective"))

  test("streamed gate equals the batch gate row-for-row across micro-batches") {
    implicit val ctx = spark.sqlContext
    val batchDf = docs.toDF()
    val thr = Sampling.winsorThresholds(
      CurationStream.gate(batchDf, "text"), "source", "score_micro",
      pLo = 0.0, pHi = 1.0)
    val expect = CurationStream.gate(batchDf, "text", Some(thr))
      .collect().map(_.toSeq).sortBy(_.toString)

    val source = MemoryStream[CurationDoc]
    val q = CurationStream.gate(source.toDF(), "text", Some(thr))
      .writeStream.outputMode("append").format("memory")
      .queryName("curation_out").start()
    try {
      // two micro-batches split mid-source: boundaries must not matter
      source.addData(docs.take(2): _*); q.processAllAvailable()
      source.addData(docs.drop(2): _*); q.processAllAvailable()
      val got = spark.table("curation_out")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq == expect.toSeq)
    } finally q.stop()
  }

  test("gate drops classifier failures and scores survivors in range") {
    val out = CurationStream.gate(docs.toDF(), "text")
    val kept = out.collect()
    assert(kept.forall(_.getAs[Boolean]("keep")))
    assert(kept.length < docs.length, "the spam rows must fail the gate")
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    assert(!keptIds.contains(4L), "the x-spam doc must be gated out")
  }
}
