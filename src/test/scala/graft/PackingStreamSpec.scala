package graft

import graft.operators.Packing
import graft.streaming.PackingStream
import graft.streaming.PackingStream.PackDoc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Concat-and-chunk placement at ingest: the streamed per-source running
  * offset must equal the batch prefix sum over the same (batch, doc_id)
  * arrival order, chunk spans must match the batch operator's
  * convention (zero-token docs → null span, no offset advance), and the
  * offset must survive micro-batch boundaries.
  */
class PackingStreamSpec extends SparkSpec {
  import sqlImplicits._

  // arrival order: batch 1 = ids 1-3, batch 2 = ids 4-6; capacity 8
  private val b1 = Seq(
    PackDoc(1L, "a", 5L), PackDoc(2L, "a", 6L), PackDoc(3L, "b", 3L))
  private val b2 = Seq(
    PackDoc(4L, "a", 0L), PackDoc(5L, "a", 4L), PackDoc(6L, "b", 13L))

  test("streamed placement equals the batch prefix sum, across batches") {
    implicit val ctx = spark.sqlContext
    val all = b1.map((1, _)) ++ b2.map((2, _))
    val batchDf = all.map { case (b, d) => (b, d.doc_id, d.source, d.nt) }
      .toDF("batch", "doc_id", "source", "nt")
    val expect = Packing.runningOffset(batchDf,
        Seq(col("batch"), col("doc_id")), "nt", lit(0), Seq("source"))
      .select(col("doc_id"), col("offset"),
        when(col("nt") > 0, expr("offset div 8")).as("fc"),
        when(col("nt") > 0, expr("(offset + nt - 1) div 8")).as("lc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet

    val source = MemoryStream[PackDoc]
    val q = PackingStream.chunkPlacement(source.toDF(), capacity = 8L)
      .writeStream.outputMode("append").format("memory")
      .queryName("pack_place").start()
    try {
      source.addData(b1: _*); q.processAllAvailable()
      source.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("pack_place")
        .select("doc_id", "offset", "first_chunk", "last_chunk").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
      assert(got == expect, s"got $got expect $expect")
      // hand semantics the twin encodes: source a offsets 0,5,11,11 —
      // the zero-token doc 4 sits AT 11 without advancing; doc 2 spans
      // chunks 0-1 (tokens 5..10); doc 6 starts at b's offset 3 and
      // spans chunks 0-1 (tokens 3..15 at capacity 8)
      val byId = got.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      assert(byId(2L) == ((5L, Some(0L), Some(1L))), byId.toString)
      assert(byId(4L) == ((11L, None, None)), byId.toString)
      assert(byId(5L) == ((11L, Some(1L), Some(1L))), byId.toString)
      assert(byId(6L) == ((3L, Some(0L), Some(1L))), byId.toString)
    } finally q.stop()
  }
}
