package graft

import graft.streaming.DriftStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming vocabulary-drift ticks: frozen reference, one TV tick per
  * micro-batch, stream ≡ batch per batch, replay-idempotent store.
  */
class DriftStreamSpec extends SparkSpec {
  import sqlImplicits._

  // the q182 hand corpus: a=4 b=4 c=1 → top-2 {a, b} at 444444 each,
  // OOV 111111
  private val snapshot = Seq(("s1", "a a a b"), ("s2", "a b b b c"))
    .toDF("source", "text")

  test("fitReference: exact top-k shares + OOV, tie on token asc") {
    val ref = DriftStream.fitReference(snapshot, "text", topK = 2)
    assert(ref.shares == Seq(("a", 444444L), ("b", 444444L)), ref.toString)
    assert(ref.oovMu == 111111L, ref.toString)
  }

  test("batchTv: hand TV per batch; empty batch yields no tick") {
    val ref = DriftStream.fitReference(snapshot, "text", topK = 2)
    // same arithmetic as q182's per-source rows
    assert(DriftStream.batchTv(Seq("a a a b").toDF("text"), "text", ref)
      .contains((4L, 611111L)))
    assert(DriftStream.batchTv(Seq("a b b b c").toDF("text"), "text", ref)
      .contains((5L, 488889L)))
    // an in-distribution batch (4 a, 4 b, 1 c) sits at the rounding floor
    assert(DriftStream.batchTv(
      Seq("a a a a b b b b c").toDF("text"), "text", ref).contains((9L, 0L)))
    assert(DriftStream.batchTv(Seq("", "  ").toDF("text"), "text", ref).isEmpty)
  }

  test("driftTicks: one tick per micro-batch, each ≡ batchTv of that batch") {
    val ref = DriftStream.fitReference(snapshot, "text", topK = 2)
    val dir = java.nio.file.Files.createTempDirectory("driftstream")
      .toFile.getAbsolutePath
    val in = MemoryStream[String](spark)
    val q = DriftStream.driftTicks(in.toDF().toDF("text"), "text", ref,
      s"$dir/metrics")
    try {
      in.addData("a a a b"); q.processAllAvailable()
      in.addData("a b b b c"); q.processAllAvailable()
      val ticks = spark.read.parquet(s"$dir/metrics")
        .select("batch", "n_tokens", "tv_mu").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(ticks == Set((0, 4L, 611111L), (1, 5L, 488889L)), ticks.toString)
    } finally q.stop()
  }
}
