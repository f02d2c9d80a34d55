package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The single-buffer MinHashAggregate must produce exactly the signatures
  * of the perms-separate-min formulation (same xxhash64 seeds).
  */
class MinHashAggSpec extends SparkSpec {
  import sqlImplicits._

  test("minhash_agg signatures identical to per-permutation min aggregates") {
    val docs = Tables.documents(spark, sf()).limit(300)
    val a = Dedup.minhashSignatures(docs, "doc_id", "text", perms = 16)
      .select(col("id"), col("sig").as("sig_a"))
    val b = Dedup.minhashSignaturesViaAgg(docs, "doc_id", "text", perms = 16)
      .select(col("id"), col("sig").as("sig_b"))
    val joined = a.join(b, "id")
    val mismatches = joined.filter(col("sig_a") =!= col("sig_b")).count()
    assert(mismatches == 0, s"$mismatches signature mismatches")
    assert(joined.count() == 300)
  }

  test("minhash_agg survives partial aggregation across many partitions") {
    val docs = Tables.documents(spark, sf()).repartition(13).limit(100)
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", perms = 8).collect()
    assert(sigs.length == 100)
    sigs.foreach { r =>
      val sig = r.getSeq[Long](1)
      assert(sig.length == 8)
      assert(sig.forall(_ != Long.MaxValue), "unfilled buffer slot leaked")
    }
  }
}
