package graft

import java.io.ByteArrayInputStream

import graft.operators.Decontamination
import graft.plans.Bloom
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom membership filter: build/probe expressions, the no-false-
  * negative guarantee, bit-exact mergeability, and the screened
  * decontamination path's equality with the exact operator.
  */
class BloomSpec extends SparkSpec {
  import sqlImplicits._

  private def bytesOf(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.head().getAs[Array[Byte]](0)

  test("bloom_agg + bloom_might_contain: zero false negatives, fpp-bounded false positives") {
    val members = spark.range(0, 5000).select(xxhash64(col("id")).as("h"))
    val bf = members.agg(Bloom.bloomAgg(col("h"), 5000, 0.01).as("bf"))
    // every inserted key answers true — the membership guarantee
    val misses = members.crossJoin(broadcast(bf))
      .filter(!Bloom.bloomMightContain(col("bf"), col("h"))).count()
    assert(misses == 0)
    // a disjoint probe set sees only the fpp tail (loose 3x headroom:
    // the measured rate is deterministic but implementation-shaped)
    val probes = spark.range(1000000, 1010000).select(xxhash64(col("id")).as("h"))
    val fps = probes.crossJoin(broadcast(bf))
      .filter(Bloom.bloomMightContain(col("bf"), col("h"))).count()
    assert(fps <= (10000 * 0.03).toLong, s"false-positive count $fps out of 10000")
  }

  test("bloom union is bitwise OR: split-and-merge equals one-pass build, byte for byte") {
    val all = spark.range(0, 4000).select(xxhash64(col("id")).as("h"))
    val whole = bytesOf(all.agg(Bloom.bloomAgg(col("h"), 4000, 0.01)))
    val evens = bytesOf(all.filter(col("h") % 2 === 0)
      .agg(Bloom.bloomAgg(col("h"), 4000, 0.01)))
    val odds = bytesOf(all.filter(col("h") % 2 =!= 0)
      .agg(Bloom.bloomAgg(col("h"), 4000, 0.01)))
    val merged = BloomFilter.readFrom(new ByteArrayInputStream(evens))
      .mergeInPlace(BloomFilter.readFrom(new ByteArrayInputStream(odds)))
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    assert(java.util.Arrays.equals(whole, out.toByteArray))
    // and the aggregate's own partial-merge path (multi-partition input)
    // lands on the same bytes — order- and layout-independent
    val repart = bytesOf(all.repartition(8).agg(Bloom.bloomAgg(col("h"), 4000, 0.01)))
    assert(java.util.Arrays.equals(whole, repart))
  }

  test("SQL registration: bloom_agg/bloom_might_contain round-trip, arity and fpp literals") {
    graft.plans.GraftExtensions.register(spark)
    spark.range(0, 100).select(xxhash64(col("id")).as("h"))
      .createOrReplaceTempView("bloom_in")
    val row = spark.sql(
      """SELECT bloom_might_contain(bf, xxhash64(42L)) AS hit,
        |       bloom_might_contain(bf, xxhash64(424242L)) AS miss_or_fp
        |FROM (SELECT bloom_agg(h, 100, 0.01) AS bf FROM bloom_in)""".stripMargin).head()
    assert(row.getBoolean(0))
    val e = intercept[Exception] {
      spark.sql("SELECT bloom_agg(1L) FROM bloom_in").collect()
    }
    assert(e.getMessage.contains("bloom_agg"))
  }

  test("incompatible filter shapes refuse to merge instead of corrupting") {
    val a = BloomFilter.create(1000, 0.01)
    val b = BloomFilter.create(2000, 0.01)
    intercept[Exception] { a.mergeInPlace(b) }
  }

  test("benchmarkContainmentBloom equals the exact operator on the sf0.001 corpus") {
    val docs = Tables.documents(spark, sf())
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val bench = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("bench_id"),
        concat_ws(" ", slice(toks,
          (floor(size(toks) / 4) + 1).cast("int"),
          greatest(floor(size(toks) / 2), lit(1)).cast("int"))).as("btext"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("bench_id"), col("n_shared"),
          col("n_bench_grams"))
        .collect().map(_.toSeq).sortBy(_.toString)
    val exact = canon(Decontamination.benchmarkContainment(
      docs, "doc_id", "text", bench, "bench_id", "btext"))
    val bloom = canon(Decontamination.benchmarkContainmentBloom(
      docs, "doc_id", "text", bench, "bench_id", "btext"))
    assert(exact.nonEmpty, "fixture must plant contaminated docs")
    assert(bloom.toSeq == exact.toSeq)
  }
}
