package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the per-thread deserialized-sketch caches (VERDICT r9 #8:
  * the q89 incident — a 1.2 MB filter memcmp'd per row through a 1-row
  * join — generalizes to every serialized sketch; this spec pins the
  * cache semantics the literal-shipping convention relies on):
  *
  *  - a STABLE reference (a plan literal: the same array instance on
  *    every evaluation) must hit the `eq` fast path and return the SAME
  *    deserialized sketch instance — deserialize once per thread, total;
  *  - content-equal but fresh byte copies (what `UnsafeRow.getBinary`
  *    hands a probe fed from a row column) must STILL hit via the
  *    memcmp safety net — correct, but paying a full compare of the
  *    serialized bytes per evaluation, which is exactly the measured-34×
  *    regression class callers must avoid by shipping literals;
  *  - different content must miss and re-deserialize.
  */
class SketchCacheSpec extends AnyFunSuite {

  private object bloomProbe extends CachedBloomEval {
    def get(bytes: Array[Byte]): BloomFilter = filterFor(bytes)
  }
  private object cmsProbe extends CachedSketchEval {
    def get(bytes: Array[Byte]): CountMinSketch = sketchFor(bytes)
  }

  private def bloomBytes(keys: Long*): Array[Byte] = {
    val bf = BloomFilter.create(1000, 0.01)
    keys.foreach(bf.putLong)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  test("bloom cache: literal (same reference) hits eq fast path — same instance back") {
    val bytes = bloomBytes(1L, 2L, 3L)
    val f1 = bloomProbe.get(bytes)
    val f2 = bloomProbe.get(bytes)
    assert(f1 eq f2, "a stable reference must not re-deserialize")
    assert(f1.mightContainLong(2L) && !f1.mightContainLong(999999L))
  }

  test("bloom cache: fresh content-equal copies hit the memcmp safety net") {
    val bytes = bloomBytes(7L, 8L)
    val f1 = bloomProbe.get(bytes)
    // simulate a row-sourced BINARY column: a fresh copy per access
    val f2 = bloomProbe.get(bytes.clone())
    assert(f1 eq f2,
      "content-equal bytes must reuse the cached deserialization (the " +
        "safety net that keeps row-fed probes correct, if slow)")
  }

  test("bloom cache: different content misses and re-deserializes correctly") {
    val a = bloomProbe.get(bloomBytes(1L))
    val b = bloomProbe.get(bloomBytes(100L))
    assert(!(a eq b))
    assert(b.mightContainLong(100L) && !b.mightContainLong(1L),
      "after a miss the probe must reflect the NEW filter, never a stale one")
  }

  test("cms cache: same eq-then-memcmp contract") {
    val cms = CountMinSketch.create(0.001, 0.99, 17)
    (1L to 50L).foreach(k => cms.addLong(k, 3))
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    val bytes = out.toByteArray
    val s1 = cmsProbe.get(bytes)
    assert(s1 eq cmsProbe.get(bytes), "eq fast path")
    assert(s1 eq cmsProbe.get(bytes.clone()), "memcmp safety net")
    val other = CountMinSketch.create(0.001, 0.99, 17)
    other.addLong(9L, 1000)
    val out2 = new ByteArrayOutputStream()
    other.writeTo(out2)
    val s2 = cmsProbe.get(out2.toByteArray)
    assert(!(s1 eq s2) && s2.estimateCount(9L) >= 1000L)
  }

  test("caches deserialize the exact serialized form (round-trip identity)") {
    val bytes = bloomBytes(11L, 22L, 33L)
    val f = bloomProbe.get(bytes)
    val out = new ByteArrayOutputStream()
    f.writeTo(out)
    assert(java.util.Arrays.equals(out.toByteArray, bytes),
      "cached filter must re-serialize byte-identically — the property " +
        "the OR-merge byte-identity specs build on")
    // the independent deserialization path agrees with the cache's
    val direct = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    assert((11L to 33L by 11L).forall(k =>
      direct.mightContainLong(k) == f.mightContainLong(k)))
  }
}
