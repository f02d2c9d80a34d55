package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Exact-integer power iteration: planted dominant direction, brute
  * replay of the integer recurrence, partitioning invariance.
  */
class PcaSpec extends SparkSpec {
  import sqlImplicits._

  /** Brute scala replay of [[Pca.topComponentVector]]'s recurrence over
    * already-quantized rows (milli BIGINTs) — same fold order-free
    * sums, same per-row div-1024 damping, same max renormalization.
    */
  private def brute(rows: Seq[Array[Long]], iters: Int): Array[Long] = {
    val dim = rows.head.length
    var v = Array.fill(dim)(1000L)
    for (_ <- 1 to iters) {
      val w = Array.fill(dim)(0L)
      rows.foreach { x =>
        val s = x.indices.map(i => x(i) * v(i)).sum
        x.indices.foreach(i => w(i) += (x(i) * s) / 1024L)
      }
      val mx = math.max(w.map(math.abs).max, 1L)
      v = w.map(_ * 1000L / mx)
    }
    v
  }

  private def toDf(rows: Seq[(Long, Array[Float])]) =
    rows.map { case (id, a) => (id, a.toSeq) }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))

  test("power iteration recovers a planted dominant direction") {
    // variance concentrated on dim 1 (values ±4), noise on dim 3 (±0.1)
    val rows = (0 until 40).map { i =>
      val a = Array.fill(4)(0.0f)
      a(1) = if (i % 2 == 0) 4.0f else -4.0f
      a(3) = if (i % 3 == 0) 0.1f else -0.1f
      (i.toLong, a)
    }
    val v = Pca.topComponentVector(toDf(rows), iters = 3)
    assert(math.abs(v(1)) == 1000L, v.mkString(","))
    assert(v(0) == 0L && v(2) == 0L, v.mkString(","))
    assert(math.abs(v(3)) < 50L, v.mkString(","))
  }

  test("explainedVarianceBp: planted axes get their energy shares, exact bp") {
    // dim 1 carries ±4, dim 3 carries ±1, no other energy: uncentered
    // energy split 16 : 1 → comp1 ≈ 9411 bp, comp2 ≈ 588 bp
    val rows = (0 until 40).map { i =>
      val a = Array.fill(4)(0.0f)
      a(1) = if (i % 2 == 0) 4.0f else -4.0f
      a(3) = if (i % 3 == 0) 1.0f else -1.0f
      (i.toLong, a)
    }
    val got = Pca.explainedVarianceBp(toDf(rows), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got.keySet == Set(1L, 2L), got.toString)
    assert(got(1L) > 9300L && got(1L) <= 10000L, got.toString)
    assert(got(2L) > 450L && got(2L) < 700L, got.toString)
    // ratios partition the total (within integer-truncation slack)
    assert(got(1L) + got(2L) <= 10000L && got(1L) + got(2L) > 9900L,
      got.toString)
  }

  test("integer recurrence matches the brute replay and ignores partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.fill(6)((rnd.nextDouble() * 4 - 2).toFloat)))
    val expected = brute(
      rows.map(_._2.map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong)), 3)
    val a = Pca.topComponentVector(toDf(rows), 3)
    val b = Pca.topComponentVector(toDf(rows).repartition(7), 3)
    assert(a.toSeq == expected.toSeq, s"a=${a.mkString(",")}")
    assert(b.toSeq == expected.toSeq, s"b=${b.mkString(",")}")
  }

  test("deflation recovers a planted SECOND direction, exactly orthogonal pre-truncation") {
    // dim 1 dominates (±4), dim 2 is the clear second direction (±2),
    // dim 0/3 carry only tiny noise — v1 must lock onto dim 1, v2 onto
    // dim 2, and the v1·v2 alignment must be tiny (bounded by the one
    // residual div-‖v₁‖² truncation, not float noise)
    val rows = (0 until 48).map { i =>
      val a = Array.fill(4)(0.0f)
      a(1) = if (i % 2 == 0) 4.0f else -4.0f
      a(2) = if (i % 3 == 0) 2.0f else -2.0f
      a(3) = if (i % 5 == 0) 0.05f else -0.05f
      (i.toLong, a)
    }
    val (v1, v2) = Pca.deflatedComponents(toDf(rows), iters = 3)
    assert(math.abs(v1(1)) == 1000L, s"v1=${v1.mkString(",")}")
    assert(math.abs(v2(2)) == 1000L, s"v2=${v2.mkString(",")}")
    assert(math.abs(v2(1)) < 50L, s"v2=${v2.mkString(",")}")
    val align = v1.zip(v2).map { case (a, b) => a * b }.sum
    // milli-unit vectors: |v1·v2| ≤ dim·1000 would be parallel-ish;
    // the deflation must hold it to truncation scale
    assert(math.abs(align) < 20000L, s"align=$align")
  }

  test("deflatedComponents is partitioning-invariant and releases caches") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.fill(5)((rnd.nextDouble() * 4 - 2).toFloat)))
    // deflation returns driver-side vectors — zero frames may linger
    assertReleases("deflatedComponents", allowed = 0) {
      val (a1, a2) = Pca.deflatedComponents(toDf(rows), 2)
      val (b1, b2) = Pca.deflatedComponents(toDf(rows).repartition(7), 2)
      assert(a1.toSeq == b1.toSeq && a2.toSeq == b2.toSeq)
    }
  }

  test("topComponentWithProjections: component rows + top-k extremes, caches released") {
    val rows = (0 until 20).map { i =>
      val a = Array.fill(3)(0.0f); a(0) = i.toFloat - 10f
      (i.toLong, a)
    }
    var out: Array[org.apache.spark.sql.Row] = null
    assertReleases("topComponentWithProjections", allowed = 1) {
      out = Pca.topComponentWithProjections(toDf(rows), iters = 2, k = 4)
        .collect()
    }
    val comp = out.filter(_.getString(0) == "component")
    val proj = out.filter(_.getString(0) == "projection")
    assert(comp.length == 3 && proj.length == 4)
    // the extreme ids are those furthest from zero along dim 0:
    // |−10| (id 0), then the |9| tie resolved by id (1 before 19),
    // then |−8| (id 2 beats id 18 on the tie)
    assert(proj.map(_.getLong(1)).toSet == Set(0L, 1L, 19L, 2L),
      proj.mkString(";"))
  }
}
