package graft

import graft.operators.Iterate
import org.apache.spark.sql.functions._

/** Pins the [[graft.operators.Iterate.Loop]] contract the five
  * iterative operators (PageRank, PPR, CC, k-core, HITS) rely on:
  * bounded in-flight storage, correct release ordering, and exactly one
  * result checkpoint left behind.
  */
class IterateSpec extends SparkSpec {
  import sqlImplicits._

  private def persisted(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("materializedIterate computes the fold and leaves one checkpoint") {
    val init = Seq(1L, 2L, 3L).toDF("x")
    assertReleases("materializedIterate", allowed = 1) {
      val out = Iterate.materializedIterate(init, 4) { (st, _) =>
        st.select((col("x") * 2).as("x"))
      }
      val got = out.collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(16L, 32L, 48L), got.toString)
    }
  }

  test("storage stays bounded to keep+1 generations mid-loop") {
    val base = persisted()
    Iterate.loop(spark) { l =>
      var st = l.ckpt(Seq(1L).toDF("x"))
      var maxInFlight = 0
      for (_ <- 1 to 6) {
        l.next()
        st = l.ckpt(st.select((col("x") + 1).as("x")))
        maxInFlight = math.max(maxInFlight, (persisted() -- base).size)
      }
      // one frame per generation, current + 1 kept — never 6
      assert(maxInFlight <= 3, s"maxInFlight=$maxInFlight")
      assert(st.head().getLong(0) == 7L)
      l.releaseAll()
    }
    assert((persisted() -- base).isEmpty, "releaseAll left blocks behind")
  }

  test("pins survive generation turnover and release at finish") {
    val base = persisted()
    val out = Iterate.loop(spark) { l =>
      val static = l.pin(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
      var st = l.ckpt(Seq(1L, 2L).toDF("k"))
      for (r <- 1 to 3) {
        l.next()
        // each round re-reads the pinned static frame AND pins a tiny
        // accumulator row referencing this round's state
        st = l.ckpt(st.join(static, "k").select(col("k")))
        l.pin(st.agg(count(lit(1)).as("n")).withColumn("round", lit(r)))
      }
      l.finish(st)
    }
    assert(out.count() == 2L)
    // only the finish checkpoint remains
    assert((persisted() -- base).size <= 1,
      s"left ${(persisted() -- base).size} frames")
  }

  test("loop releases everything when the body throws") {
    val base = persisted()
    intercept[RuntimeException] {
      Iterate.loop(spark) { l =>
        l.ckpt(Seq(1L).toDF("x"))
        l.pin(Seq(2L).toDF("y"))
        sys.error("boom")
      }
    }
    assert((persisted() -- base).isEmpty, "throw path leaked blocks")
  }

  test("finishKeepCurrent keeps the result blocks readable") {
    val out = Iterate.loop(spark) { l =>
      var st = l.ckpt(Seq(5L).toDF("x"))
      for (_ <- 1 to 3) { l.next(); st = l.ckpt(st.select((col("x") * 3).as("x"))) }
      l.finishKeepCurrent(st)
    }
    // read AFTER the loop released its history — the kept checkpoint
    // must not have been orphaned (a released localCheckpoint cannot
    // be recomputed)
    assert(out.head().getLong(0) == 135L)
  }
}
