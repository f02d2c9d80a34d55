package graft

import graft.operators.{Linkage, Profile}
import org.apache.spark.sql.functions.sum
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable pins for the record-linkage operator (q161) and the
  * Herdan vocabulary-scaling fit (q162).
  */
class LinkageSpec extends AnyFunSuite with SparkSpec {

  import sqlImplicits._

  test("fuzzyNamePairs: within-block edit distance, each pair once, counts carried") {
    val df = Seq(
      (1L, "blue bolt"), (2L, "blue bolt"),
      (3L, "blue bol"),  // blocks under "bol", not "bolt"
      (4L, "blu bolt"),  // block "bolt", dist to "blue bolt" = 1
      (5L, "red bolt"),  // dist to "blue bolt" = 3 (>2, dropped)
      (6L, "blue ring"), // different block entirely
      (7L, null), (8L, "")
    ).toDF("id", "name")
    val out = Linkage.fuzzyNamePairs(df, "name", maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    // "blue bol" blocks under "bol" — blocking MISSES it vs "blue bolt"
    // (the documented recall trade of single-key blocking);
    // "blu bolt" ↔ "blue bolt" share block "bolt" at dist 1;
    // "red bolt" ↔ "blu bolt" dist 3 and "red bolt" ↔ "blue bolt" dist 3 drop
    assert(out.toSeq == Seq(("blu bolt", "blue bolt", 1L, 1L, 2L)), out.mkString(";"))
  }

  test("fuzzyNamePairs: duplicate names collapse before pairing (dist >= 1 always)") {
    val df = Seq((1L, "hot gear"), (2L, "hot gear"), (3L, "hot gear"))
      .toDF("id", "name")
    assert(Linkage.fuzzyNamePairs(df, "name", 2).count() == 0)
    val canon = Linkage.canonicalNames(df, "name").collect()
    assert(canon.length == 1 && canon.head.getLong(1) == 3L)
  }

  test("blockStats surfaces the per-block name counts") {
    val df = Seq((1L, "a bolt"), (2L, "b bolt"), (3L, "c ring"))
      .toDF("id", "name")
    val m = Linkage.blockStats(df, "name").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("bolt" -> 2L, "ring" -> 1L))
  }

  test("triangleStats: hand graph, orientation counts each triangle once") {
    import graft.operators.Influence
    // K4 on {1,2,3,4} (4 triangles, every node in 3 of them, cc = 1)
    // plus a pendant 5—1 (degree 1, no triangle) and a duplicate +
    // reversed edge to exercise canonicalization
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (1L, 2L), // duplicates
      (5L, 1L)
    ).toDF("u", "v")
    var out: Map[Long, (Long, Long, Long)] = null
    // eager result + released iteration caches (the r10 PageRank rule):
    // at most the result's own localCheckpoint RDD may remain
    assertReleases("triangleStats", allowed = 1) {
      out = Influence.triangleStats(edges).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    }
    assert(out(1L) == ((4L, 3L, 2 * 3 * 10000L / (4 * 3))), out.toString) // deg 4: K4 + pendant
    assert(out(2L) == ((3L, 3L, 10000L)), out.toString)
    assert(out(3L) == ((3L, 3L, 10000L)), out.toString)
    assert(out(4L) == ((3L, 3L, 10000L)), out.toString)
    assert(out(5L) == ((1L, 0L, 0L)), out.toString)
    // total triangle mass: 4 triangles x 3 nodes
    assert(out.values.map(_._2).sum == 12L)
  }

  test("wedge close plans as a shuffled-hash join, never sort-merge") {
    import graft.operators.Influence
    // the wedge frame is the O(m^1.5) side — a sort-merge close would
    // externally sort it (the r12 q166 variance watch item); pin the
    // physical strategy on the shared close helper both the exact and
    // Doulion paths use. Disable broadcast so the tiny test frames
    // exercise the same non-broadcast path the sf0.1 graph takes.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val und = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
      val dir = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
      val plan = Influence.wedgeTriangles(dir, und)
        .queryExecution.executedPlan.toString
      // the close join must hash, streaming the wedge side; the wedge
      // BUILD (self-equi-join on src over the m-row dir frame) may stay
      // SMJ — sorting m rows is not the watch item, sorting m^1.5 is.
      // Small ids take the PACKED single-key path (xy = x·2³¹ + y)
      assert(plan.contains("ShuffledHashJoin [xy#"), plan)
      assert(!plan.contains("SortMergeJoin [xy#"), plan)
      // ids past 2³¹ fall back to the two-column close — still hashed
      val big = 1L << 40
      val undB = Seq((big + 1, big + 2), (big + 2, big + 3), (big + 1, big + 3))
        .toDF("a", "b")
      val dirB = Seq((big + 1, big + 2), (big + 1, big + 3), (big + 2, big + 3))
        .toDF("src", "dst")
      val planB = Influence.wedgeTriangles(dirB, undB)
        .queryExecution.executedPlan.toString
      assert(planB.contains("ShuffledHashJoin [x#"), planB)
      assert(!planB.contains("SortMergeJoin [x#"), planB)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("wedge fan-out broadcasts both sides under the session budget") {
    import graft.operators.Influence
    // under the session broadcast budget (32 B/edge against
    // autoBroadcastJoinThreshold) BOTH fan-out joins broadcast their
    // build side, so the O(m^1.5) wedge frame is generated map-side and
    // probed in the same stage — no exchange carries it; results are
    // pinned by the hand-graph triangleStats test which now takes this
    // path. Over the budget (previous test, threshold −1) the
    // shuffled-hash shape remains pinned.
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val dir = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val plan = Influence.wedgeTriangles(dir, und)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("triangleCountApprox: p=1 recovers the exact count; sampling deterministic") {
    import graft.operators.Influence
    // K5: C(5,3) = 10 triangles
    val k5 = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b))
      .toDF("u", "v")
    val full = Influence.triangleCountApprox(k5, 10000).collect().head
    assert((full.getLong(0), full.getLong(1)) == ((10L, 10L)))
    // exact side agrees: sum(n_tri)/3
    val exact = Influence.triangleStats(k5)
      .agg((sum("n_tri") / 3).cast("long")).collect().head.getLong(0)
    assert(exact == 10L)
    // p < 1: the md5-threshold subset is deterministic across runs and
    // partitionings, and the estimate is the exact 1/p^3 scale-up
    for (rep <- Seq(k5, k5.repartition(7))) {
      val s = Influence.triangleCountApprox(rep, 5000).collect().head
      assert(s.getLong(1) == s.getLong(0) * 1000000000000L /
        (5000L * 5000L * 5000L), s.toString)
    }
    val a = Influence.triangleCountApprox(k5, 5000).collect().head.getLong(0)
    val b = Influence.triangleCountApprox(k5.repartition(3), 5000)
      .collect().head.getLong(0)
    assert(a == b, s"sampled count not deterministic: $a vs $b")
  }

  test("kCorePeelProfile: clique survives, pendants peel, fixpoint visible") {
    import graft.operators.Influence
    // K4 on {1,2,3,4} + pendant chain 4—5—6 (+ a reversed duplicate):
    // 8 edges, 6 nodes → k = 16 div 6 + 1 = 3
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 5L)).toDF("u", "v")
    val got = Influence.kCorePeelProfile(edges, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // round 1 drops 5 (deg 2) and 6 (deg 1); K4 is the stable 3-core
    assert(got == Seq((1L, 3L, 4L, 6L), (2L, 3L, 4L, 6L), (3L, 3L, 4L, 6L)),
      got.toString)
    // explicit k above the clique degree peels everything
    val hard = Influence.kCorePeelProfile(edges, 2, kOverride = Some(4L))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(hard == Seq((1L, 1L, 0L), (2L, 0L, 0L)), hard.toString)
  }

  test("herdanSlope recovers a planted exponent and guards degenerates") {
    // construct docs where n_types = n_tokens^(1/2) exactly on a log
    // grid: doc k has 4^k tokens drawn from 2^k distinct words, so
    // ln V = 0.5 * ln N exactly — slope must be 500000 micro-units
    val docs = (1 to 4).map { k =>
      val types = 1 << k            // 2^k distinct words
      val total = types * types     // 4^k tokens
      val words = (0 until total).map(i => s"w${i % types}")
      ("s", words.mkString(" "))
    }.toDF("source", "text")
    val out = Profile.herdanSlope(docs).collect()
    assert(out.length == 1)
    val slope = out.head.getLong(2)
    assert(math.abs(slope - 500000L) <= 2L, s"slope=$slope")
    // degenerate: a single doc (n=1) and an all-empty source → slope 0
    val one = Seq(("s", "a b c"), ("t", ""), ("t", "   ")).toDF("source", "text")
    val m = Profile.herdanSlope(one).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m("s") == 0L)          // n < 2 guard
    assert(!m.contains("t"))      // empty docs carry no scaling info
  }
}
