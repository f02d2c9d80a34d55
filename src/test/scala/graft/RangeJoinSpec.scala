package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketized range join semantics: inclusive bounds, bucket-boundary
  * crossings, multi-interval keys, no duplicate matches, and the
  * equi-join plan shape (no nested-loop join).
  */
class RangeJoinSpec extends SparkSpec {
  import sqlImplicits._

  // bucketWidth 10: interval (5,25) spans buckets 0..2; probes chosen on
  // boundaries, interiors and just outside the inclusive edges
  private def left = Seq(
    (1L, "k1", 5L), (2L, "k1", 10L), (3L, "k1", 25L), (4L, "k1", 26L),
    (5L, "k1", 4L), (6L, "k2", 10L), (7L, "k1", 100L)
  ).toDF("row_id", "ck", "t")

  private def right = Seq(
    ("p1", "k1", 5L, 25L), ("p2", "k1", 20L, 30L), ("p3", "k2", 0L, 9L)
  ).toDF("promo", "pk", "s", "e")

  test("inclusive bounds, boundary crossings, multi-interval, no dupes") {
    val out = RangeJoin.bucketedRangeJoin(left, "ck", "t", right, "pk", "s", "e", 10L)
      .select("row_id", "promo").collect().map(r => (r.getLong(0), r.getString(1)))
    val got = out.toSet
    assert(out.length == got.size, s"duplicate matches: ${out.mkString(",")}")
    assert(got == Set(
      (1L, "p1"),              // t=5: inclusive lower bound
      (2L, "p1"),              // interior, middle bucket
      (3L, "p1"), (3L, "p2"),  // t=25: inclusive upper of p1, interior of p2
      (4L, "p2")               // outside p1, inside p2
      // 5: t=4 just below p1; 6: k2 t=10 just above p3; 7: far outside
    ), s"got $got")
  }

  test("plan is an equi-join on (key, bucket) — no nested loop") {
    val out = RangeJoin.bucketedRangeJoin(left, "ck", "t", right, "pk", "s", "e", 10L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
  }
}
