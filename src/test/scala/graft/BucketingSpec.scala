package graft

import java.nio.file.Files
import graft.sources.Bronze
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: the recurring-join posture for 100 TB.
  * Writing both sides bucketed+sorted on the join key must produce a
  * sort-merge join with NO exchange and NO sort — the plan itself is the
  * assertion.
  */
class BucketingSpec extends SparkSpec {
  import sqlImplicits._

  test("bucketed+sorted tables join with zero exchange and zero sort") {
    // managed-table locations must not linger from an aborted run
    spark.sql("DROP TABLE IF EXISTS b_profiles")
    spark.sql("DROP TABLE IF EXISTS b_metrics")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("b_profiles", "b_metrics").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) dir.listFiles().foreach(_.delete())
      dir.delete()
    }
    val profiles = (1L to 2000L).map(i => (s"u$i", s"bio $i", i * 7 % 1000))
      .toDF("username", "bio", "followers")
    val metrics = (1L to 2000L).map(i => (s"u$i", i * 3 % 500))
      .toDF("username", "views")
    Bronze.writeBucketed(profiles, "b_profiles", 8, Seq("username"))
    Bronze.writeBucketed(metrics, "b_metrics", 8, Seq("username"))

    // at test scale the sides fit the broadcast threshold, which would
    // bypass bucketing entirely; at 100 TB neither side broadcasts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_profiles").join(spark.table("b_metrics"), "username")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must use buckets, plan:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, plan:\n$plan")
      // a per-bucket Sort remains (Spark only trusts file sort order with
      // one file per bucket); it is partition-local — the network exchange,
      // which is what costs at 100 TB, is gone
      assert(joined.count() == 2000)

      // same key, unbucketed: both sides shuffle — the cost bucketing removes
      val unbucketed = profiles.join(metrics, "username")
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      // a failed assert must not leave the shared session broadcast-less
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_profiles")
      spark.sql("DROP TABLE IF EXISTS b_metrics")
    }
  }
}
