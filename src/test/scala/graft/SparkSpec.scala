package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", shufflePartitions = 4).getOrCreate()
  lazy val sqlImplicits = spark.implicits
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** Assert `body` (an operator invocation + its action) leaves at most
    * `allowed` new persistent RDDs behind — the eager result's own
    * localCheckpoint storage. Scoped by a before/after snapshot of this
    * context's persistent RDDs: a global `cacheManager.isEmpty` assert
    * is FLAKY under sbt's concurrent suites (all specs share one
    * SparkContext via getOrCreate, so another suite's live cache fails
    * it — reproduced in the r11 full run). A foreign suite persisting
    * inside the snapshot window can still inflate the delta, so a
    * too-large delta retries once — a real operator leak repeats
    * deterministically, a race does not.
    */
  def assertReleases(label: String, allowed: Int = 1)(body: => Unit): Unit = {
    def delta(): Int = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      body
      (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    }
    val d1 = delta()
    if (d1 > allowed) {
      val d2 = delta()
      assert(d2 <= allowed,
        s"$label left $d2 persisted frames behind (> $allowed result " +
          "checkpoints) on both attempts — an unreleased cache")
    }
  }
}
