package graft

import java.nio.file.Files
import graft.operators.Generations
import graft.queries.LifecycleOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The single-writer lease (VERDICT r14 #1): the generation protocol's
  * "one maintenance writer" rule is enforced by an atomic-create lock
  * marker — a second concurrent cycle on one base fails loudly with the
  * incumbent's holder id instead of interleaving cleanUncommitted/
  * commit; a crashed holder's lease is reclaimable after expiry; two
  * racing acquirers resolve to exactly one winner.
  */
class LeaseSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.documents(spark, sf("sf0.001"))
      .filter(col("doc_id") < 200).select("doc_id", "text", "lang")

  private def freshBase(tag: String): String =
    Files.createTempDirectory(tag).toString

  test("a second writer on a held base aborts with the holder's id") {
    val base = freshBase("lease_held")
    LifecycleOps.priorBuild(spark, base, docs)
    // writer 1 is mid-cycle: its lease is on disk, unexpired
    Generations.acquireLease(spark, base, "writer-one", ttlMs = 3600000L)
    val e = intercept[IllegalArgumentException] {
      LifecycleOps.refreshTo(spark, base, docs)
    }
    assert(e.getMessage.contains("writer-one"),
      s"abort message must name the incumbent: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      LifecycleOps.deleteDocs(spark, base, docs.select("doc_id").limit(1))
    }
    assert(e2.getMessage.contains("writer-one"))
    // the loser must not have disturbed the incumbent's lease
    assert(Generations.leaseHolder(spark, base).exists(_._1 == "writer-one"))
    Generations.releaseLease(spark, base, "writer-one")
    // released: the next cycle proceeds and cleans up after itself
    LifecycleOps.refreshTo(spark, base, docs.filter(col("doc_id") < 100))
    assert(Generations.leaseHolder(spark, base).isEmpty,
      "a completed cycle must release its lease")
  }

  test("a crashed holder's expired lease is reclaimed; a live one is not") {
    val base = freshBase("lease_stale")
    LifecycleOps.priorBuild(spark, base, docs)
    // simulate a crashed writer: lease present, expiry already past
    Generations.acquireLease(spark, base, "crashed-writer", ttlMs = -1000L)
    assert(Generations.leaseHolder(spark, base).isEmpty, "expired ≠ live")
    // the next cycle reclaims it and completes
    LifecycleOps.refreshTo(spark, base, docs.filter(col("doc_id") < 150))
    assert(Generations.current(spark, base).contains(1L))
    assert(Generations.leaseHolder(spark, base).isEmpty)
    // an UNPARSEABLE lease (acquire crashed between create and write):
    // a FRESH one is protected (its expiry falls back to mtime + TTL —
    // a racer mid-write must not be reclaimed), and once its mtime-
    // based TTL passes it reclaims like any stale lease
    val leaseFile = s"$base/${Generations.LeaseName}"
    Generations.writeMarker(spark, leaseFile, "")
    val e = intercept[IllegalArgumentException] {
      LifecycleOps.refreshTo(spark, base, docs)
    }
    assert(e.getMessage.contains("<unparseable>"))
    val p = new org.apache.hadoop.fs.Path(leaseFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setTimes(p, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
    LifecycleOps.refreshTo(spark, base, docs)
    assert(Generations.current(spark, base).contains(2L))
  }

  test("an injected-kill cycle releases its lease for the re-run") {
    val base = freshBase("lease_kill")
    LifecycleOps.priorBuild(spark, base, docs)
    intercept[RuntimeException] {
      LifecycleOps.refreshTo(spark, base, docs.filter(col("doc_id") < 100),
        failAt = Some("after-shards"))
    }
    // exception unwinding released the lease (only a hard JVM kill
    // leaves it, and that path is the expiry reclaim above)
    assert(Generations.leaseHolder(spark, base).isEmpty)
    LifecycleOps.refreshTo(spark, base, docs.filter(col("doc_id") < 100))
    assert(Generations.current(spark, base).contains(1L))
  }

  test("racing acquirers resolve to exactly one winner") {
    val base = freshBase("lease_race")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val attempts = (0 until 8).map { i =>
      Future {
        gate.await()
        try { Generations.acquireLease(spark, base, s"racer-$i"); true }
        catch { case _: IllegalArgumentException => false }
      }
    }
    gate.countDown()
    val results = Await.result(Future.sequence(attempts), 60.seconds)
    assert(results.count(identity) == 1,
      s"expected exactly one winner, got ${results.count(identity)}")
    val holder = Generations.leaseHolder(spark, base).map(_._1)
    assert(holder.exists(_.startsWith("racer-")))
    // re-acquire by the SAME holder renews instead of failing
    Generations.acquireLease(spark, base, holder.get)
    Generations.releaseLease(spark, base, holder.get)
    assert(Generations.leaseHolder(spark, base).isEmpty)
  }
}
