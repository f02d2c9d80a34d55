package graft.queries

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the wireFixture cache contract (VERDICT r5 #2): the q51/q52 wire
  * fixture must rebuild when the source data OR the payload expression
  * changes, and concurrent builders must not corrupt each other. The old
  * implementation cached on a (sf dir, name)-keyed `_SUCCESS` marker only,
  * so regenerated source parquet or an edited payload silently served a
  * stale fixture, and two JVMs could `overwrite` the same directory
  * concurrently.
  */
class WireFixtureSpec extends SparkSpec {

  /** Fresh source dir with an `orders.parquet` of n rows. */
  private def writeSource(dir: String, n: Int, priority: String): Unit =
    spark.range(1, n + 1L)
      .select(
        col("id").as("o_orderkey"),
        to_date(lit("2025-01-01")).as("o_orderdate"),
        lit(priority).as("o_orderpriority"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

  private def payloadOf(dir: String) =
    graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").cast("string").as("payload"))

  test("fixture rebuilds when source data changes at the same path") {
    val dir = Files.createTempDirectory("wirefix_src").toString
    writeSource(dir, 10, "1-URGENT")
    val first = MedallionOps.wireFixture(spark, dir, "t")(payloadOf(dir))
    assert(first.count() === 10)

    writeSource(dir, 13, "1-URGENT")
    val second = MedallionOps.wireFixture(spark, dir, "t")(payloadOf(dir))
    assert(second.count() === 13,
      "stale fixture served after source parquet was regenerated")
  }

  test("fixture rebuilds when the payload expression changes") {
    val dir = Files.createTempDirectory("wirefix_expr").toString
    writeSource(dir, 5, "1-URGENT")
    val a = MedallionOps.wireFixture(spark, dir, "t")(payloadOf(dir))
    assert(a.select(min("payload")).head.getString(0) === "1")

    val b = MedallionOps.wireFixture(spark, dir, "t")(
      graft.Tables.orders(spark, dir)
        .select(concat(lit("v2_"), col("o_orderkey")).as("payload")))
    assert(b.select(min("payload")).head.getString(0) === "v2_1",
      "stale fixture served after the payload expression changed")
  }

  test("concurrent builders of the same fresh key all read a complete fixture") {
    val dir = Files.createTempDirectory("wirefix_race").toString
    writeSource(dir, 200, "2-HIGH")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val counts = Await.result(
      Future.sequence(Seq.fill(4)(Future {
        MedallionOps.wireFixture(spark, dir, "t")(payloadOf(dir)).count()
      })), 120.seconds)
    assert(counts === Seq.fill(4)(200L))
  }

  test("q51/q52 wire queries still produce rows through the keyed cache") {
    val d = sf("sf0.001")
    val q51 = graft.SparkEntry.queries("q51_product_silver")(spark, d)
    val q52 = graft.SparkEntry.queries("q52_comment_silver")(spark, d)
    assert(q51.count() > 0)
    assert(q52.count() > 0)
  }
}
