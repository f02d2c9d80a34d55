package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Bench {

  /** Full-evaluation action: hash every column of every row into one
    * aggregate. Unlike `count()` — which lets Catalyst prune every computed
    * column (a projection-only query degenerates to a parquet row count) —
    * this forces each query's actual work to run while collecting only one
    * row to the driver.
    */
  private def forceEval(df: DataFrame): Unit = {
    val h = xxhash64(df.columns.map(c => col(c).cast("string")): _*)
    // decimal sum: a plain long sum of random 64-bit hashes overflows
    // within a handful of rows under ANSI mode
    df.select(h.as("h"))
      .agg(sum(col("h").cast("decimal(38,0)")), count(lit(1))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup pass: JVM/JIT + codegen caches, so round-over-round
    // per-query numbers don't depend on which query drew the warmup slot
    SparkEntry.queries.foreach { case (name, fn) =>
      try forceEval(fn(spark, sfDir)) catch {
        case e: Throwable => System.err.println(s"[bench] warmup $name FAILED: ${e.getMessage}")
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // collect OUTSIDE the timed window: on a large heap a major GC pause
      // otherwise lands mid-query on whichever one draws the short straw,
      // spiking a random per-query number 3-4x run-over-run
      System.gc()
      val t0 = System.nanoTime()
      try forceEval(fn(spark, sfDir)) catch {
        case e: Throwable =>
          // a swallowed failure shows up as a suspiciously fast "result" —
          // make it loud, while keeping the one-line JSON contract on stdout
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
