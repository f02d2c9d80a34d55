package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", shufflePartitions = 4).getOrCreate()
  lazy val sqlImplicits = spark.implicits
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
