package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided deterministic test tables
  * (`/root/testdata/sf*`, see TESTDATA.md). One parquet file per table.
  *
  * All reads go through `spark.read.parquet` so Catalyst gets column
  * pruning + predicate pushdown for free; at 100 TB these would be
  * partitioned/bucketed catalog tables, but the call sites only depend
  * on the returned DataFrame, so the swap is local to this object.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events table carries a nanosecond parquet timestamp, which Spark
    * only reads via `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * [[graft.GraftSession]]); convert to a microsecond TimestampType here
    * so every consumer sees a real timestamp column. The ns→µs truncation
    * matches DuckDB's TIMESTAMP_NS→TIMESTAMP cast, keeping oracle parity.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // round-9 testdata writes ts as timestamp[us] without a zone —
        // normalize to TimestampType (UTC session: same instant) so
        // downstream epoch-seconds casts stay legal (TIMESTAMP_NTZ →
        // BIGINT is not a supported cast)
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
