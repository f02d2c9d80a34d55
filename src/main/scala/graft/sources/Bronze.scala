package graft.sources

import graft.streaming.EventSchemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bronze-layer sources (SURVEY.md §2.1 S4–S9).
  *
  * The reference lands scraped JSONL under
  * `bronze/raw/{source}/dt={date}/` and reads it back either
  * schema-inferred (`bronze_to_silver.py:107-119`) or with the canonical
  * envelope schema (`load_bronze_data.py:22-28,85-87`). Date-partitioned
  * directories give partition pruning for free; at 100 TB the `dt=` layout
  * is what keeps any daily job from scanning the full history.
  */
object Bronze {

  /** S4: schema-inferred JSONL read (bronze exploration path). */
  def readJsonlInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S5: envelope JSONL read with the explicit bronze schema — production
    * path; never pays the inference scan.
    */
  def readEnvelope(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(EventSchemas.bronzeEnvelope).json(path)

  /** S8: fallback-format read — try parquet, fall back to JSONL (the
    * reference's try-Iceberg-then-parquet / try-parquet-then-json shape,
    * `silver_to_gold.py:89-104`, `product_tracker.py:246-271`).
    */
  def readWithFallback(spark: SparkSession, parquetPath: String,
      jsonFallbackPath: String, schema: Option[StructType] = None): DataFrame =
    try spark.read.parquet(parquetPath)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        schema.fold(spark.read.json(jsonFallbackPath))(s =>
          spark.read.schema(s).json(jsonFallbackPath))
    }

  /** Parse an envelope frame's JSON payload with a per-source schema and
    * flatten (P4): one call per (source, schema) pair. The payload often
    * repeats envelope fields (platform, username) — payload wins, envelope
    * fills the gaps (the reference's precedence in
    * `bronze_to_silver.py:196-210`).
    */
  def parsePayload(envelope: DataFrame, source: String, schema: StructType): DataFrame = {
    val flat = envelope
      .filter(col("source") === source)
      .select(col("kol_id").as("env_kol_id"), col("platform").as("env_platform"),
        col("ingest_ts"), from_json(col("payload"), schema).as("data"))
      .select(col("env_kol_id"), col("env_platform"), col("ingest_ts"), col("data.*"))
    val withPlatform =
      if (flat.columns.contains("platform"))
        flat.withColumn("platform", coalesce(col("platform"), col("env_platform")))
      else flat.withColumn("platform", col("env_platform"))
    val withUser =
      if (withPlatform.columns.contains("username"))
        withPlatform.withColumn("username", coalesce(col("username"), col("env_kol_id")))
      else withPlatform.withColumn("username", col("env_kol_id"))
    withUser.drop("env_kol_id", "env_platform")
  }

  /** K1/K2: parquet table writes, optionally `dt`-partitioned. Overwrite =
    * full refresh (the reference's default); append for timeseries.
    */
  def writeParquet(df: DataFrame, path: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** K3 semantics without Iceberg: idempotent append into a
    * `dt`-partitioned parquet table with per-partition dynamic overwrite —
    * re-running a day replaces exactly that day.
    */
  def appendPartitioned(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt")
      .parquet(path)

  /** [[parsePayload]] with a quarantine split: rows whose payload fails
    * `from_json` go to a dead-letter frame carrying the raw envelope,
    * instead of surviving as default-valued shells. Returns
    * (good, quarantined). Quarantine catches BOTH failure shapes
    * (probed empirically, pinned by WireFormatFuzzSpec at 10k cases):
    * malformed/mistyped payloads, which PERMISSIVE mode parses to a
    * struct whose dedicated corrupt-record column is set, AND
    * null/empty/whitespace payloads, which `from_json` maps to a NULL
    * struct with NO corrupt marker — the r12 accounting hole: filtering
    * on the corrupt column alone let empty envelopes through as
    * all-null "good" rows.
    */
  def parsePayloadWithQuarantine(envelope: DataFrame, source: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val probe = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType))
    val tagged = envelope
      .filter(col("source") === source)
      .withColumn("__data", from_json(col("payload"), probe,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
    val isBad = col("__data").isNull || col("__data._corrupt_record").isNotNull
    val bad = tagged.filter(isBad)
      .select(col("kol_id"), col("platform"), col("source"), col("payload"), col("ingest_ts"))
    val good = parsePayload(
      tagged.filter(!isBad).drop("__data"), source, schema)
    (good, bad)
  }

  /** Bucketed table write — the 100 TB co-location tool: two tables
    * bucketed AND sorted the same way on the join key sort-merge-join with
    * zero exchange and zero sort (BucketingSpec asserts the plan). The
    * reference has no analogue (its joins shuffle every run); at scale,
    * bucketing the silver tables on (kol/platform or doc id) converts
    * every recurring gold-build join into a local merge.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** K8: DDL built from a StructType (`StructType.toDDL`), executed via
    * `spark.sql` — the reference's CREATE TABLE IF NOT EXISTS flow
    * (`kafka_to_bronze_tiktok.py:180-220` builds Iceberg DDL from the
    * topic schema the same way; here the table is parquet-backed).
    */
  def createTableDdl(name: String, schema: StructType, location: String,
      partitionCols: Seq[String] = Nil): String = {
    val partClause =
      if (partitionCols.nonEmpty) s" PARTITIONED BY (${partitionCols.mkString(", ")})" else ""
    s"CREATE TABLE IF NOT EXISTS $name (${schema.toDDL}) USING parquet" +
      partClause + s" LOCATION '$location'"
  }

  def registerTable(spark: SparkSession, name: String, schema: StructType,
      location: String, partitionCols: Seq[String] = Nil): Unit =
    spark.sql(createTableDdl(name, schema, location, partitionCols))
}
