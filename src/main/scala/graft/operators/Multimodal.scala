package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The container has no media codecs, so the decode step is a clearly
  * marked DETERMINISTIC STUB ([[decodeStub]]): it derives a fake feature
  * vector from the bytes alone, so tests pin the real Spark-side contract
  * — schema, binary transport, partition batching, feature shape — and a
  * production build swaps only the function body (e.g. JNI to a codec or
  * an ONNX runtime session per partition, reused across the batch).
  *
  * This is the Scala twin of the PySpark `mapInPandas` pattern: a
  * `mapPartitions` over an iterator so per-partition setup cost (model
  * load, codec init) amortizes across rows, never per-row.
  */
object Multimodal {

  /** media table schema: id + modality + raw bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType))))))

  val FeatureDim = 8

  /** STUB decode/feature-extract: a real build replaces this body with an
    * actual decoder; everything around it (batching, schema, shuffle
    * behavior) is production code. Deterministic: features are a simple
    * byte-histogram projection, so tests are reproducible.
    */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    if (content != null) {
      var i = 0
      while (i < content.length) {
        acc(java.lang.Byte.toUnsignedInt(content(i)) % FeatureDim) += 1.0f
        i += 1
      }
      val n = math.max(content.length, 1).toFloat
      var j = 0
      while (j < FeatureDim) { acc(j) /= n; j += 1 }
    }
    acc
  }

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** Per-partition batched feature extraction (the mapInPandas shape):
    * partition-level setup happens once, then the iterator streams rows
    * without materializing the partition.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select("media_id", "kind", "content").mapPartitions { rows =>
      // partition-scoped setup would go here (decoder/model init)
      rows.map { r: Row =>
        val bytes = r.getAs[Array[Byte]]("content")
        MediaFeatures(
          r.getAs[Long]("media_id"),
          r.getAs[String]("kind"),
          if (bytes == null) 0L else bytes.length.toLong,
          decodeStub(bytes))
      }
    }
  }

  /** Frame-sampling plan for video: one row per sampled frame offset —
    * pure column expressions (sequence + explode); the decode of each
    * frame goes through the same stub.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      .filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)), lit(everyMs))))
      .select(col("media_id"), col("frame_ms"), col("content"))

  /** Adapt the documents table into a media frame (text bytes as payload)
    * so the pipeline is exercisable in this container. Non-ASCII
    * codepoints are replaced with '?' so the payload's byte sequence is
    * expressible per-character in ANSI SQL — that makes the q40 rollup
    * oracle-checkable in DuckDB instead of rows-only.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      // coalesce BEFORE the regex: a NULL text must become an empty
      // payload (zero features), not a NULL row the oracle would average
      // differently
      regexp_replace(coalesce(col("text"), lit("")), "[^\\x20-\\x7e]", "?")
        .cast("binary").as("content"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms"),
        lit("stub").as("codec")).as("meta"))

  /** Rollup of extracted features per modality — the q40 query surface:
    * proves schema, batching and feature shape end-to-end, hash-compared
    * against a DuckDB oracle that recomputes the stub's byte histogram
    * per character (binary half-up rounding for cross-engine parity).
    */
  def featureStats(media: DataFrame): DataFrame = {
    val feats = extractFeatures(media)
    feats.toDF()
      .withColumn("f0", element_at(col("features"), 1))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        graft.functions.TextFunctions.round4hu(avg("f0")).as("avg_f0"),
        graft.functions.TextFunctions.round4hu(
          avg(aggregate(col("features"), lit(0.0), (a, x) => a + x.cast("double"))))
          .as("avg_feature_sum"))
  }
}
