package graft.operators

import graft.functions.VectorFunctions  // HOF forms kept for generic arrays
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, per the training-data-pipeline charter:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus; one pass, no shuffle of the corpus, ranked
  *    with a per-query window. The correctness baseline.
  *  - [[lshTopK]] — random-hyperplane LSH: bucket both sides on sign-bit
  *    signatures and only score within a bucket. The scale path — at 100 TB
  *    the bucket join shuffles ids+buckets, never the full pairwise product.
  *    Planes are derived from xxhash64, so signatures are deterministic
  *    across executors with no RNG state or broadcast models.
  */
object Similarity {

  /** Exact top-k neighbors per query. `queries`/`corpus`: (id, embedding).
    * Self-matches (same id) are excluded; ties broken by neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("embedding").as("qe"))
    val c = corpus.select(col("id").as("nid"), col("embedding").as("ne"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", graft.plans.VectorExpressions.cosineNative(col("qe"), col("ne")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "cosine", "rank")
  }

  /** Approximate top-k: only candidates sharing the query's LSH bucket are
    * scored. Recall is tunable via nPlanes (fewer planes → bigger buckets).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 4): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("embedding").as("qe"),
      VectorFunctions.lshBucket(col("embedding"), nPlanes).as("bucket"))
    val c = corpus.select(col("id").as("nid"), col("embedding").as("ne"),
      VectorFunctions.lshBucket(col("embedding"), nPlanes).as("bucket"))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", graft.plans.VectorExpressions.cosineNative(col("qe"), col("ne")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "bucket", "nid", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH-blocked:
    * the dedup formulation of similarity search (pairs, not top-k).
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double, nPlanes: Int = 4): DataFrame = {
    val b = df.select(col("id"), col("embedding"),
      VectorFunctions.lshBucket(col("embedding"), nPlanes).as("bucket"))
    val a = b.as("a")
    val c = b.as("b")
    a.join(c, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine", graft.plans.VectorExpressions.cosineNative(col("a.embedding"), col("b.embedding")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
