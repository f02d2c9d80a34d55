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

  /** IVF-style ANN: a coarse quantizer of `nCentroids` deterministically
    * sampled vectors partitions the corpus into cells; queries probe the
    * `nProbe` nearest cells and only score candidates there. The centroid
    * set is collected to the driver (it is the model — a few hundred
    * vectors) and broadcast back; corpus assignment is one argmin pass.
    * Better recall than sign-bit LSH when the data is clustered, same
    * shuffle shape: candidates join on cell id, never a cross product.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = corpus
      .select(col("id"), col("embedding"))
      .orderBy(xxhash64(col("id")).asc) // deterministic pseudo-random sample
      .limit(nCentroids)
      .select(col("id").as("cid"), col("embedding").as("ce"))
    val assignW = Window.partitionBy("id").orderBy(col("dist").asc, col("cid").asc)
    val assigned = corpus.crossJoin(broadcast(cents))
      .withColumn("dist", VectorFunctions.l2Distance(col("embedding"), col("ce")))
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select(col("id").as("nid"), col("embedding").as("ne"), col("cid").as("cell"))
    val probeW = Window.partitionBy("qid").orderBy(col("dist").asc, col("cid").asc)
    val probes = queries.select(col("id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("dist", VectorFunctions.l2Distance(col("qe"), col("ce")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qe"), col("cid").as("cell"))
    val scored = broadcast(probes).join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", graft.plans.VectorExpressions.cosineNative(col("qe"), col("ne")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cell", "nid", "cosine", "rank")
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
