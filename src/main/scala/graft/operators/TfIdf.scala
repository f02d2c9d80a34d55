package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** tf-idf over whitespace tokens — corpus keyword extraction for
  * training-data curation (topical tagging, boilerplate spotting,
  * quality features).
  *
  * Shuffle story at scale: one exchange on (doc, token) for tf, one on
  * token for document frequency (counts only — partial aggregation
  * collapses the hot tokens map-side), the tf⋈df join keyed on token,
  * and the per-doc top-k window on doc id. Corpus size enters as a
  * plan-time literal (one count job), so idf is a pure projection.
  */
object TfIdf {

  /** One row per (id, token): tf, df, idf = ln((N+1)/(df+1)) + 1
    * (smoothed), tfidf.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count()
    val tf = df
      .select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("id", "token")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .withColumn("idf",
        log((lit(n.toDouble) + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
      .withColumn("tfidf", col("tf") * col("idf"))
      .select("id", "token", "tf", "df", "idf", "tfidf")
  }

  /** Top `k` terms per document by tf-idf. Ranking uses the 4dp-rounded
    * score (then token) so the order is reproducible across engines —
    * raw-double ranking could flip on libm ulp differences.
    */
  /** Feature-hashed bag-of-words similarity (the hashing trick —
    * Weinberger et al., ICML 2009): every token occurrence maps to one
    * of `dim` buckets with a ±1 sign, both derived from the portable
    * md5 first-level hash (`conv(substring(md5(t),1,8),16,10)` —
    * bucket = h mod dim, sign from the next bit group (h div dim)
    * mod 2), giving every document a dense `dim`-vector WITHOUT any
    * model, vocabulary, or fit — the cheapest text→vector bridge, and
    * the signed construction makes colliding tokens cancel in
    * expectation instead of piling up.
    *
    * Cosine is computed RELATIONALLY from the sparse bucket sums —
    * dot = Σ_b w_q·w_c over the shared-bucket join, norms ride their
    * own per-doc aggregate — so no dense vector is ever materialized
    * and the whole pipeline is exact-integer until the final
    * divide-and-round. Pairs sharing no bucket drop out of the join;
    * they are cosine-0 and can never reach a top-k.
    *
    * Shuffle story: one exchange on (doc, bucket) for the signed sums
    * (hot buckets partial-combine map-side), one per-doc norm
    * aggregate, the dot join keyed on bucket with the QUERY side
    * broadcast (≤ |q|·dim rows), and the per-query top-k through
    * WindowGroupLimit. At 100 TB the only corpus-sized costs are the
    * token scan and the (doc, bucket) aggregate — strictly less wire
    * than tf-idf, since dim caps per-doc output at `dim` rows.
    *
    * Returns (qid, nid, cosine [4dp half-up grid], rank) for the top
    * `k` per query document.
    */
  def hashedBowTopK(docs: DataFrame, idCol: String, textCol: String,
      queryMaxId: Long, dim: Int = 64, k: Int = 5): DataFrame = {
    require(dim >= 2 && k >= 1, s"dim must be >= 2 and k >= 1, got $dim, $k")
    val th = docs.select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.tokens(
          coalesce(col(textCol), lit("")))).as("t"))
      .select(col("id"),
        expr("cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)").as("h"))
    val bs = th
      .groupBy(col("id"), expr(s"pmod(h, $dim)").as("b"))
      .agg(sum(when(expr(s"pmod(h div $dim, 2)") === 0, 1L).otherwise(-1L))
        .as("w"))
      .filter(col("w") =!= 0)
    val nrm = bs.groupBy("id").agg(sum(expr("w * w")).as("n2"))
    val qb = bs.filter(col("id") < queryMaxId)
      .select(col("id").as("qid"), col("b"), col("w").as("qw"))
    val dot = broadcast(qb)
      .join(bs.select(col("id").as("nid"), col("b"), col("w").as("nw")), "b")
      .filter(col("qid") =!= col("nid"))
      .groupBy("qid", "nid")
      .agg(sum(expr("qw * nw")).as("dp"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    dot
      .join(broadcast(nrm.select(col("id").as("qid"), col("n2").as("qn2"))), "qid")
      .join(nrm.select(col("id").as("nid"), col("n2").as("nn2")), "nid")
      .withColumn("cosine", graft.functions.TextFunctions.round4hu(
        col("dp").cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("nn2").cast("double")))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "cosine", "rank")
  }

  /** All-pairs hashed-BOW cosine over a BOUNDED id slice (`id <
    * maxId`) in exact micro-units — the measurement half of
    * [[hashedBowTopK]]: `cos_u = floor(cos·10⁶ + 0.5)` per (id_a <
    * id_b) pair, pairs sharing no bucket at exact 0. The slice contract
    * makes the pair space a driver-bounded |slice|² — this is an AUDIT
    * primitive (calibration against lexical truth), not a corpus-scale
    * search; the search path is [[hashedBowTopK]].
    */
  def hashedBowPairCosines(docs: DataFrame, idCol: String, textCol: String,
      maxId: Long, dim: Int = 64): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val sliced = docs.filter(col(idCol) < maxId)
    val th = sliced.select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.tokens(
          coalesce(col(textCol), lit("")))).as("t"))
      .select(col("id"),
        expr("cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)").as("h"))
    val bs = th
      .groupBy(col("id"), expr(s"pmod(h, $dim)").as("b"))
      .agg(sum(when(expr(s"pmod(h div $dim, 2)") === 0, 1L).otherwise(-1L))
        .as("w"))
      .filter(col("w") =!= 0)
    val nrm = bs.groupBy("id").agg(sum(expr("w * w")).as("n2"))
    val dot = bs.select(col("id").as("id_a"), col("b"), col("w").as("wa"))
      .join(bs.select(col("id").as("id_b"), col("b"), col("w").as("wb")), "b")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(expr("wa * wb")).as("dp"))
    val ids = sliced.select(col(idCol).as("id_a"))
      .crossJoin(sliced.select(col(idCol).as("id_b")))
      .filter(col("id_a") < col("id_b"))
    broadcast(ids)
      .join(dot, Seq("id_a", "id_b"), "left")
      .join(broadcast(nrm.select(col("id").as("id_a"), col("n2").as("na"))), "id_a")
      .join(broadcast(nrm.select(col("id").as("id_b"), col("n2").as("nb"))), "id_b")
      .select(col("id_a"), col("id_b"),
        expr("""cast(floor(cast(coalesce(dp, 0) as double)
          / (sqrt(cast(na as double)) * sqrt(cast(nb as double)))
          * 1000000.0 + 0.5) as bigint)""").as("cos_u"))
  }

  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val scored = tfidf(df, idCol, textCol)
      .withColumn("score", graft.functions.TextFunctions.round4hu(col("tfidf")))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id", "token", "tf", "df", "score", "rank")
  }
}
