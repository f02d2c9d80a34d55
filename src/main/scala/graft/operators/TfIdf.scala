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
