package graft

import org.apache.spark.sql.SparkSession

/** Deployment-path check for the SQL surface: the
  * `SparkSessionExtensions` injection that
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` performs at
  * session build must expose the custom functions to plain `spark.sql`
  * users. The config form is a STATIC conf read when the SparkContext's
  * first session is built, so on the suite's shared context we exercise
  * the identical injection through `builder.withExtensions(new
  * GraftExtensions())` — the same `injectFunction` calls the conf path
  * runs, distinct from the live-session `register()` already covered by
  * VectorExpressionSpec.
  */
class ExtensionsDeploySpec extends SparkSpec {

  test("SparkSessionExtensions injection registers the functions") {
    // touch the shared session first so the context exists
    spark.sparkContext
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      val row = s2.sql(
        """SELECT simhash_sig('the quick brown fox') AS s,
          |  minhash_sig('the quick brown fox jumps over it', 4) AS m,
          |  cosine_f(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |  subword_piece_count('the table') AS n,
          |  winnow_fingerprints('abcdefghijklmnop') AS wf,
          |  winnow_fingerprint_positions('abcdefghijklmnop') AS wfp""".stripMargin).head()
      assert(!row.isNullAt(0))
      assert(row.getSeq[Long](1).length == 4)
      assert(row.getDouble(2) == 1.0)
      assert(row.getLong(3) == 4L)
      assert(row.getSeq[Long](4).nonEmpty)
      assert(row.getSeq[org.apache.spark.sql.Row](5).nonEmpty)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
