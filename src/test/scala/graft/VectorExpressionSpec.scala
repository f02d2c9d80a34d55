package graft

import graft.functions.VectorFunctions
import graft.plans.VectorExpressions
import org.apache.spark.sql.functions._

/** The codegen'd FloatVectorCosine/Dot must agree bitwise with the
  * higher-order-function forms (same double accumulation order) on the
  * real embeddings table, and handle nulls/length-mismatch/zero vectors.
  */
class VectorExpressionSpec extends SparkSpec {
  import sqlImplicits._

  test("native cosine == HOF cosine bitwise on real embeddings") {
    val emb = Tables.embeddings(spark, sf()).limit(200)
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b).filter(col("ida") < col("idb")).limit(5000)
    val diff = pairs.select(
      (VectorExpressions.cosineNative(col("ea"), col("eb")) -
        VectorFunctions.cosine(col("ea"), col("eb"))).as("d"),
      (VectorExpressions.dotNative(col("ea"), col("eb")) -
        VectorFunctions.dot(col("ea"), col("eb"))).as("dd"))
      .agg(max(abs(col("d"))).as("md"), max(abs(col("dd"))).as("mdd"))
      .head()
    assert(diff.getDouble(0) == 0.0, s"cosine drift ${diff.getDouble(0)}")
    assert(diff.getDouble(1) == 0.0, s"dot drift ${diff.getDouble(1)}")
  }

  test("native cosine edge cases: zero vector, length mismatch, null") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f), Array(1.0f, 2.0f)), // zero norm → 0.0
      (2L, Array(1.0f, 2.0f), Array(1.0f, 2.0f))) // self → 1.0
      .toDF("id", "a", "b")
    val got = df.select(col("id"), VectorExpressions.cosineNative(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(math.abs(got(2L) - 1.0) < 1e-15)

    val mismatch = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorExpressions.cosineNative(col("a"), col("b")).as("c"))
      .head()
    assert(mismatch.isNullAt(0), "length mismatch must be null")

    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
      .select(VectorExpressions.cosineNative(col("a"), col("b")).as("c"))
      .head()
    assert(withNull.isNullAt(0), "null input must be null")
  }

  test("SQL surface: cosine_f/dot_f/minhash_agg registered via extensions") {
    graft.plans.GraftExtensions.register(spark)
    import sqlImplicits._
    Seq((1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("vecs_sql")
    val rows = spark.sql(
      "SELECT id, cosine_f(a, b) AS c, dot_f(a, b) AS d FROM vecs_sql ORDER BY id")
      .collect()
    assert(rows(0).getDouble(1) == 1.0 && rows(0).getDouble(2) == 1.0)
    assert(rows(1).getDouble(1) == 0.0 && rows(1).getDouble(2) == 0.0)
    // aggregate path: SQL minhash_agg equals the column API
    Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("id", "h")
      .createOrReplaceTempView("hashed_sql")
    val viaSql = spark.sql(
      "SELECT id, minhash_agg(h, 4) AS sig FROM hashed_sql GROUP BY id ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val viaApi = spark.table("hashed_sql").groupBy("id")
      .agg(graft.plans.MinHashAgg.minhashAgg($"h", 4).as("sig"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(viaSql.toSeq == viaApi.toSeq)
    // scalar subword tokenizer reachable from SQL too
    val sw = spark.sql("SELECT subword_piece_count('the table') AS n").head()
    assert(sw.getLong(0) == 4L) // the=1 + ta|b|le=3
    // one-pass signature kernels reachable from SQL, equal to the column API
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text").createOrReplaceTempView("sig_sql")
    val sqlSig = spark.sql(
      """SELECT minhash_sig(text, 8) AS m, minhash_sig_portable(text, 8, 3) AS mp,
        |       simhash_sig(text) AS s, simhash_sig_portable32(text) AS sp
        |FROM sig_sql""".stripMargin).head()
    val apiSig = spark.table("sig_sql").select(
      graft.plans.SignatureExpressions.minhashSig(col("text"), 8).as("m"),
      graft.plans.SignatureExpressions.minhashSig(col("text"), 8, 3, portable = true).as("mp"),
      graft.plans.SignatureExpressions.simhashSig(col("text")).as("s"),
      graft.plans.SignatureExpressions.simhashSig(col("text"), portable = true).as("sp"))
      .head()
    assert(sqlSig.getSeq[Long](0) == apiSig.getSeq[Long](0))
    assert(sqlSig.getSeq[Long](1) == apiSig.getSeq[Long](1))
    assert(sqlSig.getLong(2) == apiSig.getLong(2))
    assert(sqlSig.getLong(3) == apiSig.getLong(3))
  }

  test("native cosine participates in whole-stage codegen") {
    val emb = Tables.embeddings(spark, sf()).limit(10)
    val exec = emb.select(VectorExpressions.cosineNative(col("embedding"), col("embedding")))
      .queryExecution.executedPlan
    val hasCodegenStage = exec.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasCodegenStage, s"expected a WholeStageCodegen stage in:\n$exec")
  }

  test("SQL surface: srp_code(vec, n_planes, dim) == the column API") {
    graft.plans.GraftExtensions.register(spark)
    import sqlImplicits._
    val rng = new scala.util.Random(3)
    (0L until 20L).map(i => i -> Array.fill(8)(rng.nextFloat() - 0.5f))
      .toDF("id", "v").createOrReplaceTempView("srp_sql")
    val viaSql = spark.sql(
      "SELECT id, srp_code(v, 16, 8) AS c FROM srp_sql ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaApi = spark.table("srp_sql")
      .select(col("id"), VectorFunctions.srpCode(col("v"), 16, 8).as("c"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("SrpPackedCode == per-plane reference bits on random vectors") {
    // the JIT-cliff fix must be a pure restructuring: every bit of the
    // packed code equals the straightforward per-plane double dot
    // computed in plain Scala with the same (ascending-i, >= 0) rule
    val rng = new scala.util.Random(42)
    val dim = 64; val planes = 62
    val vecs = (0L until 200L).map(i =>
      i -> Array.fill(dim)(rng.nextFloat() * 2 - 1))
    val w = Array.tabulate(planes)(p => VectorFunctions.hyperplaneWeights(p, dim))
    val expect = vecs.map { case (i, v) =>
      var code = 0L
      for (p <- 0 until planes) {
        var dot = 0.0
        for (j <- 0 until dim) dot += v(j).toDouble * w(p)(j)
        if (dot >= 0.0) code |= 1L << p
      }
      i -> code
    }.toMap
    val got = vecs.toDF("id", "embedding")
      .select(col("id"),
        VectorFunctions.srpCode(col("embedding"), planes, dim).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect,
      s"first mismatch: ${expect.find(kv => got(kv._1) != kv._2)}")
  }
}
