package graft

import graft.operators.{Similarity, Skew}
import graft.sources.Bronze
import graft.streaming.EventSchemas
import org.apache.spark.sql.functions._

/** Skew-salting equivalence, IVF ANN behavior, and the bronze quarantine
  * split.
  */
class SkewAndIvfSpec extends SparkSpec {
  import sqlImplicits._

  test("saltedAggregate equals plain aggregate on a hot-keyed frame") {
    val rng = new scala.util.Random(3)
    // 90% of rows on one hot key
    val rows = Seq.tabulate(5000) { i =>
      val k = if (rng.nextDouble() < 0.9) "hot" else s"k${rng.nextInt(50)}"
      (k, rng.nextInt(100).toDouble)
    }
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(df, Seq("k"), salts = 8)(
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAgg = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val skewed = (1 to 2000).map(i => (if (i % 10 != 0) "hot" else s"k$i", i)).toDF("k", "v")
    val build = Seq(("hot", "H"), ("k10", "A"), ("k20", "B")).toDF("k", "name")
    val plain = skewed.join(build, Seq("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(skewed, build, "k", salts = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin keeps left/semi/anti semantics and rejects right/full") {
    val skewed = Seq(("hot", 1), ("hot", 2), ("lonely", 3)).toDF("k", "v")
    val build = Seq(("hot", "H"), ("unseen", "U")).toDF("k", "name")
    // left: the unmatched PROBE row survives exactly once with a null
    val left = Skew.saltedJoin(skewed, build, "k", salts = 4, joinType = "left")
      .collect().map(r => (r.getString(0), r.getInt(1), Option(r.getString(2)))).toSet
    assert(left == Set(("hot", 1, Some("H")), ("hot", 2, Some("H")),
      ("lonely", 3, None)))
    val semi = Skew.saltedJoin(skewed, build, "k", salts = 4, joinType = "left_semi")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(semi == Set(("hot", 1), ("hot", 2)))
    val anti = Skew.saltedJoin(skewed, build, "k", salts = 4, joinType = "left_anti")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(anti == Set(("lonely", 3)))
    // Spark's bare aliases are salt-safe too and must not be rejected
    val semiAlias = Skew.saltedJoin(skewed, build, "k", salts = 4, joinType = "semi")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(semiAlias == semi)
    val antiAlias = Skew.saltedJoin(skewed, build, "k", salts = 4, joinType = "anti")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(antiAlias == anti)
    // right/full would emit the unmatched build row ("unseen") salts× —
    // rejected loudly instead of silently multiplying rows
    for (bad <- Seq("right", "full", "full_outer", "right_outer")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(skewed, build, "k", salts = 4, joinType = bad)
      }
      assert(e.getMessage.contains(bad), e.getMessage)
    }
  }

  test("saltedAggregateAuto: plain path under threshold, salted and equal above") {
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(4000) { i =>
      val k = if (rng.nextDouble() < 0.8) "hot" else s"k${rng.nextInt(40)}"
      (k, rng.nextInt(100).toDouble)
    }
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    def auto(threshold: Long) =
      Skew.saltedAggregateAuto(df, Seq("k"), hotKeyThreshold = threshold)(
        partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
        finalAgg = Seq(sum("ps").as("s"), sum("pn").as("n")))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    // threshold above the hot key's ~3200 rows → salts=1 degenerate path;
    // threshold far below → real salting; both must equal the plain agg
    assert(auto(1000000L) == plain)
    assert(auto(100L) == plain)
  }

  test("keyHistogram surfaces the hot key first") {
    val df = (1 to 500).map(i => (if (i <= 400) "hot" else s"k$i", i)).toDF("k", "v")
    val top = Skew.keyHistogram(df, Seq("k"), topN = 1).head()
    assert(top.getString(0) == "hot" && top.getLong(1) == 400L)
  }

  test("ivfTopK finds the planted identical vector at rank 1") {
    val rng = new scala.util.Random(11)
    val vecs = (0L until 300L).map(i => i -> Array.fill(16)(rng.nextFloat() - 0.5f))
    val planted = (999L, vecs.head._2.clone())
    val df = (vecs :+ planted).toDF("id", "embedding")
    val got = Similarity.ivfTopK(df.filter($"id" === 0L), df, k = 3,
      nCentroids = 8, nProbe = 3).collect()
    assert(got.nonEmpty)
    val r1 = got.find(_.getAs[Int]("rank") == 1).get
    assert(r1.getAs[Long]("nid") == 999L, s"expected planted twin first, got ${r1}")
    assert(math.abs(r1.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("ivf recall beats sign-bit LSH on clustered data") {
    // 4 gaussian-ish clusters → IVF cells align with clusters
    val rng = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextFloat() * 2 - 1))
    val vecs = (0L until 400L).map { i =>
      val c = centers((i % 4).toInt)
      i -> c.map(x => x + (rng.nextFloat() - 0.5f) * 0.2f)
    }
    val df = vecs.toDF("id", "embedding").cache()
    val queries = df.filter($"id" < 20)
    val exact = Similarity.bruteForceTopK(queries, df, 10).select("qid", "nid")
    val ivf = Similarity.ivfTopK(queries, df, 10, nCentroids = 12, nProbe = 4).select("qid", "nid")
    val lsh = Similarity.lshTopK(queries, df, 10, nPlanes = 4, dim = 16).select("qid", "nid")
    val total = exact.count().toDouble
    val ivfRecall = exact.intersect(ivf).count() / total
    val lshRecall = exact.intersect(lsh).count() / total
    // both are approximate — allow LSH a hair of seed luck, but IVF must be
    // in the same class AND high in absolute terms on clustered data
    assert(ivfRecall >= lshRecall - 0.02,
      s"ivf recall $ivfRecall well below lsh recall $lshRecall on clustered data")
    assert(ivfRecall > 0.85, s"ivf recall $ivfRecall unexpectedly low")
  }

  test("kmeansRefine: Lloyd rounds never increase the quantizer MSE") {
    val rng = new scala.util.Random(7)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextFloat() * 2 - 1))
    val vecs = (0L until 400L).map { i =>
      val c = centers((i % 4).toInt)
      i -> c.map(x => x + (rng.nextFloat() - 0.5f) * 0.3f)
    }
    val df = vecs.toDF("id", "embedding").cache()
    val init = Similarity.sampleCentroids(df, 6)
    val mse0 = Similarity.quantizerMse(df, init)
    val r1 = Similarity.kmeansRefine(df, init, 1)
    val mse1 = Similarity.quantizerMse(df, r1)
    val r3 = Similarity.kmeansRefine(df, init, 3)
    val mse3 = Similarity.quantizerMse(df, r3)
    assert(mse1 <= mse0 + 1e-9, s"one Lloyd round increased MSE: $mse0 -> $mse1")
    assert(mse3 <= mse1 + 1e-9, s"more rounds increased MSE: $mse1 -> $mse3")
    assert(mse3 < mse0 * 0.9, s"refinement barely moved: $mse0 -> $mse3")
    // the refined quantizer still serves ANN correctly end to end
    val queries = df.filter($"id" < 10)
    val exact = Similarity.bruteForceTopK(queries, df, 5).select("qid", "nid")
    val ivf = Similarity.ivfTopK(queries, df, 5, nCentroids = 6, nProbe = 3,
      refineIters = 2).select("qid", "nid")
    val recall = exact.intersect(ivf).count() / exact.count().toDouble
    assert(recall > 0.8, s"refined-quantizer recall $recall")
  }

  test("ivfTopK plan: assignment is a pure projection — one window, no assignment shuffle") {
    val rng = new scala.util.Random(11)
    val vecs = (0L until 300L).map(i => i -> Array.fill(16)(rng.nextFloat() - 0.5f))
    val df = vecs.toDF("id", "embedding")
    val plan = Similarity.ivfTopK(df.filter($"id" === 0L), df, k = 3,
      nCentroids = 8, nProbe = 3).queryExecution.optimizedPlan.toString()
    // exactly one Window operator (the final per-query top-k rank) — the old
    // plan had a second one ranking a crossJoin-blown-up corpus (a 16x full
    // shuffle). "Window [" matches the operator node only (not
    // windowspecdefinition / WindowGroupLimit).
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows == 1, s"expected 1 window (final rank), got $windows:\n$plan")
    assert(!plan.contains("Join Cross"), s"corpus crossJoin survived:\n$plan")
  }

  test("lshBucket plan: literal planes, no per-row hash derivation") {
    val rng = new scala.util.Random(2)
    val df = (0L until 50L).map(i => i -> Array.fill(16)(rng.nextFloat() - 0.5f))
      .toDF("id", "embedding")
    val plan = df.select(graft.functions.VectorFunctions.lshBucket(col("embedding"), 4, 16))
      .queryExecution.optimizedPlan.toString()
    assert(!plan.contains("xxhash64"), s"per-row hash derivation survived:\n$plan")
    assert(plan.contains("float_vector_dot"), s"expected codegen'd literal dot:\n$plan")
  }

  test("bronze quarantine: malformed payloads split out, not defaulted") {
    val dir = java.nio.file.Files.createTempDirectory("bronzeq").toFile
    java.nio.file.Files.write(new java.io.File(dir, "d.jsonl").toPath,
      Seq(
        """{"kol_id":"a","platform":"tiktok","source":"profiles","ingest_ts":"t1","payload":"{\"event_id\":\"p1\",\"username\":\"a\"}"}""",
        """{"kol_id":"bad","platform":"tiktok","source":"profiles","ingest_ts":"t2","payload":"NOT JSON"}""")
        .mkString("\n").getBytes)
    val env = Bronze.readEnvelope(spark, dir.getAbsolutePath)
    val (good, bad) = Bronze.parsePayloadWithQuarantine(env, "profiles", EventSchemas.profile)
    assert(good.count() == 1 && good.head().getAs[String]("username") == "a")
    val q = bad.collect()
    assert(q.length == 1 && q.head.getAs[String]("kol_id") == "bad")
    assert(q.head.getAs[String]("payload") == "NOT JSON") // raw preserved for replay
  }

  test("nearestCentroidAssign: planted clusters recovered, truncating centroid, equidistant tie to smaller label") {
    import graft.operators.Similarity
    // label 0 around (0, 0); label 1 around (10, 10); one point that a
    // float mean would place differently: label 0 train = {(0,0),(1,0)}
    // → exact centroid (su div n) = (0.5e6 div 2... ) = (500000, 0)
    val train = Seq(
      (0L, Array(0f, 0f)), (0L, Array(1f, 0f)),
      (1L, Array(10f, 10f)), (1L, Array(12f, 10f)))
      .toDF("label", "embedding")
    val cents = Similarity.labelCentroidsMicro(train, "label", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(cents(0L) == Seq(500000L, 0L), s"got $cents")
    assert(cents(1L) == Seq(11000000L, 10000000L), s"got $cents")
    val probe = Seq(
      (100L, Array(0.4f, 0.1f)),   // near label 0
      (101L, Array(11f, 9f)),      // near label 1
      // equidistant from both centroids on the axis midline:
      // (5.75, 5) is 5.25e6/5e6 from c0 and 5.25e6/5e6 from c1 → tie
      // → smaller label wins
      (102L, Array(5.75f, 5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.nearestCentroidAssign(probe,
        Similarity.labelCentroidsMicro(train, "label", "embedding"),
        "embedding")
      .select("vec_id", "pred_label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(100L -> 0L, 101L -> 1L, 102L -> 0L), s"got $got")
  }

  test("centroidCosineMatrix: hand cosines, zero-norm centroid, releases") {
    import graft.operators.Similarity
    // centroids (micro): 0 → (1e6, 0); 1 → (0, 1e6); 2 → (1e6, 1e6);
    // 3 → (0, 0) (zero norm). cos(0,1) = 0; cos(0,2) = cos(1,2) =
    // 1/√2 → floor(707106.78… + 0.5) = 707107; any pair with 3 → 0.
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(1f, 1f)), (3L, Array(0f, 0f)))
      .toDF("label", "embedding")
    assertReleases("centroidCosineMatrix") {
      val got = Similarity.centroidCosineMatrix(vecs, "label", "embedding")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == Map(
        (0L, 1L) -> ((0L, 0L)),
        (0L, 2L) -> ((1000000000000L, 707107L)),
        (1L, 2L) -> ((1000000000000L, 707107L)),
        (0L, 3L) -> ((0L, 0L)),
        (1L, 3L) -> ((0L, 0L)),
        (2L, 3L) -> ((0L, 0L))), got.toString)
    }
  }

  test("uncertaintyMarginTopK: midline points rank first, tie to smaller label, releases") {
    import graft.operators.Similarity
    // centroids: 0 → (0, 0); 1 → (10e6, 0). Margins: id 1 sits on the
    // midline (d2 equal → margin 0, pred = smaller label); id 2 is
    // slightly off-center; id 3 is deep inside label 0's region.
    val vecs = Seq(
      (1L, 0L, Array(5f, 0f)),   // d2: 25e12 / 25e12 → margin 0
      (2L, 1L, Array(6f, 0f)),   // d2: 36e12 / 16e12 → margin 20e12, pred 1
      (3L, 0L, Array(1f, 0f)),   // d2: 1e12 / 81e12 → margin 80e12
      (4L, 1L, Array(10f, 0f)))  // centroid pull: labels stay planted
      .toDF("vec_id", "label", "embedding")
    // labels fit on the data itself: centroid 0 = mean{(5,0),(1,0)} =
    // (3e6, 0); centroid 1 = mean{(6,0),(10,0)} = (8e6, 0)
    // d2 for id1 (5e6): c0 4e12, c1 9e12 → pred 0, margin 5e12
    // d2 for id2 (6e6): c0 9e12, c1 4e12 → pred 1, margin 5e12
    // d2 for id3 (1e6): c0 4e12, c1 49e12 → margin 45e12
    // d2 for id4 (10e6): c0 49e12, c1 4e12 → margin 45e12
    assertReleases("uncertaintyMarginTopK") {
      val got = Similarity.uncertaintyMarginTopK(
        vecs, "vec_id", "label", "embedding", k = 2).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(6)))
      assert(got.toSeq == Seq(
        (1L, 0L, 5000000000000L),
        (2L, 1L, 5000000000000L)), got.mkString(";"))
    }
  }

  test("labelNoiseTopK: only disagreeing vectors surface, widest margin first") {
    import graft.operators.Similarity
    // label 0 = {0, 1} → centroid 0.5e6; label 1 = {10, 9, 2} →
    // centroid 7e6. Only x=2 (label 1) lands nearer the OTHER centroid:
    // d2 = 2.25e12 vs 25e12 → pred 0, margin 22.75e12. Everyone else
    // agrees with their centroid and must not appear.
    val vecs = Seq(
      (1L, 0L, Array(0f, 0f)), (2L, 0L, Array(1f, 0f)),
      (3L, 1L, Array(10f, 0f)), (4L, 1L, Array(9f, 0f)),
      (5L, 1L, Array(2f, 0f)))
      .toDF("vec_id", "label", "embedding")
    assertReleases("labelNoiseTopK") {
      val got = Similarity.labelNoiseTopK(
        vecs, "vec_id", "label", "embedding", k = 5).collect()
      assert(got.length == 1, got.mkString(";"))
      val r = got.head
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(6)) ==
        ((5L, 1L, 0L, 2250000000000L, 22750000000000L)), r.toString)
    }
  }

  test("cell store: search ≡ in-memory ivfTopK; scan prunes to probed cells") {
    val rng = new scala.util.Random(11)
    val centers = Array.fill(6)(Array.fill(8)(rng.nextFloat() * 2 - 1))
    val vecs = (0L until 300L).map { i =>
      val c = centers((i % 6).toInt)
      i -> c.map(x => x + (rng.nextFloat() - 0.5f) * 0.1f)
    }
    val df = vecs.toDF("id", "embedding")
    val cents = Similarity.sampleCentroidsPortable(df, 6)
    val dir = java.nio.file.Files.createTempDirectory("cellstore")
      .toFile.getAbsolutePath + "/store"
    Similarity.writeCellStore(df, cents, dir)
    val queries = df.filter($"id" < 5)
    val fromStore = Similarity.searchCellStore(spark, dir, queries,
      k = 4, nProbe = 2, cents = cents)
    val inMem = Similarity.ivfTopK(queries, df, k = 4, nProbe = 2,
      centroids = Some(cents))
    val a = fromStore.collect().map(r => (r.getLong(0), r.getLong(2),
      r.getInt(4))).toSet
    val b = inMem.collect().map(r => (r.getLong(0), r.getLong(2),
      r.getInt(4))).toSet
    assert(a == b, s"store search diverged from in-memory IVF:\n$a\nvs\n$b")
    // partition pruning: the executed scan must carry the cell filter in
    // PartitionFilters (planning-time file pruning), not a post-scan Filter
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      s"no cell PartitionFilter in plan:\n${plan.take(2000)}")
    val probed = fromStore.select("cell").distinct().count()
    assert(probed < 6, s"expected < 6 probed cells, got $probed")
  }
}
