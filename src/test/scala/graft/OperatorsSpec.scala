package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, Multimodal, Packing, Similarity}
import org.apache.spark.sql.functions._

/** Operator-level behavior on planted data — the driver's documents table
  * has no duplicates, so these specs synthesize known dups/neighbors and
  * assert the operators find them (and nothing else).
  */
class OperatorsSpec extends SparkSpec {
  import sqlImplicits._

  private val docA = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val docANear = "the quick brown fox jumps over the lazy dog near the river bank tonight"
  private val docB = "completely different content about spark query engines and shuffle planning"

  test("exactText dedup groups normalized duplicates") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "HELLO WORLD  "),
      (4L, "something else")).toDF("id", "text")
    val groups = Dedup.exactText(df, "id", "text").collect()
    assert(groups.length == 2)
    val big = groups.find(_.getAs[Long]("n_copies") == 3L).get
    assert(big.getAs[Long]("rep_id") == 1L)
  }

  test("ngramJaccardPairs: near-dup pair scores high, unrelated pair absent") {
    val df = Seq((1L, docA, "s"), (2L, docANear, "s"), (3L, docB, "s"))
      .toDF("doc_id", "text", "source")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", "source").collect()
    val near = pairs.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(near.isDefined, "planted near-dup not found")
    assert(near.get.getAs[Double]("jaccard") > 0.7)
    assert(!pairs.exists(r => r.getAs[Long]("id_b") == 3L || r.getAs[Long]("id_a") == 3L),
      "unrelated doc shares no 3-shingles but appeared as candidate")
  }

  test("benchmarkContainment: embedded eval item flags at 1.0, unrelated absent, df-cap binds") {
    import graft.operators.Decontamination
    val evalItem = "the quick brown fox jumps over the lazy dog tonight again"
    val boiler = "standard corpus header boilerplate fragment repeated in every document here"
    val corpus = Seq(
      (1L, s"long article opening paragraph alpha beta $evalItem closing remarks gamma"),
      (2L, "entirely unrelated content about distributed query planning engines"),
      (3L, s"another framing text $evalItem different tail entirely here"),
      (4L, s"$boiler unique body one"), (5L, s"$boiler unique body two"),
      (6L, s"$boiler unique body three")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, evalItem), (200L, boiler)).toDF("bench_id", "btext")
    val flagged = Decontamination
      .benchmarkContainment(corpus, "doc_id", "text", bench, "bench_id", "btext")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("bench_id")) ->
        r.getAs[Double]("containment")).toMap
    // docs 1 and 3 embed the whole eval item verbatim → every bench gram
    // present → containment exactly 1.0; doc 2 shares nothing
    assert(flagged((1L, 100L)) == 1.0, s"$flagged")
    assert(flagged((3L, 100L)) == 1.0, s"$flagged")
    assert(!flagged.keys.exists(_._1 == 2L), s"unrelated doc flagged: $flagged")
    // the boilerplate bench item flags its three carriers at default df…
    assert(Seq(4L, 5L, 6L).forall(d => flagged.contains((d, 200L))), s"$flagged")
    // …and a df-cap below the carrier count drops those pairs while the
    // rare eval item still flags (the hot-gram convention)
    val capped = Decontamination
      .benchmarkContainment(corpus, "doc_id", "text", bench, "bench_id", "btext",
        maxGramDf = 2)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("bench_id"))).toSet
    assert(capped.contains((1L, 100L)) && capped.contains((3L, 100L)), s"$capped")
    assert(!capped.exists(_._2 == 200L), s"boilerplate pairs must cap away: $capped")
  }

  test("ngramJaccardPairs df cap bounds hot-shingle pair blowup") {
    // 40 docs share ONLY one boilerplate shingle; 2 docs are real near-dups
    val boiler = (1L to 40L).map(i =>
      (i, s"standard legal disclaimer text u$i v$i w$i x$i y$i z$i", "s"))
    val dups = Seq((100L, docA, "s"), (101L, docANear, "s"))
    val df = (boiler ++ dups).toDF("doc_id", "text", "source")
    // "standard legal disclaimer" (df=40) > cap=10 → dropped from the index:
    // boilerplate-only pairs vanish, the planted near-dup pair survives
    val capped = Dedup.ngramJaccardPairs(df, "doc_id", "text", "source",
      maxShingleDf = 10).collect()
    assert(capped.exists(r => r.getAs[Long]("id_a") == 100L && r.getAs[Long]("id_b") == 101L),
      "planted near-dup lost under df cap")
    assert(!capped.exists(r => r.getAs[Long]("id_a") <= 40L && r.getAs[Long]("id_b") <= 40L),
      s"boilerplate-only pairs should be pruned, got ${capped.length} pairs")
    // sanity: without the cap the boilerplate shingle emits C(40,2) pairs
    val uncapped = Dedup.ngramJaccardPairs(df, "doc_id", "text", "source").count()
    assert(uncapped >= 780L, s"expected >= C(40,2) uncapped pairs, got $uncapped")
  }

  test("minhashCandidates bucket cap drops degenerate buckets only") {
    // 30 EXACT copies → identical signatures → one bucket per band of size
    // 30 (C(30,2)=435 pairs per band); cap 20 kills them, the distinctive
    // near-dup pair (different bucket) survives
    val copies = (1L to 30L).map(i => (i, docB, "s"))
    val dups = Seq((100L, docA, "s"), (101L, docANear, "s"))
    val df = (copies ++ dups).toDF("doc_id", "text", "source")
    val capped = Dedup.minhashCandidates(df, "doc_id", "text",
      bands = 8, rowsPerBand = 2, maxBucketSize = 20).collect()
    assert(capped.exists(r => r.getAs[Long]("id_a") == 100L && r.getAs[Long]("id_b") == 101L),
      "planted near-dup lost under bucket cap")
    assert(!capped.exists(r => r.getAs[Long]("id_a") <= 30L && r.getAs[Long]("id_b") <= 30L),
      "exact-copy megabucket should be dropped by the cap")
    val uncapped = Dedup.minhashCandidates(df, "doc_id", "text",
      bands = 8, rowsPerBand = 2).count()
    assert(uncapped >= 435L, s"expected the megabucket pairs without cap, got $uncapped")
  }

  test("simhashCandidates bucket cap drops identical-signature megabuckets only") {
    // 30 exact copies → identical 64-bit signatures → every chunk bucket
    // holds all 30 (C(30,2) verify pairs PER CHUNK); cap 20 kills them,
    // the distinctive near-dup pair (its own buckets) survives
    val copies = (1L to 30L).map(i => (i, docB, "s"))
    val dups = Seq((100L, docA, "s"), (101L, docANear, "s"))
    val df = (copies ++ dups).toDF("doc_id", "text", "source")
    val capped = Dedup.simhashCandidates(df, "doc_id", "text", maxBucketSize = 20).collect()
    assert(capped.exists(r => r.getAs[Long]("id_a") == 100L && r.getAs[Long]("id_b") == 101L),
      "planted near-dup lost under chunk-bucket cap")
    assert(!capped.exists(r => r.getAs[Long]("id_a") <= 30L && r.getAs[Long]("id_b") <= 30L),
      "identical-signature megabucket should be dropped by the cap")
    val uncapped = Dedup.simhashCandidates(df, "doc_id", "text").count()
    assert(uncapped >= 435L, s"expected the megabucket pairs without cap, got $uncapped")
  }

  test("hash sampling: stable splits, expected proportions, weighted mix") {
    import graft.operators.Sampling
    val ids = (1L to 10000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val labeled = ids.withColumn("split", Sampling.splitLabel($"id")).cache()
    val bySplit = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bySplit("train") - 8000L) < 300, s"train ${bySplit("train")}")
    assert(math.abs(bySplit("val") - 1000L) < 150 && math.abs(bySplit("test") - 1000L) < 150)
    // determinism: identical assignment on recompute
    assert(labeled.select("id", "split").except(
      ids.withColumn("split", Sampling.splitLabel($"id")).select("id", "split")).isEmpty)

    val mixed = Sampling.mixBySource(ids, "source", "id",
      Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25))
    val kept = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src0 binds (keeps ~100%); others keep ~half → mix ≈ 2:1:1
    assert(kept("src0") > 2300)
    assert(math.abs(kept("src1") - kept("src0") / 2.0) < 200, s"got $kept")
    assert(math.abs(kept("src2") - kept("src0") / 2.0) < 200, s"got $kept")

    // precomputed-counts overload: same selection without the counting
    // scan (the counting variant reads the input twice at 100 TB)
    val trueCounts = ids.filter($"source".isin("src0", "src1", "src2"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixedPre = Sampling.mixBySource(ids, "source", "id",
      Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), trueCounts)
    assert(mixedPre.select("id").except(mixed.select("id")).isEmpty &&
      mixed.select("id").except(mixedPre.select("id")).isEmpty,
      "precomputed-counts overload must select the identical rows")
    intercept[IllegalArgumentException] {
      Sampling.mixBySource(ids, "source", "id",
        Map("src0" -> 0.5, "src9" -> 0.5), trueCounts)
    }
  }

  test("approximate sketches: HLL distinct and approx percentile within bounds") {
    // SURVEY §7.2.6 — the 100 TB substitutes for exact distinct/percentile.
    // Sketch estimates differ per engine, so these are bound-checked
    // against the exact answers rather than oracle-hashed.
    val ev = Tables.events(spark, sf())
    val exact = ev.agg(countDistinct("user_id")).head().getLong(0)
    val approx = ev.agg(approx_count_distinct("user_id", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL estimate $approx too far from exact $exact")
    val pApprox = ev.agg(expr("percentile_approx(value, 0.5, 1000)")).head().getDouble(0)
    val pExact = ev.agg(expr("percentile(value, 0.5)")).head().getDouble(0)
    val spread = ev.agg(expr("max(value) - min(value)")).head().getDouble(0)
    assert(math.abs(pApprox - pExact) <= spread * 0.02,
      s"approx median $pApprox vs exact $pExact (spread $spread)")
  }

  test("distributionStats: approx path has no exact-percentile value buffering") {
    // VERDICT r3 #2: exact `percentile` is a TypedImperativeAggregate that
    // buffers EVERY value of a group — an executor OOM at 100 TB. The
    // default path must plan with bounded approx_percentile sketches
    // (partial map-side aggregation), never the exact form.
    import graft.etl.Serving
    val ev = Tables.events(spark, sf())
    val approxPlan = Serving.distributionStats(ev, "event_type", "value")
      .queryExecution.executedPlan.toString
    val exactPercentile = """(?<!approx_)percentile\(""".r
    assert(approxPlan.contains("approx_percentile"),
      "approx path must plan approx_percentile sketches")
    assert(exactPercentile.findFirstIn(approxPlan).isEmpty,
      "approx path must not contain the exact percentile aggregate")
    assert(approxPlan.contains("partial_approx_percentile"),
      "sketch partials must combine map-side (partial aggregation)")
    // the exact twin (small-sf oracle parity only) does buffer values
    val exactPlan = Serving.distributionStats(ev, "event_type", "value", exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPercentile.findFirstIn(exactPlan).isDefined)

    // and the sketch's rank-error certificate holds on real data
    val check = Serving.approxPercentileRankCheck(ev, "event_type", "value",
      Seq("p25" -> 0.25, "p50" -> 0.50, "p90" -> 0.90)).collect()
    assert(check.nonEmpty)
    check.foreach { r =>
      Seq("p25_ok", "p50_ok", "p90_ok").foreach(c =>
        assert(r.getAs[Boolean](c), s"rank bound violated for $c in row $r"))
    }
  }

  test("cms heavy hitters: certificates true, merge bit-exact, planted heavy key tops") {
    import graft.operators.HeavyHitters
    val rng = new scala.util.Random(3)
    val rows = (Seq.fill(400)("hot-key") ++
        Seq.tabulate(3000)(_ => s"k${rng.nextInt(1500)}"))
      .zipWithIndex.map { case (k, i) => (k, i % 5) }
    val df = rows.toDF("key", "batch")
    val out = HeavyHitters.cmsTopKCertificate(df, "key", "batch", k = 10,
      eps = 0.005, confidence = 0.99, seed = 7).collect()
    assert(out.length == 10)
    val top = out.maxBy(_.getAs[Long]("n_exact"))
    assert(top.getAs[String]("key") == "hot-key" &&
      top.getAs[Long]("n_exact") == 400L)
    out.foreach { r =>
      Seq("est_lower_ok", "est_upper_ok", "merge_exact", "total_ok").foreach(c =>
        assert(r.getAs[Boolean](c), s"$c violated in $r"))
    }
  }

  test("approxPercentileRankCheck: nullable column — n counts only non-null values") {
    // VERDICT r6 #1: approx_percentile ignores nulls and the lo/hi rank
    // sums count a null comparison as 0, so `n` must be the NON-NULL row
    // count. With count(*) as n, 100 values + 300 nulls deflates the p50
    // rank fraction to hi/n = 50/400 = 0.125 and the certificate emits a
    // false negative (0.5 > 0.125 + eps). The fixed n=100 certifies.
    import graft.etl.Serving
    val rows = (1 to 100).map(i => ("g", Some(i.toDouble))) ++
      (1 to 300).map(_ => ("g", Option.empty[Double]))
    val df = rows.toDF("grp", "v")
    val out = Serving.approxPercentileRankCheck(df, "grp", "v",
      Seq("p25" -> 0.25, "p50" -> 0.50, "p90" -> 0.90)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 100L,
      s"n must count only non-null values, got ${r.getAs[Long]("n")}")
    Seq("p25_ok", "p50_ok", "p90_ok").foreach(c =>
      assert(r.getAs[Boolean](c), s"rank bound wrongly violated for $c in $r"))
    // pin that the OLD (count(*)) arithmetic would have misjudged here:
    // hi_p50 = 50 over 400 total rows fails the q <= hi/n + eps test
    val dilutedN = 400.0
    val hiP50 = df.filter($"v" <= 50.0).count().toDouble
    assert(!(0.5 <= hiP50 / dilutedN + 2.0 / 10000 + 1e-9),
      "test premise: diluted-n arithmetic must produce a false verdict")
  }

  test("e2e dedup: LSH candidates → jaccard verify → cluster → keep reps") {
    // {1,2,3} are a transitive near-dup chain; {10,11} exact copies; 20 unique
    val docs = Seq(
      (1L, docA, "s"), (2L, docANear, "s"), (3L, docA + " extra trailing words", "s"),
      (10L, docB, "s"), (11L, docB, "s"), (20L, "a totally unrelated short note", "s"))
      .toDF("doc_id", "text", "source")
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
      bands = 8, rowsPerBand = 2).select("id_a", "id_b")
    // verify candidates with true jaccard, keep >= 0.5
    val verified = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source")
      .filter($"jaccard" >= 0.5).select("id_a", "id_b")
      .intersect(cands)
    val kept = Dedup.dedupByPairs(docs, "doc_id", verified)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 20L), s"got $kept")
  }

  test("connectedComponents: transitive closure; dedupByPairs keeps one rep per cluster") {
    // two clusters: {1,2,3,10} (3~10 only via transitivity) and {5,6}
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (10L, 3L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 10L).forall(comps(_) == 1L))
    assert(comps(5L) == 5L && comps(6L) == 5L)
    // a 40-node chain collapses within the iteration budget only because
    // of the pointer-jumping step (plain propagation needs 39 rounds)
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val c2 = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 40L).forall(c2(_) == 1L), "chain did not fully collapse")

    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "d"), (6L, "e"), (7L, "f"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupByPairs(docs, "doc_id", pairs).collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 7L)) // cluster reps + the unpaired doc
  }

  test("incremental LSH candidates equal the full run restricted to new docs") {
    val old = Seq((1L, docA, "s"), (10L, docB, "s"),
      (20L, "another unique document entirely about databases", "s"))
      .toDF("doc_id", "text", "source")
    val fresh = Seq((2L, docANear, "s"), (11L, docB, "s"),
      (30L, "fresh unrelated content about gardening tools", "s"))
      .toDF("doc_id", "text", "source")
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("n_bands_shared"))).toSet
    val idx = Dedup.minhashIndex(old, "doc_id", "text", bands = 8, rowsPerBand = 2)
    val inc = toSet(Dedup.minhashCandidatesIncremental(fresh, "doc_id", "text",
      idx, bands = 8, rowsPerBand = 2))
    val full = toSet(Dedup.minhashCandidates(old.unionByName(fresh),
      "doc_id", "text", bands = 8, rowsPerBand = 2))
    val newIds = Set(2L, 11L, 30L)
    assert(inc == full.filter(t => newIds(t._1) || newIds(t._2)),
      s"incremental $inc != restricted full $full")
    assert(inc.exists(t => t._1 == 10L && t._2 == 11L),
      "exact copy of a historical doc not found against the index")
    assert(inc.exists(t => t._1 == 1L && t._2 == 2L),
      "near-dup of a historical doc not found against the index")
  }

  test("minhashCandidates surfaces the planted near-dup pair") {
    // 8 bands × 2 rows: the planted pair has shingle-Jaccard ≈0.85, so
    // P(miss) = (1 − J²)⁸ ≈ 4e-5 — deterministic hashes, but the band
    // layout must not make the assertion a coin flip (4×4 misses ~6%)
    val df = Seq((1L, docA, "s"), (2L, docANear, "s"), (3L, docB, "s"))
      .toDF("doc_id", "text", "source")
    val cands = Dedup.minhashCandidates(df, "doc_id", "text",
      bands = 8, rowsPerBand = 2).collect()
    assert(cands.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L),
      s"minhash missed planted near-dup; got ${cands.mkString(",")}")
  }

  test("simhash: identical texts at hamming 0, near texts within 16") {
    val df = Seq((1L, docA), (2L, docA), (3L, docANear)).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"), Dedup.simhash(TextFunctions.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L), "identical text must give identical simhash")
    val cands = Dedup.simhashCandidates(df, "doc_id", "text", verifyThreshold = 16).collect()
    assert(cands.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L &&
      r.getAs[Int]("hamming") == 0))
  }

  test("bruteForceTopK finds the planted nearest neighbor first") {
    val base = Array.tabulate(8)(i => 0.1f * (i + 1))
    val near = base.clone(); near(0) += 0.01f
    val far = Array.tabulate(8)(i => if (i % 2 == 0) -1.0f else 1.0f)
    val df = Seq((0L, base), (1L, near), (2L, far)).toDF("id", "embedding")
    val top = Similarity.bruteForceTopK(df.filter($"id" === 0L), df, k = 2).collect()
    assert(top.length == 2)
    assert(top.find(_.getAs[Int]("rank") == 1).get.getAs[Long]("nid") == 1L)
    assert(top.find(_.getAs[Int]("rank") == 1).get.getAs[Double]("cosine") > 0.999)
  }

  test("lshTopK: identical vector lands in the same bucket at rank 1") {
    val vecs = (0L until 50L).map { i =>
      val rng = new scala.util.Random(i)
      i -> Array.fill(8)(rng.nextFloat() - 0.5f)
    }
    val planted = (100L, vecs.head._2.clone()) // exact copy of vec 0
    val df = (vecs :+ planted).toDF("id", "embedding")
    val got = Similarity.lshTopK(df.filter($"id" === 0L), df, k = 1, dim = 8).collect()
    assert(got.length == 1 && got.head.getAs[Long]("nid") == 100L)
    assert(math.abs(got.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("srpHammingTopK: whole-corpus shortlist ≡ exact top-k; planted copy at Hamming 0") {
    val vecs = (0L until 60L).map { i =>
      val rng = new scala.util.Random(i)
      i -> Array.fill(8)(rng.nextFloat() - 0.5f)
    }
    val planted = (100L, vecs.head._2.clone()) // exact copy of vec 0
    val df = (vecs :+ planted).toDF("id", "embedding")
    val q = df.filter($"id" < 3L)
    // mult large enough that the Hamming shortlist IS the corpus →
    // the rerank must reproduce exact brute-force top-k bit-for-bit
    val full = Similarity.srpHammingTopK(q, df, k = 5, mult = 20,
        nPlanes = 16, dim = 8)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Similarity.bruteForceTopK(q, df, k = 5)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact, s"full-shortlist SRP diverged from exact:\n$full\nvs\n$exact")
    // the identical vector shares every sign bit → Hamming 0, rank 1
    val got = Similarity.srpHammingTopK(df.filter($"id" === 0L), df,
      k = 1, mult = 4, nPlanes = 16, dim = 8).collect()
    assert(got.length == 1 && got.head.getAs[Long]("nid") == 100L &&
      got.head.getAs[Long]("hamming") == 0L, got.mkString(";"))
  }

  test("cosineNearDupPairs finds only the planted embedding dup") {
    val rng = new scala.util.Random(7)
    val vecs = (0L until 30L).map(i => i -> Array.fill(8)(rng.nextFloat() - 0.5f))
    val planted = (100L, vecs.head._2.map(x => x * 1.001f)) // scaled copy → cos≈1
    val df = (vecs :+ planted).toDF("id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, threshold = 0.98, dim = 8).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("id_a") == 0L && pairs.head.getAs[Long]("id_b") == 100L)
  }

  test("Packing: distributed prefix sum equals the sequential reference") {
    import graft.operators.Packing
    val rng = new scala.util.Random(5)
    val counts = Seq.tabulate(300)(i =>
      (i.toLong, if (i % 17 == 0) 0L else rng.nextInt(40).toLong + 1))
    val df = counts.toDF("id", "n")
    val out = Packing.concatChunkPlacement(df, "id", "n",
      capacity = 64, groupOf = expr("id div 50"))
    val got = out.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[Long]("offset"), Option(r.getAs[Any]("first_chunk")),
        Option(r.getAs[Any]("last_chunk")), r.getAs[Long]("n_chunks"))).toMap
    var off = 0L
    counts.foreach { case (id, n) =>
      val fc = if (n > 0) Some(off / 64) else None
      val lc = if (n > 0) Some((off + n - 1) / 64) else None
      val expect = (off, fc.map(_.asInstanceOf[Any]), lc.map(_.asInstanceOf[Any]),
        fc.map(f => lc.get - f + 1).getOrElse(0L))
      assert(got(id) == expect, s"id=$id: ${got(id)} vs $expect")
      off += n
    }
    // the row-level running sum must be partitioned by the group column —
    // an unpartitioned global window would serialize the corpus
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__g#"), plan.take(2000))
  }

  test("Packing: takeTokenBudget keeps exactly the fully-fitting prefix per partition") {
    import graft.operators.Packing
    val rng = new scala.util.Random(11)
    val rows = for {
      src <- Seq("a", "b")
      i <- 0 until 80
    } yield (src, i.toLong, if (i % 13 == 0) 0L else rng.nextInt(30).toLong + 1)
    val df = rows.toDF("src", "id", "n")
    val out = Packing.takeTokenBudget(df, "id", "n", budget = 300,
        groupOf = expr("id div 16"), partitionCols = Seq("src"))
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("id")) ->
        r.getAs[Long]("offset")).toMap
    // sequential reference: per-source running offset, keep if it fully fits
    val expect = rows.groupBy(_._1).flatMap { case (src, rs) =>
      var off = 0L
      rs.sortBy(_._2).flatMap { case (_, id, n) =>
        val keep = off + n <= 300
        val o = off; off += n
        if (keep) Some((src, id) -> o) else None
      }
    }
    assert(out == expect, s"got ${out.size} rows, expected ${expect.size}")
    // zero-count rows inside the budget must be kept
    assert(out.contains(("a", 0L)) && rows.find(r => r._1 == "a" && r._2 == 0L).get._3 == 0L)
  }

  test("shuffledChunkPlacement: seeded permutation, contiguous stream, seed changes order") {
    import graft.operators.Packing
    val df = Seq.tabulate(200)(i => (i.toLong, (i % 7 + 1).toLong)).toDF("id", "n")
    val a = Packing.shuffledChunkPlacement(df, "id", "n", capacity = 32, seed = "s1")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("shuffle_key"), r.getAs[Long]("offset"))).toMap
    // the stream is a contiguous packing of the md5-shuffled order:
    // offsets sorted by shuffle_key form an exact exclusive prefix sum
    val inKeyOrder = a.toSeq.sortBy(_._2._1)
    var off = 0L
    inKeyOrder.foreach { case (id, (_, o)) =>
      assert(o == off, s"id=$id offset $o, expected $off")
      off += (id % 7 + 1)
    }
    // same seed reproduces; a different seed is a different permutation
    val a2 = Packing.shuffledChunkPlacement(df, "id", "n", capacity = 32, seed = "s1")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("offset")).toMap
    assert(a2 == a.map { case (k, (_, o)) => k -> o })
    val b = Packing.shuffledChunkPlacement(df, "id", "n", capacity = 32, seed = "s2")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("offset")).toMap
    assert(b != a2, "different seeds must permute differently")
  }

  test("packChunks: chunks cut at capacity across doc boundaries, content exact") {
    import graft.operators.Packing
    // docs of 3/4/2/0/5 tokens, capacity 4: stream = d0(3) d1(4) d2(2) d4(5)
    val docs = Seq(
      (0L, Seq("a0", "a1", "a2")),
      (1L, Seq("b0", "b1", "b2", "b3")),
      (2L, Seq("c0", "c1")),
      (3L, Seq.empty[String]),
      (4L, Seq("d0", "d1", "d2", "d3", "d4"))
    ).toDF("id", "tk")
    val got = Packing.packChunks(docs, "id", "tk", capacity = 4,
        groupOf = expr("id div 2"))
      .collect().map(r => r.getAs[Long]("chunk_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_fp"))).toMap
    val stream = Seq("a0", "a1", "a2", "b0", "b1", "b2", "b3", "c0", "c1",
      "d0", "d1", "d2", "d3", "d4")
    val expect = stream.grouped(4).zipWithIndex.map { case (chunk, i) =>
      i.toLong -> (chunk.length.toLong,
        java.security.MessageDigest.getInstance("MD5")
          .digest(chunk.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }.toMap
    assert(got == expect, s"$got vs $expect")
  }

  test("shardManifest groups contiguous chunks; writeShards lands one ordered file per shard") {
    import graft.operators.Packing
    val docs = Seq(
      (0L, Seq("a0", "a1", "a2")),
      (1L, Seq("b0", "b1", "b2", "b3")),
      (2L, Seq("c0", "c1")),
      (4L, Seq("d0", "d1", "d2", "d3", "d4"))
    ).toDF("id", "tk")
    val chunks = Packing.packChunks(docs, "id", "tk", capacity = 4,
      groupOf = expr("id div 2"))
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val stream = Seq("a0", "a1", "a2", "b0", "b1", "b2", "b3", "c0", "c1",
      "d0", "d1", "d2", "d3", "d4")
    val chunkFps = stream.grouped(4).map(c => md5s(c.mkString(" "))).toSeq
    val got = Packing.shardManifest(chunks, chunksPerShard = 2)
      .collect().map(r => r.getAs[Long]("shard_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_tokens"),
          r.getAs[String]("shard_fp")))).toMap
    assert(got == Map(
      0L -> ((2L, 8L, md5s(chunkFps.take(2).mkString(" ")))),
      1L -> ((2L, 6L, md5s(chunkFps.drop(2).mkString(" "))))), s"$got")
    // the files: one parquet per shard dir, rows in chunk order
    val dir = java.nio.file.Files.createTempDirectory("shards").toFile.getAbsolutePath
    Packing.writeShards(chunks, dir, chunksPerShard = 2)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard_id=")).sortBy(_.getName)
    assert(shardDirs.map(_.getName).toSeq == Seq("shard_id=0", "shard_id=1"))
    shardDirs.foreach { sd =>
      assert(sd.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${sd.getName} must hold exactly one data file")
    }
    val shard0 = spark.read.parquet(s"$dir/shard_id=0")
      .select("chunk_id").as[Long].collect().toSeq
    assert(shard0 == Seq(0L, 1L), "rows inside a shard file are in chunk order")
    val back = spark.read.parquet(dir)
    assert(back.count() == 4 &&
      back.select("chunk_id", "n_tokens", "chunk_fp").except(chunks).isEmpty)
  }

  test("auditShards: clean round trip all-true; tampered manifest and ghost shard surface as mismatches") {
    import graft.operators.Packing
    val docs = Seq(
      (0L, Seq("a0", "a1", "a2")),
      (1L, Seq("b0", "b1", "b2", "b3")),
      (2L, Seq("c0", "c1"))
    ).toDF("id", "tk")
    val chunks = Packing.packChunks(docs, "id", "tk", capacity = 4,
      groupOf = expr("id div 2"))
    val manifest = Packing.shardManifest(chunks, chunksPerShard = 2)
    val dir = java.nio.file.Files.createTempDirectory("audit").toFile.getAbsolutePath
    Packing.writeShards(chunks, dir, chunksPerShard = 2)
    val clean = Packing.auditShards(spark, dir, manifest).collect()
    assert(clean.nonEmpty && clean.forall(r =>
      r.getAs[Boolean]("chunks_match") && r.getAs[Boolean]("tokens_match") &&
        r.getAs[Boolean]("fp_match")), clean.mkString(";"))
    // a corrupted fingerprint in the manifest must flag ONLY that shard
    val tampered = manifest.withColumn("shard_fp",
      when(col("shard_id") === 0L, lit("deadbeef")).otherwise(col("shard_fp")))
    val t = Packing.auditShards(spark, dir, tampered)
      .collect().map(r => r.getAs[Long]("shard_id") ->
        ((r.getAs[Boolean]("chunks_match"), r.getAs[Boolean]("fp_match")))).toMap
    assert(t(0L) == ((true, false)) && t(1L) == ((true, true)), s"$t")
    // a manifest row whose shard file does not exist (ghost shard) must
    // surface as a mismatch row, not silently drop out of the join
    val ghost = manifest.unionByName(
      Seq((9L, 2L, 8L, "feedface")).toDF("shard_id", "n_chunks", "n_tokens", "shard_fp"))
    val g = Packing.auditShards(spark, dir, ghost)
      .collect().map(r => r.getAs[Long]("shard_id") ->
        ((r.getAs[Boolean]("chunks_match"), r.getAs[Boolean]("tokens_match"),
          r.getAs[Boolean]("fp_match")))).toMap
    assert(g(9L) == ((false, false, false)), s"$g")
    assert(g(0L) == ((true, true, true)) && g(1L) == ((true, true, true)), s"$g")
  }

  test("jaccardBandHistogram: integer band edges — j=1 in band 10, j=0.5 exactly in band 5") {
    import graft.operators.Dedup
    val pairs = Seq(
      ("s", 1L, 2L, 5L, 5L, 5L, 1.0),    // j = 5/5 → band 10
      ("s", 1L, 3L, 4L, 4L, 2L, 2.0 / 6), // 20 div 6 → band 3
      ("s", 2L, 3L, 3L, 3L, 3L, 1.0),    // j = 3/3 → band 10
      ("s", 4L, 5L, 3L, 6L, 3L, 0.5),    // 30 div 6 → band 5 (boundary)
      ("t", 1L, 2L, 10L, 10L, 1L, 1.0 / 19)) // 10 div 19 → band 0
      .toDF("block", "id_a", "id_b", "n_a", "n_b", "n_shared", "jaccard")
    val got = Dedup.jaccardBandHistogram(pairs)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("s", 10L)) == ((10000L, 2L)), s"got $got")
    assert(got(("s", 3L)) == ((3000L, 1L)), s"got $got")
    assert(got(("s", 5L)) == ((5000L, 1L)), s"got $got")
    assert(got(("t", 0L)) == ((0L, 1L)), s"got $got")
    assert(got.size == 4, s"got $got")
  }

  test("sharedSpans finds planted verbatim spans with exact offsets; gaps split runs") {
    import graft.operators.Dedup
    def toks(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    // doc 2 copies doc 1's tokens 5..16 (12 tokens) starting at its
    // own position 3; doc 3 copies two DISJOINT 8-token pieces of
    // doc 1 (0..7 and 12..19) back to back — the gap must yield two
    // spans (8 < minSpan 8? use minSpan 8), not one 16-token span
    val d1 = toks(0 until 30, "t")
    val d2 = toks(100 until 103, "u") + " " + toks(5 to 16, "t") + " " +
      toks(200 until 205, "v")
    val d3 = toks(0 until 8, "t") + " " + toks(12 until 20, "t")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("id", "text")
    val got = Dedup.sharedSpans(docs, "id", "text", w = 4, maxGramDf = 10,
        minSpan = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // 1-2: tokens t5..t16 = d1[5..16] vs d2[3..14] → span 12
    assert(got.contains((1L, 2L, 5L, 3L, 12L)), s"got $got")
    // 1-3: two separate 8-token spans (the gap breaks the diagonal run)
    assert(got.contains((1L, 3L, 0L, 0L, 8L)), s"got $got")
    assert(got.contains((1L, 3L, 12L, 8L, 8L)), s"got $got")
    // no 16-token merged span for the gapped pair
    assert(!got.exists(t => t._1 == 1L && t._2 == 3L && t._5 > 8L), s"got $got")
    // spans below minSpan are absent (d2/d3 share t5..t7+t12..t16 pieces
    // shorter than 5 only via sub-spans — any reported 2-3 span ≥ 5)
    assert(got.forall(_._5 >= 5L))
  }

  test("sharedSpans: a hot gram past the df cap cannot anchor a span") {
    import graft.operators.Dedup
    // the same 6-token run in SIX docs (df of its grams = 6 > cap 5);
    // two of those docs also share a rarer 6-token run (df 2)
    val hot = (0 until 6).map(i => s"h$i").mkString(" ")
    val rare = (0 until 6).map(i => s"r$i").mkString(" ")
    val docs = ((1L to 6L).map(i => (i, s"$hot z$i")) ++
      Seq((7L, s"$rare y7"), (8L, s"$rare y8"))).toDF("id", "text")
    val got = Dedup.sharedSpans(docs, "id", "text", w = 3, maxGramDf = 5,
        minSpan = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(got == Set((7L, 8L, 6L)), s"hot grams must be df-capped: $got")
  }

  test("segmentDedupIntra: self-repetition goes, cross-doc sharing stays") {
    import graft.operators.Dedup
    def seg(p: String) = (0 until 4).map(i => s"$p$i").mkString(" ")
    // doc 1 repeats segment A internally (positions 0 and 2); doc 2
    // also holds A — intra-doc dedup drops doc 1's second copy but
    // BOTH docs keep A (contrast q77's global keep-first)
    val docs = Seq(
      (1L, Seq(seg("a"), seg("b"), seg("a")).mkString(" ")),
      (2L, Seq(seg("a"), seg("c")).mkString(" "))).toDF("id", "text")
    val got = Dedup.segmentDedupIntra(docs, "id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((3L, 2L, seg("a") + " " + seg("b"))), s"got $got")
    assert(got(2L) == ((2L, 2L, seg("a") + " " + seg("c"))), s"got $got")
  }

  test("removeSpans: later doc loses the span, earlier keeps it; overlapping+adjacent cuts union") {
    import graft.operators.Dedup
    def toks(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    val d1 = toks(0 until 30, "t")
    val d2 = toks(100 until 103, "u") + " " + toks(5 to 16, "t") + " " +
      toks(200 until 205, "v")
    val docs = Seq((1L, d1), (2L, d2)).toDF("id", "text")
    val spans = Dedup.sharedSpans(docs, "id", "text", w = 4,
      maxGramDf = 10, minSpan = 5)
    val got = Dedup.removeSpans(docs, "id", "text", spans)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // id 1 (earlier) keeps its copy untouched
    assert(got(1L) == ((30L, 0L, d1)))
    // id 2 loses positions [3, 15): the 12 copied tokens
    assert(got(2L) == ((20L, 12L,
      toks(100 until 103, "u") + " " + toks(200 until 205, "v"))))
    // hand-built spans: overlapping [2,6)+[4,8) and adjacent [8,10)
    // cuts union into ONE [2,10) island; untouched + empty docs pass
    val manual = Seq((1L, 9L, 0L, 2L, 4L), (1L, 9L, 0L, 4L, 4L),
      (1L, 9L, 0L, 8L, 2L))
      .toDF("id_a", "id_b", "start_a", "start_b", "span_tokens")
    val corpus = Seq((9L, toks(0 until 10, "a")), (10L, "x y z"),
      (11L, "")).toDF("id", "text")
    val got2 = Dedup.removeSpans(corpus, "id", "text", manual)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got2(9L) == ((10L, 8L, "a0 a1")))
    assert(got2(10L) == ((3L, 0L, "x y z")))
    assert(got2(11L) == ((0L, 0L, "")))
  }

  test("dedupByPairsBest keeps the argmax-score rep, id tiebreak, singletons pass") {
    import graft.operators.Dedup
    // cluster {1,2,3} via transitive 1-2, 2-3: best is 3 (score 9, NOT
    // min id); cluster {10,11} ties on score → 10 wins by id; 20 is a
    // singleton and keeps itself
    val docs = Seq((1L, 5L), (2L, 7L), (3L, 9L), (10L, 4L), (11L, 4L),
      (20L, -2L)).toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByPairsBest(docs, "id", "score", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept == Map(3L -> 9L, 10L -> 4L, 20L -> -2L), s"got $kept")
  }

  test("topSharedPassages ranks passages by instance count with holder counts") {
    import graft.operators.Dedup
    def toks(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    val P = toks(0 until 15, "p"); val Q = toks(0 until 15, "q")
    // P held by docs 1-3 (3 pairs), Q by docs 4-5 (1 pair)
    val docs = Seq(
      (1L, P + " " + toks(0 until 4, "x1")),
      (2L, P + " " + toks(0 until 4, "x2")),
      (3L, P + " " + toks(0 until 4, "x3")),
      (4L, Q + " " + toks(0 until 4, "x4")),
      (5L, Q + " " + toks(0 until 4, "x5"))).toDF("id", "text")
    val got = Dedup.topSharedPassages(docs, "id", "text", w = 4,
        maxGramDf = 10, minSpan = 8, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.length == 2, s"got ${got.toSeq}")
    assert(got(0) == ((P, 15L, 3L, 3L)), s"got ${got(0)}")
    assert(got(1) == ((Q, 15L, 1L, 2L)), s"got ${got(1)}")
  }

  test("chunkBoundaries: spans tile each chunk exactly and reconcile with packChunks") {
    import graft.operators.Packing
    val docs = Seq(
      (0L, Seq("a0", "a1", "a2")),          // offset 0, chunk 0
      (1L, Seq("b0", "b1", "b2", "b3")),    // offset 3, spans chunks 0-1
      (2L, Seq.empty[String]),              // zero tokens: absent
      (4L, Seq("d0", "d1", "d2", "d3", "d4")) // offset 7, spans chunks 1-2
    ).toDF("id", "tk").withColumn("n", size(col("tk")).cast("long"))
    val got = Packing.chunkBoundaries(docs.select("id", "n"), "id", "n",
        capacity = 4, groupOf = expr("id div 2"))
      .select("id", "chunk_id", "start_in_chunk", "n_in_chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._3)).toSeq
    assert(got == Seq(
      (0L, 0L, 0L, 3L), (1L, 0L, 3L, 1L),   // chunk 0: a(3) + b-head(1)
      (1L, 1L, 0L, 3L), (4L, 1L, 3L, 1L),   // chunk 1: b-tail(3) + d-head(1)
      (4L, 2L, 0L, 4L)))                    // chunk 2: d-tail(4)
    // reconciliation: per-chunk span sums equal packChunks' token counts
    val chunks = Packing.packChunks(docs, "id", "tk", capacity = 4,
        groupOf = expr("id div 2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val spanSums = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(spanSums == chunks)
    // spans tile: within a chunk, starts are the running sum of spans
    got.groupBy(_._2).values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      sorted.foldLeft(0L) { case (pos, (_, _, start, n)) =>
        assert(start == pos, s"gap/overlap at $sorted"); start + n
      }
    }
  }

  test("curriculum shards: written files round-trip against the manifest, in curriculum order") {
    import graft.operators.Packing
    // q120's composed frame on the small sf: write, read back, verify
    // each shard's chunk fps against the manifest IN ORDER — the
    // trainer-side audit the manifest exists for
    val chunks = graft.queries.PipelineOps
      .curriculumChunks(spark, sf()).localCheckpoint()
    val manifest = Packing.shardManifest(chunks, chunksPerShard = 4)
      .collect().map(r => r.getAs[Long]("shard_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[String]("shard_fp")))).toMap
    assert(manifest.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("curshards")
      .toFile.getAbsolutePath
    Packing.writeShards(chunks, dir, chunksPerShard = 4)
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    manifest.foreach { case (sid, (nChunks, fp)) =>
      val rows = spark.read.parquet(s"$dir/shard_id=$sid")
        .select("chunk_id", "chunk_fp").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.length.toLong == nChunks, s"shard $sid chunk count")
      assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq,
        s"shard $sid rows must be in chunk order")
      assert(md5s(rows.map(_._2).mkString(" ")) == fp,
        s"shard $sid fingerprint mismatch — order or content drifted")
    }
  }

  test("cellOccupancyDrift: exact bp shares, empty cells reported, equal snapshots zero-delta") {
    // 2 axis centroids + 1 far decoy cell: A = 3 docs near c0 + 1 near
    // c1; B = 1 near c0 + 3 near c1 — mass moved c0 → c1; the decoy
    // cell is empty on BOTH sides and must still appear (zero row)
    val cents = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (9L, Array(50f, 50f)))
    val aDf = Seq(
      (10L, Seq(0.9f, 0.1f)), (11L, Seq(1.1f, 0f)), (12L, Seq(0.8f, 0.2f)),
      (13L, Seq(0.1f, 0.9f))).toDF("id", "embedding")
    val bDf = Seq(
      (20L, Seq(0.9f, 0f)), (21L, Seq(0f, 1.2f)), (22L, Seq(0.2f, 0.8f)),
      (23L, Seq(0.1f, 1.1f))).toDF("id", "embedding")
    val got = Similarity.cellOccupancyDrift(aDf, bDf, cents)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got(0L) == ((3L, 1L, 7500L, 2500L, 5000L)), s"got $got")
    assert(got(1L) == ((1L, 3L, 2500L, 7500L, 5000L)), s"got $got")
    assert(got(9L) == ((0L, 0L, 0L, 0L, 0L)), s"got $got")
    // identical snapshots → delta_bp 0 everywhere
    val same = Similarity.cellOccupancyDrift(aDf, aDf, cents)
      .agg(max("delta_bp")).collect().head.getLong(0)
    assert(same == 0L)
  }

  test("assignCellsJoin: cell-identical to the literal argmin, and semanticDedup dispatches to it past the literal limit") {
    // 60 pseudo-random 8-dim vectors, 9 centroids drawn from them: the
    // broadcast-join argmin must reproduce the literal path's cells
    // EXACTLY (same left-to-right double accumulation, same ‖c‖²−2·x·c
    // expansion, same smallest-cid tie-break)
    val emb = (0L until 60L).map { i =>
      (i, (0 until 8).map(j => (((i * 31 + j * 17) % 13) - 6).toFloat / 3f))
    }.toDF("id", "embedding")
    val cents = Similarity.sampleCentroidsPortable(emb, 9)
    val viaLiteral = Similarity.semanticDedup(emb, tau = 2.0, // tau>1: no drops — assignment only
        centroids = Some(cents))
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJoin = Similarity.assignCellsJoin(emb, cents)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaJoin == viaLiteral, "join argmin must be cell-identical to the literal path")
    // past LiteralAssignLimit the operator must dispatch to the join
    // path and still apply the drop rule: 2 real axis centroids plus
    // 1023 far-away decoys (cids above the real ones so ties can't
    // land on a decoy), identical twins in the first cell
    val decoys = (0 until 1023).map(i =>
      (1000L + i, Array(100f + i, 100f, 100f, 100f)))
    val manyCents = Seq(1L -> Array(1f, 0f, 0f, 0f), 2L -> Array(0f, 1f, 0f, 0f)) ++ decoys
    val small = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(1f, 0f, 0f, 0f)), // twins, cell 1
      (2L, Seq(0f, 1f, 0f, 0f))                              // alone, cell 2
    ).toDF("id", "embedding")
    val got = Similarity.semanticDedup(small, tau = 0.9,
        centroids = Some(manyCents))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("cell"), r.getAs[Boolean]("kept")))).toMap
    assert(got == Map(0L -> ((1L, true)), 1L -> ((1L, false)), 2L -> ((2L, true))),
      s"dispatched join assignment must preserve the drop rule: $got")
  }

  test("semanticDedup: transitive chain A~B, B~C drops both B and C (upper-triangular rule)") {
    // one centroid → one cell. cos(A,B) ≈ cos(B,C) ≈ 0.97 ≥ tau, but
    // cos(A,C) ≈ 0.88 < tau: the one-join upper-triangular rule drops C
    // (it has smaller-id neighbor B at ≥ tau even though B was itself
    // dropped) — greedy-against-kept would keep C. Pins the documented
    // semantics so a future "fix" toward greedy can't land silently.
    val cents = Seq(9L -> Array(1f, 0f))
    val deg = (d: Double) => Seq(math.cos(math.toRadians(d)).toFloat,
      math.sin(math.toRadians(d)).toFloat)
    val emb = Seq((0L, deg(0)), (1L, deg(14)), (2L, deg(28)))
      .toDF("id", "embedding")
    val got = Similarity.semanticDedup(emb, tau = 0.95, centroids = Some(cents))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("kept")).toMap
    assert(got == Map(0L -> true, 1L -> false, 2L -> false), s"$got")
  }

  test("semanticDedup: over-cap cell sub-splits by md5 id-hash; min id per sub-cell survives") {
    // 10 IDENTICAL vectors in one cell (every pair cosine 1): with
    // cellCap >= 10 the split is identity and only id 0 survives; with
    // cellCap 3 the cell splits into ceil(10/3) = 4 md5-hash sub-cells
    // and the minimum id of each NON-EMPTY sub-cell survives — the
    // documented recall trade that bounds the pair join.
    val cents = Seq(7L -> Array(1f, 0f, 0f, 0f))
    val emb = (0L until 10L).map(i => (i, Seq(1f, 0f, 0f, 0f)))
      .toDF("id", "embedding")
    val loose = Similarity.semanticDedup(emb, tau = 0.9,
      centroids = Some(cents), cellCap = 10)
      .filter(col("kept")).collect().map(_.getAs[Long]("id")).toSet
    assert(loose == Set(0L), s"identity split must keep only id 0: $loose")
    // replicate the split rule independently: first 8 md5 hex chars of
    // the decimal id, as a long, mod ceil(10/3) = 4
    def subcell(id: Long, ns: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % ns
    }
    val expected = (0L until 10L).groupBy(subcell(_, 4)).values.map(_.min).toSet
    val capped = Similarity.semanticDedup(emb, tau = 0.9,
      centroids = Some(cents), cellCap = 3)
      .filter(col("kept")).collect().map(_.getAs[Long]("id")).toSet
    assert(capped == expected, s"got $capped, expected $expected")
    assert(capped.contains(0L) && capped.size > 1,
      "a 4-way split of 10 ids must keep id 0 plus at least one more")
  }

  test("semanticDedup: upper-triangular within-cell keep rule, cross-cell twins untouched") {
    // explicit centroids on axes; tau = 0.9
    val cents = Seq(100L -> Array(1f, 0f, 0f, 0f), 200L -> Array(0f, 1f, 0f, 0f))
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),       // cell 100, first — kept
      (1L, Seq(0.99f, 0.1f, 0f, 0f)),  // cell 100, cos≈0.995 with v0 — dropped
      (2L, Seq(0f, 1f, 0f, 0f)),       // cell 200, first — kept
      (3L, Seq(0.1f, 0.99f, 0f, 0f)),  // cell 200, cos≈0.995 with v2 — dropped
      (4L, Seq(1f, 0.05f, 0f, 0f)),    // cell 100, cos≈0.999 with v0 — dropped
      (5L, Seq(0.7f, 0f, 0.714f, 0f))  // cell 100, cos=0.7 with v0 < 0.9 — kept
    ).toDF("id", "embedding")
    val got = Similarity.semanticDedup(emb, tau = 0.9, centroids = Some(cents))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("cell"), r.getAs[Boolean]("kept")))).toMap
    assert(got == Map(
      0L -> ((100L, true)), 1L -> ((100L, false)), 2L -> ((200L, true)),
      3L -> ((200L, false)), 4L -> ((100L, false)), 5L -> ((100L, true))), s"$got")
  }

  test("segmentDedup: global first occurrence wins, docs reassemble, empty doc survives") {
    import graft.operators.Dedup
    // width=3 segments; doc 0 and doc 2 share an identical segment block,
    // doc 3 is a full copy of doc 0, doc 4 is empty
    val df = Seq(
      (0L, "a b c d e f"),        // segs: [a b c] [d e f]
      (1L, "g h i"),              // segs: [g h i]
      (2L, "a b c x y z"),        // segs: [a b c](dup of doc0) [x y z]
      (3L, "a b c d e f"),        // both segs dup of doc 0
      (4L, "")                    // zero tokens
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(df, "doc_id", "text", width = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segs"), r.getAs[Long]("n_kept"), r.getAs[String]("kept_text"))).toMap
    assert(got(0L) == ((2L, 2L, "a b c d e f")))
    assert(got(1L) == ((1L, 1L, "g h i")))
    assert(got(2L) == ((2L, 1L, "x y z")), "doc 2 must lose its first segment to doc 0")
    assert(got(3L) == ((2L, 0L, "")), "full copy keeps nothing")
    assert(got(4L) == ((0L, 0L, "")))
    // ragged tail: a doc whose last segment is shorter than width
    val ragged = Dedup.segmentDedup(
      Seq((7L, "p q r s")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().head
    assert(ragged.getAs[Long]("n_segs") == 2L &&
      ragged.getAs[String]("kept_text") == "p q r s")
  }

  test("segmentDedup: no-window keep-first shape matches the windowed twin and plans without a Window") {
    import graft.operators.Dedup
    // randomized-ish corpus with hot segments: ids sharing id%7 share a
    // leading segment, id%3==0 docs repeat a mid segment, plus uniques —
    // exercises ties across docs AND within a doc (same digest at two
    // indexes of one doc: min(struct) must pick the lower idx)
    val df = spark.range(200).selectExpr(
      "id AS doc_id",
      """concat(
           concat_ws(' ', transform(sequence(0,2), j -> concat('h', id % 7, '_', j))), ' ',
           CASE WHEN id % 3 = 0 THEN 'rep rep rep rep rep rep ' ELSE '' END,
           concat_ws(' ', transform(sequence(0,5), j -> concat('u', id, '_', j)))
         ) AS text""")
    val fixed = Dedup.segmentDedup(df, "doc_id", "text", width = 3)
    val windowed = Dedup.segmentDedupWindowed(df, "doc_id", "text", width = 3)
    assert(fixed.exceptAll(windowed).isEmpty && windowed.exceptAll(fixed).isEmpty,
      "groupBy-min(struct) keep-first must equal the row_number window rule")
    // the scale property itself: the keep/drop decision must NOT plan a
    // Window (single-task sort per hot digest) — partial hash aggregation
    // is the whole point of the rewrite
    val plan = fixed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"segmentDedup must not plan a Window:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"keep-first must partial-aggregate map-side:\n$plan")
    // integral ids pack (id, idx) into one fixed-width decimal PRECISELY
    // so the keep-first min hash-aggregates — a SortAggregate here means
    // the packing regressed to the struct fallback (two full sorts)
    assert(!plan.contains("SortAggregate"),
      s"packed keep-first must be a HashAggregate, not SortAggregate:\n$plan")
    // non-integral ids can't pack losslessly: the struct-min fallback
    // must still match the windowed rule (task-bounded, sort-based)
    val sdf = df.selectExpr("concat('doc_', lpad(cast(doc_id AS string), 4, '0')) AS doc_id", "text")
    val sFixed = Dedup.segmentDedup(sdf, "doc_id", "text", width = 3)
    val sWin = Dedup.segmentDedupWindowed(sdf, "doc_id", "text", width = 3)
    assert(sFixed.exceptAll(sWin).isEmpty && sWin.exceptAll(sFixed).isEmpty,
      "string-id struct-min fallback must equal the window rule")
    assert(!sFixed.queryExecution.executedPlan.toString.contains("Window"))
    // curationFunnel's post-strip dedup shares the same shape
    val funnelPlan = Dedup.curationFunnel(
      df.withColumn("src", expr("CAST(doc_id % 2 AS string)")),
      "doc_id", "text", "src", width = 3, maxDf = 100)
      .queryExecution.executedPlan.toString
    assert(!funnelPlan.contains("Window"),
      s"curationFunnel must not plan a Window:\n$funnelPlan")
  }

  test("stripBoilerplate: ALL copies of a high-df segment vanish, rare text survives") {
    import graft.operators.Dedup
    // width=3: "x y z" appears in docs 0,1,2 (df=3 > maxDf=2) — every
    // copy must go, including the first; "a b c" (df=2) survives in both
    val df = Seq(
      (0L, "x y z a b c"),
      (1L, "x y z d e f"),
      (2L, "x y z g h i"),
      (3L, "a b c j k l")
    ).toDF("doc_id", "text")
    val got = Dedup.stripBoilerplate(df, "doc_id", "text", width = 3, maxDf = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("kept_text"))).toMap
    assert(got(0L) == ((1L, "a b c")), s"boilerplate first copy kept: $got")
    assert(got(1L) == ((1L, "d e f")))
    assert(got(2L) == ((1L, "g h i")))
    assert(got(3L) == ((2L, "a b c j k l")))
  }

  test("segmentOverlapMatrix: counts distinct shared segments per block pair") {
    import graft.operators.Dedup
    val df = Seq(
      (0L, "a", "x y z a b c"),       // A: {xyz, abc}
      (1L, "a", "x y z x y z"),       // A repeats xyz — still ONE distinct
      (2L, "b", "x y z d e f"),       // B: {xyz, def}
      (3L, "c", "a b c x y z")        // C: {abc, xyz}
    ).toDF("doc_id", "src", "text")
    val got = Dedup.segmentOverlapMatrix(df, "doc_id", "text", "src", width = 3)
      .collect().map(r => (r.getAs[String]("block_a"), r.getAs[String]("block_b")) ->
        r.getAs[Long]("n_shared_segments")).toMap
    assert(got == Map(("a", "b") -> 1L, ("a", "c") -> 2L, ("b", "c") -> 1L), got.toString)
  }

  test("curationFunnel: strip removes all boilerplate copies, dedup keeps firsts, per-block counts") {
    import graft.operators.Dedup
    // width=3: "x y z" df=3 (stripped entirely); "a b c" df=2 (survives
    // the strip, dedup keeps doc 0's copy and drops doc 3's)
    val df = Seq(
      (0L, "a", "x y z a b c"),
      (1L, "a", "x y z d e f"),
      (2L, "b", "x y z g h i"),
      (3L, "b", "a b c j k l")
    ).toDF("doc_id", "src", "text")
    val got = Dedup.curationFunnel(df, "doc_id", "text", "src", width = 3, maxDf = 2)
      .collect().map(r => r.getAs[String]("src") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_segs"),
          r.getAs[Long]("n_after_strip"), r.getAs[Long]("n_after_dedup"))).toMap
    // a: 4 segs, strip drops 2 xyz → 2, dedup keeps both (abc first + def)
    assert(got("a") == ((2L, 4L, 2L, 2L)), got.toString)
    // b: 4 segs, strip drops 1 xyz → 3, dedup drops doc 3's abc → 2
    assert(got("b") == ((2L, 4L, 3L, 2L)), got.toString)
  }

  test("Pii: counts per category and typed redaction; clean text untouched") {
    import graft.functions.Pii
    val df = Seq(
      (1L, "reach me at a.b+c@mail.example.org or 555-123-4567 from 10.0.0.1 thanks"),
      (2L, "two mails x@y.io and z@w.co, one ip 192.168.001.255"),
      (3L, "no pii here, just 12345 and a-b-c and v1.2 text"),
      (4L, ""),
      // SSN-shaped 3-2-4 next to a phone-shaped 3-3-4: each matches ONLY
      // its own category (\b + the digit-group shapes are disjoint)
      (5L, "ssn 078-05-1120 tel 555-123-4567 done")
    ).toDF("id", "text")
    val got = df.select(col("id"),
      Pii.emailCount(col("text")).as("e"), Pii.phoneCount(col("text")).as("p"),
      Pii.ssnCount(col("text")).as("s"),
      Pii.ipv4Count(col("text")).as("i"), Pii.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)), r.getString(5))).toMap
    assert(got(1L) == ((1, 1, 0, 1),
      "reach me at [EMAIL] or [PHONE] from [IP] thanks"), got(1L))
    assert(got(2L) == ((2, 0, 0, 1), "two mails [EMAIL] and [EMAIL], one ip [IP]"), got(2L))
    assert(got(3L) == ((0, 0, 0, 0), "no pii here, just 12345 and a-b-c and v1.2 text"), got(3L))
    assert(got(4L) == ((0, 0, 0, 0), ""), got(4L))
    assert(got(5L) == ((0, 1, 1, 0), "ssn [SSN] tel [PHONE] done"), got(5L))
  }

  test("langId picks the language with most marker hits; und on none") {
    val df = Seq(
      (1L, "le chat est sur la table et le chien est la"),
      (2L, "the cat is on the mat and the dog is here"),
      (3L, "xyzzy plugh zork")).toDF("id", "text")
    val got = df.select(col("id"), TextFunctions.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "fr" && got(2L) == "en" && got(3L) == "und")
  }

  test("langIdFromHits works with a single-language hits list") {
    // a one-entry list has no competitors — the when-chain must not
    // reduce an empty condition list (regression: empty.reduce throw)
    val df = Seq((1L, 3L), (2L, 0L)).toDF("id", "hits")
    val got = df.select(col("id"),
        TextFunctions.langIdFromHits(Seq("en" -> col("hits"))).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en" && got(2L) == "und")
  }

  test("multimodal: batched feature extraction preserves schema and shape") {
    val docs = Tables.documents(spark, sf())
    val media = Multimodal.fromDocuments(docs)
    assert(media.schema("content").dataType == org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.extractFeatures(media)
    val row = feats.head()
    assert(row.features.length == Multimodal.FeatureDim)
    assert(math.abs(row.features.sum - 1.0f) < 1e-3, "histogram features must sum to 1")
    val stats = Multimodal.featureStats(media).collect()
    assert(stats.map(_.getAs[String]("kind")).toSet == Set("image", "audio", "video"))
  }

  test("cusumDrift: hand excursions, silent-day zero fill, flat group quiet") {
    import graft.operators.Funnel
    val day = 86400000000L
    def ev(grp: String, d: Long, n: Int) =
      Seq.fill(n)((grp, d * day + 1L))
    // a: burst-gap-burst [4,0,0,4] → s = [8,0,-8,0]: both excursions 8,
    //    first |s| peak at t=0; days 1-2 have NO rows (zero fill)
    // b: flat [2,2,2] → all zero
    // c: step up [1,1,5,5] → s = [-8,-16,-8,0]: max_neg 16 at t=1
    val rows = ev("a", 0, 4) ++ ev("a", 3, 4) ++
      ev("b", 0, 2) ++ ev("b", 1, 2) ++ ev("b", 2, 2) ++
      ev("c", 10, 1) ++ ev("c", 11, 1) ++ ev("c", 12, 5) ++ ev("c", 13, 5)
    val df = rows.toDF("event_type", "us")
      .select(col("event_type"), expr("timestamp_micros(us)").as("ts"))
    val got = Funnel.cusumDrift(df, "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got == Map(
      "a" -> ((4L, 8L, 8L, 8L, 0L)),
      "b" -> ((3L, 6L, 0L, 0L, 0L)),
      "c" -> ((4L, 12L, 0L, 16L, 1L))), got.toString)
    // partitioning invariance + released bucket-count cache (only the
    // eager result's checkpoint may remain)
    var rep: Map[String, (Long, Long, Long, Long, Long)] = null
    assertReleases("cusumDrift", allowed = 1) {
      rep = Funnel.cusumDrift(df.repartition(5), "event_type", "ts")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5)))).toMap
    }
    assert(rep == got)
  }

  test("multimodal: frame sampling emits one row per interval") {
    val media = Seq((1L, "video", Array[Byte](1, 2, 3), (64, 64, 1000L, "stub")))
      .toDF("media_id", "kind", "content", "meta")
      .withColumn("meta", col("meta").cast("struct<width:int,height:int,duration_ms:bigint,codec:string>"))
    val frames = Multimodal.sampleFrames(media, everyMs = 250L).collect()
    assert(frames.map(_.getAs[Long]("frame_ms")).sorted.sameElements(Array(0L, 250L, 500L, 750L, 1000L)))
  }

  test("hashedBowTopK: identical text at cosine 1.0 rank 1; scaled copy close") {
    import graft.operators.TfIdf
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (5L, "alpha beta gamma delta epsilon"),   // identical → cosine 1.0
      (6L, "alpha beta gamma delta epsilon zeta eta"), // superset → high
      (7L, "completely different words here entirely"),
      (8L, "more unrelated content again"),
      (9L, "gamma delta something else")).toDF("doc_id", "text")
    val got = TfIdf.hashedBowTopK(docs, "doc_id", "text",
        queryMaxId = 1L, dim = 64, k = 3)
      .orderBy("rank").collect()
    assert(got.head.getAs[Long]("nid") == 5L &&
      got.head.getAs[Double]("cosine") == 1.0, got.mkString(";"))
    // the superset doc outranks the disjoint ones
    assert(got(1).getAs[Long]("nid") == 6L, got.mkString(";"))
  }

  test("lengthBucketBatches: hand waste, bucket split, whole-doc batches") {
    // bucketWidth 4, batchSize 2. Bucket 0 holds lens {3,3,3,2}: any
    // md5-order pairing puts the 2 with some 3 → padded 12, tokens 11,
    // waste_bp 10000/12 = 833 REGARDLESS of the pseudo-shuffle order
    // (the hand case is deliberately order-independent). Bucket 1 holds
    // the lone len-5 doc: one batch, zero waste.
    val docs = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h i"),
      (4L, "j k"), (5L, "l m n o p")).toDF("doc_id", "text")
    val got = Packing.lengthBucketBatches(docs, "doc_id", "text",
        bucketWidth = 4, batchSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got == Map(
      0L -> ((4L, 2L, 11L, 12L, 833L)),
      1L -> ((1L, 1L, 5L, 5L, 0L))), got.toString)
    // empty/null docs land in bucket 0 with len 0 and cost no padding
    // beyond their batch peers' max
    val empty = Packing.lengthBucketBatches(
      Seq((1L, ""), (2L, null: String)).toDF("doc_id", "text"),
      "doc_id", "text", bucketWidth = 4, batchSize = 2).collect().head
    assert(empty.getLong(0) == 0L && empty.getLong(3) == 0L &&
      empty.getLong(4) == 0L && empty.getLong(5) == 0L, empty.toString)
  }

  test("halfSampleCI: plain-Scala reference recompute of replica means and CI") {
    import graft.operators.Sampling
    val n = 200L
    val scores = (1L to n).map(i => i -> (i % 13) * 1000L).toMap
    val docs = scores.toSeq.map { case (i, s) => ("g", i, s) }
      .toDF("grp", "id", "score")
    // same portable hash, independent arithmetic
    val hs = docs.select(col("id"),
        conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val means = (0 until 32).map { b =>
      val keep = (1L to n).filter(i => ((hs(i) >> b) & 1L) == 1L)
      keep.map(scores).sum / math.max(keep.size, 1)
    }
    val (sx, sxx) = (means.sum, means.map(m => m * m).sum)
    val ci = math.floor(1.96 * math.sqrt((32.0 * sxx - sx.toDouble * sx))
      / (32 * math.sqrt(2.0)) + 0.5).toLong
    val r = Sampling.halfSampleCI(docs, "grp", "id", "score").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) ==
      ((n, scores.values.sum / n, ci, means.min, means.max)), r.toString)
  }

  test("shardBalanceAudit: reference Gini recompute; single shard perfectly balanced") {
    import graft.operators.Sampling
    // 40 docs, lengths i%7+1; the reference recomputes shard masses from
    // the same portable bucket hash but does the ranking/Gini/max-mean
    // arithmetic independently in plain Scala
    val lens = (1L to 40L).map(i => i -> ((i % 7) + 1)).toMap
    val docs = lens.toSeq.map { case (i, n) => (i, ("t " * n.toInt).trim) }
      .toDF("doc_id", "text")
    val shardOf = docs
      .select(col("doc_id"), Sampling.hashBucket(col("doc_id"), 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xs = lens.keys.toSeq.groupBy(shardOf).values
      .map(_.map(lens).sum).toSeq.sorted
    val (n, s) = (xs.size.toLong, xs.sum)
    val ssum = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    val gini = ((2 * ssum - (n + 1) * s) * 10000) / (n * s)
    val mom = xs.max * n * 10000 / s
    assertReleases("shardBalanceAudit") {
      val r = Packing.shardBalanceAudit(docs, "doc_id", "text", 4)
        .collect().head
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)) == ((n, s, xs.min, xs.max, gini, mom)),
        r.toString)
    }
    // one shard: Gini exactly 0, max/mean exactly 10000
    val one = Packing.shardBalanceAudit(docs, "doc_id", "text", 1)
      .collect().head
    assert(one.getLong(0) == 1L && one.getLong(4) == 0L &&
      one.getLong(5) == 10000L, one.toString)
  }
}
