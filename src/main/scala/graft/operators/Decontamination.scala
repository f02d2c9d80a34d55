package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.VectorExpressions

/** Training-corpus decontamination: find corpus documents that CONTAIN a
  * benchmark/eval item, by distinct token n-gram overlap — the classic
  * n-gram collision check run before training so eval items leaking into
  * the corpus don't inflate benchmark scores.
  *
  * Shape notes for 100 TB: both sides reduce to distinct (id, gram)
  * postings via the relational shingle builder (tokenizer runs once per
  * doc, window machinery after — [[Dedup.shinglePostings]]); the only
  * pair-generating step is a gram-keyed equi-join, df-capped on the
  * corpus side exactly like [[Dedup.ngramJaccardPairs]] (a boilerplate
  * gram present in thousands of docs is non-discriminative and would
  * explode the join). Benchmark sets are small next to the corpus —
  * the join's build side stays broadcastable in practice.
  */
object Decontamination {

  /** (corpus id, bench_id, n_shared, n_bench_grams, containment) for
    * every corpus-doc × benchmark-item pair sharing distinct n-grams
    * with containment ≥ `minContainment`. Containment is over the
    * BENCHMARK item's gram count — a long corpus document that embeds a
    * whole eval item is flagged at ~1.0 even though the quote is a tiny
    * fraction of the document (the fraction-of-document convention would
    * miss exactly the docs that matter most).
    *
    * `maxGramDf` caps hot corpus grams; benchmark-item gram counts keep
    * the FULL count, so containment for surviving pairs only ever
    * underestimates — same convention as [[Dedup.winnowContainmentPairs]].
    * Short docs (< n tokens) contribute their single all-token gram;
    * empty docs nothing.
    */
  def benchmarkContainment(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 5, maxGramDf: Long = 1000,
      minContainment: Double = 0.5): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val docGrams = Dedup.shinglePostings(corpus, idCol, textCol, None, n)
      .select(col("id"), col("shingle")).distinct()
    val benchGrams = Dedup.shinglePostings(bench, benchIdCol, benchTextCol, None, n)
      .select(col("id").as("bench_id"), col("shingle")).distinct()
    val benchSizes = benchGrams.groupBy("bench_id")
      .agg(count(lit(1)).as("n_bench_grams"))
    val dfw = Window.partitionBy("shingle")
    val kept = docGrams
      .withColumn("df_", count(lit(1)).over(dfw))
      .filter(col("df_") <= maxGramDf)
      .drop("df_")
    kept.join(benchGrams, Seq("shingle"))
      .groupBy("id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .join(benchSizes, Seq("bench_id"))
      .withColumn("containment", col("n_shared") / col("n_bench_grams"))
      .filter(col("containment") >= minContainment)
      .select("id", "bench_id", "n_shared", "n_bench_grams", "containment")
  }

  /** [[benchmarkContainment]] with a Bloom-filter prefilter — SAME output
    * (the filter is a candidate screen, never the verdict), different
    * 100 TB shape. The exact path's first shuffle moves EVERY distinct
    * corpus (id, gram) posting to compute the df cap; at 100 TB that
    * exchange dwarfs the benchmark side by ~6 orders of magnitude. Here
    * a [[graft.plans.BloomBuildAggregate]] over the benchmark's hashed
    * grams (a few MB regardless of corpus size) is broadcast to the
    * corpus scan, and `bloom_might_contain` drops non-benchmark grams
    * MAP-SIDE — only grams that might be in the benchmark (true matches
    * + the fpp tail) ever reach an exchange.
    *
    * Why the df cap survives the reordering: membership is a function of
    * the gram alone, so for any gram that passes the screen ALL of its
    * corpus postings pass — a screened gram's df computed on survivors
    * equals its full-corpus df, and grams the screen drops could never
    * produce a join row anyway. The cap filter is therefore applied to
    * exactly the same values as the exact path's, just computed on a
    * frame ~|bench|(1 + fpp·|corpus|/|bench|) instead of |corpus|.
    *
    * False positives cost only wasted probe rows: the gram equi-join
    * against the real benchmark postings discards them, so the output is
    * EXACT (spec-pinned equal to [[benchmarkContainment]]; q89's oracle
    * is the same SQL as q73's). Grams join on their xxhash64 digest —
    * the established digest-equals-segment convention (a collision could
    * overcount one shared gram for one pair at ~2⁻⁶⁴ per gram pair).
    */
  def benchmarkContainmentBloom(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 5, maxGramDf: Long = 1000, minContainment: Double = 0.5,
      expectedBenchGrams: Long = 1 << 20, fpp: Double = 0.01): DataFrame = {
    val idx = benchBloomIndex(bench, benchIdCol, benchTextCol, n,
      expectedBenchGrams, fpp)
    bloomScreenedContainment(corpus, idCol, textCol, idx, n, maxGramDf,
      minContainment)
  }

  /** The benchmark side of the Bloom-screened check, precomputed once:
    * hashed distinct grams, per-item gram counts, and the 1-row
    * serialized filter. A STREAM decontaminating every arriving
    * micro-batch ([[graft.streaming.DecontaminationStream]]) caches
    * these three small frames for the life of the query instead of
    * re-shingling the benchmark per batch — eval sets are static while
    * the corpus flows.
    */
  case class BenchBloomIndex(grams: DataFrame, sizes: DataFrame, bloom: DataFrame) {
    /** The serialized filter, collected ONCE and embedded as a LITERAL in
      * the probe filter. This is load-bearing for throughput, not a
      * convenience: probing via a join against the 1-row `bloom` frame
      * hands every corpus row a FRESH copy of the filter bytes
      * (UnsafeRow.getBinary), so the probe cache's content-equality check
      * degenerates to a full memcmp of the filter PER ROW — measured 34×
      * slower than the exact path at sf0.1 (49 s vs 1.4 s) on a ~1 MB
      * filter. A literal is the same array instance on every evaluation:
      * the cache hits on reference equality and the filter deserializes
      * once per thread, total. Size contract: literals ship with the
      * task binary, fine through tens of MB (10⁷ benchmark grams at 1%
      * fpp ≈ 12 MB); beyond that, distribute the filter as a file and
      * screen per partition.
      */
    lazy val bloomBytes: Array[Byte] = bloom.head().getAs[Array[Byte]]("bf")

    /** Pin the gram/size frames (benchmark-sized, not corpus-sized). */
    def cached(): BenchBloomIndex = {
      grams.cache(); sizes.cache(); this
    }
    def unpersist(): Unit = {
      grams.unpersist(); sizes.unpersist()
    }
  }

  def benchBloomIndex(bench: DataFrame, benchIdCol: String,
      benchTextCol: String, n: Int = 5,
      expectedBenchGrams: Long = 1 << 20, fpp: Double = 0.01): BenchBloomIndex = {
    require(n > 0, s"n must be positive, got $n")
    val benchGrams = Dedup.shinglePostings(bench, benchIdCol, benchTextCol, None, n)
      .select(col("id").as("bench_id"), xxhash64(col("shingle")).as("g")).distinct()
    val benchSizes = benchGrams.groupBy("bench_id")
      .agg(count(lit(1)).as("n_bench_grams"))
    val bloom = benchGrams.agg(
      graft.plans.Bloom.bloomAgg(col("g"), expectedBenchGrams, fpp).as("bf"))
    BenchBloomIndex(benchGrams, benchSizes, bloom)
  }

  /** The corpus side: screen hashed grams against the broadcast filter
    * map-side, df-cap the survivors (equal to the full-corpus cap for
    * every surviving gram — membership is a function of the gram alone,
    * so a screened gram keeps ALL its postings), then the exact join
    * and containment gate. See [[benchmarkContainmentBloom]].
    */
  def bloomScreenedContainment(corpus: DataFrame, idCol: String,
      textCol: String, idx: BenchBloomIndex, n: Int = 5,
      maxGramDf: Long = 1000, minContainment: Double = 0.5): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val docGrams = Dedup.shinglePostings(corpus, idCol, textCol, None, n)
      .select(col("id"), xxhash64(col("shingle")).as("g")).distinct()
    // literal filter bytes, NOT a join against the 1-row bloom frame —
    // see BenchBloomIndex.bloomBytes for why (34× measured)
    val screened = docGrams.filter(
      graft.plans.Bloom.bloomMightContain(lit(idx.bloomBytes), col("g")))
    val dfw = Window.partitionBy("g")
    val kept = screened
      .withColumn("df_", count(lit(1)).over(dfw))
      .filter(col("df_") <= maxGramDf)
      .drop("df_")
    kept.join(idx.grams, Seq("g"))
      .groupBy("id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .join(idx.sizes, Seq("bench_id"))
      .withColumn("containment", col("n_shared") / col("n_bench_grams"))
      .filter(col("containment") >= minContainment)
      .select("id", "bench_id", "n_shared", "n_bench_grams", "containment")
  }

  /** SEMANTIC decontamination — the embedding-level overlap screen the
    * n-gram paths above cannot see (a paraphrased benchmark item shares
    * no 8-gram with its source but sits next to it in embedding space):
    * flag every corpus vector whose cosine to ANY benchmark vector
    * reaches `tau`. The blocking is the frozen coarse-quantizer cell
    * trick ([[graft.operators.Similarity]]'s argmin, centroids fit on
    * the BENCH side — it is the small, fixed set): only same-cell
    * pairs are scored, so the candidate volume is corpus × (bench-per-
    * cell), never corpus × bench. The recall trade (a near-dup pair
    * split across a cell boundary is missed) is the same one SemDeDup
    * ships with, documented there.
    *
    * Scale shape: both assignments are pure projections (no shuffle);
    * the only exchange is the same-cell join keyed on cell, with the
    * bench side broadcastable (benchmarks are ≤10⁵ rows by
    * construction). Output rows only for CONTAMINATED corpus ids —
    * (id, n_bench_hits, max_cos4).
    */
  def semanticScreen(corpus: DataFrame, bench: DataFrame, tau: Double,
      nCentroids: Int): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1], got $tau")
    val cents = Similarity.sampleCentroidsPortable(bench, nCentroids)
    val benchCells = Similarity.assignCellsLiteral(bench, cents)
      .select(col("cell"), col("embedding").as("__bemb"))
    Similarity.assignCellsLiteral(corpus, cents)
      .join(broadcast(benchCells), Seq("cell"))
      .select(col("id"),
        VectorExpressions.cosineNative(col("embedding"), col("__bemb"))
          .as("__cos"))
      .filter(col("__cos") >= tau)
      .groupBy("id")
      .agg(count(lit(1)).as("n_bench_hits"),
        graft.functions.TextFunctions.round4hu(max(col("__cos")))
          .as("max_cos4"))
  }

  /** Token-blocklist gate — the C4 "bad words" filter (Raffel et al.
    * 2020 §2.2 drop any page containing a blocklisted word; Gopher
    * keeps a rate threshold instead). Exact whole-token matching
    * against the house whitespace tokens — a blocklisted SUBSTRING
    * inside a longer token does NOT match (the C4 critique's false
    * positives are a conscious non-goal here; substring policy is the
    * bloom n-gram screen's job).
    *
    * Per group: docs seen, docs flagged (≥1 hit), total hit
    * occurrences, and the flag rate in basis points.
    *
    * Scale shape: the blocklist ships as ONE plan-time literal array —
    * per-doc work is a map-side `filter(tokens, contains)` count inside
    * whole-stage codegen, no join, no shuffle beyond the ≤|groups|-row
    * final aggregate. Real blocklists are a few hundred terms; past a
    * few thousand, switch to a broadcast semi-join on exploded tokens
    * (the [[screenBloom]] shape) — the literal stays the fast path
    * because it never materializes posting rows.
    */
  def blocklistGate(df: DataFrame, groupCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklistGate needs at least one term")
    val tk = graft.functions.TextFunctions.tokens(
      coalesce(col(textCol), lit("")))
    val bl = lit(blocklist.toArray)
    val per = df.select(col(groupCol),
      size(filter(tk, t => array_contains(bl, t))).cast("long").as("hits"))
    per.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum("hits").as("n_hits"))
      .withColumn("flag_bp", expr("(n_flagged * 10000) div n_docs"))
  }
}
