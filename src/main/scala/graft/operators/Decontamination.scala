package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
