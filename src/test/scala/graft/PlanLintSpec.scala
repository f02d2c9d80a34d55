package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Structural plan lint: no query may plan a CartesianProductExec — the
  * one join shape with NO scale story (a broadcast nested-loop join is
  * bounded by its broadcast side; a shuffled cartesian product is
  * |A|·|B| through the shuffle). Every intentional cross join in the
  * engine carries an explicit broadcast() on its small side, so a
  * CartesianProduct appearing anywhere means a hint was lost (e.g. a
  * refactor dropped broadcast() and both sides crossed the
  * autoBroadcast threshold). Linted over the LAZY-buildable slice of
  * the query surface (operators that execute eagerly at build time —
  * Iterate loops, centroid fits, writes — are exercised by their own
  * specs and ladders; building them here would re-run those jobs).
  */
class PlanLintSpec extends SparkSpec {

  // lazy builders only: plan construction runs no job beyond file listing
  private val lazyQueries = Seq(
    "q03_region_rollup", "q09_union_reconcile", "q24_composite_scores",
    "q35_ngram_neardup", "q36_cosine_topk", "q39_lsh_ann",
    "q45_sessionization", "q59_tfidf_top_terms", "q62_embedding_neardup",
    "q66_asof_enrich", "q70_range_join", "q75_sequence_packing",
    "q77_segment_dedup", "q86_quality_gate", "q91_stratified_sample",
    "q104_constraint_checks", "q109_bm25_search", "q115_hybrid_rrf",
    "q121_retrieval_metrics", "q134_hard_negatives", "q141_length_histogram",
    "q143_jaccard_bands", "q161_fuzzy_name_linkage", "q168_query_likelihood",
    "q175_rollup_datasheet", "q176_lang_pivot",
    "q180_repetition_char_fractions", "q184_blocklist_gate",
    "q186_length_bucket_batches")

  test("no query plans a CartesianProductExec") {
    val offenders = lazyQueries.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf())
      val plan = df.queryExecution.executedPlan
      if (plan.exists(_.isInstanceOf[CartesianProductExec])) Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"CartesianProductExec found in: ${offenders.mkString(", ")}")
  }
}
