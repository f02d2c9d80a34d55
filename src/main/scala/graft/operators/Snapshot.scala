package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus snapshot diffing — the incremental-processing front door of a
  * recurring crawl: each refresh, classify every document as added /
  * removed / changed / unchanged against the previous snapshot so that
  * ONLY the added+changed slice re-enters the expensive curation
  * pipeline (dedup indexing, scoring, packing), instead of reprocessing
  * 100 TB because 0.1% moved. The streaming-dedup index
  * ([[StreamingDedup]]) consumes exactly the added side; the removed
  * side drives retention deletes downstream.
  *
  * Shape: one full outer join on the document id, comparing content
  * fingerprints — both sides reduce to (id, fp) before the join, so the
  * exchange carries two narrow columns regardless of document size, and
  * the fingerprint column can come from an existing index rather than a
  * rescan. No windows, no skew surface (ids are unique per side).
  */
object Snapshot {

  /** One row per id in either snapshot: (id, status, old_fp, new_fp)
    * with status ∈ added | removed | changed | unchanged. Fingerprints
    * are whatever `fpOf` projects (md5 of normalized text by
    * convention — [[graft.functions.TextFunctions.fingerprint]]); the
    * diff never reads the text itself.
    */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, fpCol: String): DataFrame = {
    // side presence comes from explicit markers, NOT fingerprint nullness:
    // a doc present in both snapshots with a null fingerprint (null text →
    // md5 null) must not masquerade as 'added'. The changed/unchanged
    // split then uses plain equality, so any null fingerprint classifies
    // as 'changed' — conservative (the doc re-enters the pipeline rather
    // than being silently skipped) and exactly the q92 oracle's SQL
    // semantics (presence by id, `old_fp = new_fp` for unchanged).
    val o = oldSnap.select(col(idCol).as("id"), col(fpCol).as("old_fp"),
      lit(true).as("__in_old"))
    val n = newSnap.select(col(idCol).as("id"), col(fpCol).as("new_fp"),
      lit(true).as("__in_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("old_fp") === col("new_fp"), "unchanged")
          .otherwise("changed"))
      .select("id", "status", "old_fp", "new_fp")
  }

  /** The reprocess slice: new-snapshot rows whose content is new to the
    * pipeline (added or changed), i.e. the only rows the expensive
    * stages need to see this refresh. Left-semi against the diff keeps
    * the full new-snapshot schema without carrying diff columns.
    */
  def reprocessSlice(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, fpCol: String): DataFrame = {
    val delta = corpusDiff(oldSnap, newSnap, idCol, fpCol)
      .filter(col("status").isin("added", "changed"))
      .select(col("id"))
    newSnap.join(delta, newSnap(idCol) === delta("id"), "left_semi")
  }

  /** Distribution drift between two snapshots over a low-cardinality
    * dimension (source, language, domain bucket): the statistical
    * companion to [[corpusDiff]]'s row-level diff — a refresh that adds
    * the right number of rows can still silently shift the corpus MIX,
    * which changes what a model trained on it sees. Per dimension value:
    * both sides' counts, both shares, and the absolute share drift,
    * plus the side-wide L1 drift (Σ|p−q|; total-variation distance is
    * half of it) repeated on every row of the dimension.
    *
    * Portability contract: shares are exact integer micro-shares —
    * `n·10⁶ div total` in BIGINT arithmetic (never a float division),
    * so every output is bit-identical on any engine and the L1 sum is
    * order-free. A value absent from one side counts as share 0.
    *
    * Scale shape: two map-side-combined counts (the exchange carries
    * one row per dimension value), 1-row totals broadcast onto them,
    * and a full-outer join of two ≤|dim| frames — nothing here grows
    * with corpus size, only with dimension cardinality.
    */
  def distributionDrift(oldSnap: DataFrame, newSnap: DataFrame,
      dimCol: String): DataFrame = {
    def microShares(df: DataFrame, nCol: String, mCol: String) = {
      // the side total is the sum of the per-value counts — a global
      // window over the ≤|dim|-row counts frame, NOT a second corpus scan
      df.groupBy(col(dimCol).as("value"))
        .agg(count(lit(1)).as(nCol))
        .withColumn("__t", sum(col(nCol)).over(Window.partitionBy()))
        .withColumn(mCol, expr(s"($nCol * 1000000) div __t"))
        .drop("__t")
    }
    microShares(oldSnap, "n_old", "micro_old")
      .join(microShares(newSnap, "n_new", "micro_new"), Seq("value"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new", "micro_old", "micro_new"))
      .withColumn("drift_micro", abs(col("micro_old") - col("micro_new")))
      .withColumn("l1_micro",
        sum(col("drift_micro")).over(Window.partitionBy()))
  }
}
