package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
