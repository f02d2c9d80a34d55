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

  /** Slowly-changing-dimension Type-2 compression of a change log
    * (Kimball's warehouse-dimension pattern): collapse an append-only
    * event stream `(key, attr, ts)` into validity intervals — one row
    * per (key, consecutive-run-of-equal-attr) with
    * `[from_us, to_us)` effective bounds, `to_us` null for the open
    * current version. The reference keeps only latest-state dimensions
    * (its serving tables overwrite per kol id); SCD2 is the standard
    * warehouse answer to "what was the attribute WHEN the fact
    * happened" — the as-of join ([[AsofJoin]]) then consumes these
    * intervals directly.
    *
    * Determinism: input rows first collapse to one per (key, µs) by
    * MIN attr — same-timestamp collisions otherwise make run boundaries
    * partitioning-dependent. Versions number from 1 per key in time
    * order.
    *
    * Shape: everything is partitioned by `key` — the collision
    * collapse is one hash aggregate, run detection is one lag + running
    * sum window, the interval rollup is one hash aggregate, and the
    * open/close stitch is one lead window. No global window, no join;
    * at 100 TB the only exchange is the key hash partitioning, reused
    * across all four steps.
    */
  def scd2Intervals(df: DataFrame, keyCol: String, attrCol: String,
      tsUsCol: String): DataFrame = {
    val byTime = Window.partitionBy("key").orderBy("ts_us")
    val dedup = df
      .select(col(keyCol).as("key"), col(attrCol).as("attr"),
        col(tsUsCol).cast("long").as("ts_us"))
      .groupBy("key", "ts_us").agg(min("attr").as("attr"))
    // null-safe change test, with the first row per key forced to open
    // version 1 (lag's no-previous-row null is indistinguishable from a
    // genuinely-null previous attr, and a null→null run must NOT split)
    val runs = dedup
      .withColumn("__chg",
        when(row_number().over(byTime) === 1, 1L)
          .when(not(lag("attr", 1).over(byTime) <=> col("attr")), 1L)
          .otherwise(0L))
      .withColumn("version", sum("__chg").over(byTime))
    val byVersion = Window.partitionBy("key").orderBy("version")
    runs.groupBy("key", "version")
      .agg(max("attr").as("value"), min("ts_us").as("from_us"),
        count(lit(1)).as("n_rows"))
      .withColumn("to_us", lead("from_us", 1).over(byVersion))
      .select("key", "version", "value", "from_us", "to_us", "n_rows")
  }
}
