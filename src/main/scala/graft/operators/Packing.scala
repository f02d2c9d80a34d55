package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: concatenate every document's tokens
  * in a deterministic order and split the stream at fixed `capacity`
  * boundaries (the concat-and-chunk layout GPT-style training uses).
  * The computation is a global running token offset — an exclusive
  * prefix sum over the corpus in document order.
  *
  * The naive formulation — `Window.orderBy(id)` with no partition — puts
  * the ENTIRE corpus through one task (Spark even warns); at 100 TB that
  * is not a skew ceiling but a wall. This implements the classic
  * two-phase distributed prefix sum instead: per-GROUP running sums in
  * parallel (group = a coarse range of the order key), then a prefix
  * over the per-group TOTALS — #groups rows, trivially small — joined
  * back as each group's base offset. Wall-clock scales with the scan;
  * the only serial object is the group-totals list.
  *
  * Contract: `orderCol` must be unique per row (it defines the global
  * concatenation order); `groupOf` must be monotone non-decreasing in
  * `orderCol` (e.g. `orderCol div groupWidth` for a numeric key) so
  * groups are contiguous runs of the global order.
  */
object Packing {

  /** Per-document chunk placement under concat-and-chunk: the exclusive
    * running offset of each doc's first token, and the first/last chunk
    * ids its tokens land in. Zero-token docs get `n_chunks = 0` and
    * null first/last chunk (they occupy no space in the stream).
    *
    * Output: every input column + `offset`, `first_chunk`, `last_chunk`,
    * `n_chunks`.
    */
  def concatChunkPlacement(df: DataFrame, orderCol: String, countCol: String,
      capacity: Long, groupOf: Column): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val grouped = df.withColumn("__g", groupOf)
    // phase 1 (parallel): running sum WITHIN each group
    val wIn = Window.partitionBy("__g").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = grouped.withColumn("__local_end", sum(col(countCol)).over(wIn))
    // phase 2 (tiny): exclusive prefix over per-group totals
    val wGroups = Window.orderBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = grouped.groupBy("__g")
      .agg(sum(col(countCol)).as("__g_total"))
      .withColumn("__g_base", coalesce(sum(col("__g_total")).over(wGroups), lit(0L)))
      .select(col("__g"), col("__g_base"))
    // join back (broadcast: #groups rows) and place chunks
    val placed = local.join(broadcast(bases), Seq("__g"))
      .withColumn("offset", (col("__g_base") + col("__local_end") - col(countCol)).cast("long"))
    placed
      .withColumn("first_chunk",
        when(col(countCol) > 0, chunkOf(col("offset"), capacity)))
      .withColumn("last_chunk",
        when(col(countCol) > 0,
          chunkOf(col("offset") + col(countCol) - 1, capacity)))
      .withColumn("n_chunks",
        coalesce(col("last_chunk") - col("first_chunk") + 1, lit(0L)))
      .drop("__g", "__local_end", "__g_base")
  }

  /** Chunk id of a non-negative offset. Offsets stay under 2^53
    * (≈9e15 tokens ≈ tens of PB of raw text), so after subtracting the
    * remainder the double division is exact.
    */
  private def chunkOf(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / d).cast("long")
}
