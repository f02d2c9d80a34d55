package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Whole-document next-fit bin packing: assign each document to a
  * fixed-capacity training bin WITHOUT splitting the document, walking
  * documents in a deterministic order and opening a new bin whenever the
  * current one cannot hold the next document.
  *
  * This is the complement of [[Packing.concatChunkPlacement]] (the
  * reference-style concat-and-chunk layout, `batch/silver_to_gold.py`'s
  * sequential writer generalized): chunking splits documents at chunk
  * boundaries; next-fit keeps every document intact — the layout used
  * when examples must not straddle a training sequence (instruction
  * tuning, contrastive pairs, eval shards).
  *
  * Scale design: a greedy scan is inherently sequential, so the corpus is
  * packed per LANE (`laneCols`, e.g. (source, doc_id % k)) — each lane is
  * an independent sequential scan, and lanes parallelize freely. Lanes are
  * hash-partitioned (`repartition(laneCols)`) and sorted within partitions
  * by (lane, order), so one `mapPartitions` pass sees each lane as a
  * contiguous sorted run and carries (bin, fill) state across rows,
  * resetting at lane boundaries. No window over the whole corpus, no
  * driver collect; at 100 TB parallelism = #lanes, so size k (the bucket
  * arm of the lane key) to a few × total cores. Bin ids are per-lane;
  * (lane, bin) is the global bin key.
  *
  * Next-fit, not first-fit-decreasing: FFD needs random access to open
  * bins (a heap per lane) and reorders documents, destroying the
  * deterministic doc-order contract that makes the layout resumable and
  * oracle-checkable. Next-fit wastes at most one document's slack per bin
  * and is the one-pass streaming shape.
  *
  * Contract: `laneCols`/`orderCol`/`countCol` non-null; `countCol`
  * non-negative. A document larger than `capacity` gets a bin of its own
  * (the bin overflows rather than dropping the document — the caller
  * filters oversized documents first if that is the policy).
  */
object BinPack {

  /** Returns `laneCols ++ (orderCol, countCol, bin, bin_fill)`: `bin` is
    * the 0-based bin index within the lane, `bin_fill` the lane's running
    * fill AFTER placing this row (so a bin's total is the max `bin_fill`
    * over its rows, and per-row fills pin the whole greedy trajectory).
    */
  def nextFit(df: DataFrame, laneCols: Seq[String], orderCol: String,
      countCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(laneCols.nonEmpty, "at least one lane column required")
    val keep = laneCols :+ orderCol :+ countCol
    val prepared = df
      .select(keep.map(col): _*)
      .withColumn("__n", col(countCol).cast("long"))
      .repartition(laneCols.map(col): _*)
      .sortWithinPartitions((laneCols :+ orderCol).map(col): _*)
    val outSchema = prepared.schema
      .fields.filterNot(_.name == "__n")
      .foldLeft(new org.apache.spark.sql.types.StructType)(_ add _)
      .add("bin", LongType, nullable = false)
      .add("bin_fill", LongType, nullable = false)
    val laneIdx = laneCols.map(prepared.schema.fieldIndex).toArray
    val nIdx = prepared.schema.fieldIndex("__n")
    prepared.mapPartitions { it =>
      // each partition holds whole lanes, sorted by (lane, order): carry
      // (bin, fill) across rows, reset when the lane key changes
      var lane: Seq[Any] = null
      var bin = 0L
      var fill = 0L
      it.map { r =>
        val l = laneIdx.map(r.get(_)).toSeq
        val n = r.getLong(nIdx)
        if (lane == null || l != lane) { lane = l; bin = 0L; fill = 0L }
        if (fill > 0 && fill + n > capacity) { bin += 1; fill = n }
        else fill += n
        Row.fromSeq(r.toSeq.dropRight(1) ++ Seq(bin, fill))
      }
    }(Encoders.row(outSchema))
  }
}
