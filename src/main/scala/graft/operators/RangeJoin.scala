package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join, equi-ized by time bucketing.
  *
  * Spark plans a raw `l.key = r.key AND l.t BETWEEN r.s AND r.e` as an
  * equi-join on the key followed by a per-key filter — fine until one key
  * holds many intervals (per-key product), and catastrophic without an
  * equality key (BroadcastNestedLoopJoin). Bucketizing makes the time
  * dimension part of the shuffle key: each right interval is exploded
  * into the fixed-width buckets it covers, each left row hashes to its
  * single bucket, and the join runs as a plain shuffled equi-join on
  * (key, bucket) with the exact bounds verified afterwards. A left row
  * can meet a given interval only in the left row's OWN bucket, so no
  * post-join dedupe is needed.
  *
  * Build-side blowup is `interval_span / bucketWidth` rows per interval —
  * pick bucketWidth on the order of the typical interval length (span/
  * width ≈ 1–2). Degenerate giant intervals (span ≫ width) are the skew
  * knob: widen the bucket or split those intervals upstream.
  */
object RangeJoin {

  /** `left` rows matched to every `right` interval of the same key whose
    * `[rStart, rEnd]` (inclusive) contains `lTime`. Returns left.* +
    * right.* for each match; column names must be disjoint and times
    * integral (epoch days/seconds/ms — one unit throughout).
    */
  def bucketedRangeJoin(left: DataFrame, lKey: String, lTime: String,
      right: DataFrame, rKey: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint")
    // SQL `div` — exact integral division (a double roundtrip would lose
    // precision past 2^53, e.g. epoch-micros). The identifier is
    // backtick-quoted (with ` doubled) so dotted/spaced/reserved-word
    // column names parse as plain top-level columns, not nested fields.
    def bucketOf(c: String) =
      expr(s"CAST(`${c.replace("`", "``")}` AS BIGINT) div $bucketWidth")
    val r = right.withColumn("__b",
      explode(sequence(bucketOf(rStart), bucketOf(rEnd))))
    val l = left.withColumn("__b", bucketOf(lTime))
    l.join(r,
        l("__b") === r("__b") && col(lKey) === col(rKey) &&
        col(lTime).between(col(rStart), col(rEnd)))
      .drop("__b")
  }
}
