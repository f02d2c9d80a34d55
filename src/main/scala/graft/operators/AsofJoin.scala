package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every probe row, the latest build row with the same
  * key and time ≤ the probe's time — the temporal-enrichment primitive
  * (features "as of" an event, latest price before a trade, last profile
  * update before a session) that relational Spark lacks as a builtin.
  *
  * Formulation (the scale-right one): UNION the tagged sides and take a
  * `last(value, ignoreNulls)` running window over (key, time) — ONE
  * shuffle on the key, a per-partition sort, and a linear scan. The
  * naive alternatives do not survive 100 TB: a range join
  * (`l.key = r.key AND r.t <= l.t`) explodes to |probe|×|build-per-key|
  * intermediate rows before its per-row argmax, and a windowed
  * latest-per-pair over that product inherits the blowup. Here the
  * intermediate is exactly |probe| + |build| rows.
  *
  * Contract: the build side must be unique per (key, time) — pre-dedupe
  * with a deterministic tie-break ([[Dedup.latestPerKey]]); equal
  * timestamps match (inclusive "at or before": build rows sort ahead of
  * probe rows on ties). Probe rows with no earlier build row get nulls.
  * Null build VALUES would be skipped by ignoreNulls and the previous
  * value carried instead — dedupe/clean the build side first.
  */
object AsofJoin {

  /** `left` enriched with `valueCols` from the latest `right` row at or
    * before each left row's time. Output = every left column + the
    * as-of value columns (null when no match).
    */
  def asofJoin(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"value columns ${valueCols.filter(leftCols.contains)} collide with left columns")
    val probe = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__is_probe", lit(1))
    // SQL join semantics: NULL keys never match. Window.partitionBy
    // groups NULLs into one partition, so null-key BUILD rows must be
    // dropped or they would enrich null-key probe rows (which correctly
    // pass through with null values, like a left join's unmatched side).
    val build = right.select(
      (col(rightKey).as("__k") +: col(rightTime).as("__t") +:
        valueCols.map(col)): _*)
      .filter(col("__k").isNotNull)
      .withColumn("__is_probe", lit(0))
    val unioned = probe.unionByName(build, allowMissingColumns = true)
    // build rows (tag 0) sort before probe rows (tag 1) on time ties →
    // inclusive "at or before"; explicit ROWS frame keeps the running
    // carry linear and tie-deterministic (build side is unique per
    // (key, time) by contract)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_probe") === 1)
      .select((leftCols ++ valueCols).map(col): _*)
  }
}
