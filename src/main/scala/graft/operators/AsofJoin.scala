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
  * Value columns are carried as ONE struct, so the enrichment is always
  * a single intact build row — a build row holding NULL in one value
  * column contributes that null, never a mix of columns from different
  * build rows.
  *
  * Scale ceiling — key skew: `Window.partitionBy(key)` places a key's
  * ENTIRE probe+build history in one task; one pathological hot key
  * serializes on a single core while the rest of the cluster idles
  * (measured: see PERF_NOTES "as-of under key skew"). Mitigations when a
  * key histogram shows a hot key: coarse time-bucket pre-partitioning
  * with a carry-in row per bucket (turns the axis into part of the
  * shuffle key, like [[RangeJoin]]), or splitting the hot key's probes
  * and merging. Uniform-key scaling is linear (rehearsal ladder).
  */
object AsofJoin {

  /** Temp column names the formulation claims for itself. */
  private val Reserved = Seq("__k", "__t", "__is_probe", "__vals")

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
    val reservedClash = (leftCols ++ right.columns).filter(Reserved.contains)
    require(reservedClash.isEmpty,
      s"columns ${reservedClash.distinct} collide with asofJoin's reserved temp names $Reserved")
    val probe = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__is_probe", lit(1))
    // SQL join semantics: NULL keys never match, and a NULL build time
    // never satisfies `bt <= pt` (DuckDB ASOF parity). Both must be
    // filtered: Window.partitionBy groups NULL keys into one partition
    // (a null-key build row would enrich null-key probe rows), and nulls
    // sort FIRST under asc ordering (an unfiltered null-time build row
    // would be carried into every probe row that has no earlier real
    // build row — a ghost match). Probe rows with a null key or time
    // pass through UNMATCHED by the same nulls-first ordering, like a
    // left join's unmatched side.
    val build = right.select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        struct(valueCols.map(col): _*).as("__vals"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)
      .withColumn("__is_probe", lit(0))
    val unioned = probe.unionByName(build, allowMissingColumns = true)
    // build rows (tag 0) sort before probe rows (tag 1) on time ties →
    // inclusive "at or before"; explicit ROWS frame keeps the running
    // carry linear and tie-deterministic (build side is unique per
    // (key, time) by contract). ONE last() over the value struct — probe
    // rows union in a null struct (skipped by ignoreNulls), build rows'
    // struct is never null even when its FIELDS are, so the carried
    // enrichment is always one intact build row.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__vals",
      last(col("__vals"), ignoreNulls = true).over(w))
    carried.filter(col("__is_probe") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("__vals").getField(c).as(c)): _*)
  }
}
