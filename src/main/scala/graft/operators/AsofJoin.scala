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
  * (measured: see PERF_NOTES "as-of under key skew" — 1.1× at 1M rows
  * growing to ~3–4× at 16M with half the rows on one key). When a key
  * histogram ([[Skew.keyHistogram]]) shows a hot key, use
  * [[bucketedAsofJoin]]: same semantics, row-level work partitioned by
  * (key, time-bucket), measured back at uniform wall on the same ladder
  * (13.8 s → 3.4 s at the 16M rung). Below the crossover (~4M rows here)
  * its extra stages cost more than the skew — prefer this plain variant
  * for uniform or small-key data. Uniform-key scaling is linear.
  */
object AsofJoin {

  /** Temp column names the plain formulation claims for itself. */
  private val Reserved = Seq("__k", "__t", "__is_probe", "__vals")

  /** [[bucketedAsofJoin]] additionally claims these (a user column named
    * `__b` would be silently overwritten by the bucket id and returned
    * corrupted through the final `leftCols` select; the others only ever
    * live on internal narrow frames, but are reserved alike).
    */
  private val ReservedBucketed =
    Reserved ++ Seq("__b", "__tag", "__sum", "__carry", "__last")

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

  /** [[asofJoin]] with the hot-key ceiling removed: row-level work is
    * partitioned by (key, time-BUCKET) instead of key alone, so one
    * pathological key parallelizes across its time range instead of
    * serializing through a single task (measured 3× at 16M rows with 50%
    * of rows on one key — PERF_NOTES "as-of under key skew"; this
    * variant restores ~uniform wall on the same ladder).
    *
    * How the cross-bucket dependency is broken: per (key, bucket) the
    * build side reduces to ONE summary row (its latest build row — an
    * aggregate, parallel); a running window over those summaries per key
    * — cardinality #buckets, not #rows — yields each bucket's CARRY-IN
    * (the latest build row from any earlier bucket), which is injected
    * into the bucket as a synthetic build row sorting before everything
    * local. One window per (key, bucket) then produces exact [[asofJoin]]
    * semantics: a probe matches the latest local build row at-or-before
    * it, or the carry-in, or nothing. Same contract as [[asofJoin]]
    * (build unique per (key, time), inclusive ties, null keys/times never
    * match, struct-carried row integrity); times must be integral.
    * Equality with [[asofJoin]] is spec-pinned on planted and randomized
    * frames.
    *
    * `bucketWidth` trades skew spread against overhead: the per-key
    * summary window holds span/bucketWidth rows; pick it so a hot key's
    * per-bucket slice fits a task comfortably (e.g. time span / (10 ×
    * cores)). Degenerate widths still give correct results — one giant
    * bucket degrades to [[asofJoin]]'s shape, tiny buckets shift work
    * into the summary window.
    */
  def bucketedAsofJoin(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      valueCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(valueCols.nonEmpty, "bucketedAsofJoin needs at least one value column")
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"value columns ${valueCols.filter(leftCols.contains)} collide with left columns")
    val reservedClash = (leftCols ++ right.columns).filter(ReservedBucketed.contains)
    require(reservedClash.isEmpty,
      s"columns ${reservedClash.distinct} collide with bucketedAsofJoin's reserved temp names $ReservedBucketed")

    val probe = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__is_probe", lit(1))
    val build = right.select(col(rightKey).as("__k"),
        col(rightTime).cast("long").as("__t"),
        struct(valueCols.map(col): _*).as("__vals"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)
      .withColumn("__is_probe", lit(0))
    // exact integral division (a double floor() mis-buckets past 2^53,
    // e.g. epoch-micros); SQL div truncates toward zero rather than
    // flooring, which only skews bucket WIDTHS around t=0 — bucketing
    // stays monotone in t, which is all correctness needs
    val bucketCol = expr(s"CAST(__t AS BIGINT) div $bucketWidth")

    // (1) one summary row per (key, bucket): the bucket's LATEST build
    // row — max over the (time, values) struct matches asofJoin's result
    // because build is unique per (key, time) by contract (value columns
    // must be orderable types here; the plain variant has no such bound)
    val bSum = build
      .withColumn("__b", bucketCol)
      .groupBy("__k", "__b")
      .agg(max(struct(col("__t"), col("__vals"))).as("__last"))

    // (2) carry-in per PROBE bucket: latest summary from any STRICTLY
    // earlier bucket. Probe-bucket markers sort before same-bucket build
    // summaries (tag 0 < 1), so the running carry at a marker sees only
    // earlier buckets. Window cardinality = #buckets per key, not #rows.
    val probeBuckets = probe
      .filter(col("__k").isNotNull && col("__t").isNotNull)
      .withColumn("__b", bucketCol)
      .select(col("__k"), col("__b")).distinct()
      .withColumn("__tag", lit(0))
    val carryW = Window.partitionBy("__k")
      .orderBy(col("__b").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carryIn = probeBuckets
      .unionByName(bSum.select(col("__k"), col("__b"), lit(1).as("__tag"),
        col("__last").as("__sum")), allowMissingColumns = true)
      .withColumn("__carry", last(col("__sum"), ignoreNulls = true).over(carryW))
      .filter(col("__tag") === 0)
      .select(col("__k"), col("__b"), col("__carry"))

    // (3) synthetic build row per probe bucket from the carry-in; sorts
    // before every local row via tag -1 on time ties and t <= bucket start
    val synthetic = carryIn.filter(col("__carry").isNotNull)
      .select(col("__k"), col("__b"),
        col("__carry.__t").as("__t"),
        col("__carry.__vals").as("__vals"),
        lit(-1).as("__is_probe"))

    // (4) local window per (key, bucket): carry-in < build < probe on
    // ties; the hot key's buckets land in DIFFERENT tasks
    val localUnion = probe.withColumn("__b", bucketCol)
      .unionByName(build.withColumn("__b", bucketCol),
        allowMissingColumns = true)
      .unionByName(synthetic, allowMissingColumns = true)
    val localW = Window.partitionBy("__k", "__b")
      .orderBy(col("__t").asc, col("__is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    localUnion
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(localW))
      .filter(col("__is_probe") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("__vals").getField(c).as(c)): _*)
  }
}
