package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (the charter's "salting for skew").
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the two cases it doesn't: hot-key *aggregations* and
  * broadcast-ineligible joins against a hot-keyed build side. Both use
  * deterministic salts so re-runs are reproducible.
  */
object Skew {

  /** Two-stage salted aggregation: partial aggregate on (keys, salt) —
    * spreading a hot key over `salts` reducers — then final aggregate on
    * keys. Caller supplies algebraic partial/final pairs (sum/sum,
    * count/sum, min/min, …).
    *
    * The salt is derived from the whole row hash, so identical duplicate
    * rows still spread only as far as their distinct content allows;
    * `spark_partition_id`-mixing covers the identical-duplicates case.
    *
    * Cost note: stage 1's key space is `|keys| × salts` and TWO shuffles
    * replace one. On an already-high-cardinality key set (no key holding
    * more than a reducer's worth of rows) that is pure overhead — map-side
    * partial aggregation already bounds each reducer. Salt only when a key
    * histogram shows a hot key; [[saltedAggregateAuto]] makes that call
    * from a measured histogram.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int)(
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*), spark_partition_id()), lit(salts)))
    val stage1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Join types for which exploding the build side `salts`× cannot change
    * the result: the probe side keeps exactly one salt per row, and
    * unmatched BUILD rows never reach the output. `right`/`full`/
    * `left_outer`-of-the-build would emit each unmatched build row once
    * per salt — silent row multiplication — so they are rejected.
    */
  private val SaltSafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "semi", "left_anti", "leftanti", "anti")

  /** Salted equi-join for a skewed probe side: probe rows get a random-ish
    * deterministic salt in [0, salts); the build side is exploded `salts`×
    * so every (key, salt) bucket finds its match. Build-side blowup is the
    * price — use only when the build side is modest and the probe side's
    * key histogram is pathological.
    */
  def saltedJoin(skewed: DataFrame, build: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(SaltSafeJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, got '$joinType': " +
        "the exploded build side would emit each unmatched build row " +
        s"$salts times under right/full outer semantics")
    val saltedProbe = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col): _*), spark_partition_id()), lit(salts)))
    val exploded = build.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedProbe.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Key histogram: rows per key, descending — the observability query to
    * decide whether salting is needed and with how many buckets.
    */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
      .limit(topN)

  /** [[saltedAggregate]] that decides FROM A MEASURED HISTOGRAM whether
    * salting pays: if no key exceeds `hotKeyThreshold` rows it degrades
    * to `salts = 1` — stage 1's key space is the plain key space and
    * stage 2 regroups one row per key, so the blowup the scaladoc above
    * warns about never happens; otherwise it salts so the hottest key
    * spreads into ~`hotKeyThreshold`-sized slices, capped at `maxSalts`.
    * The histogram probe is one extra pass over the input — worth it when
    * the input is reused (cached/checkpointed) or the aggregate is part
    * of a repeated pipeline; for one-shot ad-hoc queries prefer AQE or a
    * fixed, known `salts`.
    */
  def saltedAggregateAuto(df: DataFrame, keys: Seq[String],
      hotKeyThreshold: Long = 2000000L, maxSalts: Int = 64)(
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    require(hotKeyThreshold > 0 && maxSalts >= 1,
      s"need hotKeyThreshold > 0 and maxSalts >= 1, got $hotKeyThreshold/$maxSalts")
    val hottest = keyHistogram(df, keys, topN = 1).collect()
      .headOption.map(_.getAs[Long]("n_rows")).getOrElse(0L)
    val salts =
      if (hottest <= hotKeyThreshold) 1
      else math.min(maxSalts.toLong,
        (hottest + hotKeyThreshold - 1) / hotKeyThreshold).toInt
    saltedAggregate(df, keys, salts)(partial, finalAgg)
  }
}
