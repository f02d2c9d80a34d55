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

  /** Salted equi-join for a skewed probe side: probe rows get a random-ish
    * deterministic salt in [0, salts); the build side is exploded `salts`×
    * so every (key, salt) bucket finds its match. Build-side blowup is the
    * price — use only when the build side is modest and the probe side's
    * key histogram is pathological.
    */
  def saltedJoin(skewed: DataFrame, build: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
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
}
