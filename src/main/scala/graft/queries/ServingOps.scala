package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Remaining serving/analytics shapes (SURVEY.md §2.10 Q2/Q7, §2.5 A10).
  *
  *  - q41 distribution stats — A10 (`feature_engineering.py:401-419`
  *    describe/quantile thresholds): exact interpolated percentiles
  *    (Spark `percentile` ≡ DuckDB `quantile_cont`), stddev, extremes.
  *  - q42 point lookup — Q2 (`trino_client.py:147-206`).
  *  - q43 per-key feed — Q7 (`trino_client.py:370-397`).
  */
object ServingOps {

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q41_price_distribution",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
        |  round(stddev_samp(l_extendedprice), 2) AS sd,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      // exact = true is the small-sf oracle twin ONLY (quantile_cont needs
      // interpolated exactness); the production default is the
      // approx_percentile path certified by q60.
      graft.etl.Serving.distributionStats(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice", exact = true)
    },

    QueryDef.sql(
      "q60_price_distribution_approx",
      """SELECT l_returnflag, count(*) AS n,
        |  true AS p25_ok, true AS p50_ok, true AS p75_ok, true AS p90_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      // the scale path for A10: approx_percentile sketches (bounded
      // buffers) + an in-engine rank-error certificate. The sketch values
      // are engine-specific, so the oracle pins the *guarantee*: every
      // returned quantile's true rank must sit within 2/accuracy of its
      // target (the distributed GK-merge bound — see
      // Serving.approxPercentileRankCheck) — all-true booleans hash-match
      // iff the bound holds on the real data.
      graft.etl.Serving.approxPercentileRankCheck(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
        Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75, "p90" -> 0.90))
    },

    // q64: MERGEABLE distinct-count sketches — the rolling 100 TB shape
    // for "distinct users per key over all history": persist per-batch
    // HLL sketches, union increments, never rescan. Estimates are
    // engine-specific binaries, so (q60 pattern) the oracle pins the
    // GUARANTEE: exact counts from DuckDB + all-true certificates that
    // (a) the merged-batch estimate, (b) the single-pass estimate, and
    // (c) their mutual gap sit within 5% (≈3σ at the default lgK=12,
    // rel. err. 1.04/√2¹² ≈ 1.6%) — booleans hash-match iff the bounds
    // hold on the real data.
    QueryDef.sql(
      "q64_hll_incremental",
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  true AS merged_ok, true AS full_ok, true AS merge_consistent
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      // deterministic "daily batch" split; sketches per batch, then union
      val ska = ev.filter(col("event_id") % 2 === 0).groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id")).as("ska"))
      val skb = ev.filter(col("event_id") % 2 =!= 0).groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id")).as("skb"))
      // FULL OUTER: an event_type whose events all land in one parity
      // batch still has a merged estimate (the present sketch alone) —
      // an inner join would drop it while the oracle, grouping all
      // events, still emits its row
      val merged = ska.join(skb, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          hll_sketch_estimate(
            when(col("ska").isNull, col("skb"))
              .when(col("skb").isNull, col("ska"))
              .otherwise(hll_union(col("ska"), col("skb")))).as("est_m"))
      val full = ev.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_f"),
          countDistinct("user_id").as("n_exact"))
      full.join(merged, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("est_m").cast("double") / col("n_exact") - 1.0) <= 0.05)
            .as("merged_ok"),
          (abs(col("est_f").cast("double") / col("n_exact") - 1.0) <= 0.05)
            .as("full_ok"),
          (abs(col("est_m") - col("est_f")).cast("double")
            <= greatest(lit(0.05) * col("n_exact"), lit(1.0)))
            .as("merge_consistent"))
    },

    // q79: mergeable count-min FREQUENCY sketches — the q64 contract for
    // heavy hitters ([[graft.operators.HeavyHitters]]): per-source
    // sketches, cms_union_agg merge (cell-wise addition — bit-identical
    // to a single pass, asserted by merge_exact), estimates certified
    // against the exact 3-gram counts. The oracle pins the exact top-20
    // and the all-true certificates.
    QueryDef.sql(
      "q79_cms_heavy_hitters",
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0) AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(tk) = 0 THEN []
        |    ELSE list_transform(generate_series(1, greatest(len(tk) - 2, 1)),
        |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])) END AS g
        |  FROM toks),
        |occ AS (SELECT unnest(g) AS key FROM sh),
        |c AS (SELECT key, CAST(count(*) AS BIGINT) AS n_exact FROM occ GROUP BY key)
        |SELECT key, n_exact,
        |  true AS est_lower_ok, true AS est_upper_ok,
        |  true AS merge_exact, true AS total_ok
        |FROM c ORDER BY n_exact DESC, key LIMIT 20""".stripMargin) { (s, d) =>
      val posts = graft.operators.Dedup.shinglePostings(
        Tables.documents(s, d), "doc_id", "text", Some("source"), 3)
      graft.operators.HeavyHitters.cmsTopKCertificate(
        posts, keyCol = "shingle", batchCol = "block",
        k = 20, eps = 0.002, confidence = 0.99, seed = 17)
    },

    QueryDef.sql(
      "q42_point_lookup",
      """SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS acctbal,
        |  c_mktsegment
        |FROM customer WHERE c_custkey = 42 LIMIT 1""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") === 42)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("acctbal"), col("c_mktsegment"))
        .limit(1)
    },

    QueryDef.sql(
      "q44_label_buckets",
      """WITH per_user AS (
        |  SELECT user_id, count(*) AS n, sum(value) AS eng FROM events GROUP BY user_id),
        |vel AS (
        |  SELECT user_id, eng / 5.0 * (1.0 + 0.1 * ln(1.0 + n)) AS v FROM per_user),
        |scored AS (
        |  SELECT user_id,
        |    round(100.0 / (1.0 + exp(-0.8 * (
        |      0.5 * (v / greatest(100.0, 1.0)) +
        |      0.3 * (v / greatest(avg(v) OVER (), 1.0)) +
        |      0.2 * 1.0 - 2.0))), 2) AS score
        |  FROM vel),
        |labeled AS (
        |  SELECT score,
        |    CASE WHEN score >= 80 THEN 'Viral' WHEN score >= 60 THEN 'Hot'
        |         WHEN score >= 40 THEN 'Warm' WHEN score >= 25 THEN 'Normal'
        |         ELSE 'Cold' END AS trending_label
        |  FROM scored)
        |SELECT trending_label, count(*) AS n,
        |  round(min(score), 2) AS min_score, round(max(score), 2) AS max_score,
        |  floor(avg(score) * 10000.0 + 0.5) / 10000.0 AS avg_score
        |FROM labeled GROUP BY trending_label""".stripMargin) { (s, d) =>
      import graft.functions.{Scores, TextFunctions}
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("eng"))
        .withColumn("v", Scores.velocity(col("n"), col("eng")))
      val globalAvg = perUser.agg(avg("v").as("global_avg_v"))
      val scored = perUser.crossJoin(broadcast(globalAvg))
        .withColumn("score",
          round(Scores.trendingScore(col("v"), lit(100.0), col("global_avg_v"), lit(0.0)), 2))
        .withColumn("trending_label", Scores.trendingLabel(col("score")))
      // Q9 shape via the serving layer, with cross-engine-safe rounding
      graft.etl.Serving.labelBucketStats(scored, "trending_label", "score")
        .withColumn("avg_score", TextFunctions.round4hu(col("avg_score_raw")))
        .drop("avg_score_raw")
    },

    QueryDef.sql(
      "q43_user_feed",
      """SELECT event_id, event_type, round(value, 2) AS value,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM events WHERE user_id = 7
        |ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC LIMIT 20""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("user_id") === 7)
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(20)
        .select(col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    },

    QueryDef.sql(
      "q53_topk_whitelisted",
      s"""WITH $dimStandInSql
         |SELECT username, platform, followers_count, following_count, verified
         |FROM dim ORDER BY followers_count DESC, username ASC LIMIT 25""".stripMargin) { (s, d) =>
      // Q6 through the serving layer: whitelisted metric, total order
      graft.etl.Serving.topK(dimStandIn(s, d), "followers_count", 25)
    },

    QueryDef.sql(
      "q54_faceted_search",
      s"""WITH $dimStandInSql
         |SELECT username, platform, followers_count, following_count, verified
         |FROM dim
         |WHERE username LIKE '%u1%' AND platform = 'tiktok'
         |  AND followers_count >= 10000 AND followers_count <= 500000
         |  AND verified = true
         |ORDER BY followers_count DESC, username ASC LIMIT 30""".stripMargin) { (s, d) =>
      // Q8 through the serving layer: dynamically assembled facet predicates
      graft.etl.Serving.facetedSearch(dimStandIn(s, d),
        q = Some("u1"), platform = Some("tiktok"),
        minFollowers = Some(10000L), maxFollowers = Some(500000L),
        verifiedOnly = true, limit = 30)
    }
  )

  /** dim_kol stand-in from customer for the serving-layer oracles. */
  private def dimStandIn(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).select(
      concat(lit("u"), col("c_custkey").cast("string")).as("username"),
      element_at(array(lit("tiktok"), lit("youtube"), lit("instagram")),
        (col("c_custkey") % 3).cast("int") + 1).as("platform"),
      greatest((col("c_acctbal") * 100.0).cast("long"), lit(0L)).as("followers_count"),
      ((col("c_custkey") % 500) + 1).as("following_count"),
      (col("c_custkey") % 4 === 0).as("verified"))

  private def dimStandInSql =
    """dim AS (
      |  SELECT 'u' || CAST(c_custkey AS VARCHAR) AS username,
      |    list_extract(['tiktok','youtube','instagram'],
      |      CAST(c_custkey % 3 AS INTEGER) + 1) AS platform,
      |    greatest(CAST(trunc(c_acctbal * 100.0) AS BIGINT), 0) AS followers_count,
      |    (c_custkey % 500) + 1 AS following_count,
      |    c_custkey % 4 = 0 AS verified
      |  FROM customer)""".stripMargin
}
