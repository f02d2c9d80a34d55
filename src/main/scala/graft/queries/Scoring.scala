package graft.queries

import graft.Tables
import graft.functions.Scores
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scoring-formula coverage (SURVEY.md §2.9 U1–U8) on the testdata.
  *
  * The KOL-shaped inputs (followers, engagement…) don't exist in the
  * TPC-H-ish tables, so each query derives deterministic stand-in inputs
  * from keys/measures — the mapping is arbitrary but identical in the
  * Spark build and the DuckDB oracle, so the *formula* is what's verified.
  */
object Scoring {

  /** Deterministic dirty count-string per customer, same construction in
    * Spark and SQL: variants K / M / B / comma-grouped / junk / empty.
    */
  private val rawCountSql =
    """CASE WHEN c_custkey % 11 = 0 THEN '' ELSE
      |  CASE c_custkey % 5
      |    WHEN 0 THEN concat(CAST(c_custkey % 900 AS VARCHAR), '.', CAST(c_custkey % 10 AS VARCHAR), 'K')
      |    WHEN 1 THEN concat(CAST(c_custkey % 90 AS VARCHAR), '.', CAST(c_custkey % 10 AS VARCHAR), 'M')
      |    WHEN 2 THEN concat(CAST(c_custkey % 5 AS VARCHAR), 'B')
      |    WHEN 3 THEN concat(CAST(c_custkey % 9 + 1 AS VARCHAR), ',', lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0'))
      |    ELSE concat('x', CAST(c_custkey AS VARCHAR))
      |  END END""".stripMargin

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q20_count_parse",
      s"""WITH raw AS (
         |  SELECT c_custkey, $rawCountSql AS raw_count FROM customer),
         |norm AS (
         |  SELECT c_custkey, raw_count,
         |         upper(trim(replace(raw_count, ',', ''))) AS s FROM raw),
         |parsed AS (
         |  SELECT c_custkey % 5 AS variant,
         |    CASE WHEN regexp_matches(s, '^-?([0-9]+\\.?[0-9]*|\\.[0-9]+)[KMB]?$$')
         |         THEN CAST(trunc(
         |             CAST(regexp_extract(s, '^(-?([0-9]+\\.?[0-9]*|\\.[0-9]+))', 1) AS DOUBLE) *
         |             (CASE WHEN s LIKE '%B' THEN 1e9 WHEN s LIKE '%M' THEN 1e6
         |                   WHEN s LIKE '%K' THEN 1e3 ELSE 1 END)) AS BIGINT)
         |         ELSE 0 END AS parsed
         |  FROM norm)
         |SELECT variant, count(*) AS n, CAST(sum(parsed) AS BIGINT) AS total,
         |       max(parsed) AS max_parsed, min(parsed) AS min_parsed
         |FROM parsed GROUP BY variant""".stripMargin) { (s, d) =>
      val ck = col("c_custkey")
      val rawCount = when(ck % 11 === 0, "").otherwise(
        when(ck % 5 === 0, concat((ck % 900).cast("string"), lit("."), (ck % 10).cast("string"), lit("K")))
          .when(ck % 5 === 1, concat((ck % 90).cast("string"), lit("."), (ck % 10).cast("string"), lit("M")))
          .when(ck % 5 === 2, concat((ck % 5).cast("string"), lit("B")))
          .when(ck % 5 === 3, concat((ck % 9 + 1).cast("string"), lit(","), lpad((ck % 1000).cast("string"), 3, "0")))
          .otherwise(concat(lit("x"), ck.cast("string"))))
      Tables.customer(s, d)
        .select((ck % 5).as("variant"), Scores.parseCountString(rawCount).as("parsed"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n"), sum("parsed").as("total"),
          max("parsed").as("max_parsed"), min("parsed").as("min_parsed"))
    },

    QueryDef.sql(
      "q21_trending_scores",
      """WITH per_user AS (
        |  SELECT user_id, count(*) AS n, sum(value) AS eng FROM events GROUP BY user_id),
        |vel AS (
        |  SELECT user_id, n, eng,
        |         eng / 5.0 * (1.0 + 0.1 * ln(1.0 + n)) AS v FROM per_user),
        |scored AS (
        |  SELECT user_id, n, eng, v,
        |    100.0 / (1.0 + exp(-0.8 * (
        |      0.5 * (v / greatest(100.0, 1.0)) +
        |      0.3 * (v / greatest(avg(v) OVER (), 1.0)) +
        |      0.2 * (1.0 + 0.0) - 2.0))) AS score
        |  FROM vel)
        |SELECT user_id, n AS event_count, round(eng, 2) AS engagement,
        |  round(v, 4) AS velocity, round(score, 2) AS trending_score,
        |  CASE WHEN score >= 80 THEN 'Viral' WHEN score >= 60 THEN 'Hot'
        |       WHEN score >= 40 THEN 'Warm' WHEN score >= 25 THEN 'Normal'
        |       ELSE 'Cold' END AS trending_label
        |FROM scored""".stripMargin) { (s, d) =>
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("eng"))
        .withColumn("v", Scores.velocity(col("n"), col("eng")))
      val globalAvg = perUser.agg(avg("v").as("global_avg_v"))
      val scored = perUser
        .crossJoin(broadcast(globalAvg))
        .withColumn("score",
          Scores.trendingScore(col("v"), lit(100.0), col("global_avg_v"), lit(0.0)))
      scored.select(
        col("user_id"), col("n").as("event_count"),
        round(col("eng"), 2).as("engagement"),
        round(col("v"), 4).as("velocity"),
        round(col("score"), 2).as("trending_score"),
        Scores.trendingLabel(col("score")).as("trending_label"))
    },

    QueryDef.sql(
      "q22_trust_scores",
      """SELECT c_custkey,
        |  greatest(least(round(
        |    (CASE WHEN c_acctbal > 5000 THEN 20.0 ELSE 0.0 END) +
        |    (CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY') THEN 10.0 ELSE 0.0 END) +
        |    least((c_custkey % 4000) / 365.0 * 20.0, 20.0) +
        |    least(greatest(c_acctbal * 100.0, 0.0) /
        |          greatest((c_custkey % 500) + 1, 1) / 10.0 * 20.0, 20.0) +
        |    (CASE WHEN c_custkey % 10 = 0 THEN -30.0 ELSE 20.0 END)
        |  , 1), 100.0), 0.0) AS trust_score,
        |  CASE WHEN greatest(CAST(trunc(c_acctbal * 100.0) AS BIGINT), 0) >= 1000000 THEN 'Mega'
        |       WHEN greatest(CAST(trunc(c_acctbal * 100.0) AS BIGINT), 0) >= 100000 THEN 'Macro'
        |       WHEN greatest(CAST(trunc(c_acctbal * 100.0) AS BIGINT), 0) >= 10000 THEN 'Micro'
        |       WHEN greatest(CAST(trunc(c_acctbal * 100.0) AS BIGINT), 0) >= 1000 THEN 'Nano'
        |       ELSE 'Rising' END AS kol_tier
        |FROM customer""".stripMargin) { (s, d) =>
      val ck = col("c_custkey")
      val followers = greatest((col("c_acctbal") * 100.0).cast("long"), lit(0L))
      Tables.customer(s, d).select(
        ck.as("c_custkey"),
        Scores.trustScore(
          verified = col("c_acctbal") > 5000,
          hasProfileImage = col("c_mktsegment").isin("BUILDING", "MACHINERY"),
          accountAgeDays = ck % 4000,
          followers = greatest(col("c_acctbal") * 100.0, lit(0.0)),
          following = (ck % 500) + 1,
          isUntrustworthy = when(ck % 10 === 0, 1).otherwise(0)).as("trust_score"),
        Scores.kolTier(followers).as("kol_tier"))
    },

    QueryDef.sql(
      "q23_success_scores",
      """WITH per_cust AS (
        |  SELECT o_custkey, sum(o_totalprice) / 10.0 AS views,
        |         avg(o_totalprice) / 500000.0 AS eng_rate,
        |         count(*) / 100.0 AS est_ctr,
        |         count(*) * 1000.0 AS engagement
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey,
        |  round(least(30.0, views / 50000.0 * 30.0) + least(30.0, eng_rate * 300.0) +
        |        least(20.0, est_ctr * 200.0) + least(20.0, engagement / 5000.0 * 20.0), 2)
        |    AS success_score,
        |  CASE WHEN least(30.0, views / 50000.0 * 30.0) + least(30.0, eng_rate * 300.0) +
        |            least(20.0, est_ctr * 200.0) + least(20.0, engagement / 5000.0 * 20.0) >= 50
        |       THEN 'High' ELSE 'Not-High' END AS success_label
        |FROM per_cust""".stripMargin) { (s, d) =>
      val perCust = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          (sum("o_totalprice") / 10.0).as("views"),
          (avg("o_totalprice") / 500000.0).as("eng_rate"),
          (count(lit(1)) / 100.0).as("est_ctr"),
          (count(lit(1)) * 1000.0).as("engagement"))
      val score = Scores.successScore(col("views"), col("eng_rate"), col("est_ctr"), col("engagement"))
      perCust.select(
        col("o_custkey"),
        round(score, 2).as("success_score"),
        Scores.successLabel(score).as("success_label"))
    },

    QueryDef.sql(
      "q24_composite_scores",
      """WITH trust AS (
        |  SELECT c_custkey,
        |    greatest(least(round(
        |      (CASE WHEN c_acctbal > 5000 THEN 20.0 ELSE 0.0 END) +
        |      (CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY') THEN 10.0 ELSE 0.0 END) +
        |      least((c_custkey % 4000) / 365.0 * 20.0, 20.0) +
        |      least(greatest(c_acctbal * 100.0, 0.0) /
        |            greatest((c_custkey % 500) + 1, 1) / 10.0 * 20.0, 20.0) +
        |      (CASE WHEN c_custkey % 10 = 0 THEN -30.0 ELSE 20.0 END)
        |    , 1), 100.0), 0.0) AS trust_score FROM customer),
        |agg AS (
        |  SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
        |  FROM orders GROUP BY o_custkey),
        |joined AS (
        |  SELECT c_custkey, trust_score,
        |    coalesce(n_orders, 0) AS n_orders, coalesce(spend, 0.0) AS spend
        |  FROM trust LEFT JOIN agg ON c_custkey = o_custkey),
        |scored AS (
        |  SELECT c_custkey, trust_score,
        |    round(100.0 / (1.0 + exp(-0.8 * (n_orders / 5.0 - 2.0))), 2) AS trending_score,
        |    round(least(30.0, spend / 500000.0 * 30.0) +
        |          least(20.0, n_orders * 2.0), 2) AS success_score
        |  FROM joined)
        |SELECT c_custkey, trending_score, success_score, trust_score,
        |  round(0.4 * trending_score + 0.35 * success_score + 0.25 * trust_score, 4)
        |    AS composite_score
        |FROM scored""".stripMargin) { (s, d) =>
      val trust = Tables.customer(s, d).select(
        col("c_custkey"),
        Scores.trustScore(
          verified = col("c_acctbal") > 5000,
          hasProfileImage = col("c_mktsegment").isin("BUILDING", "MACHINERY"),
          accountAgeDays = col("c_custkey") % 4000,
          followers = greatest(col("c_acctbal") * 100.0, lit(0.0)),
          following = (col("c_custkey") % 500) + 1,
          isUntrustworthy = when(col("c_custkey") % 10 === 0, 1).otherwise(0)).as("trust_score"))
      val agg = Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("spend"))
      val joined = trust
        .join(agg, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("trust_score"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("spend"), lit(0.0)).as("spend"))
      val scored = joined
        .withColumn("trending_score",
          round(lit(100.0) / (lit(1.0) + exp(lit(-0.8) * (col("n_orders") / 5.0 - 2.0))), 2))
        .withColumn("success_score",
          round(least(lit(30.0), col("spend") / 500000.0 * 30.0) +
            least(lit(20.0), col("n_orders") * 2.0), 2))
      // round at 4dp: the weighted sum of 2dp/1dp components is exact at 4
      // decimals, so no .xxx5 half-way cases exist — rounding half-way
      // behavior differs between Spark (HALF_UP on the shortest decimal
      // repr) and DuckDB (on the binary double), so any query output must
      // never round at a scale where its values sit exactly on the grid+5.
      scored.select(
        col("c_custkey"), col("trending_score"), col("success_score"), col("trust_score"),
        round(Scores.compositeScore(col("trending_score"), col("success_score"), col("trust_score")), 4)
          .as("composite_score"))
    },

    // U2 with REAL momentum: the reference stubs prev-window engagement to
    // None in-stream (`trending_stream.py:479`), zeroing the 0.2·(1+mom)
    // term. Here the previous hour's engagement feeds it — lag() in this
    // batch twin, the T7 prev-value state operator on the stream
    // (StatefulVelocity; momentum parity stream↔batch is spec-pinned in
    // StreamingSpec "stream momentum equals the batch lag twin").
    QueryDef.sql(
      "q71_momentum_trending",
      """WITH hourly AS (
        |  SELECT user_id,
        |    strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
        |             '%Y-%m-%d %H:%M:%S') AS hour,
        |    count(*) AS n, round(sum(value), 2) AS eng
        |  FROM events GROUP BY 1, 2),
        |base AS (
        |  SELECT user_id, hour, n, eng,
        |    lag(eng) OVER (PARTITION BY user_id ORDER BY hour) AS prev_eng,
        |    eng / 60.0 * (1.0 + 0.1 * ln(1.0 + n)) AS v
        |  FROM hourly),
        |m AS (
        |  SELECT user_id, hour, n, eng, v,
        |    CASE WHEN prev_eng IS NOT NULL AND prev_eng > 0
        |         THEN (eng - prev_eng) / prev_eng ELSE 0.0 END AS mom
        |  FROM base),
        |scored AS (
        |  SELECT user_id, hour, n, eng, mom,
        |    100.0 / (1.0 + exp(-0.8 * (
        |      0.5 * (v / greatest(100.0, 1.0)) +
        |      0.3 * (v / greatest(avg(v) OVER (), 1.0)) +
        |      0.2 * (1.0 + mom) - 2.0))) AS score
        |  FROM m)
        |SELECT user_id, hour, n AS event_count, eng AS engagement,
        |  floor(mom * 10000.0 + 0.5) / 10000.0 AS momentum,
        |  round(score, 2) AS trending_score
        |FROM scored""".stripMargin) { (s, d) =>
      // cache the hourly aggregate: the lag-window branch and the
      // global-average branch both consume it, and neither an explicit
      // repartition nor AQE exchange reuse can share the stage — column
      // pruning gives the two branches different exchange payloads, so
      // the canonicalized plans never match and the events scan +
      // aggregation would run TWICE (verified in the final AQE plan).
      // The cached frame is |users × hours| rows — tiny next to the scan
      // it saves; this is the materialize-the-small-intermediate shape a
      // production pipeline gets by writing the hourly table. The entry
      // stays pinned for the session (no post-consumption unpersist
      // hook), but repeated invocations do NOT accumulate: CacheManager
      // dedupes by canonicalized plan, so it is one bounded entry per
      // data dir. Bench clears the cache before every timed run, so the
      // benched number is end-to-end (scan + aggregate + both branches),
      // comparable to uncached queries (ADVICE r8).
      val hourly = Tables.events(s, d)
        .groupBy(col("user_id"), window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("eng"))
        .select(col("user_id"),
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n"), col("eng"))
        .withColumn("v", Scores.velocity(col("n"), col("eng"), windowMinutes = 60.0))
        .cache()
      val w = Window.partitionBy("user_id").orderBy("hour")
      val base = hourly
        .withColumn("prev_eng", lag(col("eng"), 1).over(w))
        .withColumn("mom", Scores.momentum(col("eng"), col("prev_eng")))
      val scored = base
        .crossJoin(broadcast(hourly.agg(avg("v").as("gv"))))
        .withColumn("score",
          Scores.trendingScore(col("v"), lit(100.0), col("gv"), col("mom")))
      scored.select(col("user_id"), col("hour"),
        col("n").as("event_count"), col("eng").as("engagement"),
        graft.functions.TextFunctions.round4hu(col("mom")).as("momentum"),
        round(col("score"), 2).as("trending_score"))
    },

    QueryDef.sql(
      "q25_time_decay",
      """WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS max_ts FROM events),
        |w AS (
        |  SELECT event_type, value,
        |    exp(-(ln(2.0) / 7.0) *
        |        greatest(date_diff('second', CAST(ts AS TIMESTAMP), max_ts) / 86400.0, 0.0))
        |      AS decay_w,
        |    CASE WHEN value <= 0 THEN 0.1 ELSE
        |      0.1 + 0.9 * least(ln(1.0 + value / 100.0) / ln(101.0), 1.0) END AS eng_w
        |  FROM events, mx)
        |SELECT event_type, count(*) AS n,
        |  floor(sum(decay_w * value) * 10000.0 + 0.5) / 10000.0 AS decayed_value,
        |  floor(avg(decay_w) * 10000.0 + 0.5) / 10000.0 AS avg_decay,
        |  floor(avg(eng_w) * 10000.0 + 0.5) / 10000.0 AS avg_eng_weight
        |FROM w GROUP BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val mx = ev.agg(max("ts").as("max_ts"))
      ev.crossJoin(broadcast(mx))
        .withColumn("delta_days",
          (unix_timestamp(col("max_ts")) - unix_timestamp(col("ts"))) / 86400.0)
        .withColumn("decay_w", Scores.timeDecayWeight(col("delta_days")))
        .withColumn("eng_w", Scores.engagementWeight(col("value"), lit(100.0)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          graft.functions.TextFunctions.round4hu(sum(col("decay_w") * col("value"))).as("decayed_value"),
          graft.functions.TextFunctions.round4hu(avg("decay_w")).as("avg_decay"),
          graft.functions.TextFunctions.round4hu(avg("eng_w")).as("avg_eng_weight"))
    }
  )
}
