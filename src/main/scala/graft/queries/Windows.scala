package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window operator coverage (SURVEY.md §2.8 T2/T3 + §2.6 extensions),
  * verified in batch mode — `window()` has identical bucketing semantics in
  * batch and streaming, so the oracle checks the exact window assignment
  * the hot path uses (the streaming-only parts — watermark, trigger,
  * output mode, state — are covered by MemoryStream specs).
  *
  *  - q26 tumbling window agg  — T3 (`features_stream.py:91-121`)
  *  - q27 sliding window agg   — T2 (`trending_stream.py:458-470`)
  *  - q28 prev-window velocity — T7/W-ext (`kafka_profile_stream.py:111-185`,
  *    done with `lag` instead of the reference's Redis round-trip)
  */
object Windows {

  val all: Seq[QueryDef] = Seq(

    // q66: as-of join ([[graft.operators.AsofJoin]] — union + one running
    // window, a single shuffle on the key) against DuckDB's native
    // ASOF LEFT JOIN: a true cross-engine semantic oracle for the
    // temporal-enrichment primitive. Event times are mapped into the
    // order era on an integer epoch-seconds axis (1995-01-01 +
    // 80×(ts − 2024-01-01), exact BIGINT arithmetic on both engines), so
    // probes land between/before/after build rows and exercise the
    // mid-series match, the inclusive bound and the no-match-null path.
    // q70: bucketized range join ([[graft.operators.RangeJoin]]) — every
    // order landing inside a 14-day "promo window" opened by the same
    // customer's anchor orders (o_orderkey % 100 = 0), on an integral
    // epoch-day axis. The oracle is the plain inequality join; the
    // engine runs the equi-ized (key, bucket) form.
    QueryDef.sql(
      "q70_range_join",
      """WITH pr AS (
        |  SELECT o_orderkey AS promo_id, o_custkey AS pck,
        |    datediff('day', DATE '1970-01-01', o_orderdate) AS ps
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |l AS (
        |  SELECT o_orderkey AS order_key, o_custkey AS ck,
        |    datediff('day', DATE '1970-01-01', o_orderdate) AS t
        |  FROM orders)
        |SELECT p.promo_id, l.order_key,
        |  CAST(l.t - p.ps AS BIGINT) AS day_offset
        |FROM pr p JOIN l ON l.ck = p.pck AND l.t BETWEEN p.ps AND p.ps + 14""".stripMargin) { (s, d) =>
      val promos = Tables.orders(s, d)
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("promo_id"), col("o_custkey").as("pck"),
          datediff(col("o_orderdate"), lit("1970-01-01")).as("ps"))
        .withColumn("pe", col("ps") + 14)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey").as("order_key"), col("o_custkey").as("ck"),
          datediff(col("o_orderdate"), lit("1970-01-01")).as("t"))
      graft.operators.RangeJoin
        .bucketedRangeJoin(orders, "ck", "t", promos, "pck", "ps", "pe",
          bucketWidth = 16)
        .select(col("promo_id"), col("order_key"),
          (col("t") - col("ps")).cast("long").as("day_offset"))
    },

    QueryDef.sql(
      "q66_asof_enrich",
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
        |    788918400 + (CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |                 - 1704067200) * 80 AS pt
        |  FROM events WHERE event_type = 'purchase' AND user_id < 50),
        |ords AS (
        |  SELECT o_custkey AS ck,
        |    CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ot,
        |    max(o_orderkey) AS asof_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts_s, o.asof_orderkey
        |FROM ev e ASOF LEFT JOIN ords o
        |  ON e.user_id = o.ck AND e.pt >= o.ot""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("user_id") < 50)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          (lit(788918400L) +
            (col("ts").cast("long") - lit(1704067200L)) * 80).as("pt"))
      // build side deduped per (key, time) with a deterministic tie-break
      // (max orderkey per customer-day) — the asofJoin contract
      val ords = Tables.orders(s, d)
        .select(col("o_custkey").as("ck"),
          col("o_orderdate").cast("timestamp").cast("long").as("ot"),
          col("o_orderkey"))
        .groupBy("ck", "ot").agg(max("o_orderkey").as("asof_orderkey"))
      graft.operators.AsofJoin
        .asofJoin(ev, "user_id", "pt", ords, "ck", "ot", Seq("asof_orderkey"))
        .select("event_id", "user_id", "ts_s", "asof_orderkey")
    },

    // q72: the SAME temporal enrichment through the skew-resistant
    // bucketed as-of ([[graft.operators.AsofJoin.bucketedAsofJoin]] —
    // row-level window partitioned by (key, time-bucket), carry-in via
    // per-bucket build summaries) against the SAME native ASOF oracle:
    // the mitigation's exact-equality claim, hash-verified cross-engine.
    // Axis spans ~30 years of epoch seconds; width 2^25 s (~1 year)
    // gives a mixed local/carry bucket population.
    QueryDef.sql(
      "q72_asof_bucketed",
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
        |    788918400 + (CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |                 - 1704067200) * 80 AS pt
        |  FROM events WHERE event_type = 'purchase' AND user_id < 50),
        |ords AS (
        |  SELECT o_custkey AS ck,
        |    CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ot,
        |    max(o_orderkey) AS asof_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts_s, o.asof_orderkey
        |FROM ev e ASOF LEFT JOIN ords o
        |  ON e.user_id = o.ck AND e.pt >= o.ot""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("user_id") < 50)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          (lit(788918400L) +
            (col("ts").cast("long") - lit(1704067200L)) * 80).as("pt"))
      val ords = Tables.orders(s, d)
        .select(col("o_custkey").as("ck"),
          col("o_orderdate").cast("timestamp").cast("long").as("ot"),
          col("o_orderkey"))
        .groupBy("ck", "ot").agg(max("o_orderkey").as("asof_orderkey"))
      graft.operators.AsofJoin
        .bucketedAsofJoin(ev, "user_id", "pt", ords, "ck", "ot",
          Seq("asof_orderkey"), bucketWidth = 1L << 25)
        .select("event_id", "user_id", "ts_s", "asof_orderkey")
    },

    QueryDef.sql(
      "q26_tumbling_hourly",
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
        |               '%Y-%m-%d %H:%M:%S') AS wstart,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
        |  floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"),
          graft.functions.TextFunctions.round4hu(avg("value")).as("avg_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n"), col("sum_value"), col("avg_value"))
    },

    QueryDef.sql(
      "q27_sliding_2h_1h",
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
        |               - to_hours(k), '%Y-%m-%d %H:%M:%S') AS wstart,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n"), col("sum_value"))
    },

    QueryDef.sql(
      "q45_sessionization",
      """WITH ordered AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t, value
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, t, value,
        |    CASE WHEN lag(t) OVER w IS NULL
        |              OR date_diff('second', lag(t) OVER w, t) > 1800 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM ordered WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |sessions AS (
        |  SELECT user_id, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events,
        |  floor((count(*) / CAST(max(sid) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
        |    AS avg_events_per_session,
        |  round(sum(value), 2) AS total_value
        |FROM sessions GROUP BY user_id""".stripMargin) { (s, d) =>
      // gaps-and-islands sessionization (30-min inactivity): the batch twin
      // of streaming session_window, W-series beyond the reference
      val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val flagged = Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byTime))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
        .withColumn("sid", sum("new_session").over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      flagged.groupBy("user_id")
        .agg(max("sid").cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"),
          graft.functions.TextFunctions.round4hu(
            count(lit(1)) / max("sid").cast("double")).as("avg_events_per_session"),
          round(sum("value"), 2).as("total_value"))
    },

    QueryDef.sql(
      "q28_hourly_velocity",
      """WITH hourly AS (
        |  SELECT user_id,
        |    strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
        |             '%Y-%m-%d %H:%M:%S') AS hour,
        |    count(*) AS n, round(sum(value), 2) AS eng
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, hour, n, eng,
        |  round(CASE WHEN lag(eng) OVER w IS NULL THEN 0.0
        |             ELSE greatest(eng - lag(eng) OVER w, 0.0) END, 2) AS velocity
        |FROM hourly WINDOW w AS (PARTITION BY user_id ORDER BY hour)""".stripMargin) { (s, d) =>
      val hourly = Tables.events(s, d)
        .groupBy(col("user_id"), window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("eng"))
        .select(col("user_id"),
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n"), col("eng"))
      val w = Window.partitionBy("user_id").orderBy("hour")
      hourly
        .withColumn("prev", lag(col("eng"), 1).over(w))
        .withColumn("velocity",
          round(when(col("prev").isNull, 0.0)
            .otherwise(greatest(col("eng") - col("prev"), lit(0.0))), 2))
        .drop("prev")
    },

    // q157: ordered-step conversion funnel ([[graft.operators.Funnel
    // .stages]]) — view → click → purchase, each stage the user's
    // earliest qualifying event STRICTLY AFTER their previous stage
    // time. Per stage: users reaching it and the exact integral sum of
    // time-to-convert in µs (mean = sum/n). Times compare as
    // epoch-microsecond BIGINTs on both engines; no raw timestamps in
    // the output.
    QueryDef.sql(
      "q157_conversion_funnel",
      """WITH s1 AS (
        |  SELECT user_id AS u, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id AS u, s1.t1,
        |    MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS tk
        |  FROM events e JOIN s1 ON e.user_id = s1.u
        |  WHERE e.event_type = 'click'
        |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) > s1.t1
        |  GROUP BY 1, 2),
        |s3 AS (
        |  SELECT e.user_id AS u, s2.t1,
        |    MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS tk
        |  FROM events e JOIN s2 ON e.user_id = s2.u
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) > s2.tk
        |  GROUP BY 1, 2)
        |SELECT stage, step, n_users, sum_lag_us FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
        |    CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(0 AS BIGINT) AS sum_lag_us FROM s1
        |  UNION ALL
        |  SELECT 2, 'click', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(tk - t1), 0) AS BIGINT) FROM s2
        |  UNION ALL
        |  SELECT 3, 'purchase', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(tk - t1), 0) AS BIGINT) FROM s3)
        |ORDER BY stage""".stripMargin) { (s, d) =>
      graft.operators.Funnel.stages(Tables.events(s, d),
        Seq("view", "click", "purchase"))
    },

    // q158: cohort retention triangle ([[graft.operators.Funnel
    // .retentionCohorts]]) — users bucketed by the integral epoch-week
    // of their first event; for every (cohort, offset) pair the number
    // of that cohort's users active `offset` weeks later. Integer
    // `div` bucketing on epoch-µs — bit-identical edges on both
    // engines.
    QueryDef.sql(
      "q158_retention_cohorts",
      """WITH w AS (
        |  SELECT DISTINCT user_id AS u,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS w
        |  FROM events),
        |c AS (SELECT u, MIN(w) AS cohort_w FROM w GROUP BY u)
        |SELECT CAST(c.cohort_w AS BIGINT) AS cohort_w,
        |  CAST(w.w - c.cohort_w AS BIGINT) AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM w JOIN c USING (u) GROUP BY 1, 2""".stripMargin) { (s, d) =>
      graft.operators.Funnel.retentionCohorts(Tables.events(s, d))
    },

    // q159: last-touch attribution — every purchase credited to the
    // user's latest view/click at-or-before it ([[graft.operators
    // .AsofJoin]] composed over the event log; DuckDB's native ASOF is
    // the cross-engine oracle, the q66 pattern). The "campaign" rides
    // the props payload (regexp-extracted digits mod 5 — identical text
    // both engines); touches dedupe per (user, time) by lexicographic
    // min (the asofJoin build-uniqueness contract); unattributed
    // purchases group under null campaign/touch.
    QueryDef.sql(
      "q159_last_touch_attribution",
      """WITH touches0 AS (
        |  SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
        |    event_type AS touch_type,
        |    CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) % 5
        |      AS campaign
        |  FROM events WHERE event_type IN ('view', 'click')),
        |touches AS (
        |  SELECT u, tu, touch_type, campaign FROM (
        |    SELECT *, row_number() OVER (PARTITION BY u, tu
        |      ORDER BY touch_type, campaign) AS rn
        |    FROM touches0) WHERE rn = 1),
        |p AS (
        |  SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS pu, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT t.touch_type, t.campaign,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  round(sum(p.value), 2) AS attributed_value
        |FROM p ASOF LEFT JOIN touches t
        |  ON p.u = t.u AND t.tu <= p.pu
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), unix_micros(col("ts")).as("tu"),
          struct(col("event_type").as("touch_type"),
            expr("cast(regexp_extract(props, '([0-9]+)', 1) as bigint) % 5")
              .as("campaign")).as("tc"))
        .groupBy("user_id", "tu").agg(min("tc").as("tc"))
        .select(col("user_id"), col("tu"),
          col("tc.touch_type").as("touch_type"),
          col("tc.campaign").as("campaign"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pu"), col("value"))
      graft.operators.AsofJoin
        .asofJoin(purchases, "user_id", "pu", touches, "user_id", "tu",
          Seq("touch_type", "campaign"))
        .groupBy("touch_type", "campaign")
        .agg(count(lit(1)).as("n_purchases"),
          round(sum("value"), 2).as("attributed_value"))
    },

    // q197: view→click interval join ([[graft.streaming
    // .AttributionStream.viewClickPairs]]) — every click joined to the
    // same user's views from the preceding hour. This is the BATCH face
    // of the stream-stream interval join (withWatermark is a no-op
    // here); the streaming twin runs the identical builder over two
    // live streams with watermark-bounded state, spec-pinned equal.
    QueryDef.sql(
      "q197_view_click_interval_join",
      """WITH v AS (
        |  SELECT event_id AS view_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS vu
        |  FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT event_id AS click_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS cu
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id, v.view_id, c.click_id,
        |  CAST((c.cu - v.vu) // 1000000 AS BIGINT) AS lag_s
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND c.cu >= v.vu AND c.cu <= v.vu + 3600000000"""
        .stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      graft.streaming.AttributionStream.viewClickPairs(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "click"), horizonSec = 3600)
    },

    // q204: event-type Markov transition matrix ([[graft.operators
    // .Funnel.transitionMatrix]]) — the empirical journey graph next to
    // q157's prescribed funnel: which event follows which per user,
    // row-normalized in exact micro-units. One lag window PARTITIONED
    // by user (never global), one (from, to) aggregate, broadcast
    // row-totals join.
    QueryDef.sql(
      "q204_event_transitions",
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |      AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
        |  FROM c GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n,
        |  CAST(c.n * 1000000 // t.tot AS BIGINT) AS p_u
        |FROM c JOIN t USING (from_type)""".stripMargin) { (s, d) =>
      graft.operators.Funnel.transitionMatrix(
        Tables.events(s, d), "user_id",
        Seq(unix_micros(col("ts").cast("timestamp")), col("event_id")),
        "event_type")
    },

    // q167: SCD Type-2 compression of the event log ([[graft.operators
    // .Snapshot.scd2Intervals]], the Kimball warehouse-dimension
    // pattern): each user's event-type stream collapses into validity
    // intervals — one row per consecutive run with [from_us, to_us)
    // bounds, to_us null for the open current version. Same-µs
    // collisions collapse by MIN attr first (determinism), versions
    // number from 1 per key in time order. Top-100 longest CLOSED
    // intervals under the (duration desc, key, version) total order —
    // bounded output over the full interval table.
    QueryDef.sql(
      "q167_scd2_intervals",
      """WITH dedup AS (
        |  SELECT user_id AS key, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    min(event_type) AS attr
        |  FROM events GROUP BY 1, 2),
        |runs AS (
        |  SELECT key, ts_us, attr,
        |    CASE WHEN row_number() OVER w = 1 THEN 1
        |         WHEN NOT (lag(attr) OVER w IS NOT DISTINCT FROM attr) THEN 1
        |         ELSE 0 END AS chg
        |  FROM dedup WINDOW w AS (PARTITION BY key ORDER BY ts_us)),
        |v AS (
        |  SELECT key, ts_us, attr,
        |    sum(chg) OVER (PARTITION BY key ORDER BY ts_us) AS version
        |  FROM runs),
        |iv AS (
        |  SELECT key, CAST(version AS BIGINT) AS version,
        |    max(attr) AS value, min(ts_us) AS from_us,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM v GROUP BY key, version),
        |st AS (
        |  SELECT key, version, value, from_us,
        |    lead(from_us) OVER (PARTITION BY key ORDER BY version) AS to_us,
        |    n_rows
        |  FROM iv)
        |SELECT key, version, value, from_us, to_us, n_rows,
        |  CAST(to_us - from_us AS BIGINT) AS dur_us
        |FROM st WHERE to_us IS NOT NULL
        |ORDER BY dur_us DESC, key, version LIMIT 100""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      graft.operators.Snapshot
        .scd2Intervals(ev, "user_id", "event_type", "ts_us")
        .where(col("to_us").isNotNull)
        .withColumn("dur_us", (col("to_us") - col("from_us")).cast("long"))
        .orderBy(col("dur_us").desc, col("key"), col("version"))
        .limit(100)
    },

    // q173: CUSUM volume-drift statistics per event type ([[graft
    // .operators.Funnel.cusumDrift]], Page 1954) — the sequential
    // change detector next to q99/q132's point-in-time drift: daily
    // event volumes against the flat reference total div n_days,
    // cumulative deviations kept exact by summing n·xᵢ − total (no
    // per-bucket division remainder), silent days filled as zero
    // volume across each type's active span. Reported: max positive /
    // negative excursion + the earliest bucket achieving the absolute
    // peak.
    QueryDef.sql(
      "q173_cusum_drift",
      """WITH counts AS (
        |  SELECT event_type AS grp,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS b,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT grp, min(b) AS b0, max(b) AS b1
        |          FROM counts GROUP BY grp),
        |fb AS (SELECT grp, b0, unnest(generate_series(b0, b1)) AS b
        |       FROM spans),
        |filled AS (
        |  SELECT f.grp, CAST(f.b - f.b0 AS BIGINT) AS t,
        |    coalesce(c.x, 0) AS x
        |  FROM fb f LEFT JOIN counts c ON c.grp = f.grp AND c.b = f.b),
        |tot AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n_buckets,
        |    CAST(sum(x) AS BIGINT) AS total
        |  FROM filled GROUP BY grp),
        |cs AS (
        |  SELECT f.grp, f.t,
        |    sum(f.x * tt.n_buckets - tt.total)
        |      OVER (PARTITION BY f.grp ORDER BY f.t) AS s
        |  FROM filled f JOIN tot tt USING (grp)),
        |st AS (
        |  SELECT grp, CAST(greatest(max(s), 0) AS BIGINT) AS max_pos,
        |    CAST(greatest(-min(s), 0) AS BIGINT) AS max_neg,
        |    max(abs(s)) AS mxs
        |  FROM cs GROUP BY grp),
        |pk AS (
        |  SELECT cs.grp, CAST(min(cs.t) AS BIGINT) AS peak_t
        |  FROM cs JOIN st ON cs.grp = st.grp AND abs(cs.s) = st.mxs
        |  GROUP BY cs.grp)
        |SELECT t.grp AS event_type, t.n_buckets, t.total,
        |  st.max_pos, st.max_neg, pk.peak_t
        |FROM tot t JOIN st USING (grp) JOIN pk USING (grp)""".stripMargin) {
      (s, d) =>
      graft.operators.Funnel
        .cusumDrift(Tables.events(s, d), "event_type", "ts")
    }
  )
}
