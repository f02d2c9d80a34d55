package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.1–§2.7) expressed on the
  * driver's TPC-H-ish testdata. Each query is the Spark-idiomatic form of a
  * reference operator family:
  *
  *  - q01 multi-measure hash agg  — A1 (`bronze_to_silver.py:552-566`)
  *  - q02 top-k                   — O3 (`trino_client.py:337-358`)
  *  - q03 dim joins               — J1/J3 (`silver_to_gold.py:161-199,589-598`)
  *  - q04 filter+derived measure  — P8/P20
  *  - q05 conditional agg         — A5 (`trino_client.py:268`)
  *  - q06 distinct count          — A2 (`silver_to_gold.py:575-586`)
  *  - q07 latest-per-key window   — W1 (`product_tracker.py:286-294`)
  *  - q08 deterministic dedupe    — A8/O5 (dropDuplicates w/ recency tie-break,
  *                                  SURVEY §7.4 hard-part 3)
  *  - q09 unionByName reconcile   — O4 (`bronze_to_silver.py:225-227`)
  *  - q10 substring search        — Q3 (`trino_client.py:208-252`)
  *  - q11 global stats            — Q4/A3 (`trino_client.py:258-289`)
  *  - q12 pagination              — Q1/O2 (`trino_client.py:112-139`)
  *  - q13 per-group stats         — Q5 (`trino_client.py:291-321`)
  *  - q14 date kit                — P19 (`silver_to_gold.py:326-343`)
  *  - q15 CASE-WHEN tiers         — P7 (`silver_to_gold.py:453-467`)
  *  - q16 regexp extraction       — P10 (`bronze_to_silver.py:168-175`)
  *  - q17 math transforms         — P13/P14/P15 (`feature_engineering.py:176-216`)
  *  - q18 anti join               — (beyond reference: NOT EXISTS shape)
  *  - q19 semi join               — (beyond reference: EXISTS shape)
  *
  * All joins against nation/region/supplier-sized dims are explicitly
  * `broadcast(...)` — at 100 TB the fact side never shuffles for these.
  */
object Relational {

  val all: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2)                                        AS sum_qty,
        |  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2)              AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |  floor(avg(l_quantity) * 10000.0 + 0.5) / 10000.0                 AS avg_qty,
        |  floor(avg(l_extendedprice) * 10000.0 + 0.5) / 10000.0            AS avg_price,
        |  floor(avg(l_discount) * 10000.0 + 0.5) / 10000.0                 AS avg_disc,
        |  count(*)                                                         AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          graft.functions.TextFunctions.round4hu(avg("l_quantity")).as("avg_qty"),
          graft.functions.TextFunctions.round4hu(avg("l_extendedprice")).as("avg_price"),
          graft.functions.TextFunctions.round4hu(avg("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    QueryDef.sql(
      "q02_topk_customers",
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 50""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(50)
    },

    QueryDef.sql(
      "q03_region_rollup",
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  round(sum(c_acctbal), 2) AS sum_bal, floor(avg(c_acctbal) * 10000.0 + 0.5) / 10000.0 AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("n_cust"),
          round(sum("c_acctbal"), 2).as("sum_bal"),
          graft.functions.TextFunctions.round4hu(avg("c_acctbal")).as("avg_bal"))
    },

    QueryDef.sql(
      "q04_revenue_filter",
      """SELECT l_returnflag, round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE year(l_shipdate) = 1997 AND l_discount BETWEEN 0.02 AND 0.08
        |  AND l_quantity < 24
        |GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(year(col("l_shipdate")) === 1997 &&
          col("l_discount").between(0.02, 0.08) && col("l_quantity") < 24)
        .groupBy("l_returnflag")
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))
    },

    QueryDef.sql(
      "q05_priority_conditional",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  floor(avg(o_totalprice) * 10000.0 + 0.5) / 10000.0 AS avg_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("o_totalprice") > 150000, 1L).otherwise(0L)).as("n_big"),
          graft.functions.TextFunctions.round4hu(avg("o_totalprice")).as("avg_price"))
    },

    QueryDef.sql(
      "q06_distinct_customers",
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct("o_custkey").as("n_cust"), count(lit(1)).as("n"))
    },

    QueryDef.sql(
      "q07_latest_event_per_user",
      """SELECT user_id, event_id, event_type, round(value, 2) AS value,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    },

    QueryDef.sql(
      "q08_dedupe_latest",
      """SELECT user_id, event_type, event_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
      graft.operators.Dedup.latestPerKey(
        Tables.events(s, d), Seq("user_id", "event_type"),
        Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_type"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    },

    QueryDef.sql(
      "q09_union_reconcile",
      """SELECT src, nationkey, count(*) AS n, round(sum(acctbal), 2) AS sum_bal,
        |  count(mktsegment) AS n_seg
        |FROM (
        |  SELECT s_name AS name, s_nationkey AS nationkey, s_acctbal AS acctbal,
        |         'supplier' AS src, NULL AS mktsegment FROM supplier
        |  UNION ALL
        |  SELECT c_name, c_nationkey, c_acctbal, 'customer', c_mktsegment FROM customer
        |) GROUP BY src, nationkey""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d).select(
        col("s_name").as("name"), col("s_nationkey").as("nationkey"),
        col("s_acctbal").as("acctbal"), lit("supplier").as("src"))
      val cus = Tables.customer(s, d).select(
        col("c_name").as("name"), col("c_nationkey").as("nationkey"),
        col("c_acctbal").as("acctbal"), lit("customer").as("src"),
        col("c_mktsegment").as("mktsegment"))
      sup.unionByName(cus, allowMissingColumns = true)
        .groupBy("src", "nationkey")
        .agg(count(lit(1)).as("n"), round(sum("acctbal"), 2).as("sum_bal"),
          count(col("mktsegment")).as("n_seg"))
    },

    QueryDef.sql(
      "q10_search_parts",
      """SELECT p_partkey, p_name, p_brand, round(p_retailprice, 2) AS price
        |FROM part
        |WHERE lower(p_name) LIKE '%widget%' AND p_size >= 20
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(lower(col("p_name")).like("%widget%") && col("p_size") >= 20)
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          round(col("p_retailprice"), 2).as("price"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        .limit(20)
    },

    QueryDef.sql(
      "q11_global_stats",
      """SELECT count(*) AS n_customers, count(DISTINCT c_nationkey) AS n_nations,
        |  round(sum(c_acctbal), 2) AS total_bal, floor(avg(c_acctbal) * 10000.0 + 0.5) / 10000.0 AS avg_bal,
        |  CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.customer(s, d).agg(
        count(lit(1)).as("n_customers"),
        countDistinct("c_nationkey").as("n_nations"),
        round(sum("c_acctbal"), 2).as("total_bal"),
        graft.functions.TextFunctions.round4hu(avg("c_acctbal")).as("avg_bal"),
        sum(when(col("c_acctbal") > 0, 1L).otherwise(0L)).as("n_positive"))
    },

    QueryDef.sql(
      "q12_page2",
      """SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS acctbal
        |FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 20 OFFSET 20""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .offset(20)
        .limit(20)
    },

    QueryDef.sql(
      "q13_event_type_stats",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
        |  round(avg(value), 4) AS avg_value, round(max(value), 2) AS max_value,
        |  round(min(value), 2) AS min_value, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"),
          round(avg("value"), 4).as("avg_value"), round(max("value"), 2).as("max_value"),
          round(min("value"), 2).as("min_value"), countDistinct("user_id").as("n_users"))
    },

    QueryDef.sql(
      "q14_orders_by_quarter",
      """SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        |  strftime(o_orderdate, '%Y-%m') AS ym_first, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY year(o_orderdate), quarter(o_orderdate), strftime(o_orderdate, '%Y-%m')""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym_first"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    },

    QueryDef.sql(
      "q15_customer_tiers",
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 2000 THEN 'low'
        |            WHEN c_acctbal < 6000 THEN 'mid'
        |            ELSE 'high' END AS tier,
        |  count(*) AS n, round(min(c_acctbal), 2) AS min_bal,
        |  round(max(c_acctbal), 2) AS max_bal
        |FROM customer GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .withColumn("tier",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 2000, "low")
            .when(col("c_acctbal") < 6000, "mid")
            .otherwise("high"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"), round(min("c_acctbal"), 2).as("min_bal"),
          round(max("c_acctbal"), 2).as("max_bal"))
    },

    QueryDef.sql(
      "q16_props_extract",
      """SELECT event_type,
        |  round(avg(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)), 4) AS avg_k,
        |  max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k,
        |  min(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS min_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val k = regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
      Tables.events(s, d)
        .withColumn("k", k)
        .groupBy("event_type")
        .agg(round(avg("k"), 4).as("avg_k"), max("k").as("max_k"),
          min("k").as("min_k"), count(lit(1)).as("n"))
    },

    QueryDef.sql(
      "q17_math_transforms",
      """SELECT l_linestatus,
        |  round(sum(ln(1.0 + l_quantity)), 2) AS sum_log_qty,
        |  round(avg(sqrt(l_extendedprice)), 4) AS avg_sqrt_price,
        |  round(sum(least(l_extendedprice * l_discount, 1000.0)), 2) AS sum_capped_disc,
        |  round(max(greatest(l_quantity, l_tax * 100.0)), 2) AS max_mixed
        |FROM lineitem GROUP BY l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          round(sum(log1p(col("l_quantity"))), 2).as("sum_log_qty"),
          round(avg(sqrt(col("l_extendedprice"))), 4).as("avg_sqrt_price"),
          round(sum(least(col("l_extendedprice") * col("l_discount"), lit(1000.0))), 2).as("sum_capped_disc"),
          round(max(greatest(col("l_quantity"), col("l_tax") * 100.0)), 2).as("max_mixed"))
    },

    QueryDef.sql(
      "q18_customers_no_orders",
      """SELECT c_nationkey, count(*) AS n
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
        |GROUP BY c_nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(year(col("o_orderdate")) === 1995),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"))
    },

    QueryDef.sql(
      "q19_active_customer_segments",
      """SELECT c_mktsegment, count(*) AS n, floor(avg(c_acctbal) * 10000.0 + 0.5) / 10000.0 AS avg_bal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), graft.functions.TextFunctions.round4hu(avg("c_acctbal")).as("avg_bal"))
    },

    // q67/q68: the skew-mitigation operators under hash verification —
    // salting must be INVISIBLE in the result, so the oracles are the
    // plain unsalted SQL. Aggregates are integer-exact (quantity is an
    // integer-valued double, counts/keys are longs), so two-stage
    // summation cannot drift from DuckDB's single pass.
    QueryDef.sql(
      "q67_salted_aggregate",
      """SELECT l_returnflag,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      // l_returnflag has 3 values over the whole table — exactly the hot
      // grouping key salting exists for; 32 salts spread each key over
      // the full reducer count before the 3-row final aggregate
      graft.operators.Skew.saltedAggregate(
        Tables.lineitem(s, d).select("l_returnflag", "l_quantity"),
        Seq("l_returnflag"), salts = 32)(
        partial = Seq(sum("l_quantity").as("s_"), count(lit(1)).as("c_")),
        finalAgg = Seq(sum("s_").cast("long").as("sum_qty"),
          sum("c_").cast("long").as("n")))
    },

    QueryDef.sql(
      "q68_salted_join",
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      val probe = Tables.orders(s, d)
        .select(col("o_custkey").as("jk"), col("o_custkey"), col("o_orderkey"))
      val build = Tables.customer(s, d)
        .select(col("c_custkey").as("jk"), col("c_mktsegment"))
      graft.operators.Skew.saltedJoin(probe, build, "jk", salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct("o_custkey").as("n_customers"),
          min("o_orderkey").as("min_ok"), max("o_orderkey").as("max_ok"))
    },

    // q100: Z-order file layout ([[graft.operators.Layout]]) — Morton-
    // interleave (l_partkey, l_suppkey), assign rows to fixed-size
    // "files" in key order, and report each file's per-dimension
    // min/max span: the file-level statistics a scan would prune on.
    // Z-ordering keeps BOTH spans narrow (lexicographic keeps only the
    // leading one) — the q-visible pin of the layout, since the span
    // columns are exactly what makes predicates on either dimension
    // skip files. The oracle replays the identical bit arithmetic; the
    // production write path is [[graft.operators.Layout.clusterByZOrder]]
    // (sampled range partitioning — no global window), the rn
    // formulation here is the deterministic cross-engine pin.
    QueryDef.sql(
      "q100_zorder_layout",
      s"""WITH z0 AS (
         |  SELECT l_orderkey, l_linenumber,
         |    (l_partkey % 65536) AS x, (l_suppkey % 65536) AS y
         |  FROM lineitem),
         |z AS (
         |  SELECT *, ${graft.operators.Layout.zOrderKey2Sql("x", "y", 16)}
         |    AS zkey
         |  FROM z0),
         |r AS (
         |  SELECT *, (row_number() OVER
         |    (ORDER BY zkey, l_orderkey, l_linenumber) - 1) // 4096 AS file_id
         |  FROM z)
         |SELECT CAST(file_id AS BIGINT) AS file_id,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(x) AS min_part, max(x) AS max_part,
         |  CAST(max(x) - min(x) + 1 AS BIGINT) AS part_span,
         |  min(y) AS min_supp, max(y) AS max_supp,
         |  CAST(max(y) - min(y) + 1 AS BIGINT) AS supp_span
         |FROM r GROUP BY file_id""".stripMargin) { (s, d) =>
      val z = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(65536L)).as("x"),
          pmod(col("l_suppkey"), lit(65536L)).as("y"))
        .withColumn("zkey",
          graft.operators.Layout.zOrderKey2(col("x"), col("y"), 16))
      z.withColumn("file_id",
          expr("(row_number() OVER (ORDER BY zkey, l_orderkey, l_linenumber)" +
            " - 1) div 4096").cast("long"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("x").as("min_part"), max("x").as("max_part"),
          (max("x") - min("x") + 1).cast("long").as("part_span"),
          min("y").as("min_supp"), max("y").as("max_supp"),
          (max("y") - min("y") + 1).cast("long").as("supp_span"))
    },

    // q209: 3-D Hilbert vs Morton file layout ([[graft.operators.Layout
    // .hilbertKey]]/[[graft.operators.Layout.zOrderKeyN]] — VERDICT r12
    // #6): q100 generalized to the 3–4-dim clustering real lakehouse
    // specs use, with BOTH curves' per-file per-dimension spans in one
    // result so the locality comparison is itself hash-pinned. The
    // Hilbert side is the Skilling (2004) kernel as a codegen'd
    // Catalyst expression; the oracle replays the SAME state machine as
    // an unrolled CTE chain ([[graft.operators.Layout.hilbertSqlCtes]])
    // — the loop is sequential per bit level, so the SQL twin is one
    // CTE per invert/exchange step. LayoutAndDriftSpec pins hilbert ≤
    // morton on bounding-box volume and span sum.
    QueryDef.sql(
      "q209_hilbert_layout",
      s"""WITH z0 AS (
         |  SELECT l_orderkey, l_linenumber,
         |    (l_partkey % 32) AS px, (l_suppkey % 32) AS sy,
         |    (l_orderkey % 32) AS oz,
         |    (l_partkey % 32) AS x0, (l_suppkey % 32) AS x1,
         |    (l_orderkey % 32) AS x2
         |  FROM lineitem),
         |${graft.operators.Layout.hilbertSqlCtes(3, 5,
            Seq("l_orderkey", "l_linenumber", "px", "sy", "oz"), "z0")},
         |hr AS (
         |  SELECT px, sy, oz, (row_number() OVER
         |    (ORDER BY hkey, l_orderkey, l_linenumber) - 1) // 1500 AS file_id
         |  FROM h_key),
         |mk AS (
         |  SELECT px, sy, oz, l_orderkey, l_linenumber,
         |    ${graft.operators.Layout.zOrderKeyNSql(Seq("x0", "x1", "x2"), 5)}
         |      AS mkey
         |  FROM z0),
         |mr AS (
         |  SELECT px, sy, oz, (row_number() OVER
         |    (ORDER BY mkey, l_orderkey, l_linenumber) - 1) // 1500 AS file_id
         |  FROM mk),
         |agg AS (
         |  SELECT 'hilbert' AS curve, file_id, px, sy, oz FROM hr
         |  UNION ALL
         |  SELECT 'morton' AS curve, file_id, px, sy, oz FROM mr)
         |SELECT curve, CAST(file_id AS BIGINT) AS file_id,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(px) AS min_x, max(px) AS max_x,
         |  CAST(max(px) - min(px) + 1 AS BIGINT) AS span_x,
         |  min(sy) AS min_y, max(sy) AS max_y,
         |  CAST(max(sy) - min(sy) + 1 AS BIGINT) AS span_y,
         |  min(oz) AS min_z, max(oz) AS max_z,
         |  CAST(max(oz) - min(oz) + 1 AS BIGINT) AS span_z
         |FROM agg GROUP BY curve, file_id""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(32L)).as("px"),
          pmod(col("l_suppkey"), lit(32L)).as("sy"),
          pmod(col("l_orderkey"), lit(32L)).as("oz"))
      val dims = Seq(col("px"), col("sy"), col("oz"))
      def layout(name: String, key: org.apache.spark.sql.Column) = base
        .withColumn("k", key)
        .withColumn("file_id",
          expr("(row_number() OVER (ORDER BY k, l_orderkey, l_linenumber)" +
            " - 1) div 1500").cast("long"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("px").as("min_x"), max("px").as("max_x"),
          (max("px") - min("px") + 1).cast("long").as("span_x"),
          min("sy").as("min_y"), max("sy").as("max_y"),
          (max("sy") - min("sy") + 1).cast("long").as("span_y"),
          min("oz").as("min_z"), max("oz").as("max_z"),
          (max("oz") - min("oz") + 1).cast("long").as("span_z"))
        .select(lit(name).as("curve"), col("*"))
      layout("hilbert", graft.operators.Layout.hilbertKey(dims, 5))
        .unionByName(layout("morton", graft.operators.Layout.zOrderKeyN(dims, 5)))
    },

    // q161: fuzzy entity linkage over part names ([[graft.operators
    // .Linkage.fuzzyNamePairs]]) — canonicalize-then-link (Fellegi &
    // Sunter 1969): one hash aggregate to the distinct-name frame
    // (orders smaller than the record table — ALL pairwise work happens
    // there), block on the last name token (the head noun), within-block
    // self-join under name_a < name_b with levenshtein ≤ 2. Both
    // engines implement unit-cost edit distance, so pairs + member
    // counts hash-match exactly. Downstream these pairs feed
    // connectedComponents like near-dup pairs (q131).
    QueryDef.sql(
      "q161_fuzzy_name_linkage",
      """WITH canon AS (
        |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_members,
        |    string_split(p_name, ' ')[-1] AS block
        |  FROM part WHERE p_name IS NOT NULL AND len(p_name) > 0
        |  GROUP BY p_name)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        |  a.n_members AS n_a, b.n_members AS n_b
        |FROM canon a JOIN canon b
        |  ON a.block = b.block AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin) { (s, d) =>
      graft.operators.Linkage.fuzzyNamePairs(Tables.part(s, d), "p_name", 2)
    },

    // q192: k-anonymity profile ([[graft.operators.Profile
    // .kAnonymityProfile]], Sweeney 2002) over the (nation, market
    // segment) quasi-identifier pair — the re-identification audit run
    // before releasing a table the q103 PII scrub has already cleaned of
    // DIRECT identifiers. Count-of-counts shape: one corpus exchange on
    // the quasi-id key, cumulative walk over the ≤distinct-class-size
    // level frame.
    QueryDef.sql(
      "q192_k_anonymity",
      """WITH classes AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS k
        |  FROM customer GROUP BY 1, 2),
        |levels AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n_classes,
        |    CAST(k * count(*) AS BIGINT) AS n_rows
        |  FROM classes GROUP BY k),
        |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows FROM levels)
        |SELECT k AS class_size, n_classes, n_rows,
        |  CAST(sum(n_rows) OVER (ORDER BY k) AS BIGINT) AS cum_rows,
        |  CAST((sum(n_rows) OVER (ORDER BY k)) * 10000 // total_rows
        |    AS BIGINT) AS risk_bp
        |FROM levels CROSS JOIN tot""".stripMargin) { (s, d) =>
      graft.operators.Profile.kAnonymityProfile(
        Tables.customer(s, d), Seq("c_nationkey", "c_mktsegment"))
    },

    // q199: RFM segmentation ([[graft.operators.Funnel.rfmSegments]]) —
    // the classic recency/frequency/monetary customer partition with
    // EXACT tertile cuts from value histograms (the q189 prefix-sum
    // discipline): no ntile window over the population, bit-identical
    // boundaries on both engines, value in exact cents.
    QueryDef.sql(
      "q199_rfm_segments",
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(max(epoch_us(CAST(o_orderdate AS TIMESTAMP))
        |      // 86400000000) AS BIGINT) AS r,
        |    CAST(count(*) AS BIGINT) AS f,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS m
        |  FROM orders GROUP BY o_custkey),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
        |rc AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
        |  FROM (SELECT r AS v, count(*) AS cnt FROM per GROUP BY r)),
        |rcut AS (SELECT
        |    min(CASE WHEN cum * 3 >= n THEN v END) AS r_cut1,
        |    min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS r_cut2
        |  FROM rc CROSS JOIN nn),
        |fc AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
        |  FROM (SELECT f AS v, count(*) AS cnt FROM per GROUP BY f)),
        |fcut AS (SELECT
        |    min(CASE WHEN cum * 3 >= n THEN v END) AS f_cut1,
        |    min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS f_cut2
        |  FROM fc CROSS JOIN nn),
        |mc AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
        |  FROM (SELECT m AS v, count(*) AS cnt FROM per GROUP BY m)),
        |mcut AS (SELECT
        |    min(CASE WHEN cum * 3 >= n THEN v END) AS m_cut1,
        |    min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS m_cut2
        |  FROM mc CROSS JOIN nn)
        |SELECT
        |  CAST(1 + CASE WHEN p.r > r_cut1 THEN 1 ELSE 0 END
        |    + CASE WHEN p.r > r_cut2 THEN 1 ELSE 0 END AS BIGINT) AS r_tier,
        |  CAST(1 + CASE WHEN p.f > f_cut1 THEN 1 ELSE 0 END
        |    + CASE WHEN p.f > f_cut2 THEN 1 ELSE 0 END AS BIGINT) AS f_tier,
        |  CAST(1 + CASE WHEN p.m > m_cut1 THEN 1 ELSE 0 END
        |    + CASE WHEN p.m > m_cut2 THEN 1 ELSE 0 END AS BIGINT) AS m_tier,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(p.m) AS BIGINT) AS m_cents
        |FROM per p CROSS JOIN rcut CROSS JOIN fcut CROSS JOIN mcut
        |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      graft.operators.Funnel.rfmSegments(
        Tables.orders(s, d), "o_custkey", "o_orderdate", "o_totalprice")
    },

    // q203: Benford first-digit audit ([[graft.operators.Profile
    // .benfordAudit]]) on order totals — the one-pass data-forgery /
    // unit-mix smell test: leading-digit shares vs the log10(1+1/d)
    // expectation in exact basis points. (TPC-H prices are synthetic-
    // uniform, so the deltas READ large — the audit detecting exactly
    // what it should about this data.)
    QueryDef.sql(
      "q203_benford_audit",
      s"""WITH c AS (
         |  SELECT CASE WHEN o_totalprice >= 1 THEN
         |      CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
         |        AS VARCHAR), 1, 1) AS BIGINT)
         |    ELSE 0 END AS digit,
         |    CAST(count(*) AS BIGINT) AS n_rows
         |  FROM orders GROUP BY 1),
         |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n FROM c),
         |e(digit, benford_bp) AS (VALUES ${(1 to 9).map(dd =>
             s"(CAST($dd AS BIGINT), CAST(${math.floor(
               math.log10(1.0 + 1.0 / dd) * 10000.0 + 0.5).toLong} AS BIGINT))")
             .mkString(", ")})
         |SELECT c.digit, c.n_rows,
         |  CAST(c.n_rows * 10000 // t.n AS BIGINT) AS share_bp,
         |  CAST(coalesce(e.benford_bp, 0) AS BIGINT) AS benford_bp,
         |  CAST(CASE WHEN c.digit >= 1
         |    THEN c.n_rows * 10000 // t.n - e.benford_bp
         |    ELSE 0 END AS BIGINT) AS delta_bp
         |FROM c CROSS JOIN t LEFT JOIN e ON e.digit = c.digit"""
        .stripMargin) { (s, d) =>
      graft.operators.Profile.benfordAudit(
        Tables.orders(s, d), "o_totalprice")
    }
  )
}
