package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{BinPack, Profile, Quantize, Similarity}
import org.apache.spark.sql.functions._

/** Corpus admission & layout operators (beyond-reference, SURVEY §2.11):
  * the checks and transforms a pipeline runs when a new data drop arrives
  * and when a packed corpus leaves for the trainer.
  *
  *  - q101 whole-document next-fit bin packing: fixed-capacity training
  *    bins that never split a document ([[graft.operators.BinPack]]) —
  *    the instruction-tuning/eval-shard layout, vs q75/q80's
  *    concat-and-chunk. Oracle replays the greedy scan with a recursive
  *    CTE per lane; per-row `bin_fill` pins the whole trajectory.
  *  - q102 symmetric int8 embedding quantization (FAISS SQ8 shape):
  *    map-only, codegen'd, bit-portable via q85's integer micro-unit
  *    discipline ([[graft.operators.Quantize]]).
  *  - q103 single-pass column profile: row/null/distinct/range per column
  *    in one scan ([[graft.operators.Profile]]) — the Deequ-style snapshot
  *    recorded before a corpus drop is admitted.
  *  - q104 constraint checks: uniqueness, nullness, derived-column
  *    consistency, referential integrity — one scan per table, anti-join
  *    for FKs, (constraint, violations, passed) long format.
  *  - q105 per-dimension embedding moments: n/Σv/Σv²/min/max by dimension
  *    in integer micro-units (the feature-scaling prep for q94/q56's
  *    centroid paths; posexplode + partial aggregation, so the shuffle
  *    carries 64 rows per map partition no matter the corpus size).
  */
object ValidationOps {

  /** DuckDB twin of TextFunctions.tokens (same as TextOps.T). */
  private val T = "list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)"

  private val Capacity = 128L
  private val LaneBuckets = 4

  val all: Seq[QueryDef] = Seq(

    // q117: per-source corpus datasheet (Gebru et al., "Datasheets for
    // Datasets") — volumes, language spread, exact-dup mass (q113's
    // bag-of-words key, within source), q97 classifier keep count.
    QueryDef.sql(
      "q117_corpus_datasheet",
      s"""WITH f AS (
         |  SELECT doc_id, source, lang, n_chars,
         |    len($T) AS n_tok, len(list_distinct($T)) AS n_dis,
         |    len(regexp_replace(text, '\\s', '', 'g')) AS n_ch,
         |    len(list_filter($T,
         |      t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS stop_hits,
         |    md5(list_aggr(list_sort(list_distinct($T)), 'string_agg', ' '))
         |      AS fp
         |  FROM documents),
         |base AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |    count(DISTINCT lang) AS n_langs,
         |    CAST(sum(CASE WHEN (-3000000 - 40000*n_tok + 200000*n_dis
         |      + 2000*n_ch + 300000*stop_hits) >= 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_quality_keep
         |  FROM f GROUP BY source),
         |dups AS (
         |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_dup_docs FROM (
         |    SELECT source, fp, count(*) AS cnt FROM f GROUP BY 1, 2)
         |  WHERE cnt > 1 GROUP BY source)
         |SELECT b.source, b.n_docs, b.n_tokens, b.n_chars, b.n_langs,
         |  b.n_quality_keep, coalesce(d.n_dup_docs, 0) AS n_dup_docs
         |FROM base b LEFT JOIN dups d USING (source)""".stripMargin) { (s, d) =>
      Profile.corpusDatasheet(Tables.documents(s, d))
        .select("source", "n_docs", "n_tokens", "n_chars", "n_langs",
          "n_quality_keep", "n_dup_docs")
    },

    // q122: per-source lexical diversity ([[graft.operators.Profile
    // .lexicalDiversity]]) — the datasheet's templated-vs-organic
    // signal: type-token ratio and per-doc-distinct-trigram diversity
    // (q35's shingle convention), ratios in exact basis points. Low
    // trigram diversity at healthy TTR = boilerplate; both low =
    // generated spam.
    QueryDef.sql(
      "q122_lexical_diversity",
      s"""WITH toksrc AS (SELECT source, $T AS tk FROM documents),
         |tf AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(count(DISTINCT t) AS BIGINT) AS n_types
         |  FROM (SELECT source, unnest(tk) AS t FROM toksrc) GROUP BY source),
         |sh AS (
         |  SELECT source,
         |    CASE WHEN len(tk) = 0 THEN []
         |         ELSE list_distinct(list_transform(
         |           generate_series(1, greatest(len(tk) - 2, 1)),
         |           i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS gs
         |  FROM toksrc),
         |gf AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_trigrams,
         |    CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_trigrams
         |  FROM (SELECT source, unnest(gs) AS g FROM sh) GROUP BY source),
         |base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |         FROM documents GROUP BY source)
         |SELECT b.source, b.n_docs,
         |  coalesce(tf.n_tokens, 0) AS n_tokens,
         |  coalesce(tf.n_types, 0) AS n_types,
         |  coalesce(tf.n_types, 0) * 10000 // greatest(coalesce(tf.n_tokens, 0), 1)
         |    AS ttr_bp,
         |  coalesce(gf.n_trigrams, 0) AS n_trigrams,
         |  coalesce(gf.n_distinct_trigrams, 0) AS n_distinct_trigrams,
         |  coalesce(gf.n_distinct_trigrams, 0) * 10000
         |    // greatest(coalesce(gf.n_trigrams, 0), 1) AS trigram_diversity_bp
         |FROM base b LEFT JOIN tf USING (source)
         |LEFT JOIN gf USING (source)""".stripMargin) { (s, d) =>
      Profile.lexicalDiversity(Tables.documents(s, d))
    },

    // q196: the per-source data card ([[graft.operators.Profile
    // .dataCard]], Gebru et al. 2018) — the q117 datasheet, q122
    // diversity ratios, q189 exact length quantiles, and q190 nucleus
    // vocabulary composed into ONE wide audit row per source: the
    // release-review artifact. Four irreducible single-scan
    // aggregations; all joins are broadcast over the ≤|sources| frame.
    QueryDef.sql(
      "q196_data_card",
      s"""WITH f AS (
         |  SELECT doc_id, source, lang, n_chars,
         |    len($T) AS n_tok, len(list_distinct($T)) AS n_dis,
         |    len(regexp_replace(text, '\\s', '', 'g')) AS n_ch,
         |    len(list_filter($T,
         |      t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
         |      AS stop_hits,
         |    md5(list_aggr(list_sort(list_distinct($T)), 'string_agg', ' '))
         |      AS fp
         |  FROM documents),
         |base AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |    count(DISTINCT lang) AS n_langs,
         |    CAST(sum(CASE WHEN (-3000000 - 40000*n_tok + 200000*n_dis
         |      + 2000*n_ch + 300000*stop_hits) >= 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_quality_keep
         |  FROM f GROUP BY source),
         |dups AS (
         |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_dup_docs FROM (
         |    SELECT source, fp, count(*) AS cnt FROM f GROUP BY 1, 2)
         |  WHERE cnt > 1 GROUP BY source),
         |toksrc AS (SELECT source, $T AS tk FROM documents),
         |tf AS (
         |  SELECT source, CAST(count(DISTINCT t) AS BIGINT) AS n_types
         |  FROM (SELECT source, unnest(tk) AS t FROM toksrc) GROUP BY source),
         |sh AS (
         |  SELECT source,
         |    CASE WHEN len(tk) = 0 THEN []
         |         ELSE list_distinct(list_transform(
         |           generate_series(1, greatest(len(tk) - 2, 1)),
         |           i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS gs
         |  FROM toksrc),
         |gf AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_trigrams,
         |    CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_trigrams
         |  FROM (SELECT source, unnest(gs) AS g FROM sh) GROUP BY source),
         |hist AS (SELECT source, CAST(n_tok AS BIGINT) AS len,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM f GROUP BY 1, 2),
         |cum AS (SELECT source, len,
         |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY len) AS BIGINT)
         |      AS cum
         |  FROM hist),
         |qs AS (SELECT c.source,
         |    min(CASE WHEN c.cum * 100 >= b.n_docs * 50 THEN c.len END)
         |      AS p50_len,
         |    min(CASE WHEN c.cum * 100 >= b.n_docs * 90 THEN c.len END)
         |      AS p90_len,
         |    min(CASE WHEN c.cum * 100 >= b.n_docs * 99 THEN c.len END)
         |      AS p99_len
         |  FROM cum c JOIN base b USING (source) GROUP BY c.source),
         |counts AS (SELECT source, t AS tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT source, unnest(tk) AS t FROM toksrc) GROUP BY 1, 2),
         |levels AS (SELECT source, cnt,
         |    CAST(count(*) AS BIGINT) AS types,
         |    CAST(cnt * count(*) AS BIGINT) AS mass
         |  FROM counts GROUP BY 1, 2),
         |ltot AS (SELECT source, CAST(sum(mass) AS BIGINT) AS lt_tokens,
         |    CAST(sum(types) AS BIGINT) AS lt_types
         |  FROM levels GROUP BY source),
         |walk AS (SELECT source, cnt, types, mass,
         |    CAST(sum(mass) OVER (PARTITION BY source ORDER BY cnt DESC)
         |      AS BIGINT) AS cum_mass,
         |    CAST(sum(types) OVER (PARTITION BY source ORDER BY cnt DESC)
         |      AS BIGINT) AS cum_types
         |  FROM levels),
         |sel AS (SELECT w.source, t.lt_types,
         |    w.cum_types - w.types
         |      + (((t.lt_tokens * 9500 + 9999) // 10000)
         |         - (w.cum_mass - w.mass) + w.cnt - 1) // w.cnt
         |      AS nucleus_types,
         |    row_number() OVER (PARTITION BY w.source ORDER BY w.cum_mass ASC)
         |      AS rk
         |  FROM walk w JOIN ltot t USING (source)
         |  WHERE w.cum_mass >= (t.lt_tokens * 9500 + 9999) // 10000)
         |SELECT b.source, b.n_docs, b.n_tokens, b.n_chars, b.n_langs,
         |  b.n_quality_keep,
         |  coalesce(d.n_dup_docs, 0) AS n_dup_docs,
         |  coalesce(tf.n_types, 0) AS n_types,
         |  coalesce(tf.n_types, 0) * 10000 // greatest(b.n_tokens, 1)
         |    AS ttr_bp,
         |  coalesce(gf.n_distinct_trigrams, 0) * 10000
         |    // greatest(coalesce(gf.n_trigrams, 0), 1)
         |    AS trigram_diversity_bp,
         |  q.p50_len, q.p90_len, q.p99_len,
         |  CAST(coalesce(s.nucleus_types, 0) AS BIGINT) AS nucleus_types,
         |  CAST(coalesce(s.nucleus_types * 10000 // s.lt_types, 0)
         |    AS BIGINT) AS nucleus_share_bp
         |FROM base b
         |LEFT JOIN dups d USING (source)
         |LEFT JOIN tf USING (source)
         |LEFT JOIN gf USING (source)
         |LEFT JOIN qs q USING (source)
         |LEFT JOIN (SELECT * FROM sel WHERE rk = 1) s USING (source)"""
        .stripMargin) { (s, d) =>
      Profile.dataCard(Tables.documents(s, d))
    },

    // q101: whole-doc next-fit packing into 128-token bins, packed per
    // (source, doc_id % 4) lane so the greedy scans parallelize. The
    // oracle's recursive CTE advances one document per lane per step —
    // the sequential semantics the distributed mapPartitions pass must
    // reproduce exactly.
    QueryDef.sql(
      "q101_binpack_nextfit",
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, source, doc_id % $LaneBuckets AS lane_bucket,
         |    CAST(len($T) AS BIGINT) AS n_tok
         |  FROM documents),
         |ord AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY source, lane_bucket ORDER BY doc_id) AS rn
         |  FROM toks),
         |pack AS (
         |  SELECT source, lane_bucket, doc_id, n_tok, rn,
         |    CAST(0 AS BIGINT) AS bin, n_tok AS bin_fill
         |  FROM ord WHERE rn = 1
         |  UNION ALL
         |  SELECT o.source, o.lane_bucket, o.doc_id, o.n_tok, o.rn,
         |    CASE WHEN p.bin_fill > 0 AND p.bin_fill + o.n_tok > $Capacity
         |         THEN p.bin + 1 ELSE p.bin END,
         |    CASE WHEN p.bin_fill > 0 AND p.bin_fill + o.n_tok > $Capacity
         |         THEN o.n_tok ELSE p.bin_fill + o.n_tok END
         |  FROM pack p JOIN ord o
         |    ON o.source = p.source AND o.lane_bucket = p.lane_bucket
         |   AND o.rn = p.rn + 1)
         |SELECT source, lane_bucket, doc_id, n_tok, bin, bin_fill
         |FROM pack""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(
        col("source"),
        pmod(col("doc_id"), lit(LaneBuckets.toLong)).as("lane_bucket"),
        col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
      BinPack.nextFit(docs, Seq("source", "lane_bucket"), "doc_id", "n_tok",
        Capacity)
        .select("source", "lane_bucket", "doc_id", "n_tok", "bin", "bin_fill")
    },

    // q102: per-vector symmetric int8 quantization + reconstruction error
    // in integer tenth-microunits (order-free sums → engine-portable).
    QueryDef.sql(
      "q102_int8_quantize",
      """WITH sc AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
        |      / 127.0 AS scale
        |  FROM embeddings),
        |qz AS (
        |  SELECT vec_id, embedding, scale,
        |    list_transform(embedding, v -> CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(greatest(-127.0, least(127.0,
        |             floor(CAST(v AS DOUBLE) / scale + 0.5))) AS INTEGER)
        |      END) AS q
        |  FROM sc),
        |er AS (
        |  SELECT vec_id, scale, q, len(embedding) AS nd,
        |    list_transform(generate_series(1, len(embedding)),
        |      i -> CAST(floor(abs(CAST(embedding[i] AS DOUBLE)
        |             - CAST(q[i] AS DOUBLE) * scale) * 10000000.0 + 0.5)
        |           AS BIGINT)) AS errs
        |  FROM qz)
        |SELECT vec_id, CAST(nd AS BIGINT) AS n_dims,
        |  CAST(floor(scale * 10000000.0 + 0.5) AS BIGINT) AS scale_u,
        |  CAST(list_sum(errs) AS BIGINT) AS sum_err_u,
        |  list_min(q) AS q_min, list_max(q) AS q_max,
        |  CAST(len(list_filter(q, x -> x <> 0)) AS BIGINT) AS n_nonzero
        |FROM er""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
        .withColumn("__scale", Quantize.scaleOf(col("embedding")))
        .withColumn("__q", Quantize.int8Codes(col("embedding"), col("__scale")))
      e.select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        floor(col("__scale") * 1e7 + 0.5).as("scale_u"),
        Quantize.arraySum(
          Quantize.errorMicros(col("embedding"), col("__q"), col("__scale"))
            .cast("array<long>")).as("sum_err_u"),
        array_min(col("__q")).as("q_min"),
        array_max(col("__q")).as("q_max"),
        size(filter(col("__q"), q => q =!= 0)).cast("long").as("n_nonzero"))
    },

    // q103: one-scan column profile of `documents`. text is count-only
    // (string ranges are offered only for ASCII-ordered columns —
    // cross-engine collation on arbitrary UTF-8 differs).
    QueryDef.sql(
      "q103_column_profile",
      profileSql(Seq("doc_id", "n_chars"), Seq("lang", "source"), Seq("text"))) {
      (s, dir) =>
        Profile.columnProfile(Tables.documents(s, dir),
          numericCols = Seq("doc_id", "n_chars"),
          stringCols = Seq("lang", "source"),
          countOnlyCols = Seq("text"))
    },

    // q172: robust per-source length-anomaly stats ([[graft.operators
    // .Profile.madOutlierStats]], Hampel's 3-MAD rule) — the
    // data-quality detector the mean/stddev profile (q103/q117) cannot
    // be: one pathological giant doc drags a source's mean, never its
    // median. Exactness via DOUBLED medians (integer medians
    // interpolate at most to .5, so med2/mad4 are exact BIGINTs on
    // both engines) and the pure-integer flag 2·dev2 > 3·mad4.
    QueryDef.sql(
      "q172_mad_outliers",
      s"""WITH v AS (
         |  SELECT source, CAST(len($T) AS BIGINT) AS x FROM documents),
         |med AS (
         |  SELECT source, CAST(2 * quantile_cont(x, 0.5) AS BIGINT) AS med2
         |  FROM v GROUP BY source),
         |dev AS (
         |  SELECT v.source, med.med2, abs(v.x * 2 - med.med2) AS dev2
         |  FROM v JOIN med USING (source)),
         |mad AS (
         |  SELECT source, CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
         |  FROM dev GROUP BY source)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n,
         |  max(d.med2) AS med2, max(m.mad4) AS mad4,
         |  CAST(sum(CASE WHEN d.dev2 * 2 > m.mad4 * 3 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_outliers
         |FROM dev d JOIN mad m USING (source)
         |GROUP BY d.source""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("source"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n_tok"))
      Profile.madOutlierStats(docs, "source", "n_tok")
    },

    // q104: admission constraints — per-table single-pass checks plus
    // anti-join referential integrity, long format (constraint,
    // violations, passed).
    QueryDef.sql(
      "q104_constraint_checks",
      """SELECT 'doc_id_unique' AS check_name,
        |  CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS violations,
        |  count(*) = count(DISTINCT doc_id) AS passed
        |FROM documents
        |UNION ALL
        |SELECT 'doc_text_not_null',
        |  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) = 0
        |FROM documents
        |UNION ALL
        |SELECT 'doc_n_chars_consistent',
        |  CAST(sum(CASE WHEN (n_chars IS NULL) <> (text IS NULL) THEN 1
        |                WHEN n_chars IS NULL THEN 0
        |                WHEN n_chars <> len(text) THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN (n_chars IS NULL) <> (text IS NULL) THEN 1
        |           WHEN n_chars IS NULL THEN 0
        |           WHEN n_chars <> len(text) THEN 1 ELSE 0 END) = 0
        |FROM documents
        |UNION ALL
        |SELECT 'orders_custkey_fk',
        |  CAST(count(*) AS BIGINT), count(*) = 0
        |FROM orders o WHERE NOT EXISTS (
        |  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'lineitem_orderkey_fk',
        |  CAST(count(*) AS BIGINT), count(*) = 0
        |FROM lineitem l WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'events_ts_not_null',
        |  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) = 0
        |FROM events""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val inconsistent =
        when((col("n_chars").isNull) =!= (col("text").isNull), 1L)
          .when(col("n_chars").isNull, 0L)
          .when(col("n_chars") =!= length(col("text")), 1L)
          .otherwise(0L)
      // documents: three constraints from ONE scan, exploded to rows
      val docChecks = docs
        .agg(count(lit(1)).as("__n"), countDistinct(col("doc_id")).as("__d"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("__tn"),
          sum(inconsistent).as("__nc"))
        .select(explode(array(
          struct(lit("doc_id_unique").as("check_name"),
            (col("__n") - col("__d")).as("violations")),
          struct(lit("doc_text_not_null").as("check_name"),
            col("__tn").as("violations")),
          struct(lit("doc_n_chars_consistent").as("check_name"),
            col("__nc").as("violations")))).as("c"))
        .select("c.*")
      val orders = Tables.orders(s, dir)
      val customer = Tables.customer(s, dir)
      val lineitem = Tables.lineitem(s, dir)
      val ordersFk = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("orders_custkey_fk").as("check_name"), col("violations"))
      val lineitemFk = lineitem
        .join(orders, lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem_orderkey_fk").as("check_name"), col("violations"))
      val eventsTs = Tables.events(s, dir)
        .agg(sum(when(col("ts").isNull, 1L).otherwise(0L)).as("violations"))
        .select(lit("events_ts_not_null").as("check_name"), col("violations"))
      docChecks.unionByName(ordersFk).unionByName(lineitemFk)
        .unionByName(eventsTs)
        .select(col("check_name"), col("violations"),
          (col("violations") === 0L).as("passed"))
    },

    // q132: embedding-distribution drift via frozen-cell occupancy
    // ([[graft.operators.Similarity.cellOccupancyDrift]]) — the PSI
    // pattern in embedding space: even vec_ids are the reference
    // snapshot (centroids fit there, md5-portable), odd vec_ids the
    // new one; per frozen cell, populations and exact basis-point
    // shares with the absolute share delta. The q99 drift report's
    // embedding analogue.
    QueryDef.sql(
      "q132_embedding_drift",
      """WITH a AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id % 2 = 0),
        |b AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id % 2 = 1),
        |cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
        |          FROM embeddings WHERE vec_id % 2 = 0
        |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 12),
        |aa AS (
        |  SELECT id, cid AS cell FROM (
        |    SELECT a.id, c.cid, row_number() OVER (PARTITION BY a.id
        |      ORDER BY list_dot_product(ce, ce) - 2 * list_dot_product(v, ce),
        |        cid) AS rn
        |    FROM a CROSS JOIN cents c) WHERE rn = 1),
        |bb AS (
        |  SELECT id, cid AS cell FROM (
        |    SELECT b.id, c.cid, row_number() OVER (PARTITION BY b.id
        |      ORDER BY list_dot_product(ce, ce) - 2 * list_dot_product(v, ce),
        |        cid) AS rn
        |    FROM b CROSS JOIN cents c) WHERE rn = 1),
        |ca AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_a FROM aa GROUP BY cell),
        |cb AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_b FROM bb GROUP BY cell),
        |j AS (
        |  SELECT cents.cid AS cell, coalesce(ca.n_a, 0) AS n_a,
        |    coalesce(cb.n_b, 0) AS n_b
        |  FROM cents LEFT JOIN ca ON cents.cid = ca.cell
        |  LEFT JOIN cb ON cents.cid = cb.cell),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |             CAST(sum(n_b) AS BIGINT) AS tb FROM j)
        |SELECT cell, n_a, n_b,
        |  (n_a * 10000) // greatest(ta, 1) AS share_bp_a,
        |  (n_b * 10000) // greatest(tb, 1) AS share_bp_b,
        |  abs((n_a * 10000) // greatest(ta, 1)
        |    - (n_b * 10000) // greatest(tb, 1)) AS delta_bp
        |FROM j CROSS JOIN t""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding"))
      val aDf = emb.filter(col("id") % 2 === 0)
      val bDf = emb.filter(col("id") % 2 === 1)
      Similarity.cellOccupancyDrift(aDf, bDf,
        Similarity.sampleCentroidsPortable(aDf, 12))
    },

    // q105: per-dimension embedding moments in integer micro-units.
    // posexplode then hash-agg: partial aggregation collapses each map
    // partition to 64 rows before the shuffle, so the exchange is O(64 ×
    // #partitions) regardless of corpus size.
    QueryDef.sql(
      "q105_dim_stats",
      """WITH pv AS (
        |  SELECT unnest(generate_series(1, len(embedding))) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings)
        |SELECT CAST(pos AS BIGINT) AS pos, count(*) AS n,
        |  CAST(sum(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s_u,
        |  CAST(sum(CAST(floor(v * v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS ss_u,
        |  CAST(min(floor(v * 1000000.0 + 0.5)) AS BIGINT) AS min_u,
        |  CAST(max(floor(v * 1000000.0 + 0.5)) AS BIGINT) AS max_u
        |FROM pv GROUP BY pos""".stripMargin) { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(posexplode(col("embedding")))
        .select((col("pos") + 1).cast("long").as("pos"),
          col("col").cast("double").as("v"))
        .groupBy("pos")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v") * 1e6 + 0.5)).as("s_u"),
          sum(floor(col("v") * col("v") * 1e6 + 0.5)).as("ss_u"),
          min(floor(col("v") * 1e6 + 0.5)).as("min_u"),
          max(floor(col("v") * 1e6 + 0.5)).as("max_u"))
    },

    // q139: packing-efficiency datasheet — the layout DECISION the two
    // packing families feed: concat-and-chunk (q75/q80, zero padding
    // but documents split across training sequences) vs whole-document
    // next-fit (q101, boundaries intact but bins padded), compared at
    // the same capacity in bins used, padding tokens, overflow tokens
    // (a document longer than the capacity overfills its own next-fit
    // bin — reported, never hidden), documents split, and basis-point
    // utilization. Two single-row aggregates over frames the engine
    // already builds; the oracle replays both layouts (global-window
    // prefix sum + the recursive-CTE greedy walk) independently.
    QueryDef.sql(
      "q139_packing_efficiency",
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, source, doc_id % $LaneBuckets AS lane_bucket,
         |    CAST(len($T) AS BIGINT) AS n_tok
         |  FROM documents),
         |ord AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY source, lane_bucket ORDER BY doc_id) AS rn
         |  FROM toks),
         |pack AS (
         |  SELECT source, lane_bucket, doc_id, n_tok, rn,
         |    CAST(0 AS BIGINT) AS bin, n_tok AS bin_fill
         |  FROM ord WHERE rn = 1
         |  UNION ALL
         |  SELECT o.source, o.lane_bucket, o.doc_id, o.n_tok, o.rn,
         |    CASE WHEN p.bin_fill > 0 AND p.bin_fill + o.n_tok > $Capacity
         |         THEN p.bin + 1 ELSE p.bin END,
         |    CASE WHEN p.bin_fill > 0 AND p.bin_fill + o.n_tok > $Capacity
         |         THEN o.n_tok ELSE p.bin_fill + o.n_tok END
         |  FROM pack p JOIN ord o
         |    ON o.source = p.source AND o.lane_bucket = p.lane_bucket
         |   AND o.rn = p.rn + 1),
         |fills AS (
         |  SELECT source, lane_bucket, bin, CAST(max(bin_fill) AS BIGINT) AS fill
         |  FROM pack GROUP BY 1, 2, 3),
         |nf AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_bins,
         |    CAST(sum(greatest($Capacity - fill, 0)) AS BIGINT) AS padding_tokens,
         |    CAST(sum(greatest(fill - $Capacity, 0)) AS BIGINT) AS overflow_tokens,
         |    CAST(sum(fill) AS BIGINT) AS n_tokens
         |  FROM fills),
         |o AS (
         |  SELECT doc_id, n_tok AS n_tokens,
         |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS "offset"
         |  FROM toks),
         |ca AS (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(coalesce(max(CASE WHEN n_tokens > 0
         |      THEN ("offset" + n_tokens - 1) // $Capacity END), -1) + 1
         |      AS BIGINT) AS n_bins,
         |    CAST(sum(CASE WHEN n_tokens > 0
         |      AND ("offset" + n_tokens - 1) // $Capacity > "offset" // $Capacity
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_split
         |  FROM o)
         |SELECT 'concat_chunk' AS strategy, CAST($Capacity AS BIGINT) AS capacity,
         |  n_bins, n_tokens,
         |  CAST(n_bins * $Capacity - n_tokens AS BIGINT) AS padding_tokens,
         |  CAST(0 AS BIGINT) AS overflow_tokens, n_docs_split,
         |  CAST((n_tokens * 10000) // greatest(n_bins * $Capacity, 1) AS BIGINT)
         |    AS utilization_bp
         |FROM ca
         |UNION ALL
         |SELECT 'nextfit_whole_doc', CAST($Capacity AS BIGINT), n_bins, n_tokens,
         |  padding_tokens, overflow_tokens, CAST(0 AS BIGINT),
         |  CAST((n_tokens * 10000) // greatest(n_bins * $Capacity, 1) AS BIGINT)
         |FROM nf""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(
        col("source"),
        pmod(col("doc_id"), lit(LaneBuckets.toLong)).as("lane_bucket"),
        col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
      val placed = graft.operators.Packing.concatChunkPlacement(
        docs.select(col("doc_id"), col("n_tok").as("n_tokens")),
        "doc_id", "n_tokens", Capacity, groupOf = expr("doc_id div 64"))
      val ca = placed.agg(
          sum("n_tokens").cast("long").as("n_tokens"),
          (coalesce(max("last_chunk").cast("long"), lit(-1L)) + 1L).as("n_bins"),
          sum(when(col("n_chunks") > 1, 1L).otherwise(0L)).cast("long")
            .as("n_docs_split"))
        .select(lit("concat_chunk").as("strategy"),
          lit(Capacity).as("capacity"), col("n_bins"), col("n_tokens"),
          (col("n_bins") * Capacity - col("n_tokens")).as("padding_tokens"),
          lit(0L).as("overflow_tokens"), col("n_docs_split"))
      val fills = BinPack.nextFit(docs, Seq("source", "lane_bucket"),
          "doc_id", "n_tok", Capacity)
        .groupBy("source", "lane_bucket", "bin")
        .agg(max("bin_fill").cast("long").as("fill"))
      val nf = fills.agg(
          count(lit(1)).as("n_bins"),
          sum(greatest(lit(Capacity) - col("fill"), lit(0L))).cast("long")
            .as("padding_tokens"),
          sum(greatest(col("fill") - lit(Capacity), lit(0L))).cast("long")
            .as("overflow_tokens"),
          sum(col("fill")).cast("long").as("n_tokens"))
        .select(lit("nextfit_whole_doc").as("strategy"),
          lit(Capacity).as("capacity"), col("n_bins"), col("n_tokens"),
          col("padding_tokens"), col("overflow_tokens"),
          lit(0L).as("n_docs_split"))
      ca.unionByName(nf).withColumn("utilization_bp",
        expr(s"(n_tokens * 10000) div greatest(n_bins * $Capacity, 1)"))
    },

    // q141: log2 token-length histogram ([[graft.operators.Profile
    // .tokenLengthHistogram]]) — the length distribution behind the
    // q117 datasheet totals and the input the q139 capacity decision
    // needs. The bucket is the bit-exact integer ⌊log2 n⌋ via
    // `length(bin(n)) - 1` (no float log2 — exact powers of two cannot
    // misfile on rounding); empty docs keep the -1 sentinel row. One
    // hash aggregate, ≤ |sources|·64 rows out.
    QueryDef.sql(
      "q141_length_histogram",
      s"""WITH f AS (
         |  SELECT source, CAST(coalesce(len($T), 0) AS BIGINT) AS n
         |  FROM documents)
         |SELECT source,
         |  CAST(CASE WHEN n <= 0 THEN -1 ELSE len(bin(n)) - 1 END
         |    AS BIGINT) AS bucket,
         |  CAST(CASE WHEN n <= 0 THEN 0
         |    ELSE (CAST(1 AS BIGINT) << (len(bin(n)) - 1)) END
         |    AS BIGINT) AS bucket_lo,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n) AS BIGINT) AS n_tokens
         |FROM f GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      Profile.tokenLengthHistogram(Tables.documents(s, d))
    },

    // q175: multi-level datasheet via ROLLUP — (source, lang) leaves,
    // per-source subtotals, grand total, in ONE aggregate through
    // Catalyst's Expand operator (each input row fans out to its 3
    // grouping sets map-side, then a single hash aggregate — no
    // self-union of three scans, which is what the naive version
    // costs; at 100 TB that is one corpus pass instead of three).
    // grouping_id disambiguates a real null group value from a rollup
    // subtotal; both engines compute the same (source=bit1, lang=bit0)
    // id under the declared column order.
    QueryDef.sql(
      "q175_rollup_datasheet",
      s"""SELECT source, lang,
         |  CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len($T)) AS BIGINT) AS n_tokens
         |FROM documents
         |GROUP BY ROLLUP(source, lang)""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), col("lang"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n_tok"))
        .rollup("source", "lang")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .select("source", "lang", "gid", "n_docs", "n_tokens")
    },

    // q176: language-mix PIVOT — token share per source pivoted into
    // one fixed column per language ([[org.apache.spark.sql
    // .RelationalGroupedDataset.pivot]] with EXPLICIT values, so the
    // plan is a single hash aggregate with conditional sums — no
    // second collect-distinct pass over the corpus, and the schema is
    // static at any scale). The oracle is the same conditional
    // aggregation spelled out (the pivot desugaring both engines
    // agree on).
    QueryDef.sql(
      "q176_lang_pivot",
      s"""SELECT source,
         |  CAST(coalesce(sum(CASE WHEN lang = 'en' THEN len($T) END), 0) AS BIGINT) AS en_tokens,
         |  CAST(coalesce(sum(CASE WHEN lang = 'fr' THEN len($T) END), 0) AS BIGINT) AS fr_tokens,
         |  CAST(coalesce(sum(CASE WHEN lang = 'es' THEN len($T) END), 0) AS BIGINT) AS es_tokens,
         |  CAST(coalesce(sum(CASE WHEN lang = 'de' THEN len($T) END), 0) AS BIGINT) AS de_tokens,
         |  CAST(coalesce(sum(CASE WHEN lang = 'zh' THEN len($T) END), 0) AS BIGINT) AS zh_tokens
         |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      val langs = Seq("en", "fr", "es", "de", "zh")
      val p = Tables.documents(s, d)
        .select(col("source"), col("lang"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n_tok"))
        .groupBy("source")
        .pivot("lang", langs)
        .agg(sum("n_tok"))
      langs.foldLeft(p) { (df, l) =>
        df.withColumn(s"${l}_tokens", coalesce(col(l), lit(0L))).drop(l)
      }.select(col("source") +: langs.map(l => col(s"${l}_tokens")): _*)
    },

    // q201: half-sample bootstrap CI on the per-source quality mean
    // ([[graft.operators.Sampling.halfSampleCI]], McCarthy 1969 /
    // Chamandy et al. 2012) — the error bar that says whether a
    // quality drop between corpus drops is noise or a regression. 32
    // hash-bit replicas ride ONE conditional aggregate (no row
    // multiplication); exact BIGINT sums to the one final sqrt,
    // identical IEEE text both engines.
    QueryDef.sql("q201_metric_confidence", q201Sql) { (s, d) =>
      import graft.operators.{Classifier, Sampling}
      Sampling.halfSampleCI(
        Classifier.qualityClassify(Tables.documents(s, d), "text")
          .select(col("source"), col("doc_id"), col("score_micro")),
        "source", "doc_id", "score_micro", replicas = 32)
    },

    // q200: CUBE datasheet — q175's ROLLUP plus the grouping set it
    // omits (per-LANG subtotals across sources), still ONE aggregate
    // through Expand: each input row fans out to its 4 grouping sets
    // map-side; one corpus pass where the naive version unions four.
    // Completes the multi-level-aggregate SQL surface
    // (ROLLUP/PIVOT/CUBE).
    QueryDef.sql(
      "q200_cube_datasheet",
      s"""SELECT source, lang,
         |  CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len($T)) AS BIGINT) AS n_tokens
         |FROM documents
         |GROUP BY CUBE(source, lang)""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), col("lang"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n_tok"))
        .cube("source", "lang")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .select("source", "lang", "gid", "n_docs", "n_tokens")
    },
  )

  /** q201 oracle: the 32 hash-bit half-sample replicas as generated
    * conditional sums (the q37 generation pattern), replica means as a
    * DuckDB list, variance/CI in the identical IEEE expression text the
    * Spark side uses.
    */
  private def q201Sql: String = {
    val b = 32
    val sums = (0 until b).map { i =>
      val bit = s"(h // ${1L << i}) % 2 = 1"
      s"CAST(coalesce(sum(CASE WHEN $bit THEN score END), 0) AS BIGINT) AS s$i, " +
        s"CAST(sum(CASE WHEN $bit THEN 1 ELSE 0 END) AS BIGINT) AS n$i"
    }.mkString(",\n    ")
    val means = (0 until b).map(i => s"s$i // greatest(n$i, 1)")
      .mkString("[", ", ", "]")
    s"""WITH f AS (
       |  SELECT source,
       |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) AS h,
       |    len($T) AS n_tok, len(list_distinct($T)) AS n_dis,
       |    len(regexp_replace(text, '\\s', '', 'g')) AS n_ch,
       |    len(list_filter($T,
       |      t -> t IN ('the','a','an','of','and','in','to','is','it','that')))
       |      AS stop_hits
       |  FROM documents),
       |g AS (SELECT source, h,
       |    CAST(-3000000 - 40000*n_tok + 200000*n_dis + 2000*n_ch
       |      + 300000*stop_hits AS BIGINT) AS score
       |  FROM f),
       |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(score) AS BIGINT) AS stot,
       |    $sums
       |  FROM g GROUP BY source),
       |m AS (SELECT source, n_docs, stot, $means AS means FROM a),
       |v AS (SELECT source, n_docs, stot,
       |    CAST(list_sum(means) AS BIGINT) AS sx,
       |    CAST(list_sum(list_transform(means, x -> x * x)) AS BIGINT) AS sxx,
       |    CAST(list_min(means) AS BIGINT) AS replica_min_u,
       |    CAST(list_max(means) AS BIGINT) AS replica_max_u
       |  FROM m)
       |SELECT source, n_docs, stot // n_docs AS mean_u,
       |  CAST(floor(1.96 * sqrt(CAST($b * sxx - sx * sx AS DOUBLE))
       |    / ($b * sqrt(2.0)) + 0.5) AS BIGINT) AS ci95_halfwidth_u,
       |  replica_min_u, replica_max_u
       |FROM v""".stripMargin
  }

  /** q103 oracle: one UNION ALL branch per profiled column, types aligned
    * across branches (BIGINT counts, DOUBLE numeric ranges, VARCHAR
    * string ranges, NULL where the kind doesn't apply).
    */
  private def profileSql(numeric: Seq[String], strings: Seq[String],
      countOnly: Seq[String]): String = {
    def branch(c: String, numMin: String, numMax: String, sMin: String,
        sMax: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  $numMin AS num_min, $numMax AS num_max,
         |  $sMin AS str_min, $sMax AS str_max
         |FROM documents""".stripMargin
    val nD = "CAST(NULL AS DOUBLE)"
    val nS = "CAST(NULL AS VARCHAR)"
    (numeric.map(c => branch(c, s"CAST(min($c) AS DOUBLE)",
        s"CAST(max($c) AS DOUBLE)", nS, nS)) ++
      strings.map(c => branch(c, nD, nD, s"min($c)", s"max($c)")) ++
      countOnly.map(c => branch(c, nD, nD, nS, nS)))
      .mkString("\nUNION ALL\n")
  }
}
