package graft

import java.nio.file.Files
import graft.etl.{BronzeToSilver, FeatureEngineering, ProductTracker, Serving, SilverToGold}
import graft.sources.Bronze
import graft.streaming.EventSchemas
import org.apache.spark.sql.functions._

/** End-to-end medallion pipeline on FIXTURES.md-shaped data: bronze
  * envelope JSONL → silver cleaning → gold star schema → serving queries.
  * Asserts the reference's own invariants (SURVEY.md §5): envelope fields
  * present, no duplicates by business key, scores in [0,100], K/M/B
  * parsing, coalesce-default null hygiene.
  */
class MedallionSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val bronzeDir: String = {
    val dir = Files.createTempDirectory("bronze").toFile
    val lines = Seq(
      // two profile versions for kol_a (dedupe keeps latest), dirty counts
      """{"kol_id":"kol_a","platform":"tiktok","source":"profiles","ingest_ts":"2025-01-02T00:00:00","payload":"{\"event_id\":\"p1\",\"event_time\":\"2025-01-01T10:00:00\",\"username\":\"kol_a\",\"nickname\":\"KOL A\",\"followers_raw\":\"852.3K\",\"following_raw\":\"1,024\",\"likes_raw\":\"33.6M\",\"verified\":true,\"bio\":\"hello\",\"avatar_url\":\"http://x/a.jpg\"}"}""",
      """{"kol_id":"kol_a","platform":"tiktok","source":"profiles","ingest_ts":"2025-01-03T00:00:00","payload":"{\"event_id\":\"p2\",\"event_time\":\"2025-01-02T10:00:00\",\"username\":\"kol_a\",\"nickname\":\"KOL A\",\"followers_raw\":\"901.1K\",\"following_raw\":\"1,030\",\"likes_raw\":\"34.0M\",\"verified\":true,\"bio\":\"hello\",\"avatar_url\":\"http://x/a.jpg\"}"}""",
      // username only via profile_url; null counts
      """{"kol_id":"kol_b","platform":"youtube","source":"profiles","ingest_ts":"2025-01-02T00:00:00","payload":"{\"event_id\":\"p3\",\"event_time\":\"2025-01-01T11:00:00\",\"profile_url\":\"https://yt.example/@KOL_B\",\"followers_count\":52000,\"verified\":false}"}""",
      // keyless profile → dropped
      """{"kol_id":null,"platform":"tiktok","source":"profiles","ingest_ts":"2025-01-02T00:00:00","payload":"{\"event_id\":\"p4\",\"event_time\":\"2025-01-01T12:00:00\",\"bio\":\"orphan\"}"}""",
      // videos: two for kol_a (one duplicated id), one for kol_b
      """{"kol_id":"kol_a","platform":"tiktok","source":"videos","ingest_ts":"2025-01-02T00:00:00","payload":"{\"event_id\":\"v1\",\"event_time\":\"2025-01-01T10:05:00\",\"username\":\"kol_a\",\"video_id\":\"vid1\",\"video_views\":100000,\"video_likes\":9000,\"video_comments\":500,\"video_shares\":250}"}""",
      """{"kol_id":"kol_a","platform":"tiktok","source":"videos","ingest_ts":"2025-01-02T00:00:00","payload":"{\"event_id\":\"v2\",\"event_time\":\"2025-01-01T10:06:00\",\"username\":\"kol_a\",\"video_id\":\"vid1\",\"video_views\":110000,\"video_likes\":9500,\"video_comments\":600,\"video_shares\":300}"}""",
      """{"kol_id":"kol_a","platform":"tiktok","source":"videos","ingest_ts":"2025-01-02T00:00:00","payload":"{\"event_id\":\"v3\",\"event_time\":\"2025-01-01T10:07:00\",\"username\":\"kol_a\",\"video_id\":\"vid2\",\"video_views\":50000,\"video_likes\":2000,\"video_comments\":100,\"video_shares\":50}"}""",
      """{"kol_id":"kol_b","platform":"youtube","source":"videos","ingest_ts":"2025-01-02T00:00:00","payload":"{\"event_id\":\"v4\",\"event_time\":\"2025-01-01T11:05:00\",\"username\":\"kol_b\",\"video_id\":\"vid9\",\"video_views\":2000000,\"video_likes\":150000,\"video_comments\":8000,\"video_shares\":4000}"}""")
    Files.write(new java.io.File(dir, "part-0.jsonl").toPath,
      lines.mkString("\n").getBytes)
    dir.getAbsolutePath
  }

  private lazy val envelope = Bronze.readEnvelope(spark, bronzeDir).cache()
  private lazy val profiles = BronzeToSilver.cleanProfiles(
    Bronze.parsePayload(envelope, "profiles", EventSchemas.profile))
  private lazy val content = BronzeToSilver.cleanContent(
    Bronze.parsePayload(envelope, "videos", EventSchemas.video))

  test("bronze envelope: canonical fields present and typed") {
    assert(envelope.columns.toSet ==
      Set("kol_id", "platform", "source", "payload", "ingest_ts"))
    assert(envelope.count() == 8)
  }

  test("silver profiles: K/M/B parsing, URL-derived username, latest wins, keyless dropped") {
    val rows = profiles.collect()
    assert(rows.length == 2, s"expected 2 profiles, got ${rows.length}")
    val a = rows.find(_.getAs[String]("username") == "kol_a").get
    assert(a.getAs[Long]("followers_count") == 901100L) // latest event wins
    assert(a.getAs[Long]("following_count") == 1030L)
    assert(a.getAs[Long]("likes_total") == 34000000L)
    assert(a.getAs[Boolean]("has_profile_image"))
    val b = rows.find(_.getAs[String]("username") == "kol_b").get
    assert(b.getAs[Long]("followers_count") == 52000L) // numeric preferred
    assert(!b.getAs[Boolean]("verified")) // coalesce(false)
  }

  test("silver content: duplicate video_id deduped to latest, rates guarded") {
    val rows = content.collect()
    assert(rows.length == 3)
    val vid1 = rows.find(_.getAs[String]("content_id") == "vid1").get
    assert(vid1.getAs[Long]("views") == 110000L) // v2 won
    assert(vid1.getAs[Long]("engagement_total") == 9500 + 600 + 300)
    // no duplicates by business key (reference invariant)
    assert(content.groupBy("content_id", "platform").count().filter($"count" > 1).count() == 0)
  }

  test("engagement metrics: multi-measure rollup with derived averages") {
    val m = BronzeToSilver.engagementMetrics(content)
      .filter($"username" === "kol_a").head()
    assert(m.getAs[Long]("total_views") == 160000L)
    assert(m.getAs[Long]("content_count") == 2L)
    assert(m.getAs[Long]("total_engagement") == (9500 + 600 + 300) + (2000 + 100 + 50))
    assert(m.getAs[Double]("avg_views_per_content") == 80000.0)
  }

  test("gold dim_kol: trust in [0,100], tiers, ratio; fact FKs resolve; KPI rollup") {
    val dim = SilverToGold.dimKol(profiles, None, Some(BronzeToSilver.engagementMetrics(content)))
    val rows = dim.collect()
    rows.foreach { r =>
      val t = r.getAs[Double]("trust_score")
      assert(t >= 0 && t <= 100, s"trust $t out of range")
    }
    val a = rows.find(_.getAs[String]("username") == "kol_a").get
    assert(a.getAs[String]("kol_tier") == "Macro") // 901k followers
    val fact = SilverToGold.factKolPerformance(content)
    assert(fact.filter($"platform_id" === 0).count() == 0, "unresolved platform FK")
    assert(fact.filter($"content_id" === "vid9").head().getAs[String]("performance_tier") == "viral")
    val kpi = SilverToGold.aggPlatformKpi(profiles, content).collect()
    val tiktok = kpi.find(_.getAs[String]("platform") == "tiktok").get
    assert(tiktok.getAs[Long]("kol_count") == 1L)
    assert(tiktok.getAs[Double]("verified_ratio") == 1.0)
  }

  test("dim_time covers the observed span with full date kit") {
    val dt = SilverToGold.dimTime(content, "event_time").collect()
    assert(dt.length == 1)
    val d = dt.head
    assert(d.getAs[Int]("date_id") == 20250101)
    assert(d.getAs[String]("quarter_label") == "Q1")
    assert(d.getAs[String]("day_name") == "Wednesday")
    assert(!d.getAs[Boolean]("is_weekend"))
  }

  test("serving: list/search/topK/faceted shapes honor whitelists and filters") {
    val dim = SilverToGold.dimKol(profiles, None, None)
    assert(Serving.listKols(dim, Some("tiktok"), "followers_count",
      descending = true, limit = 10, offset = 0).count() == 1)
    intercept[IllegalArgumentException] {
      Serving.listKols(dim, None, "bio; DROP TABLE", descending = true, 10, 0)
    }
    assert(Serving.searchKols(dim, "KOL_").head().getAs[String]("username") == "kol_a")
    assert(Serving.topK(dim, "followers_count", 1).head().getAs[String]("username") == "kol_a")
    val faceted = Serving.facetedSearch(dim, q = None, platform = None,
      minFollowers = Some(100000L), maxFollowers = None, verifiedOnly = true)
    assert(faceted.collect().map(_.getAs[String]("username")).toSeq == Seq("kol_a"))
    val stats = Serving.globalStats(dim).head()
    assert(stats.getAs[Long]("total_kols") == 2L)
    assert(stats.getAs[Long]("verified_count") == 1L)
  }

  test("O5 upsert: platform refresh is deterministic under key conflicts") {
    val existing = Seq(
      ("kol_a", "tiktok", 100L, "2025-01-01T00:00:00"),
      ("kol_x", "youtube", 50L, "2025-01-01T00:00:00"))
      .toDF("username", "platform", "followers_count", "event_time")
    val fresh = Seq(("kol_a", "tiktok", 999L, "2025-01-02T00:00:00"))
      .toDF("username", "platform", "followers_count", "event_time")
    val merged = BronzeToSilver.upsertPlatform(existing, fresh, "tiktok",
      Seq("username", "platform"), "event_time")
    assert(merged.count() == 2)
    assert(merged.filter($"username" === "kol_a").head().getAs[Long]("followers_count") == 999L)
  }

  test("trust features e2e: dirty timestamps through silver, gold training, 29 features") {
    // created_at 100 days before asOf; fully labeled bot
    val pj1 = """{"profile":{"screen_name":"bot_king","description":"crypto influencer","default_profile":false,"default_profile_image":false,"has_url":true,"verified":true,"followers_count":50000,"friends_count":100,"statuses_count":250,"favourites_count":10,"created_at":"2025-09-23 07:30:00"},"derived_features":{"followers_friends_ratio":500.0},"trust_label":{"is_bot":1,"is_human":0,"account_type":"bot"}}"""
    // malformed created_at, no description, default profile image, unlabeled
    val pj2 = """{"profile":{"screen_name":"mystery","default_profile_image":true,"statuses_count":10,"created_at":"around 2019 i think"},"derived_features":{},"trust_label":{}}"""
    // missing created_at, empty-string bio, labeled human
    val pj3 = """{"profile":{"screen_name":"fresh","description":"","followers_count":10,"friends_count":20,"statuses_count":5},"trust_label":{"is_bot":0,"is_human":1,"account_type":"human"}}"""
    val env = Seq(
      ("tw_1", "twitter", "twitter_human_bots", pj1, "2026-01-01T00:00:00"),
      ("tw_2", "twitter", "twitter_human_bots", pj2, "2026-01-01T00:00:00"),
      ("tw_3", "twitter", "twitter_human_bots", pj3, "2026-01-01T00:00:00"),
      ("kol_a", "tiktok", "profiles", "{}", "2026-01-01T00:00:00"))
      .toDF("kol_id", "platform", "source", "payload", "ingest_ts")

    val silver = BronzeToSilver.trustFeaturesSilver(
      BronzeToSilver.parseTwitterTrust(env), asOf = to_date(lit("2026-01-01")))
    val rows = silver.collect()
    assert(rows.length == 3) // non-twitter sources excluded
    val r1 = rows.find(_.getAs[String]("kol_id") == "tw_1").get
    assert(r1.getAs[Int]("account_age_days") == 100)
    assert(r1.getAs[Double]("posts_per_day") == 2.5)
    assert(r1.getAs[Boolean]("has_profile_image"))
    assert(r1.getAs[Boolean]("has_bio") && r1.getAs[Int]("bio_length") == 17)
    val r2 = rows.find(_.getAs[String]("kol_id") == "tw_2").get
    assert(r2.isNullAt(r2.fieldIndex("account_age_days")),
      "malformed timestamp must survive as NULL age in silver (reference reach)")
    assert(r2.getAs[Double]("posts_per_day") == 0.0)
    assert(!r2.getAs[Boolean]("has_profile_image")) // default image inverts
    assert(r2.getAs[String]("account_type") == "unknown")
    val r3 = rows.find(_.getAs[String]("kol_id") == "tw_3").get
    assert(r3.getAs[Int]("account_age_days") == 0) // null created_at → 0
    assert(!r3.getAs[Boolean]("has_bio") && r3.getAs[Int]("bio_length") == 0)

    val gold = SilverToGold.mlTrustTraining(silver)
    val goldRows = gold.collect()
    assert(goldRows.map(_.getAs[String]("kol_id")).toSet == Set("tw_1", "tw_3"),
      "unlabeled rows must not reach training")
    val g1 = goldRows.find(_.getAs[String]("kol_id") == "tw_1").get
    assert(g1.getAs[Int]("label") == 1 && g1.getAs[Int]("verified") == 1)
    assert(goldRows.find(_.getAs[String]("kol_id") == "tw_3").get.getAs[Int]("label") == 0)

    val feats = FeatureEngineering.trustFeatures(gold)
    assert(FeatureEngineering.featureColumns.forall(feats.columns.contains))
    val f1 = feats.filter($"kol_id" === "tw_1").head()
    assert(math.abs(f1.getAs[Double]("log_followers") - math.log1p(50000)) < 1e-12)
    assert(f1.getAs[Int]("followers_tier") == 2)
  }

  test("product tracker: incremental deltas equal batch rebuild; latest view") {
    def batch(rows: (String, String, Long)*) =
      rows.toSeq.map { case (p, t, c) => (p, t, c, "s1", "u1") }
        .toDF("product_id", "scraped_at", "sold_count", "seller_id", "username")
    val b1 = batch(("p1", "2025-01-01 00:00:00", 100L), ("p2", "2025-01-01 00:00:00", 50L))
    val b2 = batch(("p1", "2025-01-02 00:00:00", 130L), ("p3", "2025-01-02 00:00:00", 10L))
    val b3 = batch(("p1", "2025-01-03 00:00:00", 130L), ("p2", "2025-01-03 00:00:00", 75L))

    // the reference's incremental run loop: delta vs last known history
    val t1 = ProductTracker.withSoldDelta(b1, None)
    val t2 = ProductTracker.withSoldDelta(b2, Some(t1))
    val t3 = ProductTracker.withSoldDelta(b3, Some(t1.unionByName(t2)))
    val incremental = t1.unionByName(t2).unionByName(t3)
    // batch replay over the full series must agree row-for-row
    val rebuilt = ProductTracker.rebuildDeltas(b1.unionByName(b2).unionByName(b3))
      .select(incremental.columns.map(col): _*)
    val key = Seq("product_id", "scraped_at")
    assert(incremental.orderBy(key.map(col): _*).collect().toSeq ==
      rebuilt.orderBy(key.map(col): _*).collect().toSeq)

    val deltas = incremental.collect()
      .map(r => (r.getAs[String]("product_id"), r.getAs[String]("scraped_at")) ->
        r.getAs[Long]("sold_delta")).toMap
    assert(deltas(("p1", "2025-01-01 00:00:00")) == 0L) // first run
    assert(deltas(("p1", "2025-01-02 00:00:00")) == 30L)
    assert(deltas(("p1", "2025-01-03 00:00:00")) == 0L) // unchanged count
    assert(deltas(("p2", "2025-01-03 00:00:00")) == 25L)
    assert(deltas(("p3", "2025-01-02 00:00:00")) == 0L) // first-seen mid-series

    val latest = ProductTracker.latestSoldView(incremental)
    assert(latest.count() == 3)
    assert(latest.filter($"product_id" === "p1").head().getAs[Long]("sold_count") == 130L)
    assert(latest.filter($"product_id" === "p2").head().getAs[String]("scraped_at")
      == "2025-01-03 00:00:00")
  }

  test("silver discovery: latest round wins, defaults coalesced, keyless dropped") {
    val lines = Seq(
      """{"event_id":"e1","event_time":"2025-01-01T00:00:00","platform":"tiktok","username":"kol_x","discovered_from":"seed","discovery_score":0.8,"discovery_round":1,"followers":100}""",
      """{"event_id":"e2","event_time":"2025-01-02T00:00:00","platform":"tiktok","username":"kol_x","discovered_from":"kol_a","discovery_round":2}""",
      """{"event_id":"e3","event_time":"2025-01-01T00:00:00","platform":"tiktok"}""")
    val df = lines.toDF("json")
      .select(from_json($"json", EventSchemas.discovery).as("d")).select("d.*")
    val out = BronzeToSilver.cleanDiscovery(df)
    assert(out.count() == 1) // keyless dropped, rounds collapsed
    val x = out.head()
    assert(x.getAs[Long]("discovery_round") == 2L) // latest round wins
    assert(x.getAs[String]("discovered_from") == "kol_a")
    assert(x.getAs[Long]("followers") == 0L) // absent in winning round → 0
    assert(x.getAs[Double]("discovery_score") == 0.0)
    assert(x.getAs[String]("predicted_niche") == "unknown")
    assert(!x.getAs[Boolean]("verified"))
  }

  test("silver comments and products: trim/dedupe/U1-fallback discipline") {
    val comments = Seq(
      """{"event_id":"c1","event_time":"2025-01-01T00:00:00","platform":"tiktok","video_id":"v1","username":"u1","comment_text":"  nice video  "}""",
      """{"event_id":"c2","event_time":"2025-01-02T00:00:00","platform":"tiktok","video_id":"v1","username":"u1","comment_text":"nice video"}""",
      """{"event_id":"c3","event_time":"2025-01-01T00:00:00","platform":"tiktok","video_id":"v1","username":"u2","comment_text":"   "}""",
      """{"event_id":"c4","event_time":"2025-01-01T00:00:00","platform":"tiktok","video_id":"v2","username":"u3","comment_text":"ok"}""")
      .toDF("json").select(from_json($"json", EventSchemas.comment).as("d")).select("d.*")
    val cleanedC = BronzeToSilver.cleanComments(comments)
    assert(cleanedC.count() == 2) // trimmed dup collapsed, blank dropped
    val c = cleanedC.filter($"video_id" === "v1").head()
    assert(c.getAs[String]("comment_text") == "nice video")
    assert(c.getAs[Int]("comment_length") == 10)
    assert(c.getAs[String]("event_time") == "2025-01-02T00:00:00") // latest kept

    val products = Seq(
      """{"event_id":"p1","event_time":"2025-01-01T00:00:00","platform":"tiktok","username":"u1","product_id":"pr1","sold_count_raw":"1.5K","video_views":200,"video_likes":30,"video_comments":10,"video_shares":10}""",
      """{"event_id":"p2","event_time":"2025-01-02T00:00:00","platform":"tiktok","username":"u1","product_id":"pr1","sold_count":2000,"video_views":400,"video_likes":40,"video_comments":20,"video_shares":20,"price":9.99,"currency":"VND"}""",
      """{"event_id":"p3","event_time":"2025-01-01T00:00:00","platform":"tiktok","username":"u2"}""")
      .toDF("json").select(from_json($"json", EventSchemas.product).as("d")).select("d.*")
    val cleanedP = BronzeToSilver.cleanProducts(products)
    assert(cleanedP.count() == 1) // keyless dropped, latest per product wins
    val p = cleanedP.head()
    assert(p.getAs[Long]("sold_count") == 2000L)
    assert(p.getAs[Double]("price") == 9.99 && p.getAs[String]("currency") == "VND")
    assert(p.getAs[Long]("engagement_total") == 80L)
    assert(p.getAs[Double]("engagement_rate") == 20.0) // 80/400*100
    // the raw-count fallback path on the superseded row still parses
    val withRaw = BronzeToSilver.cleanProducts(products.filter($"event_id" === "p1")).head()
    assert(withRaw.getAs[Long]("sold_count") == 1500L)
  }
}
