package graft

import graft.etl.FeatureEngineering
import org.apache.spark.sql.functions._

/** U7 feature pipeline: shape (29 features), golden values for a known
  * row, fraud-flag boundaries, null-fill discipline.
  */
class FeatureEngineeringSpec extends SparkSpec {
  import sqlImplicits._

  private def base(followers: Long, following: Long, posts: Long, favs: Long,
      ageDays: Int, ppd: Double, bio: Int) =
    (followers, following, posts, favs, ageDays,
      if (following > 0) followers.toDouble / following else followers.toDouble,
      ppd, bio, 1, 0, 1, 1, 0, 0)

  private val cols = Seq("followers_count", "following_count", "post_count",
    "favorites_count", "account_age_days", "followers_following_ratio",
    "posts_per_day", "bio_length", "has_bio", "has_url", "has_profile_image",
    "verified", "default_profile", "default_profile_image")

  test("29 features with golden values for a trusted-looking account") {
    val df = Seq(base(50000L, 500L, 2000L, 40000L, 1500, 1.4, 120)).toDF(cols: _*)
    val out = FeatureEngineering.trustFeatures(df)
    assert(FeatureEngineering.featureColumns.length == 29)
    FeatureEngineering.featureColumns.foreach(c =>
      assert(out.columns.contains(c), s"missing feature $c"))
    val r = out.head()
    assert(math.abs(r.getAs[Double]("log_followers") - math.log1p(50000)) < 1e-12)
    assert(r.getAs[Double]("engagement_rate") == 40000.0 / 2001.0)
    assert(r.getAs[Double]("profile_completeness") == 2.0 / 3.0) // bio+img, no url
    assert(r.getAs[Int]("followers_tier") == 2) // mid
    assert(r.getAs[Int]("account_age_tier") == 2) // 2-5y
    assert(r.getAs[Int]("high_activity_flag") == 0)
    assert(r.getAs[Int]("fake_follower_indicator") == 0)
    assert(r.getAs[Double]("bio_length_norm") == 0.6)
  }

  test("fraud flags fire on the reference's thresholds") {
    val bot = Seq(base(20000L, 10L, 5000L, 10L, 100, 30.0, 0)).toDF(cols: _*)
    val r = FeatureEngineering.trustFeatures(bot).head()
    assert(r.getAs[Int]("high_activity_flag") == 1) // ppd > 20
    assert(r.getAs[Int]("low_engagement_high_posts") == 1) // rate<0.01 & posts>1000
    assert(r.getAs[Int]("suspicious_growth") == 1) // 200 fol/day, age<365
    assert(r.getAs[Int]("fake_follower_indicator") == 1) // 20k fol, rate<0.1
    assert(r.getAs[Double]("followers_following_ratio_capped") == 2000.0)
    assert(r.getAs[Double]("posts_per_day_capped") == 30.0)
  }

  test("nulls fill to 0 across the feature set") {
    val withNulls = Seq(base(1000L, 10L, 5L, 5L, 10, 0.5, 10)).toDF(cols: _*)
      .withColumn("followers_following_ratio",
        lit(null).cast("double")) // simulate missing upstream ratio
    val r = FeatureEngineering.trustFeatures(withNulls).head()
    assert(r.getAs[Double]("followers_following_ratio_capped") == 0.0)
  }

  test("trainingTable selects id + label + 29 features") {
    val df = Seq(base(1000L, 10L, 5L, 5L, 10, 0.5, 10)).toDF(cols: _*)
      .withColumn("kol_id", lit("k1")).withColumn("label", lit(0))
    val t = FeatureEngineering.trainingTable(df)
    assert(t.columns.length == 31)
    assert(t.columns.take(2).sameElements(Array("kol_id", "label")))
  }
}
