package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** U7 — the 29-dim trust feature pipeline
  * (`batch/feature_store/feature_engineering.py:154-398`, feature list
  * `:400-445`) as pure column expressions: log transforms, capped ratios,
  * derived rates, 5 fraud-indicator flags, 3 tier binnings, 3
  * interactions, null fill. One narrow projection pass — no shuffle, no
  * UDF; at 100 TB this runs at scan speed.
  *
  * Expected input columns (silver `kol_trust_features` shape):
  * followers_count, following_count, post_count, favorites_count,
  * account_age_days, followers_following_ratio, posts_per_day, bio_length,
  * has_bio, has_url, has_profile_image, verified, default_profile,
  * default_profile_image (numeric 0/1 flags).
  */
object FeatureEngineering {

  val featureColumns: Seq[String] = Seq(
    "log_followers", "log_following", "log_posts", "log_favorites",
    "log_account_age",
    "followers_following_ratio_capped", "posts_per_day_capped",
    "engagement_rate", "activity_score", "profile_completeness",
    "followers_per_day", "posts_per_follower", "following_per_day",
    "bio_length_norm",
    "high_activity_flag", "low_engagement_high_posts",
    "default_profile_score", "suspicious_growth", "fake_follower_indicator",
    "followers_tier", "account_age_tier", "activity_tier",
    "verified_followers_interaction", "profile_engagement_interaction",
    "age_activity_interaction",
    "has_bio", "has_url", "has_profile_image", "verified")

  def trustFeatures(df: DataFrame): DataFrame = {
    val engineered = df
      // 1. log transforms
      .withColumn("log_followers", log1p(col("followers_count")))
      .withColumn("log_following", log1p(col("following_count")))
      .withColumn("log_posts", log1p(col("post_count")))
      .withColumn("log_favorites", log1p(col("favorites_count")))
      .withColumn("log_account_age", log1p(col("account_age_days")))
      // 2. ratio capping
      .withColumn("followers_following_ratio_capped",
        when(col("followers_following_ratio") > 10000, 10000.0)
          .otherwise(col("followers_following_ratio")))
      .withColumn("posts_per_day_capped",
        when(col("posts_per_day") > 50, 50.0).otherwise(col("posts_per_day")))
      // 3. derived features
      .withColumn("engagement_rate",
        col("favorites_count") / (col("post_count") + 1))
      .withColumn("activity_score",
        col("posts_per_day_capped") * sqrt(col("engagement_rate") + 1))
      .withColumn("profile_completeness",
        (col("has_bio") + col("has_url") + col("has_profile_image")) / 3.0)
      .withColumn("followers_per_day",
        col("followers_count") / (col("account_age_days") + 1))
      .withColumn("posts_per_follower",
        col("post_count") / (col("followers_count") + 1))
      .withColumn("following_per_day",
        col("following_count") / (col("account_age_days") + 1))
      .withColumn("bio_length_norm", least(col("bio_length") / 200.0, lit(1.0)))
      // 4. untrustworthy indicators
      .withColumn("high_activity_flag",
        when(col("posts_per_day") > 20, 1).otherwise(0))
      .withColumn("low_engagement_high_posts",
        when(col("engagement_rate") < 0.01 && col("post_count") > 1000, 1).otherwise(0))
      .withColumn("default_profile_score",
        col("default_profile") + col("default_profile_image"))
      .withColumn("suspicious_growth",
        when(col("followers_per_day") > 100 && col("account_age_days") < 365, 1)
          .otherwise(0))
      .withColumn("fake_follower_indicator",
        when(col("followers_count") > 10000 && col("engagement_rate") < 0.1, 1)
          .otherwise(0))
      // 5. binning
      .withColumn("followers_tier",
        when(col("followers_count") < 1000, 0)
          .when(col("followers_count") < 10000, 1)
          .when(col("followers_count") < 100000, 2)
          .when(col("followers_count") < 1000000, 3)
          .otherwise(4))
      .withColumn("account_age_tier",
        when(col("account_age_days") < 365, 0)
          .when(col("account_age_days") < 730, 1)
          .when(col("account_age_days") < 1825, 2)
          .otherwise(3))
      .withColumn("activity_tier",
        when(col("posts_per_day") < 0.5, 0)
          .when(col("posts_per_day") < 2, 1)
          .when(col("posts_per_day") < 10, 2)
          .otherwise(3))
      // 6. interactions
      .withColumn("verified_followers_interaction",
        col("verified") * col("log_followers"))
      .withColumn("profile_engagement_interaction",
        col("profile_completeness") * col("engagement_rate"))
      .withColumn("age_activity_interaction",
        col("log_account_age") * (lit(1.0) / (col("posts_per_day_capped") + 1)))
    // 7. null fill over the feature set
    engineered.na.fill(0, featureColumns)
  }

  /** The ml_trust_training selection: id + label + the 29 features. */
  def trainingTable(df: DataFrame, idCol: String = "kol_id",
      labelCol: String = "label"): DataFrame =
    trustFeatures(df).select((Seq(idCol, labelCol) ++ featureColumns).map(col): _*)
}
