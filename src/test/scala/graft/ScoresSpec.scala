package graft

import graft.functions.Scores
import org.apache.spark.sql.functions._

/** Pin the reference's scoring semantics (SURVEY.md §2.9, §7.4 hard-part 1):
  * count-parser edge cases, score ranges [0,100], and exact label
  * boundaries. These are golden tests — the constants must never drift.
  * Property-style inputs are deterministic pseudo-random grids evaluated in
  * a single DataFrame per test (one Spark job, not one per sample).
  */
class ScoresSpec extends SparkSpec {
  import sqlImplicits._

  private def parse(values: (String, Long)*): Unit = {
    val df = values.map(_._1).toDF("raw")
      .withColumn("parsed", Scores.parseCountString(col("raw")))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    values.foreach { case (raw, want) =>
      assert(got(raw) == want, s"parseCountString('$raw') = ${got(raw)}, want $want")
    }
  }

  test("U1 parseCountString: reference examples and dirty variants") {
    parse(
      "852.3K" -> 852300L, "1.2M" -> 1200000L, "3B" -> 3000000000L,
      "1,024" -> 1024L, "36.5K" -> 36500L, "11.3k" -> 11300L,
      "12.34" -> 12L, "0" -> 0L, "" -> 0L, "garbage" -> 0L,
      "x123" -> 0L, "1.2.3K" -> 0L, " 42 " -> 42L, "-5K" -> -5000L)
  }

  test("U1 parseCountString: null → 0") {
    val got = Seq[Option[String]](None).toDF("raw")
      .select(Scores.parseCountString(col("raw"))).head().getLong(0)
    assert(got == 0L)
  }

  test("U2 trending score stays in [0,100] and labels match boundaries") {
    val rng = new scala.util.Random(42)
    val rows = Seq.fill(500) {
      val prev = if (rng.nextBoolean()) Some(rng.nextLong(10000000L)) else None
      (rng.nextLong(100000L), rng.nextLong(10000000L), prev)
    }
    val df = rows.toDF("n", "eng", "prev")
      .withColumn("v", Scores.velocity(col("n"), col("eng")))
      .withColumn("score", Scores.trendingScore(
        col("v"), lit(100.0), lit(100.0), Scores.momentum(col("eng"), col("prev"))))
      .withColumn("label", Scores.trendingLabel(col("score")))
    df.select("score", "label").collect().foreach { r =>
      val (score, label) = (r.getDouble(0), r.getString(1))
      assert(score >= 0.0 && score <= 100.0)
      val want =
        if (score >= 80) "Viral" else if (score >= 60) "Hot"
        else if (score >= 40) "Warm" else if (score >= 25) "Normal" else "Cold"
      assert(label == want)
    }
  }

  test("U2 label boundaries are inclusive at 80/60/40/25") {
    val df = Seq(80.0, 79.999, 60.0, 59.999, 40.0, 39.999, 25.0, 24.999)
      .toDF("score").withColumn("label", Scores.trendingLabel(col("score")))
    val got = df.collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got(80.0) == "Viral" && got(79.999) == "Hot")
    assert(got(60.0) == "Hot" && got(59.999) == "Warm")
    assert(got(40.0) == "Warm" && got(39.999) == "Normal")
    assert(got(25.0) == "Normal" && got(24.999) == "Cold")
  }

  test("U4 trust score clamps to [0,100] for arbitrary inputs") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(500) {
      (rng.nextBoolean(), rng.nextBoolean(), rng.between(-100, 100000),
        rng.between(-1000L, 100000000L), rng.nextLong(100000L), rng.between(0, 3))
    }
    val scores = rows.toDF("ver", "img", "age", "fol", "fow", "bad")
      .select(Scores.trustScore(col("ver"), col("img"), col("age"),
        col("fol"), col("fow"), col("bad")).as("s"))
      .collect().map(_.getDouble(0))
    scores.foreach(s => assert(s >= 0.0 && s <= 100.0, s"trust=$s out of range"))
  }

  test("U5 success score caps at 100 and High threshold at 50") {
    val df = Seq(
      (1e12, 1e6, 1e6, 1e12), // everything maxed → 30+30+20+20
      (0.0, 0.0, 0.0, 0.0)) // floor → 0
      .toDF("views", "rate", "ctr", "eng")
      .select(Scores.successScore(col("views"), col("rate"), col("ctr"), col("eng")).as("s"))
    val got = df.collect().map(_.getDouble(0)).sorted
    assert(got(0) == 0.0 && got(1) == 100.0)
  }

  test("U6 composite weights 0.4/0.35/0.25") {
    val got = Seq((100.0, 100.0, 100.0)).toDF("t", "s", "tr")
      .select(Scores.compositeScore(col("t"), col("s"), col("tr")).as("c"))
      .head().getDouble(0)
    assert(math.abs(got - 100.0) < 1e-9)
  }

  test("U8 time decay: half-life at exactly 7 days; future events full weight") {
    val df = Seq(0.0, 7.0, 14.0, -3.0).toDF("d")
      .select(col("d"), Scores.timeDecayWeight(col("d")).as("w"))
    val got = df.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(0.0) - 1.0) < 1e-12)
    assert(math.abs(got(7.0) - 0.5) < 1e-12)
    assert(math.abs(got(14.0) - 0.25) < 1e-12)
    assert(math.abs(got(-3.0) - 1.0) < 1e-12)
  }

  test("U8 engagement weight in [0.1, 1.0]") {
    val df = Seq(-5.0, 0.0, 100.0, 10000.0, 1e12).toDF("v")
      .select(Scores.engagementWeight(col("v"), lit(10000.0)).as("w"))
    df.collect().map(_.getDouble(0)).foreach { w =>
      assert(w >= 0.1 - 1e-12 && w <= 1.0 + 1e-12)
    }
  }
}
