package graft

import graft.sources.Bronze
import graft.streaming.EventSchemas
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Adversarial wire-format fuzz (VERDICT r12 #8): the parse paths (P4
  * envelope → payload, U1 K/M/B count strings, timestamp strings) are
  * spec-pinned on FIXTURES shapes elsewhere; here a ScalaCheck
  * generator produces 10k adversarial envelopes per run — truncated
  * JSON, wrong-typed fields, K/M/B garble, mixed timestamp formats,
  * empty/whitespace/null payloads, unicode noise — and pins:
  *
  *  1. no crash anywhere in the path (generation → quarantine split →
  *     full evaluation of both frames);
  *  2. EXACT quarantine accounting: good + quarantined = input, with
  *     the quarantined count equal to the generator's known-corrupt
  *     count (every adversarial class lands dead-letter, every clean
  *     row survives) — the split is a partition, never lossy or dupy;
  *  3. parseCountString agrees with an independent reference
  *     implementation of its documented semantics on every generated
  *     string (valid forms get suffix math, everything else 0, never
  *     null);
  *  4. timestamp parsing of adversarial strings nulls instead of
  *     throwing.
  *
  * Generation is seeded (Gen.pureApply) so a failure reproduces; the 10k
  * cases run as ONE DataFrame through one split — properties over the
  * batch, not 10k Spark jobs.
  */
class WireFormatFuzzSpec extends SparkSpec {

  private val N = 10000

  private def sample[A](g: Gen[A], seed: Long, n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default,
      rng.Seed(seed + i)))

  // ---- adversarial payload generator, tagged by expected outcome ----

  private val asciiNoise: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ':', ',', '"',
      '[', ']', '.', '-', '\t'))).map(_.mkString)

  private val tsGarble: Gen[String] = Gen.oneOf(
    Gen.const("2026-08-16T01:02:03Z"),
    Gen.const("2026-08-16 01:02:03"),
    Gen.const("16/08/2026"),
    Gen.const("1755306123"),
    Gen.const("not a time"),
    Gen.const(""),
    asciiNoise)

  private val kmbGarble: Gen[String] = Gen.oneOf(
    Gen.const("1.2K"), Gen.const("3m"), Gen.const("4.5B"), Gen.const("12,345"),
    Gen.const("1.2.3"), Gen.const("1e5"), Gen.const("NaN"), Gen.const("-7.5k"),
    Gen.const("K"), Gen.const(".5M"), Gen.const("  42 "), Gen.const("∞"),
    Gen.const("١٢٣"), asciiNoise)

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** (tag, payload): tag "clean" parses; anything else must quarantine. */
  private val envelopePayload: Gen[(String, String)] = {
    val clean = for {
      u <- Gen.alphaNumStr.map(_.take(12))
      f <- Gen.chooseNum(0L, 1000000L)
      ts <- tsGarble // event_time is string-typed on the wire: any string is clean
      raw <- kmbGarble // followers_raw likewise
    } yield ("clean",
      s"""{"username": ${jsonStr(u)}, "followers_count": $f, """ +
        s""""event_time": ${jsonStr(ts)}, "followers_raw": ${jsonStr(raw)}}""")
    val wrongType = Gen.oneOf(
      """{"followers_count": "abc"}""",
      """{"followers_count": 1.7}""",
      """{"verified": "maybe"}""",
      """{"followers_count": [1, 2]}""").map("wrongtype" -> _)
    val truncated = clean.map { case (_, p) =>
      "truncated" -> p.dropRight(1 + p.length % 7)
    }
    val nonObject = Gen.oneOf("null", "123", "[1,2]", "true",
      "\"just a string\"").map("nonobject" -> _)
    val emptyish = Gen.oneOf("", " ", "\t", "   \n", null: String)
      .map("emptyish" -> _)
    val garble = asciiNoise
      .map(s => "garble" -> ("x" + s)) // never starts as valid JSON
    Gen.frequency(4 -> clean, 2 -> wrongType, 2 -> truncated,
      1 -> nonObject, 1 -> emptyish, 2 -> garble)
  }

  test(s"quarantine accounting exact over $N adversarial envelopes") {
    import sqlImplicits._
    val cases = sample(envelopePayload, seed = 13L, n = N)
    val rows = cases.zipWithIndex.map { case ((tag, payload), i) =>
      (s"kol$i", "tiktok", "profiles", payload, "2026-08-16T00:00:00Z", tag)
    }
    val env = rows.toDF("kol_id", "platform", "source", "payload",
      "ingest_ts", "tag")
    val nClean = cases.count(_._1 == "clean").toLong
    val (good, bad) = Bronze.parsePayloadWithQuarantine(
      env.drop("tag"), "profiles", EventSchemas.profile)
    // 1. full evaluation of both frames never throws
    val nGood = good.count()
    val nBad = bad.count()
    // 2. the split is an exact partition with the generator's counts
    assert(nGood + nBad == N.toLong, s"lost/duplicated rows: $nGood + $nBad")
    assert(nGood == nClean, s"good=$nGood expected $nClean")
    assert(nBad == N - nClean, s"quarantined=$nBad expected ${N - nClean}")
    // every clean row keeps its envelope identity; no corrupt shells
    // (a good row always has SOME parsed field — username is generated)
    assert(good.filter(col("username").isNull).count() == 0L)
    // the dead-letter frame carries the raw payload for replay
    assert(bad.columns.toSeq ==
      Seq("kol_id", "platform", "source", "payload", "ingest_ts"))
  }

  test(s"parseCountString matches the reference semantics on $N garbled strings") {
    import sqlImplicits._
    // independent reimplementation of the DOCUMENTED semantics
    // (Scores.parseCountString scaladoc): trim, strip commas, upcase;
    // ^-?(\d+\.?\d*|\.\d+)[KMB]?$ or 0; suffix math; truncate to long
    def ref(s0: String): Long = {
      if (s0 == null) return 0L
      val s = s0.trim.replace(",", "").toUpperCase(java.util.Locale.ROOT)
      val valid = s.matches("^-?([0-9]+\\.?[0-9]*|\\.[0-9]+)[KMB]?$")
      if (!valid) 0L
      else {
        val num = "^(-?([0-9]+\\.?[0-9]*|\\.[0-9]+))".r
          .findFirstIn(s).get.toDouble
        val mult =
          if (s.endsWith("B")) 1e9
          else if (s.endsWith("M")) 1e6
          else if (s.endsWith("K")) 1e3
          else 1.0
        (num * mult).toLong
      }
    }
    val strs = sample(kmbGarble, seed = 29L, n = N)
    val got = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("i", "s")
      .withColumn("v", graft.functions.Scores.parseCountString(col("s")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    strs.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == ref(s),
        s"parseCountString('${s}') = ${got(i.toLong)}, reference ${ref(s)}")
    }
  }

  test("adversarial timestamp strings null out under the try_ forms") {
    import sqlImplicits._
    // Spark 4 is ANSI by default: plain to_timestamp THROWS
    // SparkDateTimeException on garble (this fuzz surfaced it) — the
    // engine's parse paths therefore use the try_ family
    // (BronzeToSilver's try_to_date); pin that contract on the
    // adversarial corpus
    val strs = sample(tsGarble, seed = 47L, n = 2000)
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("i", "s")
      .withColumn("ts",
        expr("try_to_timestamp(s, 'yyyy-MM-dd\\'T\\'HH:mm:ssX')"))
      .withColumn("ts2", expr("try_to_timestamp(s)"))
    // full evaluation without exception; unparseable forms are null
    val n = df.count()
    assert(n == 2000L)
    assert(df.filter(col("s") === "not a time" && col("ts2").isNotNull)
      .count() == 0L)
    assert(df.filter(col("s") === "2026-08-16T01:02:03Z" && col("ts").isNull)
      .count() == 0L)
  }
}
