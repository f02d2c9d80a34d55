package graft

import graft.operators.{BinPack, Profile, Quantize}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the corpus-admission layer (q101–q105): next-fit bin
  * packing, int8 quantization, the column profiler, and the constraint
  * checks — on crafted frames where the expected answers are computable
  * by hand (the oracle queries pin the real-data behavior).
  */
class ValidationOpsSpec extends AnyFunSuite with SparkSpec {

  import sqlImplicits._

  // ---- BinPack.nextFit ----------------------------------------------

  private def packed(rows: Seq[(String, Long, Long)], capacity: Long) = {
    val df = rows.toDF("lane", "id", "n")
    BinPack.nextFit(df, Seq("lane"), "id", "n", capacity)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
  }

  test("nextFit packs greedily in order, resetting per lane") {
    val out = packed(Seq(
      ("a", 1L, 60L), ("a", 2L, 50L), ("a", 3L, 30L), ("a", 4L, 10L),
      ("b", 1L, 100L), ("b", 2L, 1L)), capacity = 100L)
    // lane a: 60+50>100 → new bin; 50+30<=100 stays; +10 <= 100 stays
    assert(out === Seq(
      ("a", 1L, 60L, 0L, 60L), ("a", 2L, 50L, 1L, 50L),
      ("a", 3L, 30L, 1L, 80L), ("a", 4L, 10L, 1L, 90L),
      ("b", 1L, 100L, 0L, 100L), ("b", 2L, 1L, 1L, 1L)))
  }

  test("nextFit gives an oversized document its own overflowing bin") {
    val out = packed(Seq(
      ("a", 1L, 10L), ("a", 2L, 500L), ("a", 3L, 10L)), capacity = 100L)
    assert(out === Seq(
      ("a", 1L, 10L, 0L, 10L),
      ("a", 2L, 500L, 1L, 500L), // overflows alone, never dropped
      ("a", 3L, 10L, 2L, 10L)))
  }

  test("nextFit zero-count rows join the current bin without opening one") {
    val out = packed(Seq(("a", 1L, 0L), ("a", 2L, 100L), ("a", 3L, 0L)), 100L)
    assert(out.map(_._4).toSeq === Seq(0L, 0L, 0L))
  }

  test("nextFit is invariant to input partitioning") {
    val rows = (1L to 200L).map(i => (s"lane${i % 7}", i, (i * 13) % 50 + 1))
    val a = packed(rows, 120L)
    val b = {
      val df = rows.toDF("lane", "id", "n").repartition(13)
      BinPack.nextFit(df, Seq("lane"), "id", "n", 120L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(t => (t._1, t._2))
    }
    assert(a === b)
    // every row appears exactly once
    assert(a.length === 200)
    // capacity respected whenever a bin holds >1 row
    val binTotal = a.groupBy(t => (t._1, t._4)).values
    binTotal.foreach { rs =>
      if (rs.length > 1) assert(rs.map(_._3).sum <= 120L)
    }
    // bins are contiguous, 0-based, fill is the running sum within a bin
    a.groupBy(_._1).values.foreach { laneRows =>
      val bins = laneRows.sortBy(_._2).map(_._4)
      assert(bins.head === 0L)
      bins.sliding(2).foreach {
        case Array(x, y) => assert(y === x || y === x + 1)
        case _ =>
      }
    }
  }

  // ---- Quantize ------------------------------------------------------

  test("int8 roundtrip error is bounded by scale/2 per dimension") {
    val df = Seq(
      (1L, Array(0.5f, -1.25f, 3.75f, 0.0f)),
      (2L, Array(-0.001f, 0.002f, -0.003f, 0.004f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // all-zero → scale 0, codes 0
    ).toDF("vec_id", "embedding")
    val out = df
      .withColumn("scale", Quantize.scaleOf($"embedding"))
      .withColumn("q", Quantize.int8Codes($"embedding", $"scale"))
      .withColumn("err", Quantize.errorMicros($"embedding", $"q", $"scale"))
      .collect()
    out.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val q = r.getAs[scala.collection.Seq[Int]]("q")
      val errU = r.getAs[scala.collection.Seq[Long]]("err")
      assert(q.forall(c => c >= -127 && c <= 127))
      // |v - q*scale| <= scale/2 (+1 micro-unit of floor slack)
      errU.foreach(e => assert(e <= math.floor(scale / 2 * 1e7 + 0.5).toLong + 1))
      if (scale == 0.0) assert(q.forall(_ == 0) && errU.forall(_ == 0L))
    }
    // the max-|v| dimension quantizes to ±127 exactly
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[scala.collection.Seq[Int]]("q")(2) === 127)
  }

  test("quantization on real embeddings never clips and keeps sign") {
    val e = Tables.embeddings(spark, sf())
      .withColumn("scale", Quantize.scaleOf($"embedding"))
      .withColumn("q", Quantize.int8Codes($"embedding", $"scale"))
      .select(
        max(array_max($"q")).as("qmax"),
        min(array_min($"q")).as("qmin"),
        sum(size(filter(zip_with($"embedding", $"q",
          (v, q) => (v > 0.0f && q < 0) || (v < 0.0f && q > 0)),
          x => x))).as("sign_flips"))
      .head()
    assert(e.getAs[Int]("qmax") <= 127 && e.getAs[Int]("qmin") >= -127)
    assert(e.getAs[Long]("sign_flips") === 0L)
  }

  // ---- Profile -------------------------------------------------------

  test("columnProfile counts nulls, distincts and ranges in one pass") {
    val df = Seq[(java.lang.Long, String, String)](
      (1L, "en", "alpha"), (2L, "en", null), (3L, null, "beta"),
      (null, "de", "beta"), (5L, "de", "beta")
    ).toDF("id", "lang", "note")
    val p = Profile.columnProfile(df, numericCols = Seq("id"),
      stringCols = Seq("lang"), countOnlyCols = Seq("note"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "lang", "note"))
    val id = p("id")
    assert(id.getLong(1) === 5L && id.getLong(2) === 1L && id.getLong(3) === 4L)
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 5.0)
    assert(id.isNullAt(6) && id.isNullAt(7))
    val lang = p("lang")
    assert(lang.getLong(2) === 1L && lang.getLong(3) === 2L)
    assert(lang.getString(6) === "de" && lang.getString(7) === "en")
    val note = p("note")
    assert(note.getLong(2) === 1L && note.getLong(3) === 2L)
    assert(note.isNullAt(4) && note.isNullAt(6))
  }

  test("constraint checks flag planted violations") {
    // q104's shape on a frame with a duplicate id and a bad n_chars
    val df = Seq((1L, "ab", 2L), (1L, "cde", 3L), (2L, "fg", 99L))
      .toDF("doc_id", "text", "n_chars")
    val dup = df.agg((count(lit(1)) - countDistinct($"doc_id")).as("v")).head().getLong(0)
    val bad = df.agg(sum(when($"n_chars" =!= length($"text"), 1L).otherwise(0L)).as("v"))
      .head().getLong(0)
    assert(dup === 1L && bad === 1L)
  }

  test("corpus datasheet: totals reconcile, dup mass counts whole collision groups") {
    val df = Seq(
      (1L, "a b c", "en", 5L, "s1"), (2L, "c b a", "en", 5L, "s1"),
      (3L, "a b c d", "fr", 7L, "s1"), (4L, "x y", "en", 3L, "s2"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    val ds = graft.operators.Profile.corpusDatasheet(df)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val s1 = ds("s1")
    // docs 1 and 2 share a bag-of-words fingerprint: BOTH count as dup mass
    assert(s1.getAs[Long]("n_dup_docs") == 2L)
    assert(s1.getAs[Long]("n_docs") == 3L && s1.getAs[Long]("n_langs") == 2L)
    assert(s1.getAs[Long]("n_tokens") == 10L && s1.getAs[Long]("n_chars") == 17L)
    assert(ds("s2").getAs[Long]("n_dup_docs") == 0L)
    // keep counts can never exceed doc counts
    assert(ds.values.forall(r =>
      r.getAs[Long]("n_quality_keep") <= r.getAs[Long]("n_docs")))
  }

  test("lexicalDiversity: hand-computed TTR/trigram ratios, empty and short docs") {
    import graft.operators.Profile
    val docs = Seq(
      // s1: "a b c d" + "a b c d" → 8 tokens, 4 types (ttr 5000);
      // trigrams per doc (distinct): {a b c, b c d} ×2 → 4 postings,
      // 2 distinct (diversity 5000)
      ("s1", "a b c d"), ("s1", "a b c d"),
      // s2: one short doc (2 tokens → ONE full-run gram) + one empty doc
      ("s2", "x y"), ("s2", ""),
      // s3: fully organic single doc
      ("s3", "p q r s t")).toDF("source", "text")
    val got = Profile.lexicalDiversity(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = got("s1")
    assert(s1.getAs[Long]("n_tokens") == 8L && s1.getAs[Long]("n_types") == 4L)
    assert(s1.getAs[Long]("ttr_bp") == 5000L)
    assert(s1.getAs[Long]("n_trigrams") == 4L &&
      s1.getAs[Long]("n_distinct_trigrams") == 2L)
    assert(s1.getAs[Long]("trigram_diversity_bp") == 5000L)
    val s2 = got("s2")
    assert(s2.getAs[Long]("n_docs") == 2L && s2.getAs[Long]("n_tokens") == 2L)
    assert(s2.getAs[Long]("n_trigrams") == 1L, "short doc yields its full run")
    val s3 = got("s3")
    assert(s3.getAs[Long]("ttr_bp") == 10000L &&
      s3.getAs[Long]("trigram_diversity_bp") == 10000L)
  }

  test("tokenLengthHistogram: exact log2 buckets, power-of-two edges, empty-doc sentinel") {
    // lengths 0,1,2,3,4,8 → buckets -1,0,1,1,2,3 with lo 0,1,2,4,8;
    // a NULL text folds into the empty-doc sentinel, never a NULL bucket
    val docs = Seq(
      ("s1", ""), ("s1", "t1"), ("s1", "t1 t2"), ("s1", "t1 t2 t3"),
      ("s1", "t1 t2 t3 t4"), ("s2", "t1 t2 t3 t4 t5 t6 t7 t8"))
      .toDF("source", "text")
      .unionByName(Seq(("s2", Option.empty[String])).toDF("source", "text"))
    val got = Profile.tokenLengthHistogram(docs)
      .collect().map(r => (r.getString(0), r.getAs[Long]("bucket")) ->
        ((r.getAs[Long]("bucket_lo"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens")))).toMap
    assert(got(("s1", -1L)) == ((0L, 1L, 0L)), s"got $got")
    assert(got(("s1", 0L)) == ((1L, 1L, 1L)), s"got $got")
    assert(got(("s1", 1L)) == ((2L, 2L, 5L)), s"got $got")
    // length 4 is EXACTLY 2^2 — must land in bucket 2, not 1 (the
    // float-log2 misfile this operator's integer bin() path avoids)
    assert(got(("s1", 2L)) == ((4L, 1L, 4L)), s"got $got")
    assert(got(("s2", 3L)) == ((8L, 1L, 8L)), s"got $got")
    assert(got(("s2", -1L)) == ((0L, 1L, 0L)), s"got $got")
    assert(got.size == 6, s"got $got")
  }

  test("pmiCollocations: hand-computed micro-nat PMI, min-count floor, Nb before the floor") {
    // unigrams: p=4 q=2 z=2 (Nu=8); bigrams: (p,q)x2 (p,z)x1 (z,p)x1
    // (Nb=4). minCount=2 keeps only (p,q):
    // PMI = ln(2*8*8 / (4*4*2)) = ln 4 -> 1386294 micro-nats — only
    // correct if Nb=4 counts the pairs the floor drops
    val docs = Seq("p q", "p q", "p z", "z p").toDF("text")
    val got = Profile.pmiCollocations(docs, minCount = 2, k = 10).collect()
    assert(got.length == 1, got.mkString(";"))
    val r = got(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)) ==
      (("p", "q", 2L, 1386294L)), s"got ${got.mkString(";")}")
    // single-token and empty docs contribute no bigrams and never crash
    val tiny = Seq("solo", "", "a b", "a b").toDF("text")
    val t = Profile.pmiCollocations(tiny, minCount = 2, k = 10).collect()
    assert(t.length == 1 && t(0).getString(0) == "a", t.mkString(";"))
  }

  /** Brute-force twin of [[Profile.ZipfSlopeExprSql]] over (rank, freq)
    * pairs — same micro-nat floors, same double OLS.
    */
  private def zipfBrute(pairs: Seq[(Int, Long)]): Long = {
    val pts = pairs.map { case (r, f) =>
      (math.floor(math.log(r.toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(f.toDouble) * 1e6 + 0.5).toLong) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val den = n * sxx - sx * sx
    if (pts.size < 2 || den == 0.0) 0L
    else math.floor((n * sxy - sx * sy) / den * 1e6 + 0.5).toLong
  }

  test("zipfSlope: exact 1/r corpus fits slope ~ -1e6; matches the brute twin") {
    // token freqs exactly 120/r for r = 1..6 → ln f = ln 120 − ln r
    val freqs = Seq("a" -> 120, "b" -> 60, "c" -> 40, "d" -> 30,
      "e" -> 24, "f" -> 20)
    val text = freqs.map { case (t, n) => Seq.fill(n)(t).mkString(" ") }
      .mkString(" ")
    val docs = Seq(("s1", text)).toDF("source", "text")
    val got = Profile.zipfSlope(docs).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 6L)
    val slope = got(0).getLong(2)
    assert(math.abs(slope + 1000000L) <= 5, s"slope $slope")
    assert(slope == zipfBrute(freqs.zipWithIndex.map {
      case ((_, f), i) => (i + 1, f.toLong) }), s"slope $slope")
  }

  test("zipfSlope: threshold cut equals plain top-k under boundary ties") {
    // freqs a:5, b:3, c:3, d:3, e:1 with k=3 — the bounded-heap
    // threshold admits the d tie, the rank cut must still keep exactly
    // (a,1) (b,2) (c,3) in (freq desc, token) order
    val text = "a a a a a b b b c c c d d d e"
    val docs = Seq(("s1", text)).toDF("source", "text")
    val got = Profile.zipfSlope(docs, k = 3).collect()
    assert(got.length == 1 && got(0).getLong(1) == 3L, got.mkString(";"))
    assert(got(0).getLong(2) ==
      zipfBrute(Seq((1, 5L), (2, 3L), (3, 3L))), got.mkString(";"))
    // degenerate: a single distinct token has no spread → slope 0
    val one = Seq(("s1", "x x x")).toDF("source", "text")
    val g1 = Profile.zipfSlope(one).collect()
    assert(g1(0).getLong(1) == 1L && g1(0).getLong(2) == 0L)
  }

  test("trigramNovelty: unique-fraction bp, intra-doc dups once, empty doc zeros") {
    val docs = Seq(
      (1L, "a b c d"),   // shingles {a b c, b c d} — first shared with d2
      (2L, "a b c x"),   // {a b c, b c x}
      (3L, "q r s"),     // {q r s} unique
      (4L, ""),          // none
      (5L, "a b c a b c a b c")) // distinct {a b c, b c a, c a b}
      .toDF("doc_id", "text")
    val got = Profile.trigramNovelty(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 1L, 5000L)), s"got $got")
    assert(got(2L) == ((2L, 1L, 5000L)), s"got $got")
    assert(got(3L) == ((1L, 1L, 10000L)), s"got $got")
    assert(got(4L) == ((0L, 0L, 0L)), s"got $got")
    // doc 5's repeated "a b c" is one observation AND it is corpus-shared
    // (docs 1, 2 carry it) → 2 of 3 shingles unique
    assert(got(5L) == ((3L, 2L, 6666L)), s"got $got")
  }

  test("madOutlierStats: hand medians, 3-MAD flag, zero-MAD degeneracy") {
    import sqlImplicits._
    // g1: values 10,10,12,14,100 → med 12 (med2 24), devs 2,2,0,2,88
    //     → MAD 2 (mad4 8); outlier iff 2·dev2 > 24 → only 100 (dev2 176)
    // g2: 5,5,5,9 → med 5 (med2 10), devs 0,0,0,4 → MAD 0 (mad4 0):
    //     the off-median 9 flags (zero-MAD degeneracy, documented)
    val df = Seq(("g1", 10L), ("g1", 10L), ("g1", 12L), ("g1", 14L),
      ("g1", 100L), ("g2", 5L), ("g2", 5L), ("g2", 5L), ("g2", 9L))
      .toDF("src", "x")
    val got = Profile.madOutlierStats(df, "src", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "g1" -> ((5L, 24L, 8L, 1L)),
      "g2" -> ((4L, 10L, 0L, 1L))), got.toString)
    // even-count interpolation: 1,2,3,4 → med2 = 5 (the .5 median doubled)
    val even = Profile.madOutlierStats(
      Seq(("e", 1L), ("e", 2L), ("e", 3L), ("e", 4L)).toDF("src", "x"),
      "src", "x").collect().head
    assert(even.getLong(2) == 5L, even.toString)
  }

  test("rollup fans out through ONE Expand; explicit-values pivot is one pass") {
    import sqlImplicits._
    val docs = Seq(("s1", "en", 3L), ("s1", "fr", 2L), ("s2", "en", 5L))
      .toDF("source", "lang", "n_tok")
    val ru = docs.rollup("source", "lang")
      .agg(grouping_id().cast("long").as("gid"), sum("n_tok").as("t"))
    val ruPlan = ru.queryExecution.executedPlan.toString
    assert("(?i)expand".r.findAllIn(ruPlan).size >= 1 &&
      "LocalTableScan".r.findAllIn(ruPlan).size == 1,
      s"rollup must be one Expand over one scan, not a self-union:\n$ruPlan")
    // leaf + subtotal + grand total rows, gid bits (source=2, lang=1)
    val rows = ru.collect().map(r => (Option(r.getString(0)).getOrElse("-"),
      Option(r.getString(1)).getOrElse("-"), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._3, x._1, x._2)).toSeq
    assert(rows == Seq(("s1", "en", 0L, 3L), ("s1", "fr", 0L, 2L),
      ("s2", "en", 0L, 5L), ("s1", "-", 1L, 5L), ("s2", "-", 1L, 5L),
      ("-", "-", 3L, 10L)), rows.toString)
    val pv = docs.groupBy("source").pivot("lang", Seq("en", "fr"))
      .agg(sum("n_tok"))
    val pvPlan = pv.queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(pvPlan).size == 1,
      s"explicit-values pivot must not re-scan for distinct values:\n$pvPlan")
    val got = pv.collect().map(r => r.getString(0) ->
      ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got == Map("s1" -> ((Some(3L), Some(2L))),
      "s2" -> ((Some(5L), None))), got.toString)
  }

  test("readabilityStats: hand Flesch, empty/null sentinel, bucket counts") {
    import sqlImplicits._
    // "The cat sat. The dog ran!": W=6, S=2, syl=6 →
    // 206835000 - (1015000*6)//2 - (84600000*6)//6 = 119190000 (easy)
    // empty + null docs: sentinel w=1, s=1, syl=0 →
    // 206835000 - 1015000 - 0 = 205820000 (easy)
    val docs = Seq(("g1", "The cat sat. The dog ran!"),
      ("g2", ""), ("g2", null: String)).toDF("source", "text")
    val got = Profile.readabilityStats(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "g1" -> ((1L, 119190000L, 1L, 0L)),
      "g2" -> ((2L, 205820000L, 2L, 0L))), got.toString)
    // a syllable-dense unpunctuated doc lands hard (flesch < 30):
    // 9 one-syllable-per-vowel-group long words, one sentence
    val hard = Seq(("h", Seq.fill(3)(
      "extraordinary continuation representation").mkString(" ")))
      .toDF("source", "text")
    val h = Profile.readabilityStats(hard, "source", "text").collect().head
    assert(h.getLong(4) == 1L, h.toString)
  }

  test("agreementKappa: hand confusion, degenerate unanimity, nulls excluded") {
    import graft.operators.Evaluation
    import sqlImplicits._
    // 10 rows: n11=4, n00=3, n10=2, n01=1 → po = 0.7
    // pa = 0.6, pb = 0.5 → pe = 0.6·0.5 + 0.4·0.5 = 0.5 → kappa = 0.4
    val df = (Seq.fill(4)((true, true)) ++ Seq.fill(3)((false, false)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(1)((false, true)))
      .toDF("a", "b")
    val r = Evaluation.agreementKappa(df, "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((10L, 4L, 2L, 1L, 3L)), r.toString)
    assert(r.getLong(5) == 700000L && r.getLong(6) == 500000L &&
      r.getLong(7) == 400000L, r.toString)
    // unanimous raters: pe = 1 → kappa 0 by convention, po = 1
    val u = Evaluation.agreementKappa(
      Seq((true, true), (true, true)).toDF("a", "b"), "a", "b").collect().head
    assert(u.getLong(5) == 1000000L && u.getLong(7) == 0L, u.toString)
    // null rater rows are excluded from every count
    val n = Evaluation.agreementKappa(
      Seq((Some(true), Some(true)), (None, Some(false)), (Some(false), None))
        .toDF("a", "b"), "a", "b").collect().head
    assert(n.getLong(0) == 1L, n.toString)
  }

  test("repetitionStats: hand fractions, flags, empty/null docs") {
    import sqlImplicits._
    // s1 doc "a a a a a": nt=5 nc=9; top1 cnt 5 → 10000;
    //   top 2-gram "a a" cnt 4 len 3 → 120000//9 = 13333 (flag);
    //   one 5-gram, no dup → 0
    // s1 doc "x y z w v": all-unique; top1 cnt 1 → 2000;
    //   top 2-gram cnt 1 len 3 → 30000//9 = 3333 (tiny-doc flag)
    // s2 doc "p q p q p q p q": nt=8 nc=15; top1 'p' cnt 4 → 5000;
    //   "p q" cnt 4 len 3 → 120000//15 = 8000; 5-grams alternate
    //   (n5=4, nd5=2) → 5000 (flag)
    // s2 empty + null docs: guards nt=nc=1, all zero, unflagged
    val docs = Seq(("s1", "a a a a a"), ("s1", "x y z w v"),
      ("s2", "p q p q p q p q"), ("s2", ""), ("s2", null: String))
      .toDF("source", "text")
    val got = Profile.repetitionStats(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got == Map(
      "s1" -> ((2L, 6000L, 8333L, 0L, 2L)),
      "s2" -> ((3L, 1666L, 2666L, 1666L, 1L))), got.toString)
    // count tie on the top 2-gram breaks to the LONGER gram: "aa bb"
    // (len 5) and "zz q" (len 4) both count 2 → 2·5·10000 // 21 = 4761,
    // not 3809
    val tie = Profile.repetitionStats(
      Seq(("s3", "aa bb aa bb zz q zz q")).toDF("source", "text"),
      "source", "text").collect().head
    assert(tie.getLong(3) == 4761L, tie.toString)
  }

  test("repetitionStats: randomized docs match a plain-Scala reference") {
    import sqlImplicits._
    // tiny vocab forces count ties and length ties — the cases where
    // the sorted-array run-length fold could silently disagree with the
    // (count DESC, len DESC, gram ASC) rule
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = (0 until 60).map { i =>
      val n = rng.nextInt(13) // 0..12 tokens
      (s"d$i", Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    def ref(text: String): (Long, Long, Long) = {
      val tk = text.split("\\s+").filter(_.nonEmpty).toSeq
      val nc = math.max(text.length.toLong, 1L)
      val nt = math.max(tk.size.toLong, 1L)
      def top(grams: Seq[String]): (Long, Long) =
        if (grams.isEmpty) (0L, 0L)
        else {
          val (g, cnt) = grams.groupBy(identity).view.mapValues(_.size).toSeq
            .sortBy { case (g, c) => (-c, -g.length, g) }.head
          (cnt.toLong, g.length.toLong)
        }
      val t1 = top(tk)._1
      val g2 = tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val (c2, l2) = top(g2)
      val g5 = tk.sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSeq
      val dup5 = if (g5.isEmpty) 0L
        else ((g5.size - g5.distinct.size).toLong * 10000L) / g5.size
      ((t1 * 10000L) / nt, (c2 * l2 * 10000L) / nc, dup5)
    }
    // one group per doc → the per-group "averages" ARE the per-doc values
    val got = Profile.repetitionStats(docs.toDF("source", "text"),
        "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == ref(text), s"$id '$text': got ${got(id)} ref ${ref(text)}")
    }
  }

  test("vocabDrift: hand TV distance, OOV bucket, gap token, releases") {
    import sqlImplicits._
    // corpus: a=4 b=4 c=1 (ctot 9); top-2 = {a, b} (tie 4=4 → tok asc);
    // corpus shares a=b=444444, oov=111111
    // s1 "a a a b": a=750000 b=250000 oov=0
    //   → tv = 305556 + 194444 + 111111 = 611111, gap a (305556)
    // s2 "a b b b c": a=200000 b=600000 oov=200000
    //   → tv = 244444 + 155556 + 88889 = 488889, gap a (244444)
    val docs = Seq(("s1", "a a a b"), ("s2", "a b b b c"))
      .toDF("source", "text")
    assertReleases("vocabDrift") {
      val got = Profile.vocabDrift(docs, "source", "text", topK = 2)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
      assert(got == Map(
        "s1" -> ((4L, 611111L, "a", 305556L)),
        "s2" -> ((5L, 488889L, "a", 244444L))), got.toString)
    }
    // an all-empty source carries no token row and drops out entirely
    val sparse = Profile.vocabDrift(
      Seq(("s1", "a a"), ("s2", "")).toDF("source", "text"),
      "source", "text", topK = 1).collect()
    assert(sparse.map(_.getString(0)).toSeq == Seq("s1"), sparse.mkString(";"))
  }

  test("lengthQuantiles: hand quantiles, empty/null docs at length 0, releases") {
    // s1: ten docs of lengths 1..10 → p50 = 5 (cum 5 ≥ 5), p90 = 9,
    // p99 = 10 (cum must reach ⌈9.9⌉ = 10)
    val s1 = (1 to 10).map(n => ("s1", Some(("t " * n).trim)))
    // s2: lengths {0 (empty), 0 (null), 7} → p50 = 0 (two of three docs
    // are empty), p90 = p99 = 7
    val s2 = Seq(("s2", Some("")), ("s2", None),
      ("s2", Some("a b c d e f g")))
    val docs = (s1 ++ s2).toDF("source", "text")
    assertReleases("lengthQuantiles") {
      val got = Profile.lengthQuantiles(docs).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == Map(
        "s1" -> ((10L, 5L, 9L, 10L)),
        "s2" -> ((3L, 0L, 7L, 7L))), got.toString)
    }
  }

  test("nucleusVocab: boundary-level remainder, one-level corpus, empty source drops") {
    // s1: a×50 b×30 c×10 d×5 e×5 → 100 tokens, target ⌈95⌉ = 95;
    // levels desc: 50(cum 50) 30(80) 10(90) 5(100) → boundary level 5
    // needs ⌈(95−90)/5⌉ = 1 of its 2 types → nucleus 4 of 5 types
    val s1 = "s1" -> (("a " * 50) + ("b " * 30) + ("c " * 10) +
      ("d " * 5) + ("e " * 5)).trim
    // s2: a single token → nucleus 1 of 1
    val s2 = "s2" -> "a"
    // s3: five types ×2 each, target ⌈9.5⌉ = 10 → the whole single
    // level: ⌈10/2⌉ = 5 types
    val s3 = "s3" -> "a a b b c c d d e e"
    val docs = Seq(s1, s2, s3, "s4" -> "").toDF("source", "text")
    assertReleases("nucleusVocab") {
      val got = Profile.nucleusVocab(docs).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      assert(got == Map(
        "s1" -> ((100L, 5L, 4L, 8000L)),
        "s2" -> ((1L, 1L, 1L, 10000L)),
        "s3" -> ((10L, 5L, 5L, 10000L))), got.toString)
    }
    // partial take INSIDE the boundary level: a×6 b×2 c×2 d×1 at 70%
    // cover → target ⌈7.7⌉ = 8, level 2 (cum 10) needs ⌈(8−6)/2⌉ = 1
    // → nucleus 2 of 4 types
    val part = Profile.nucleusVocab(
      Seq("s" -> "a a a a a a b b c c d").toDF("source", "text"),
      coverBp = 7000).collect()
    assert(part.length == 1 &&
      (part.head.getLong(1), part.head.getLong(2), part.head.getLong(3)) ==
        ((11L, 4L, 2L)), part.mkString(";"))
  }

  test("trimmedMean: boundary levels take partially, ties trim by mass, releases") {
    // s1: lengths 1..20 at 5% trim → lo 1, hi 19: ranks 2..19 keep
    // lengths 2..19 → sum 189 / 18 = 10.5 → 10_500_000 micro
    val s1 = (1 to 20).map(n => ("s1", ("t " * n).trim))
    // s2: ties at the cut — lengths {1,1,1,10,10} at 5% trim of n=5 →
    // lo 0, hi 5: nothing trims; mean 23/5 = 4.6 → 4_600_000
    val s2 = Seq(("s2", "t"), ("s2", "t"), ("s2", "t"),
      ("s2", ("t " * 10).trim), ("s2", ("t " * 10).trim))
    val docs = (s1 ++ s2).toDF("source", "text")
    assertReleases("trimmedMean") {
      val got = Profile.trimmedMean(docs).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == Map(
        "s1" -> ((20L, 18L, 10500000L)),
        "s2" -> ((5L, 5L, 4600000L))), got.toString)
    }
    // heavier trim with a tie STRADDLING the cut: lengths
    // {1, 5,5,5,5, 100} at 20% trim of n=6 → lo 1, hi 5: drops the 1
    // and the 100, keeps all four 5s partially-clipped at both ends
    val straddle = Profile.trimmedMean(
      (Seq(("s", "t")) ++ Seq.fill(4)(("s", ("t " * 5).trim)) ++
        Seq(("s", ("t " * 100).trim))).toDF("source", "text"),
      trimBp = 2000).collect().head
    assert((straddle.getLong(1), straddle.getLong(2),
      straddle.getLong(3)) == ((6L, 4L, 5000000L)), straddle.toString)
  }

  test("benfordAudit: hand digits, sub-1 sentinel, releases") {
    // digits: 1.5→1, 19→1, 0.5→sentinel 0, 950→9, 99→9; n = 5
    val vals = Seq(1.5, 19.0, 0.5, 950.0, 99.0).toDF("v")
    assertReleases("benfordAudit") {
      val got = Profile.benfordAudit(vals, "v").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == Map(
        0L -> ((1L, 2000L, 0L, 0L)),
        // benford_bp(1) = floor(log10(2)*1e4 + .5) = 3010
        1L -> ((2L, 4000L, 3010L, 990L)),
        // benford_bp(9) = floor(log10(10/9)*1e4 + .5) = 458
        9L -> ((2L, 4000L, 458L, 3542L))), got.toString)
    }
  }

  test("kAnonymityProfile: hand histogram, cumulative risk, releases") {
    // classes over (a, b): (1,x)×1, (2,x)×2, (2,y)×2, (3,x)×4
    // → levels: k=1 (1 class, 1 row), k=2 (2 classes, 4 rows),
    //   k=4 (1 class, 4 rows); total 9 rows
    // cum: 1, 5, 9 → risk_bp 1111, 5555, 10000
    val rows = Seq((1, "x"), (2, "x"), (2, "x"), (2, "y"), (2, "y"),
      (3, "x"), (3, "x"), (3, "x"), (3, "x")).toDF("a", "b")
    assertReleases("kAnonymityProfile") {
      val got = Profile.kAnonymityProfile(rows, Seq("a", "b")).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == Map(
        1L -> ((1L, 1L, 1L, 1111L)),
        2L -> ((2L, 4L, 5L, 5555L)),
        4L -> ((1L, 4L, 9L, 10000L))), got.toString)
    }
  }

  test("dataCard: composes its four components field-for-field; empty source keeps its row") {
    // needs the datasheet input schema: doc_id/lang/n_chars ride along
    val docs = Seq(
      (1L, "s1", "en", "the cat sat on the mat"),
      (2L, "s1", "en", "the cat sat on the mat"), // exact dup of 1
      (3L, "s1", "de", "der hund lief schnell weg heute"),
      (4L, "s2", "en", ""))
      .toDF("doc_id", "source", "lang", "text")
      .withColumn("n_chars", length(coalesce(col("text"), lit(""))).cast("long"))
    val card = Profile.dataCard(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(card.keySet == Set("s1", "s2"), card.keySet.toString)
    // every field equals the standalone component's value
    val ds = Profile.corpusDatasheet(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val ld = Profile.lexicalDiversity(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val lq = Profile.lengthQuantiles(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val nv = Profile.nucleusVocab(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    for (s <- Seq("s1", "s2")) {
      val c = card(s)
      assert(c.getLong(c.fieldIndex("n_dup_docs")) ==
        ds(s).getLong(ds(s).fieldIndex("n_dup_docs")), s)
      assert(c.getLong(c.fieldIndex("ttr_bp")) ==
        ld(s).getLong(ld(s).fieldIndex("ttr_bp")), s)
      assert(c.getLong(c.fieldIndex("p99_len")) ==
        lq(s).getLong(lq(s).fieldIndex("p99_len")), s)
      val nuc = nv.get(s).map(r => r.getLong(r.fieldIndex("nucleus_types")))
        .getOrElse(0L)
      assert(c.getLong(c.fieldIndex("nucleus_types")) == nuc, s)
    }
    // the all-empty source: zero tokens, nucleus fields coalesce to 0
    val s2 = card("s2")
    assert(s2.getLong(s2.fieldIndex("n_tokens")) == 0L &&
      s2.getLong(s2.fieldIndex("nucleus_types")) == 0L &&
      s2.getLong(s2.fieldIndex("p50_len")) == 0L, s2.toString)
  }
}
