package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native one-pass signature kernels (graft.plans.MinHashSig /
  * SimHashSig) must produce EXACTLY the signatures of the explode+agg
  * posting paths, on real documents and on the tokenization edge cases
  * (empty text, whitespace-only, leading whitespace, short docs below the
  * shingle width, null text). Token-less docs are dropped by both paths
  * (explode emits no rows; the expression returns null and is filtered).
  */
class SignatureParitySpec extends SparkSpec {

  private def docs: DataFrame = Tables.documents(spark, sf())

  private def edges: DataFrame = {
    import sqlImplicits._
    Seq(
      (1L, "one"),
      (2L, "two tokens"),
      (3L, "exactly three word tokens here no wait six"),
      (4L, ""),
      (5L, "   "),
      (6L, "  leading whitespace token"),
      (7L, null.asInstanceOf[String]),
      (8L, "repeat repeat repeat repeat")
    ).toDF("doc_id", "text")
  }

  private def assertSameSigs(native: DataFrame, posting: DataFrame): Unit = {
    val n = native.withColumnRenamed("sig", "sig_n")
    val p = posting.withColumnRenamed("sig", "sig_p")
    val joined = n.join(p, Seq("id"), "full_outer")
      .select(col("id"), col("sig_n"), col("sig_p"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2),
        s"doc ${r.get(0)} present on one side only: ${r.get(1)} vs ${r.get(2)}")
      assert(r.get(1) == r.get(2), s"signature mismatch for doc ${r.get(0)}")
    }
  }

  test("minhash native == postings, xxhash64 family (documents + edges)") {
    for (df <- Seq(docs, edges)) {
      assertSameSigs(
        Dedup.minhashSignatures(df, "doc_id", "text", perms = 16),
        Dedup.minhashSignaturesViaPostings(df, "doc_id", "text", perms = 16))
    }
  }

  test("minhash native == postings, portable family (documents + edges)") {
    for (df <- Seq(docs, edges)) {
      assertSameSigs(
        Dedup.minhashSignatures(df, "doc_id", "text", perms = 16,
          family = Dedup.PortableHashFamily),
        Dedup.minhashSignaturesViaPostings(df, "doc_id", "text", perms = 16,
          family = Dedup.PortableHashFamily))
    }
  }

  test("simhash native == postings, 64-bit xxhash64 family") {
    for (df <- Seq(docs, edges)) {
      assertSameSigs(
        Dedup.simhashSignatures(df, "doc_id", "text"),
        Dedup.simhashSignaturesViaPostings(df, "doc_id", "text"))
    }
  }

  test("simhash native == postings, 32-bit portable family") {
    for (df <- Seq(docs, edges)) {
      assertSameSigs(
        Dedup.simhashSignatures32Portable(df, "doc_id", "text"),
        Dedup.simhashSignaturesViaPostings(df, "doc_id", "text", portable = true))
    }
  }

  test("token-less docs are dropped, token-ful docs kept (native)") {
    val ids = Dedup.minhashSignatures(edges, "doc_id", "text", perms = 4)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 6L, 8L))
    val sids = Dedup.simhashSignatures(edges, "doc_id", "text")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(sids.toSeq == Seq(1L, 2L, 3L, 6L, 8L))
  }

  test("candidate pipeline: kernel runs once, branches share the exchange") {
    val cands = Dedup.simhashCandidatesPortable(docs, "doc_id", "text",
      verifyThreshold = 16, maxBucketSize = 500)
    cands.collect()
    val plan = cands.queryExecution.executedPlan.toString
    // final AQE plan: the three consumers of the chunked signatures (the
    // bucket-size count and both self-join sides) must be served from ONE
    // materialized stage — the kernel projection appears exactly once
    val finalStart = plan.indexOf("== Final Plan ==")
    assert(finalStart >= 0, plan.take(500))
    val initStart = plan.indexOf("== Initial Plan ==")
    val finalSection =
      if (initStart > finalStart) plan.substring(finalStart, initStart)
      else plan.substring(finalStart)
    val kernels = finalSection.split("simhash_sig_portable32\\(text", -1).length - 1
    assert(kernels == 1, s"kernel evaluated $kernels times:\n${finalSection.take(3000)}")
    // and no scan filter may re-evaluate the kernel (the inferred-isnotnull
    // trap): every kernel mention sits in a Project, none in a Filter
    assert(!finalSection.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("simhash_sig")), finalSection.take(3000))
  }

  test("winnowing: partial copy shares fingerprints, exact dup shares all") {
    import sqlImplicits._
    val para = "the five boxing wizards jump quickly over the frozen river bank"
    val df = Seq(
      (1L, s"unique opening line alpha beta gamma. $para"),
      (2L, s"$para. completely different closing thoughts here"),
      (3L, s"unique opening line alpha beta gamma. $para"),
      (4L, "tiny"),
      (5L, "zebra xylophone quantum mechanics lecture notes volume seven")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "doc_id", "text")
      .collect().groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.map(_.getLong(1)).toSet
      }
    // a paragraph pasted into an otherwise-unrelated doc still shares its
    // window minima — the containment property MinHash dilutes away
    assert((fps(1L) & fps(2L)).nonEmpty, "partial copy must share fingerprints")
    assert(fps(1L) == fps(3L), "exact dup must share every fingerprint")
    assert(!fps.contains(4L), "shorter-than-k doc emits nothing")
    assert((fps(5L) & fps(1L)).isEmpty, "unrelated docs must not collide")
  }

  test("winnow iterates CODEPOINTS: combining marks are separate units (pinned)") {
    // DuckDB's string_split(text,'') yields grapheme CLUSTERS; this kernel
    // iterates codepoints. For single-codepoint graphemes (all testdata)
    // the two agree — q65's oracle parity is claimed only there. This pins
    // the kernel's actual behavior on the divergent case so a future
    // change is a deliberate decision, not drift: precomposed é (U+00E9)
    // and decomposed e+U+0301 are DIFFERENT codepoint sequences, hence
    // different fingerprints, while the supplementary-plane emoji (one
    // codepoint, two UTF-16 chars) hashes as ONE unit.
    val precomposed = "caf\u00e9 latte order"     // \u00e9 = 1 codepoint
    val decomposed = "cafe\u0301 latte order"     // e + combining acute
    val fpOf = (s: String) =>
      graft.plans.SigOps.winnow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 8, 4)
        .toLongArray().toSet
    assert(fpOf(precomposed) != fpOf(decomposed),
      "combining-mark normalization must be visible to the codepoint kernel")
    // 7 codepoints but 8 UTF-16 chars (U+1F600 is a surrogate pair): a
    // codepoint kernel sees m = 7−8+1 ≤ 0 → empty; a (wrong) char-based
    // kernel would see 8 units and emit a gram
    assert(fpOf("😀bcdefg").isEmpty,
      "a supplementary-plane codepoint must count as one unit, not two")
  }

  test("positional winnowing: planted copy localized to its offset within w") {
    import sqlImplicits._
    val para = "pack my box with five dozen liquor jugs before the festival begins"
    val prefix = "totally original framing text written for document alpha here. "
    val df = Seq((1L, prefix + para), (2L, para)).toDF("doc_id", "text")
    val w = 4
    val rows = Dedup.winnowFingerprintPositions(df, "doc_id", "text", k = 8, w = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val aPos = rows.filter(_._1 == 1L).groupBy(_._2).map { case (fp, rs) =>
      fp -> rs.map(_._3).toSet
    }
    val bPos = rows.filter(_._1 == 2L).groupBy(_._2).map { case (fp, rs) =>
      fp -> rs.map(_._3).toSet
    }
    val shared = aPos.keySet & bPos.keySet
    assert(shared.nonEmpty, "copied paragraph must share positional fingerprints")
    // every shared fingerprint's offset delta recovers the plant within w;
    // interior grams recover it EXACTLY (prefix is ASCII → codepoints=chars)
    val deltas = shared.toSeq.flatMap(fp =>
      for (pa <- aPos(fp); pb <- bPos(fp)) yield pa - pb)
    val offset = prefix.length
    assert(deltas.forall(d => math.abs(d - offset) <= w),
      s"offset $offset not recovered within $w: $deltas")
    assert(deltas.count(_ == offset) * 2 >= deltas.size,
      s"majority of shared fps should recover the offset exactly: $deltas")

    // distinct fp VALUES equal the set-semantics kernel's output — each
    // window's minimum VALUE is tie-side-independent, only positions move
    val setFps = Dedup.winnowFingerprints(df, "doc_id", "text", k = 8, w = w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r._1, r._2)).toSet == setFps,
      "positional selections must cover exactly the set kernel's values")

    // total on the short-doc edges, like the set kernel
    val edge = Seq((3L, "tiny"), (4L, "exactly8"), (5L, "")).toDF("doc_id", "text")
    val er = Dedup.winnowFingerprintPositions(edge, "doc_id", "text", k = 8, w = w)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(er.toSeq == Seq((4L, 0)), s"short-doc rule: $er")
  }

  test("winnow containment pairs: pasted paragraph found, hot-fp cap bounds the join") {
    import sqlImplicits._
    val para = "pack my box with five dozen liquor jugs before the festival starts downtown"
    val boiler = "standard header fragment repeated everywhere in this corpus"
    val df = Seq(
      (1L, s"original article text one. $para. original closing one"),
      (2L, s"totally different frame. $para. other remarks entirely"),
      (3L, s"$boiler. unrelated body alpha"),
      (4L, s"$boiler. unrelated body beta"),
      (5L, s"$boiler. unrelated body gamma")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowContainmentPairs(df, "doc_id", "text",
      minContainment = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"pasted paragraph not found: $pairs")
    // with the cap tightened below the boilerplate family size, its
    // fingerprints drop out and the boilerplate-only pairs disappear
    val capped = Dedup.winnowContainmentPairs(df, "doc_id", "text",
      maxFpDf = 2, minContainment = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)), s"capped run lost the true pair: $capped")
    assert(!capped.exists { case (a, b) => a >= 3L && b >= 3L },
      s"boilerplate-only pairs must be capped away: $capped")
  }

  test("native signature stays inside whole-stage codegen, computed once") {
    val plan = Dedup.minhashSignatures(docs, "doc_id", "text", perms = 16)
      .queryExecution.executedPlan.toString
    // `*(n)` prefixes are WholeStageCodegen stage markers
    assert(plan.contains("*(1) Project"), plan.take(2000))
    // the kernel must appear exactly once (a sig-alias filter would get
    // pushed below the projection and evaluate it a second time)
    assert(plan.split("minhash_sig", -1).length - 1 == 1, plan.take(2000))
  }
}
