package graft

import graft.operators.UnigramLm
import org.scalatest.funsuite.AnyFunSuite

/** Exact pins for the unigram-LM tokenizer (q163/q164): seeded
  * vocabulary contents, a brute-force Viterbi replay, the packed
  * tie-break, and the over-cap exclusion contract.
  */
class UnigramLmSpec extends AnyFunSuite with SparkSpec {

  import sqlImplicits._

  /** Brute Viterbi over a cost map — same packed recurrence
    * b[j] = min(b[i] + 64·c + 1), same div/mod decode.
    */
  private def brute(word: String, cost: Map[String, Long]): Option[(Long, Long)] = {
    val n = word.length
    val b = Array.fill(n + 1)(UnigramLm.Inf)
    b(0) = 0L
    for (j <- 1 to n; i <- 0 until j) {
      val piece = word.substring(i, j)
      cost.get(piece).foreach { c =>
        b(j) = math.min(b(j), b(i) + 64L * c + 1L)
      }
    }
    if (b(n) >= UnigramLm.Inf) None else Some((b(n) / 64L, b(n) % 64L))
  }

  test("seedVocab keeps all chars, caps multi-char pieces, exact micro-nat costs") {
    // corpus: "abab" x3, "ab" x2 — candidates include a, b, ab, ba,
    // aba, bab, abab; with minCount 2 and vocabSize 1 only the most
    // frequent multi-char survives next to the full alphabet
    val docs = Seq("abab abab abab ab ab").toDF("text")
    val words = UnigramLm.wordFrame(docs, "text")
    val vocab = UnigramLm.seedVocab(words, maxPieceLen = 4,
      vocabSize = 1, minCount = 2L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // occurrence-weighted: in "abab" (freq 3): a x2, b x2, ab x2, ba,
    // aba, bab, abab; in "ab" (freq 2): a, b, ab
    // → a: 3*2+2 = 8, b: 8, ab: 3*2+2 = 8, ba/aba/bab/abab: 3 each
    // top-1 multi by (freq desc, piece): "ab" (8)
    val names = vocab.map(_._1).toSeq
    assert(names == Seq("a", "ab", "b"), vocab.mkString(";"))
    val total = vocab.map(_._2).sum  // 8 + 8 + 8 = 24
    assert(total == 24L)
    val expCost = math.floor((math.log(24.0) - math.log(8.0)) * 1e6 + 0.5).toLong
    assert(vocab.forall(_._3 == expCost), vocab.mkString(";"))
  }

  test("viterbiSegment matches the brute packed DP on random words") {
    val rnd = new scala.util.Random(13)
    val alpha = "abc"
    val wordsSeq = (0 until 60).map { _ =>
      val n = 1 + rnd.nextInt(10)
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct
    val docs = Seq(wordsSeq.mkString(" ")).toDF("text")
    val words = UnigramLm.wordFrame(docs, "text")
    val vocab = UnigramLm.seedVocab(words, maxPieceLen = 4,
      vocabSize = 8, minCount = 2L)
    val cost = vocab.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = UnigramLm.viterbiSegment(words, vocab).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    wordsSeq.foreach { w =>
      assert(got.get(w) == brute(w, cost), s"word=$w")
    }
  }

  test("packed min prefers lower cost, then fewer pieces") {
    // vocab hand-built so "aa" has two optimal-cost splits: piece "aa"
    // (cost 10) vs "a"+"a" (cost 5+5) — equal cost, packed min must
    // choose ONE piece
    val words = Seq(("aa", 1L)).toDF("word", "freq")
    val vocab = Seq(("a", 1L, 5L), ("aa", 1L, 10L))
      .toDF("piece", "freq", "cost_u")
    val out = UnigramLm.viterbiSegment(words, vocab).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 10L && out.head.getLong(2) == 1L,
      out.mkString(";"))
  }

  /** Brute backward walk over the brute DP — same equality test, same
    * smallest-start tie-break.
    */
  private def brutePieces(word: String, cost: Map[String, Long]): Seq[String] = {
    val n = word.length
    val b = Array.fill(n + 1)(UnigramLm.Inf)
    b(0) = 0L
    for (j <- 1 to n; i <- 0 until j) {
      cost.get(word.substring(i, j)).foreach { c =>
        b(j) = math.min(b(j), b(i) + 64L * c + 1L)
      }
    }
    if (b(n) >= UnigramLm.Inf) return Seq.empty
    var pos = n
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (pos > 0) {
      val s = (0 until pos).find { i =>
        cost.get(word.substring(i, pos))
          .exists(c => b(i) + 64L * c + 1L == b(pos))
      }.get
      out += word.substring(s, pos)
      pos = s
    }
    out.toSeq
  }

  test("viterbiPieces recovers the exact best-path pieces (brute replay)") {
    val rnd = new scala.util.Random(29)
    val alpha = "abc"
    val wordsSeq = (0 until 50).map { _ =>
      val n = 1 + rnd.nextInt(9)
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct
    val docs = Seq(wordsSeq.mkString(" ")).toDF("text")
    val words = UnigramLm.wordFrame(docs, "text")
    val vocab = UnigramLm.seedVocab(words, maxPieceLen = 3,
      vocabSize = 6, minCount = 2L)
    val cost = vocab.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = UnigramLm.viterbiPieces(words, vocab).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    wordsSeq.foreach { w =>
      val exp = brutePieces(w, cost)
        .groupBy(identity).map { case (p, xs) => (w, p) -> xs.length.toLong }
      val gotW = got.view.filterKeys(_._1 == w).toMap
      assert(gotW == exp, s"word=$w got=$gotW exp=$exp")
    }
  }

  test("one hard-EM round does not increase the corpus NLL") {
    // a corpus with real segmentation ambiguity: repeated bigrams and
    // trigrams with overlapping pieces
    val docs = Seq(
      ("s", "abcabc abcabc abab ababab bcbc abc ab bc cab cabcab"),
      ("s", "abcabc abab cab abc abc bc bc ab")
    ).toDF("source", "text")
    val out = UnigramLm.segmentStatsEm(docs, "text", "source",
      emRounds = 2, maxPieceLen = 4, vocabSize = 6, minCount = 2L)
      .collect()
      .map(r => r.getLong(1) -> r.getLong(5)).toMap  // round -> nll
    assert(out.size == 3)
    assert(out(1L) <= out(0L), out.toString)
    assert(out(2L) <= out(1L), out.toString)
  }

  test("emRound drops unused multi-char pieces but keeps the alphabet") {
    // "ab" dominates: the best path never uses "a"+"b" separately, and
    // never uses any other multi piece — EM must keep chars anyway
    val docs = Seq("ab ab ab ab").toDF("text")
    val words = UnigramLm.wordFrame(docs, "text")
    val v0 = UnigramLm.seedVocab(words, maxPieceLen = 2,
      vocabSize = 4, minCount = 2L)
    val v1 = UnigramLm.emRound(words, v0).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // paths: every "ab" → one "ab" piece (4 occurrences); chars floored at 1
    assert(v1.toSeq == Seq(("a", 1L), ("ab", 4L), ("b", 1L)), v1.mkString(";"))
  }

  test("segmentStats rolls up occurrences and reports over-cap words") {
    val long = "x" * (UnigramLm.MaxWordLen + 1)
    val docs = Seq(
      ("s1", s"ab ab $long"),
      ("s2", "ab")
    ).toDF("source", "text")
    val out = UnigramLm.segmentStats(docs, "text", "source",
      maxPieceLen = 4, vocabSize = 4, minCount = 2L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (n1, ex1, _, _) = out("s1")
    val (n2, ex2, _, _) = out("s2")
    assert(n1 == 2L && ex1 == 1L, out.toString)   // the 17-char word excluded, counted
    assert(n2 == 1L && ex2 == 0L, out.toString)
    // the over-cap word still SEEDS the vocabulary: chars a:3 b:3 x:17
    // + top-4 multi by freq (xx:16, xxx:15, xxxx:14, ab:3) → total 71;
    // best split of "ab" = the single "ab" piece at ln(71/3) micro-nats
    val c = math.floor((math.log(71.0) - math.log(3.0)) * 1e6 + 0.5).toLong
    assert(out("s2")._3 == 1L && out("s2")._4 == c, out.toString)
    assert(out("s1")._3 == 2L && out("s1")._4 == 2L * c, out.toString)
  }
}
