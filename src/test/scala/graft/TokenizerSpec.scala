package graft

import graft.operators.Tokenizer
import org.apache.spark.sql.functions._

/** BPE merge induction: hand-computed trajectories, tie-breaks, the
  * boundary-consuming run semantics, and corpus exhaustion.
  */
class TokenizerSpec extends SparkSpec {
  import sqlImplicits._

  private def table(text: Seq[String], merges: Int = 3) =
    Tokenizer.bpeMergeTable(text.zipWithIndex.map(_.swap).toDF("id", "text"),
        "text", merges)
      .orderBy("step")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .toSeq

  test("classic hug/pug trajectory matches hand-computed merges") {
    // words: hug×2, hugs×1, pug×1 → round 1 merges (u,g) f=4 (13→9
    // symbols), round 2 (h,ug) f=3 (→6), round 3 ties (hug,s)/(p,ug)
    // at f=1 and lhs order picks (hug,s) (→5)
    val got = table(Seq("hug hug hugs", "pug"))
    assert(got == Seq(
      (1L, "u", "g", 4L, 9L),
      (2L, "h", "ug", 3L, 6L),
      (3L, "hug", "s", 1L, 5L)))
  }

  test("self-overlapping pair merges every other occurrence per round") {
    // 'aaaa'×2: round 1 picks (a,a) f=6 but the consumed boundary space
    // leaves ' aa a a ' (not ' aa aa '); round 2 re-ties (aa,a)/(a,a) at
    // f=2 and lhs order re-picks (a,a) → ' aa aa '; round 3 (aa,aa)
    val got = table(Seq("aaaa aaaa"))
    assert(got == Seq(
      (1L, "a", "a", 6L, 6L),
      (2L, "a", "a", 2L, 4L),
      (3L, "aa", "aa", 2L, 2L)))
  }

  test("corpus exhaustion truncates the merge table") {
    // 'ab ab ac': after (a,b) then (a,c) no pairs remain — step 3 absent
    val got = table(Seq("ab ab ac"))
    assert(got == Seq(
      (1L, "a", "b", 2L, 4L),
      (2L, "a", "c", 1L, 3L)))
  }

  test("checkpointed training equals the lazy plan merge-for-merge") {
    val docs = (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) "hug hug hugs pug" else "pug pugs hug")).toDF("id", "text")
    val lazyT = Tokenizer.bpeMergeTable(docs, "text", 6, checkpointEvery = 0)
      .orderBy("step").collect().map(_.toSeq).toSeq
    val ckptT = Tokenizer.bpeMergeTable(docs, "text", 6, checkpointEvery = 2)
      .orderBy("step").collect().map(_.toSeq).toSeq
    assert(lazyT == ckptT)
    // the 4-word corpus exhausts after 5 merges (every word 1 symbol)
    assert(lazyT.length == 5)
  }

  test("delta pair counts equal the recount path merge-for-merge") {
    // exercises ties, self-overlap runs, and corpus exhaustion — the
    // regimes where a stale pair count would first diverge
    val corpora = Seq(
      (1 to 40).map(i =>
        (i.toLong, if (i % 2 == 0) "hug hug hugs pug" else "pug pugs hug")),
      Seq((1L, "aaaa aaaa ab"), (2L, "abab aaaa")),
      (1 to 30).map(i => (i.toLong, s"spark data sql w${i % 7}")))
    corpora.foreach { rows =>
      val docs = rows.toDF("id", "text")
      val recount = Tokenizer.bpeMergeTable(docs, "text", 8, checkpointEvery = 2)
        .orderBy("step").collect().map(_.toSeq).toSeq
      val delta = Tokenizer.bpeMergeTableDelta(docs, "text", 8)
        .orderBy("step").collect().map(_.toSeq).toSeq
      assert(delta == recount)
    }
  }

  test("applyMerges replays training: per-word segmentation and totals agree") {
    // hug/pug corpus: after the 3 trained merges the words segment as
    // hug→[hug], hugs→[hug s]→[hugs], pug→[p ug]
    val docs = Seq((1L, "hug hug hugs"), (2L, "pug")).toDF("id", "text")
    val mt = Tokenizer.bpeMergeTable(docs, "text", 3)
    val merges = Tokenizer.collectMerges(mt)
    assert(merges == Seq(("u", "g"), ("h", "ug"), ("hug", "s")))
    val got = Tokenizer.applyMerges(docs, "id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 2L)) // [hug][hug][hugs] / [p ug]
    // train/apply consistency: Σ n_tokens == final round's tokens_after
    val finalAfter = mt.orderBy(col("step").desc).limit(1)
      .collect().head.getLong(4)
    assert(got.values.sum == finalAfter)
  }

  test("applyMerges keeps the every-other-occurrence boundary semantics") {
    // same quirk as training: ' a b a b ' merging (a,b) consumes the
    // separator, so only the first occurrence merges in one pass
    val docs = Seq((1L, "abab")).toDF("id", "text")
    val got = Tokenizer.applyMerges(docs, "id", "text", Seq(("a", "b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L)) // [ab][a][b]
    // a second replay of the same pair (as training round 2 would do)
    // closes the remaining occurrence
    val got2 = Tokenizer.applyMerges(docs, "id", "text",
      Seq(("a", "b"), ("a", "b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 2L)) // [ab][ab]
  }

  test("fertilityByGroup: per-slice piece math and the train-total invariant") {
    // hug/pug corpus with a group split: en = "hug hug hugs" (3 words →
    // [hug][hug][hugs] = 3 pieces), de = "pug" (1 word → [p ug] = 2)
    val docs = Seq((1L, "en", "hug hug hugs"), (2L, "de", "pug"))
      .toDF("id", "lang", "text")
    val merges = Tokenizer.collectMerges(
      Tokenizer.bpeMergeTable(docs, "text", 3))
    val got = Tokenizer.fertilityByGroup(docs, "lang", "text", merges)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("en") == ((3L, 3L, 1.0, 0.0)))   // all three words one piece
    assert(got("de") == ((1L, 2L, 2.0, 1.0)))   // pug splits: [p][ug]
    // Σ n_pieces across groups == applyMerges' corpus total
    val total = Tokenizer.applyMerges(docs, "id", "text", merges)
      .agg(sum("n_tokens")).collect().head.getLong(0)
    assert(got.values.map(_._2).sum == total)
  }

  test("merge table is invariant to document partitioning") {
    val docs = (1 to 50).map(i =>
      (i.toLong, if (i % 3 == 0) "spark spark sql" else "spark data sql data"))
    val a = Tokenizer.bpeMergeTable(docs.toDF("id", "text"), "text", 3)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Tokenizer.bpeMergeTable(docs.toDF("id", "text").repartition(13),
        "text", 3)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}
