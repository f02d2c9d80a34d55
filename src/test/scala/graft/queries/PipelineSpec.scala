package graft

/** Invariants of the composed q95 pipeline that hold at ANY scale factor
  * (the DuckDB oracle pins exact values per SF; this spec pins the
  * structural laws those values must obey, so a future stage reorder or
  * parameter drift that happens to keep the hash at one SF still trips):
  *
  *  - the funnel only ever narrows: n_input ≥ n_slice ≥ n_clean ≥
  *    n_dedup ≥ n_gated ≥ n_capped ≥ n_mixed ≥ 0, and the survival
  *    counts are identical on every output row (one stats row
  *    broadcast, never a per-shard recompute);
  *  - shard ids are contiguous from 0 and every shard except the last
  *    holds exactly chunksPerShard = 4 chunks;
  *  - concat-and-chunk arithmetic: every chunk holds ≤ capacity = 256
  *    tokens and only the stream's LAST chunk may be partial, so the
  *    total token count lies in ((ΣnChunks − 1)·256, ΣnChunks·256].
  */
class PipelineSpec extends SparkSpec {

  test("q95: funnel monotone, stats uniform, shard/chunk arithmetic") {
    val rows = SparkEntry.queries("q95_corpus_to_shards")(spark, sf())
      .collect()
    assert(rows.nonEmpty, "the pipeline must produce at least one shard")

    val stats = rows.map { r =>
      Seq("n_input", "n_slice", "n_clean", "n_dedup", "n_gated",
        "n_capped", "n_mixed").map(r.getAs[Long])
    }
    assert(stats.distinct.length == 1, "survival counts identical on every row")
    val Seq(nIn, nSl, nCl, nDd, nGa, nCa, nMx) = stats.head
    val chain = Seq(nIn, nSl, nCl, nDd, nGa, nCa, nMx)
    assert(chain.zip(chain.tail).forall { case (a, b) => a >= b } && nMx >= 0,
      s"funnel must be monotone non-increasing: $chain")
    assert(nSl < nIn, "the snapshot slice must actually slice")
    assert(nMx > 0, "the mixed set must be non-empty at test SF")

    val shards = rows.map(r => (r.getAs[Long]("shard_id"),
      r.getAs[Long]("n_chunks"), r.getAs[Long]("n_tokens")))
    assert(shards.map(_._1).sorted.toSeq == (0L until shards.length).toSeq,
      "shard ids contiguous from 0")
    val last = shards.length - 1
    assert(shards.filter(_._1 < last).forall(_._2 == 4),
      "every shard except the last holds exactly 4 chunks")
    assert(shards.forall(s => s._2 >= 1 && s._2 <= 4))
    assert(shards.forall(s => s._3 <= s._2 * 256),
      "no shard can exceed capacity x its chunk count")
    val totChunks = shards.map(_._2).sum
    val totTok = shards.map(_._3).sum
    assert(totTok > (totChunks - 1) * 256 && totTok <= totChunks * 256,
      s"all chunks full except the stream's last: $totTok tokens in $totChunks chunks")
  }

  /** q116 invariants: deciles are value-monotone in difficulty, bucket
    * range is [0,9], and band sizes are near-uniform (ties may skew).
    */
  test("q116: curriculum buckets monotone in nllu, 10 near-even bands") {
    val rows = SparkEntry.queries("q116_curriculum_order")(spark, sf())
      .collect()
      .map(r => (r.getAs[Long]("nllu"), r.getAs[Long]("bucket")))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, b) => b >= 0 && b <= 9 })
    // monotone: sort by difficulty; bucket sequence must be nondecreasing
    val byDiff = rows.sortBy(_._1).map(_._2)
    assert(byDiff.zip(byDiff.tail).forall { case (a, b) => a <= b })
    // near-even: no band holds more than 3x its fair share
    val n = rows.length
    rows.groupBy(_._2).values.foreach(g => assert(g.length <= n * 3 / 10 + 1))
  }
}
