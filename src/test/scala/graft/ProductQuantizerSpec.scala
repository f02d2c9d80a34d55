package graft

import graft.operators.ProductQuantizer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ invariants on the real embeddings (the q106/q107 oracles pin exact
  * cross-engine values; these pin the algebra the oracles can't see).
  */
class ProductQuantizerSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf())
    .select(col("vec_id").as("id"), col("embedding"))
  private lazy val model = ProductQuantizer.fitPortable(emb, dim = 64, m = 8, ks = 16)
  private lazy val codes = ProductQuantizer.encode(emb, model).cache()

  private def unpack(packed: Long): Seq[Int] =
    (0 until model.m).map(mi => ((packed >>> (mi * model.bits)) & (model.ks - 1)).toInt)

  test("encode matches a driver-side brute-force argmin per subspace") {
    val vecs = emb.orderBy("id").limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val got = codes.filter(col("id").isin(vecs.keys.toSeq: _*)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      val expect = (0 until model.m).map { mi =>
        val sub = v.slice(mi * model.subDim, (mi + 1) * model.subDim)
        model.books(mi).zipWithIndex.map { case (c, j) =>
          // the operator's own ‖c‖²−2·x·c expansion (same FP sequence —
          // a direct Σ(c−x)² could flip near-ties)
          val normC = c.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
          val dot = sub.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
            acc + a.toDouble * b.toDouble }
          (normC - 2.0 * dot, j)
        }.min._2
      }
      assert(unpack(got(id)) === expect, s"vector $id")
    }
  }

  test("encode is deterministic under repartitioning") {
    val a = codes.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = ProductQuantizer.encode(emb.repartition(13), model)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a === b)
  }

  test("ADC distance equals distance to the reconstructed vector") {
    val queries = emb.filter(col("id") < 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val top = ProductQuantizer.adcTopK(codes, queries, model, k = 5).collect()
    val codeOf = codes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qv = queries.toMap
    top.foreach { r =>
      val (qid, nid, distU) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val q = qv(qid)
      // reconstruct nid from its codes; true d²(q, recon) in micro-units
      // must match the LUT sum within m units of floor slack
      val exact = (0 until model.m).map { mi =>
        val c = model.books(mi)(unpack(codeOf(nid))(mi))
        val qSub = q.slice(mi * model.subDim, (mi + 1) * model.subDim)
        qSub.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
          acc + (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }
      }.sum
      assert(math.abs(distU - exact * 1e6) <= model.m.toDouble,
        s"qid=$qid nid=$nid distU=$distU exact=${exact * 1e6}")
    }
    // per-query: exactly k rows, ranks 1..k, distances nondecreasing
    top.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to 5))
      val d = sorted.map(_.getLong(2))
      assert(d.zip(d.tail).forall { case (x, y) => x <= y })
    }
  }

  test("IVFPQ with every cell probed equals plain ADC") {
    val coarse = graft.operators.Similarity.sampleCentroidsPortable(emb, 8)
    val index = ProductQuantizer.ivfpqIndex(emb, coarse, model)
    val queries = emb.filter(col("id") < 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "nid", "dist_u", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val a = rows(ProductQuantizer.ivfpqTopK(index, queries, model, coarse,
      nProbe = 8, k = 5))
    val b = rows(ProductQuantizer.adcTopK(codes, queries, model, k = 5))
    assert(a.toSeq == b.toSeq)
  }

  test("IVFPQ equals ADC restricted to the probed cells") {
    val coarse = graft.operators.Similarity.sampleCentroidsPortable(emb, 12)
    val index = ProductQuantizer.ivfpqIndex(emb, coarse, model)
    val cellOf = index.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val queries = emb.filter(col("id") < 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val got = ProductQuantizer.ivfpqTopK(index, queries, model, coarse,
        nProbe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._3, t._2)).toSeq).toMap
    // expected: the UNRESTRICTED ADC ranking, filtered to probed cells
    val full = ProductQuantizer.adcTopK(codes, queries, model, k = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    queries.foreach { case (qid, q) =>
      val probes = coarse.map { case (cid, c) =>
        val dot = q.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
          acc + a.toDouble * b.toDouble }
        val nc = c.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
        (nc - 2.0 * dot, cid)
      }.sorted.take(3).map(_._2).toSet
      val expect = full.filter(t => t._1 == qid && probes(cellOf(t._2)))
        .sortBy(t => (t._3, t._2)).take(5).toSeq
      assert(got(qid) == expect, s"qid=$qid")
    }
  }

  test("exactRerank over a whole-corpus shortlist equals exact search") {
    // shortlist = every (qid, nid) pair → the rerank IS the exact
    // brute-force ranking; pins the rerank's distance/ordering contract
    val queries = emb.filter(col("id") < 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val n = emb.count().toInt
    val got = ProductQuantizer.adcTopKRerank(codes, emb, queries, model,
        k = 5, shortlistMult = n) // k·mult ≥ corpus → full shortlist
      .select("qid", "nid", "exact_u", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).toSeq).toMap
    val vecs = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    queries.foreach { case (qid, q) =>
      val nq = q.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      val expect = vecs.filter(_._1 != qid).map { case (nid, v) =>
        val dot = v.zip(q).foldLeft(0.0) { case (a, (x, y)) =>
          a + x.toDouble * y.toDouble }
        val nv = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
        (math.floor(((nq - 2.0 * dot) + nv) * 1e6 + 0.5).toLong, nid)
      }.sorted.take(5).zipWithIndex
        .map { case ((d, nid), i) => (qid, nid, d, i + 1) }.toSeq
      assert(got(qid) == expect, s"qid=$qid")
    }
  }

  test("rerank recall on clustered vectors reaches exact-search recall") {
    // 50 clusters of 10 (center + 5% noise): the exact top-5 are 5 of
    // the query's 9 cluster-mates; PQ collapses all 9 to ONE code
    // tuple, so plain ADC must tie-break by id and picks wrong mates —
    // while the 4·k shortlist holds the whole tie group and the exact
    // rerank reorders it perfectly. (Cluster size must EXCEED k: with
    // size ≈ k the 5th neighbor sits in the uniform background where
    // no shortlist can find it — a corpus artifact, not a tie-break
    // one.)
    val n = 500L
    val cv = spark.range(n).select(col("id"),
      expr(s"""transform(sequence(0, 63), j -> CAST(
        (CAST(pmod(xxhash64(concat('c', cast(pmod(id, 50) AS string),
           ':', cast(j AS string))), 2001) AS DOUBLE) / 1000.0 - 1.0)
        + (CAST(pmod(xxhash64(concat('n', cast(id AS string), ':',
           cast(j AS string))), 2001) AS DOUBLE) / 1000.0 - 1.0) * 0.05
        AS FLOAT))""").as("embedding")).cache()
    val cModel = ProductQuantizer.fitPortable(cv, dim = 64, m = 8, ks = 16)
    val cCodes = ProductQuantizer.encode(cv, cModel)
    val queries = cv.filter(col("id") < 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val vecs = cv.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def exactTop(qid: Long, q: Array[Float]) = {
      val nq = q.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      vecs.filter(_._1 != qid).map { case (nid, v) =>
        val dot = v.zip(q).foldLeft(0.0) { case (a, (x, y)) =>
          a + x.toDouble * y.toDouble }
        val nv = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
        (math.floor(((nq - 2.0 * dot) + nv) * 1e6 + 0.5).toLong, nid)
      }.sorted.take(5).map(_._2).toSet
    }
    def ids(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adc = ids(ProductQuantizer.adcTopK(cCodes, queries, cModel, k = 5))
    val rer4 = ids(ProductQuantizer.adcTopKRerank(cCodes, cv, queries, cModel,
      k = 5, shortlistMult = 4))
    val rer20 = ids(ProductQuantizer.adcTopKRerank(cCodes, cv, queries, cModel,
      k = 5, shortlistMult = 20))
    def recall(got: Map[Long, Set[Long]]) = queries.map { case (qid, q) =>
      (got(qid) intersect exactTop(qid, q)).size.toDouble / 5
    }.sum / queries.size
    // the tie-break blind spot is REAL: plain ADC cannot reach full
    // recall (9 identically-coded mates, only 5 slots, id order picks
    // wrong ones for at least one query)
    assert(recall(adc) < 1.0, s"corpus failed to expose the ADC tie gap")
    // monotone-in-shortlist, and the rerank RECOVERS the exact top-5
    // for every query — the whole tie group fits in the 4·k shortlist
    // and the exact rescore orders it perfectly
    assert(recall(rer4) >= recall(adc),
      s"rerank@4k recall ${recall(rer4)} < adc recall ${recall(adc)}")
    assert(recall(rer20) >= recall(rer4),
      s"recall must be monotone in the shortlist: ${recall(rer20)} < ${recall(rer4)}")
    queries.foreach { case (qid, q) =>
      assert(rer4(qid) == exactTop(qid, q),
        s"rerank must recover the exact top-5 for qid=$qid")
    }
    cv.unpersist()
  }

  test("ivfpqTopKRerank at full probe equals adcTopKRerank") {
    val coarse = graft.operators.Similarity.sampleCentroidsPortable(emb, 8)
    val index = ProductQuantizer.ivfpqIndex(emb, coarse, model)
    val queries = emb.filter(col("id") < 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "nid", "exact_u", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val a = rows(ProductQuantizer.ivfpqTopKRerank(index, emb, queries, model,
      coarse, nProbe = 8, k = 5))
    val b = rows(ProductQuantizer.adcTopKRerank(codes, emb, queries, model, k = 5))
    assert(a == b)
  }

  test("residual IVFPQ: recall on clustered vectors >= raw-vector IVFPQ") {
    // the FAISS argument for encoding residuals: within a cell the
    // residuals sit near 0, so the same 8x16 codebook budget resolves
    // noise-scale structure that raw-vector codebooks collapse
    val n = 500L
    val cv = spark.range(n).select(col("id"),
      expr(s"""transform(sequence(0, 63), j -> CAST(
        (CAST(pmod(xxhash64(concat('c', cast(pmod(id, 100) AS string),
           ':', cast(j AS string))), 2001) AS DOUBLE) / 1000.0 - 1.0)
        + (CAST(pmod(xxhash64(concat('n', cast(id AS string), ':',
           cast(j AS string))), 2001) AS DOUBLE) / 1000.0 - 1.0) * 0.05
        AS FLOAT))""").as("embedding")).cache()
    cv.count()
    val coarse = graft.operators.Similarity.sampleCentroidsPortable(cv, 12)
    val queries = cv.filter(col("id") < 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val vecs = cv.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def exactTop(qid: Long, q: Array[Float]) = {
      val nq = q.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      vecs.filter(_._1 != qid).map { case (nid, v) =>
        val dot = v.zip(q).foldLeft(0.0) { case (a, (x, y)) =>
          a + x.toDouble * y.toDouble }
        val nv = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
        ((nq - 2.0 * dot) + nv, nid)
      }.sorted.take(5).map(_._2).toSet
    }
    def ids(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rawModel = ProductQuantizer.fitPortable(cv, dim = 64, m = 8, ks = 16)
    val raw = ids(ProductQuantizer.ivfpqTopK(
      ProductQuantizer.ivfpqIndex(cv, coarse, rawModel), queries, rawModel,
      coarse, nProbe = 12, k = 5))
    val resModel = ProductQuantizer.fitResidualPortable(cv, coarse, 64, 8, 16)
    val res = ids(ProductQuantizer.ivfpqResidualTopK(
      ProductQuantizer.encodeResiduals(cv, coarse, resModel), queries,
      resModel, coarse, nProbe = 12, k = 5))
    def recall(got: Map[Long, Set[Long]]) = queries.map { case (qid, q) =>
      (got(qid) intersect exactTop(qid, q)).size.toDouble / 5
    }.sum / queries.size
    assert(recall(res) >= recall(raw),
      s"residual recall ${recall(res)} < raw recall ${recall(raw)}")
    cv.unpersist()
  }

  test("encodeResiduals is deterministic under repartitioning") {
    val coarse = graft.operators.Similarity.sampleCentroidsPortable(emb, 12)
    val m = ProductQuantizer.fitResidualPortable(emb, coarse, 64, 8, 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val a = rows(ProductQuantizer.encodeResiduals(emb, coarse, m))
    val b = rows(ProductQuantizer.encodeResiduals(emb.repartition(13), coarse, m))
    assert(a == b)
  }

  test("distortion is zero for codebook members' own sample vectors") {
    // the 16 sampled vectors ARE centroids in every subspace → their
    // distortion is exactly 0 (up to the +0.5 floor, which keeps 0 at 0)
    val sampleIds = graft.operators.Similarity
      .sampleCentroidsPortable(emb, 16).map(_._1)
    val d = codes.filter(col("id").isin(sampleIds: _*))
      .agg(max("distortion_u")).head().getLong(0)
    assert(d === 0L)
  }
}
