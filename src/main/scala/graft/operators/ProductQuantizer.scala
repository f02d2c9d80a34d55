package graft.operators

import graft.plans.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search at corpus scale — the
  * compression/search scheme of Jégou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search" (TPAMI 2011), the workhorse
  * behind FAISS `IVFPQ`: split each d-dim vector into `m` subvectors,
  * quantize every subvector against a small per-subspace codebook, and
  * search with asymmetric distance computation (ADC) — per-query lookup
  * tables over the CODES, never touching the original vectors.
  *
  * Scale shape:
  *  - the codebook is driver-sized by construction (m · ks · (d/m)
  *    floats) and ships into the plan as literals — encoding is a pure
  *    projection, map-only, whole-stage codegen, zero shuffle;
  *  - codes pack into ONE BIGINT per vector (m · log₂ks ≤ 63 bits); a
  *    100 TB float32 corpus becomes a ~1.5 TB code table, which is the
  *    artifact ADC scans;
  *  - ADC is again a pure projection over the code table (m shift-mask
  *    lookups + an integer sum per row) followed by a per-query top-k
  *    window — `WindowGroupLimit` keeps the shuffle at k rows per
  *    partition per query.
  *
  * Bit-portability: codebooks are md5-hash-ordered corpus samples
  * ([[Similarity.sampleCentroidsPortable]]'s recipe — no RNG), argmin
  * uses the q56 `‖c‖² − 2·x·c` literal expansion on dimension slices
  * (ties broken by code index), and every cross-engine-visible distance
  * is quantized to integer micro-units BEFORE summation so sums are
  * order-free (q85's discipline).
  */
object ProductQuantizer {

  /** A fitted product quantizer: `books(mi)(j)` is code `j`'s centroid in
    * subspace `mi` (a d/m-dim slice). `ks` must be a power of two so
    * packed codes unpack with shift/mask on both engines.
    */
  final case class Model(dim: Int, m: Int, ks: Int,
      books: Seq[Seq[Array[Float]]]) {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(ks > 1 && (ks & (ks - 1)) == 0, s"ks must be a power of two, got $ks")
    val subDim: Int = dim / m
    val bits: Int = java.lang.Integer.numberOfTrailingZeros(ks)
    require(m * bits <= 63, s"packed code needs ${m * bits} bits > 63")
  }

  /** Fit by portable sampling: the md5-ordered first `ks` corpus vectors,
    * sliced per subspace (every subspace shares the sample rows — the
    * recipe an oracle replays with ORDER BY md5(id) LIMIT ks).
    * `corpus` needs (id, embedding) columns.
    */
  def fitPortable(corpus: DataFrame, dim: Int, m: Int, ks: Int): Model = {
    val sampled = Similarity.sampleCentroidsPortable(corpus, ks)
    require(sampled.size == ks, s"corpus smaller than ks=$ks")
    val subDim = dim / m
    val books = (0 until m).map { mi =>
      sampled.map { case (_, v) => v.slice(mi * subDim, (mi + 1) * subDim) }
    }
    Model(dim, m, ks, books)
  }

  private def normSq(v: Array[Float]): Double =
    v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)

  /** Best (code, true-distance) for subspace `mi` as ONE argmin: array_min
    * over (d, cid, t) structs where d = ‖c‖² − 2·x·c ranks (the ‖x‖² term
    * is constant within the subspace, so ranking matches true distance),
    * cid breaks ties toward the smaller code, and t is the true
    * micro-unit distance floor((d + ‖x‖²)·10⁶ + 0.5) carried along.
    */
  private def bestOf(model: Model, vec: Column, mi: Int): Column = {
    val sub = slice(vec, mi * model.subDim + 1, model.subDim)
    val subNorm = VectorExpressions.dotNative(sub, sub)
    array_min(array(model.books(mi).zipWithIndex.map { case (c, j) =>
      val d = lit(normSq(c)) - lit(2.0) * VectorExpressions.dotNative(sub, lit(c))
      struct(d.as("d"), lit(j).as("cid"),
        floor((d + subNorm) * 1e6 + 0.5).as("t"))
    }: _*))
  }

  /** Encode: (id, packed_code BIGINT with subspace `mi` in bits
    * [mi·bits, (mi+1)·bits), distortion_u BIGINT = Σ per-subspace
    * micro-unit squared distances). Map-only, zero shuffle.
    */
  def encode(corpus: DataFrame, model: Model, idCol: String = "id",
      vecCol: String = "embedding"): DataFrame = {
    val bests = (0 until model.m).map(mi => bestOf(model, col(vecCol), mi))
    val packed = bests.zipWithIndex.map { case (b, mi) =>
      shiftleft(b.getField("cid").cast("long"), mi * model.bits)
    }.reduce(_ bitwiseOR _)
    val distort = bests.map(_.getField("t").cast("long")).reduce(_ + _)
    corpus.select(col(idCol), packed.as("packed_code"),
      distort.as("distortion_u"))
  }

  /** ADC top-k over an ENCODED table: for each query vector (collected —
    * queries are few by contract), build the m·ks lookup table of
    * micro-unit subspace distances driver-side (same (a − 2b) + c
    * evaluation order as the encoder so any engine replays it), then
    * score every code row with m shift-mask lookups + an integer sum,
    * and keep the top k by (distance, id). `codes` needs
    * (id, packed_code).
    */
  def adcTopK(codes: DataFrame, queries: Seq[(Long, Array[Float])],
      model: Model, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mask = lit((model.ks - 1).toLong)
    val scored = queries.map { case (qid, q) =>
      val luts: Seq[Array[Long]] = (0 until model.m).map { mi =>
        val qSub = q.slice(mi * model.subDim, (mi + 1) * model.subDim)
        val normQ = normSq(qSub)
        model.books(mi).map { c =>
          val dot = qSub.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
            acc + a.toDouble * b.toDouble }
          math.floor(((normSq(c) - 2.0 * dot) + normQ) * 1e6 + 0.5).toLong
        }.toArray
      }
      val dist = (0 until model.m).map { mi =>
        val code = shiftrightunsigned(col("packed_code"), mi * model.bits)
          .bitwiseAND(mask)
        element_at(lit(luts(mi)), (code + 1).cast("int"))
      }.reduce(_ + _)
      codes.select(lit(qid).as("qid"), col("id").as("nid"),
        dist.as("dist_u")).where(col("nid") =!= qid)
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("qid").orderBy(col("dist_u"), col("nid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF-PQ index build — the FAISS `IVFPQ` composition (Jégou et al.):
    * coarse cells from [[Similarity.assignCellsJoin]]'s broadcast-join
    * argmin (cell = nearest coarse centroid's id, smallest-id
    * tie-break) with the PQ code packed in the same pass. One row per
    * vector: (id, cell, packed_code) — at 100 TB this 16-byte-row table,
    * written partitioned BY cell, is the entire search artifact; the
    * float vectors are cold storage.
    */
  def ivfpqIndex(corpus: DataFrame, coarse: Seq[(Long, Array[Float])],
      model: Model, idCol: String = "id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = Similarity.assignCellsJoin(
      corpus.select(col(idCol).as("id"), col(vecCol).as("embedding")), coarse)
    val bests = (0 until model.m).map(mi => bestOf(model, col("embedding"), mi))
    val packed = bests.zipWithIndex.map { case (b, mi) =>
      shiftleft(b.getField("cid").cast("long"), mi * model.bits)
    }.reduce(_ bitwiseOR _)
    assigned.select(col("id"), col("cell"), packed.as("packed_code"))
  }

  /** IVF-PQ search: each query ranks the coarse centroids driver-side
    * (same `‖c‖² − 2·q·c` / smallest-cid order as the index build and
    * the oracle), probes its `nProbe` nearest cells, and ADC-scores ONLY
    * the code rows in those cells — the scan reads nProbe/nlist of the
    * code table, which composed with PQ's 1.5% byte ratio is the shape
    * that makes 100 TB ANN interactive. Scoring and ranking are exactly
    * [[adcTopK]]'s: integer micro-unit LUTs, m shift-mask lookups per
    * row, (dist_u, nid) order.
    */
  def ivfpqTopK(index: DataFrame, queries: Seq[(Long, Array[Float])],
      model: Model, coarse: Seq[(Long, Array[Float])],
      nProbe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mask = lit((model.ks - 1).toLong)
    val scored = queries.map { case (qid, q) =>
      val probeCells: Seq[Long] = coarse.map { case (cid, c) =>
        val dot = q.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
          acc + a.toDouble * b.toDouble }
        (normSq(c) - 2.0 * dot, cid)
      }.sorted.take(nProbe).map(_._2)
      val luts: Seq[Array[Long]] = (0 until model.m).map { mi =>
        val qSub = q.slice(mi * model.subDim, (mi + 1) * model.subDim)
        val normQ = normSq(qSub)
        model.books(mi).map { c =>
          val dot = qSub.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
            acc + a.toDouble * b.toDouble }
          math.floor(((normSq(c) - 2.0 * dot) + normQ) * 1e6 + 0.5).toLong
        }.toArray
      }
      val dist = (0 until model.m).map { mi =>
        val code = shiftrightunsigned(col("packed_code"), mi * model.bits)
          .bitwiseAND(mask)
        element_at(lit(luts(mi)), (code + 1).cast("int"))
      }.reduce(_ + _)
      index
        .where(col("cell").isin(probeCells: _*) && col("id") =!= qid)
        .select(lit(qid).as("qid"), col("id").as("nid"), dist.as("dist_u"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("qid").orderBy(col("dist_u"), col("nid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  // -------------------------------------------------------------------
  // Residual IVF-PQ — the REAL FAISS IVFPQ: quantize x − c(cell)
  // -------------------------------------------------------------------

  /** A fitted RESIDUAL product quantizer: codebooks over integer
    * micro-unit residual vectors (see [[encodeResiduals]]). Keeping the
    * residual space integer makes every distance below exact BIGINT
    * arithmetic — no floating point after the one quantization step, so
    * cross-engine replay is trivial (the q85/q102 discipline applied to
    * the vector path itself).
    */
  final case class IntModel(dim: Int, m: Int, ks: Int,
      books: Seq[Seq[Array[Long]]]) {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(ks > 1 && (ks & (ks - 1)) == 0, s"ks must be a power of two, got $ks")
    val subDim: Int = dim / m
    val bits: Int = java.lang.Integer.numberOfTrailingZeros(ks)
    require(m * bits <= 63, s"packed code needs ${m * bits} bits > 63")
  }

  /** Integer micro-unit residual of every vector against its coarse
    * cell's centroid: (id, cell, rv array<bigint>) with
    * rv_i = floor((x_i − c_i)·10⁶ + 0.5). Assignment is
    * [[Similarity.assignCellsJoin]]'s broadcast-join argmin (identical
    * to the plain-IVFPQ cells, so the two index variants are
    * comparable cell-for-cell); the residual is a map-side zip_with.
    */
  def residualFrame(corpus: DataFrame, coarse: Seq[(Long, Array[Float])],
      idCol: String = "id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = coarse.map { case (cid, ce) => (cid, ce.toSeq) }
      .toDF("__rcid", "__rce")
    Similarity.assignCellsJoin(
        corpus.select(col(idCol).as("id"), col(vecCol).as("embedding")), coarse)
      .join(broadcast(cents), col("cell") === col("__rcid"))
      .select(col("id"), col("cell"),
        zip_with(col("embedding"), col("__rce"), (a, b) =>
          floor((a.cast("double") - b.cast("double")) * 1e6 + 0.5)
            .cast("long")).as("rv"))
  }

  /** Fit residual codebooks by the portable recipe: the md5-ordered
    * first `ks` RESIDUAL vectors (each subspace shares the sample rows
    * — same replayable construction as [[fitPortable]], over the
    * residual frame). Residuals cluster around 0 within every cell, so
    * a codebook fit on them resolves much finer structure than one fit
    * on raw vectors — the reason FAISS IVFPQ encodes residuals.
    */
  def fitResidualPortable(corpus: DataFrame, coarse: Seq[(Long, Array[Float])],
      dim: Int, m: Int, ks: Int): IntModel = {
    val sampled = residualFrame(corpus, coarse)
      .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
      .limit(ks)
      .collect()
      .map(r => r.getSeq[Long](2).toArray)
    require(sampled.length == ks, s"corpus smaller than ks=$ks")
    val subDim = dim / m
    val books = (0 until m).map { mi =>
      sampled.toSeq.map(v => v.slice(mi * subDim, (mi + 1) * subDim))
    }
    IntModel(dim, m, ks, books)
  }

  private def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  private def normSqLong(v: Array[Long]): Long =
    v.foldLeft(0L)((acc, x) => acc + x * x)

  /** Encode residuals against the fitted integer codebooks: one row per
    * vector (id, cell, packed_code), all-BIGINT argmin
    * `‖c‖² − 2·x·c` per subspace with smallest-code tie-break —
    * bit-exact on any engine by construction (no floats anywhere).
    * Same pass computes the coarse assignment; map-only after the
    * assignment's one collapsed exchange.
    */
  def encodeResiduals(corpus: DataFrame, coarse: Seq[(Long, Array[Float])],
      model: IntModel, idCol: String = "id",
      vecCol: String = "embedding"): DataFrame = {
    val rf = residualFrame(corpus, coarse, idCol, vecCol)
    val bests = (0 until model.m).map { mi =>
      val sub = slice(col("rv"), mi * model.subDim + 1, model.subDim)
      array_min(array(model.books(mi).zipWithIndex.map { case (c, j) =>
        struct(
          (lit(normSqLong(c)) - lit(2L) * dotLong(sub, lit(c))).as("d"),
          lit(j).as("cid"))
      }: _*))
    }
    val packed = bests.zipWithIndex.map { case (b, mi) =>
      shiftleft(b.getField("cid").cast("long"), mi * model.bits)
    }.reduce(_ bitwiseOR _)
    rf.select(col("id"), col("cell"), packed.as("packed_code"))
  }

  /** Residual-ADC top-k: each query ranks the coarse centroids
    * driver-side (the [[ivfpqTopK]] rule), then for every PROBED cell
    * builds the per-cell lookup table over the QUERY'S OWN residual in
    * that cell — `‖(q−c_cell)_sub − book_j‖²` in exact integer units —
    * and scores the cell's code rows with m shift-mask lookups + an
    * integer sum. The per-cell LUTs ship as one map literal
    * (nProbe·m·ks longs — driver-sized); scan and ranking are
    * [[ivfpqTopK]]'s. This is the asymmetric-distance form of true
    * IVFPQ: within a probed cell, distance(q, x) =
    * ‖(q−c) − r̂(x)‖² exactly, so finer codebooks (fit on residuals)
    * buy recall that raw-vector codebooks cannot.
    */
  def ivfpqResidualTopK(index: DataFrame, queries: Seq[(Long, Array[Float])],
      model: IntModel, coarse: Seq[(Long, Array[Float])],
      nProbe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mask = lit((model.ks - 1).toLong)
    val scored = queries.map { case (qid, q) =>
      val probeCells: Seq[Long] = coarse.map { case (cid, c) =>
        val dot = q.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
          acc + a.toDouble * b.toDouble }
        (normSq(c) - 2.0 * dot, cid)
      }.sorted.take(nProbe).map(_._2)
      val centOf = coarse.toMap
      val lutByCell: Seq[(Long, Array[Long])] = probeCells.map { cell =>
        val c = centOf(cell)
        val qr: Array[Long] = q.indices.map(i =>
          math.floor((q(i).toDouble - c(i).toDouble) * 1e6 + 0.5).toLong).toArray
        val flat = Array.tabulate(model.m * model.ks) { idx =>
          val mi = idx / model.ks
          val j = idx % model.ks
          val qSub = qr.slice(mi * model.subDim, (mi + 1) * model.subDim)
          val cj = model.books(mi)(j)
          qSub.zip(cj).foldLeft(0L) { case (acc, (a, b)) =>
            acc + (a - b) * (a - b) }
        }
        cell -> flat
      }
      val lutMap = map(lutByCell.flatMap { case (cell, flat) =>
        Seq(lit(cell), lit(flat)) }: _*)
      val dist = (0 until model.m).map { mi =>
        val code = shiftrightunsigned(col("packed_code"), mi * model.bits)
          .bitwiseAND(mask)
        element_at(element_at(lutMap, col("cell")),
          (lit(mi * model.ks) + code + 1).cast("int"))
      }.reduce(_ + _)
      index
        .where(col("cell").isin(probeCells: _*) && col("id") =!= qid)
        .select(lit(qid).as("qid"), col("id").as("nid"), dist.as("dist_u"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("qid").orderBy(col("dist_u"), col("nid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Exact rerank of a (qid, nid) SHORTLIST against the ORIGINAL
    * vectors — the standard FAISS two-stage pattern (Jégou et al. §V.C):
    * ADC compresses the corpus scan, then the top `m·k` shortlist —
    * tiny at any scale — is rescored with the exact distance, recovering
    * the recall the quantizer's cell collapse loses (the r10 ladder
    * measured ADC alone at recall@5 = 0.80 clustered: the 5th neighbor
    * shares a code tuple with its cluster-mates and ties die by id).
    *
    * Shape: the shortlist (|queries|·shortlist rows) broadcasts into a
    * hash join against the vector table — map-only, no shuffle; at
    * 100 TB the vector table is id-bucketed so the join prunes to the
    * shortlist's buckets and the floats are read for shortlist ids only.
    * Exact distance is the same micro-unit convention as the ADC LUTs:
    * `floor(((‖q‖² − 2·x·q) + ‖x‖²)·10⁶ + 0.5)` with the identical
    * evaluation order, so any engine replays it; rank by (exact_u, nid).
    *
    * Output: (qid, nid, exact_u, rank ≤ k).
    */
  def exactRerank(shortlist: DataFrame, vectors: DataFrame,
      queries: Seq[(Long, Array[Float])], k: Int,
      idCol: String = "id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty, "exactRerank needs at least one query")
    val withVec = broadcast(shortlist.select("qid", "nid"))
      .join(vectors.select(col(idCol).as("nid"), col(vecCol).as("ne")), "nid")
    val exact = queries.map { case (qid, q) =>
      val d = lit(normSq(q)) -
        lit(2.0) * VectorExpressions.dotNative(col("ne"), lit(q))
      (qid, floor((d + VectorExpressions.dotNative(col("ne"), col("ne")))
        * 1e6 + 0.5).cast("long"))
    }.foldLeft(lit(null).cast("long")) { case (acc, (qid, e)) =>
      when(col("qid") === qid, e).otherwise(acc)
    }
    val scored = withVec.withColumn("exact_u", exact).drop("ne")
    val w = Window.partitionBy("qid").orderBy(col("exact_u"), col("nid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("qid", "nid", "exact_u", "rank")
  }

  /** [[adcTopK]] + [[exactRerank]]: ADC scans the code table for a
    * `k·shortlistMult` shortlist, the exact pass rescores only those
    * rows. At 100 TB the rerank reads `|queries|·m·k` vectors — nearly
    * free — and converts ADC's quantization-bound recall into
    * exact-ordering recall over the shortlist.
    */
  def adcTopKRerank(codes: DataFrame, vectors: DataFrame,
      queries: Seq[(Long, Array[Float])], model: Model, k: Int,
      shortlistMult: Int = 4): DataFrame = {
    require(shortlistMult >= 1, s"shortlistMult must be >= 1, got $shortlistMult")
    exactRerank(adcTopK(codes, queries, model, k * shortlistMult),
      vectors, queries, k)
  }

  /** [[ivfpqTopK]] + [[exactRerank]] — the full FAISS IVFPQ+rerank
    * composition: probe nProbe cells, ADC-score their codes, rerank the
    * `k·shortlistMult` survivors exactly.
    */
  def ivfpqTopKRerank(index: DataFrame, vectors: DataFrame,
      queries: Seq[(Long, Array[Float])], model: Model,
      coarse: Seq[(Long, Array[Float])], nProbe: Int, k: Int,
      shortlistMult: Int = 4): DataFrame = {
    require(shortlistMult >= 1, s"shortlistMult must be >= 1, got $shortlistMult")
    exactRerank(ivfpqTopK(index, queries, model, coarse, nProbe,
      k * shortlistMult), vectors, queries, k)
  }
}
