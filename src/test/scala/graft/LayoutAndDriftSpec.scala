package graft

import graft.operators.{Classifier, Layout, Packing, Snapshot}
import org.apache.spark.sql.functions._

/** Round-10 additions: linear quality classifier, sliding-window
  * chunking, distribution drift, Z-order layout.
  */
class LayoutAndDriftSpec extends SparkSpec {
  import sqlImplicits._

  // ---- Classifier ----

  test("qualityClassify: exact integer score on a hand-computed document") {
    val df = Seq((1L, "the the quick brown fox"), (2L, ""), (3L, "  "))
      .toDF("doc_id", "text")
    val out = Classifier.qualityClassify(df, "text")
      .select("doc_id", "n_tok", "n_dis", "n_ch", "stop_hits", "score_micro", "keep")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 5 tokens, 4 distinct, 19 chars sans spaces, 2 stop hits
    val r1 = out(1L)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4)) == ((5L, 4L, 19L, 2L)))
    val expected = -3000000L + -40000L * 5 + 200000L * 4 + 2000L * 19 + 300000L * 2
    assert(r1.getLong(5) == expected && expected == -1762000L)
    assert(!r1.getBoolean(6))
    // empty / whitespace-only: all-zero features, score == bias, drop
    Seq(2L, 3L).foreach { id =>
      val r = out(id)
      assert((r.getLong(1), r.getLong(2), r.getLong(4)) == ((0L, 0L, 0L)))
      assert(r.getLong(5) == Classifier.QualityBiasMicro && !r.getBoolean(6))
    }
  }

  test("trainLinear2: recovers an exact planted linear law; degenerate features fall back to intercept-only") {
    // y = 3 + 2*x1 - x2 on four non-collinear points; n = 4 is a power
    // of two, so every /n in the centered moments is exact in binary
    // and the recovered weights quantize exactly
    val planted = Seq((0L, 0L, 3L), (1L, 0L, 5L), (0L, 1L, 2L), (2L, 1L, 6L))
      .toDF("x1", "x2", "y")
    val w = Classifier.trainLinear2(planted, "x1", "x2", "y").collect()(0)
    assert((w.getLong(0), w.getLong(1), w.getLong(2), w.getLong(3), w.getLong(4)) ==
      ((4L, 3000000L, 2000000L, -1000000L, 10000L)), s"got $w")
    // constant features: det = 0 -> slopes 0, intercept = mean(y), R2 0
    val flat = Seq((1L, 1L, 10L), (1L, 1L, 20L)).toDF("x1", "x2", "y")
    val f = Classifier.trainLinear2(flat, "x1", "x2", "y").collect()(0)
    assert((f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3), f.getLong(4)) ==
      ((2L, 15000000L, 0L, 0L, 0L)), s"got $f")
    // null rows excluded, not zero-filled
    val withNull = Seq((Some(0L), Some(0L), Some(3L)), (Some(1L), Some(0L), Some(5L)),
      (Some(0L), Some(1L), Some(2L)), (Some(2L), Some(1L), Some(6L)),
      (None, Some(9L), Some(99L)), (Some(9L), Some(9L), None))
      .toDF("x1", "x2", "y")
    val n = Classifier.trainLinear2(withNull, "x1", "x2", "y").collect()(0)
    assert((n.getLong(0), n.getLong(2), n.getLong(3)) == ((4L, 2000000L, -1000000L)), s"got $n")
  }

  test("applyLinear2: trained weights reproduce a planted law exactly on the training frame") {
    val planted = Seq((0L, 0L, 3L), (1L, 0L, 5L), (0L, 1L, 2L), (2L, 1L, 6L))
      .toDF("x1", "x2", "y")
    val w = Classifier.trainLinear2(planted, "x1", "x2", "y")
    val fit = Classifier.applyLinear2(planted, "x1", "x2", w)
      .select("y", "score_fit_micro").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // perfect linear data + exact quantized weights → fit == y on every row
    assert(fit.nonEmpty && fit.forall { case (y, f) => f == y }, fit.mkString(","))
  }

  test("qualityClassify: keep boundary is score >= 0, both classes occur on testdata") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val out = Classifier.qualityClassify(docs, "text")
    val bad = out.filter((col("score_micro") >= 0) =!= col("keep")).count()
    assert(bad == 0L)
    val byClass = out.groupBy("keep").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byClass.getOrElse(true, 0L) > 0 && byClass.getOrElse(false, 0L) > 0)
  }

  // ---- slidingChunks ----

  test("slidingChunks: window starts, lengths, overlap content, and edges") {
    val df = Seq(
      (1L, (1 to 40).map(i => s"t$i").mkString(" ")), // 40 tokens, w=16 s=8
      (2L, "a b c"), // n <= width: single chunk
      (3L, ""), (4L, "   ") // empty: no rows
    ).toDF("doc_id", "text")
    val out = Packing.slidingChunks(df, "doc_id", "text", width = 16, stride = 8)
      .orderBy("id", "chunk_idx").collect()
    // doc 1: starts 0,8,16,24,32 -> 5 chunks; lengths 16,16,16,16,8
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getLong(1)).toSeq == (0L to 4L))
    assert(d1.map(_.getLong(2)).toSeq == Seq(0L, 8L, 16L, 24L, 32L))
    assert(d1.map(_.getLong(3)).toSeq == Seq(16L, 16L, 16L, 16L, 8L))
    // chunk 1 of doc 1 covers tokens 9..24 (1-based): md5 pinned
    val toks = (1 to 40).map(i => s"t$i")
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(toks.slice(8, 24).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d1(1).getString(4) == want)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getLong(3) == 3L && d2(0).getLong(2) == 0L)
    assert(!out.exists(r => r.getLong(0) >= 3L))
  }

  test("slidingChunks: stride == width degenerates to disjoint chunking") {
    val df = Seq((1L, (1 to 10).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val out = Packing.slidingChunks(df, "doc_id", "text", width = 4, stride = 4)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 4L, 8L))
    assert(out.map(_.getLong(3)).sum == 10L) // disjoint cover, no overlap
  }

  // ---- distributionDrift ----

  test("distributionDrift: zero drift on identical sides, exact micro shares") {
    val snap = Seq("a", "a", "a", "b").toDF("src")
    val out = Snapshot.distributionDrift(snap, snap, "src")
      .orderBy("value").collect()
    assert(out.map(_.getAs[Long]("micro_old")).toSeq == Seq(750000L, 250000L))
    assert(out.forall(r => r.getAs[Long]("drift_micro") == 0L &&
      r.getAs[Long]("l1_micro") == 0L))
  }

  test("distributionDrift: one-sided values fill zero; l1 is the drift sum") {
    val o = Seq("a", "a", "b").toDF("src")
    val n = Seq("a", "c", "c", "c").toDF("src")
    val out = Snapshot.distributionDrift(o, n, "src")
      .collect().map(r => r.getAs[String]("value") -> r).toMap
    assert(out("b").getAs[Long]("n_new") == 0L &&
      out("b").getAs[Long]("micro_new") == 0L)
    assert(out("c").getAs[Long]("n_old") == 0L)
    // micro shares: a 2/3 vs 1/4, b 1/3 vs 0, c 0 vs 3/4 (integer div)
    assert(out("a").getAs[Long]("micro_old") == 666666L)
    assert(out("a").getAs[Long]("micro_new") == 250000L)
    val drifts = out.values.map(_.getAs[Long]("drift_micro")).toSeq
    assert(out.values.forall(_.getAs[Long]("l1_micro") == drifts.sum))
  }

  // ---- Layout / Z-order ----

  test("zOrderKey2 interleaves bits exactly (vs a reference Scala fold)") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (65535L, 65535L),
      (12345L, 54321L), (65536L, 1L)) // high bits beyond `bits` ignored
    val df = cases.toDF("x", "y")
      .withColumn("z", Layout.zOrderKey2(col("x"), col("y"), 16))
    val got = df.orderBy("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == ref(x & 65535L, y & 65535L, 16), s"($x,$y)")
    }
    // canonical small case: x=0b101, y=0b011 -> even bits 1,0,1 + odd
    // bits 1,1,0 -> z=0b011011 = 27
    assert(ref(5L, 3L, 16) == 27L)
  }

  test("zOrderKey2 keeps both dimensions' per-file spans narrow vs lexicographic") {
    // 64x64 grid, one point per cell; 16 "files" of 256 rows each
    val grid = spark.range(4096).select((col("id") / 64).cast("long").as("x"),
      pmod(col("id"), lit(64L)).as("y"))
    def spans(keyed: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val f = keyed
        .withColumn("fid", expr("(row_number() OVER (ORDER BY k, x, y) - 1) div 256"))
        .groupBy("fid")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).collect()(0)
      (f.getDouble(0), f.getDouble(1))
    }
    val (lexX, lexY) = spans(grid.withColumn("k", col("x") * 64 + col("y")))
    val (zX, zY) = spans(grid.withColumn("k", Layout.zOrderKey2(col("x"), col("y"), 6)))
    // lexicographic: perfect on x, useless on y (full 0..63 span per file)
    assert(lexY == 63.0 && lexX < 16)
    // z-order: BOTH spans a fraction of the domain (16x16 quads -> span 15)
    assert(zX <= 16.0 && zY <= 16.0, s"z spans ($zX, $zY)")
  }

  test("zOrderKeyN: 2-D case equals zOrderKey2; 3-D bit placement exact") {
    val df = Seq((5L, 3L, 6L)).toDF("x", "y", "z")
    val r = df.select(
      Layout.zOrderKeyN(Seq(col("x"), col("y")), 6).as("k2n"),
      Layout.zOrderKey2(col("x"), col("y"), 6).as("k2"),
      Layout.zOrderKeyN(Seq(col("x"), col("y"), col("z")), 4).as("k3"))
      .collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    // 3-D reference fold: bit b of dim d at b*3+d
    def ref(xs: Seq[Long], bits: Int): Long =
      (0 until bits).flatMap(b => xs.zipWithIndex.map { case (x, d) =>
        ((x >> b) & 1L) << (b * 3 + d) }).reduce(_ | _)
    assert(r.getLong(2) == ref(Seq(5L, 3L, 6L), 4))
  }

  test("hilbert: bijective and unit-step — the defining curve properties") {
    // every Hilbert curve visits each cell exactly once and consecutive
    // indices are unit neighbors (exactly one coordinate changes, by 1);
    // checked exhaustively for (n=2, bits=3) and (n=3, bits=2)
    for ((n, bits) <- Seq((2, 3), (3, 2))) {
      val side = 1 << bits
      val total = 1L << (n * bits)
      val seen = new Array[Array[Long]](total.toInt)
      def walk(coords: List[Long], d: Int): Unit =
        if (d == n) {
          val h = graft.plans.HilbertOps.index(bits, coords.toArray)
          assert(h >= 0 && h < total, s"h=$h out of range for n=$n bits=$bits")
          assert(seen(h.toInt) == null, s"duplicate index $h")
          seen(h.toInt) = coords.toArray
        } else (0L until side).foreach(v => walk(coords :+ v, d + 1))
      walk(Nil, 0)
      (1 until total.toInt).foreach { h =>
        val diff = seen(h).zip(seen(h - 1)).map { case (a, b) => math.abs(a - b) }
        assert(diff.sum == 1, s"n=$n bits=$bits step $h not unit: " +
          s"${seen(h - 1).mkString(",")} -> ${seen(h).mkString(",")}")
      }
    }
  }

  test("hilbertKey column (codegen) matches HilbertOps, nulls propagate") {
    val rows = (0L until 64L).map(i => (i / 8, i % 8)) :+ ((9L, 20L))
    val df = rows.toDF("x", "y")
      .withColumn("h", Layout.hilbertKey(Seq(col("x"), col("y")), 3))
    df.collect().foreach { r =>
      val exp = graft.plans.HilbertOps.index(3, Array(r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) == exp, s"(${r.getLong(0)},${r.getLong(1)})")
    }
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .withColumn("h", Layout.hilbertKey(Seq(col("x"), col("y")), 3))
    assert(withNull.collect()(0).isNullAt(2))
  }

  test("hilbert beats morton on 3-D per-file bounding boxes") {
    // full 16^3 grid, files of 96 cells. File size is deliberately NOT a
    // power of two: at power-of-two sizes every contiguous key range of
    // either curve is an exact box and the metrics tie; real file sizing
    // is byte-driven, not cell-count-aligned, and there Morton's
    // power-of-two boundary jumps fatten the straddling files' boxes
    // while Hilbert's unit-step adjacency keeps them tight (measured:
    // vol 4864 vs 11584, span sum 519 vs 691 on this grid).
    val n = 16L
    val grid = spark.range(n * n * n).select(
      (col("id") / (n * n)).cast("long").as("x"),
      pmod((col("id") / n).cast("long"), lit(n)).as("y"),
      pmod(col("id"), lit(n)).as("z"))
    def fileStats(keyed: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = keyed
        .withColumn("fid",
          expr("(row_number() OVER (ORDER BY k, x, y, z) - 1) div 96"))
        .groupBy("fid")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1) *
          (max("z") - min("z") + 1)).as("vol"),
          ((max("x") - min("x")) + (max("y") - min("y")) +
            (max("z") - min("z"))).as("spansum"))
        .agg(sum("vol"), sum("spansum")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val dims = Seq(col("x"), col("y"), col("z"))
    val (mVol, mSpan) = fileStats(grid.withColumn("k", Layout.zOrderKeyN(dims, 4)))
    val (hVol, hSpan) = fileStats(grid.withColumn("k", Layout.hilbertKey(dims, 4)))
    assert(hVol < mVol, s"hilbert vol=$hVol not below morton $mVol")
    assert(hSpan < mSpan, s"hilbert spansum=$hSpan not below morton $mSpan")
    // and both prune where lexicographic cannot: its trailing dim spans
    // the full domain in every file
    val (_, lexSpan) = fileStats(grid.withColumn("k",
      col("x") * n * n + col("y") * n + col("z")))
    assert(hSpan < lexSpan && mSpan < lexSpan, s"lex spansum=$lexSpan")
  }

  test("clusterByZOrder: partitions are zkey-ranged and internally sorted") {
    val grid = spark.range(1024).select((col("id") / 32).cast("long").as("x"),
      pmod(col("id"), lit(32L)).as("y"))
    val parts = Layout.clusterByZOrder(grid, col("x"), col("y"), nFiles = 4, bits = 5)
      .select(Layout.zOrderKey2(col("x"), col("y"), 5).as("z"))
      .rdd.mapPartitions { it => Iterator(it.map(_.getLong(0)).toSeq) }
      .collect().filter(_.nonEmpty)
    parts.foreach(p => assert(p == p.sorted, "within-partition sort"))
    val ranges = parts.map(p => (p.head, p.last)).sortBy(_._1)
    ranges.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._2 <= w(1)._1, "disjoint ranges")
    }
  }
}
