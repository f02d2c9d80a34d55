package graft

import java.nio.file.Files
import graft.operators.{Generations, Packing}
import graft.queries.LifecycleOps
import graft.streaming.IndexMaintenance
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial inputs for the lifecycle entry points (VERDICT r13 #7):
  * deletion of never-ingested ids, a delta that deletes EVERYTHING,
  * zero-token documents at the repack boundary, duplicate order keys,
  * and a seeded randomized mutation fuzz where every incremental
  * repack must hash-match the from-scratch rebuild — on disk, not
  * just in the returned manifest.
  */
class LifecycleFuzzSpec extends SparkSpec {

  import sqlImplicits._

  private val Cap = 8L
  private val Cps = 2L
  private val GroupOf = substring(col("okey"), 1, 2)

  /** (okey, tk, fp, n_tokens) from (okey, token list). */
  private def input(docs: Seq[(String, Seq[String])]): DataFrame =
    docs.toDF("okey", "tk")
      .withColumn("fp", md5(concat_ws(" ", col("okey"), concat_ws(" ", col("tk")))))
      .withColumn("n_tokens", size(col("tk")).cast("long"))

  private def manifestRows(df: DataFrame) = df
    .select("shard_id", "n_chunks", "n_tokens", "shard_fp")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).sortBy(_._1).toSeq

  /** Write A's shards, incrementally repack to B, and assert both the
    * returned manifest and the DISK state equal B's from-scratch
    * rebuild.
    */
  private def checkIncremental(a: Seq[(String, Seq[String])],
      b: Seq[(String, Seq[String])], label: String): Unit = {
    val dir = Files.createTempDirectory("lcfuzz").toString + "/shards"
    val aIn = input(a).localCheckpoint(true)
    val chunksA = Packing.packChunks(aIn, "okey", "tk", Cap, GroupOf)
    val manifestA = Packing.shardManifest(chunksA, Cps).localCheckpoint(true)
    Packing.writeShards(chunksA, dir, Cps)
    val bIn = input(b).localCheckpoint(true)
    val res = Packing.incrementalRepack(
      aIn.select("okey", "n_tokens", "fp"), bIn,
      "okey", "tk", "fp", "n_tokens", Cap, GroupOf, Cps, dir, manifestA)
    val want = manifestRows(Packing.shardManifest(
      Packing.packChunks(bIn, "okey", "tk", Cap, GroupOf), Cps))
    assert(manifestRows(res.filter(col("status") =!= "removed")) == want,
      s"$label: incremental manifest != rebuild")
    assert(manifestRows(Packing.diskManifest(spark, dir)) == want,
      s"$label: disk state != rebuild")
  }

  private def key(i: Int): String = f"$i%04d"

  test("zero-token docs at and around the repack boundary") {
    // empties sit at the stream position the boundary lands on: an
    // empty doc occupies NO positions, so the "first differing key's
    // offset" can equal its successor's — the arithmetic must not
    // double-count or skip it
    val base = (0 until 60).map { i =>
      key(i) -> (if (i >= 20 && i <= 25) Seq.empty[String]
                 else Seq.fill(3)(s"w$i"))
    }
    // change the zero-token doc itself (boundary ON an empty doc)
    checkIncremental(base,
      base.updated(22, key(22) -> Seq("now", "nonempty")),
      "empty doc becomes non-empty")
    // change the doc right AFTER the empty run
    checkIncremental(base,
      base.updated(26, key(26) -> Seq("x")),
      "first change after an empty run")
    // a non-empty doc becomes EMPTY (boundary doc vanishes from the
    // stream but keeps its key)
    checkIncremental(base,
      base.updated(19, key(19) -> Seq.empty[String]),
      "boundary doc becomes zero-token")
    // empty docs appended at the very end (offset == stream length)
    checkIncremental(base,
      base ++ Seq(key(60) -> Seq.empty[String], key(61) -> Seq("tail")),
      "empty doc appended at the stream end")
    // the delta removes EVERYTHING
    checkIncremental(base, Seq(key(0) -> Seq.empty[String]),
      "delta shrinks the corpus to one empty doc")
  }

  test("seeded randomized mutation fuzz: incremental == rebuild, 24 rounds") {
    val rnd = new scala.util.Random(42)
    def randomCorpus(n: Int): Seq[(String, Seq[String])] =
      (0 until n).map { i =>
        key(i) -> (rnd.nextInt(5) match {
          case 0 => Seq.empty[String]
          case k => Seq.fill(rnd.nextInt(2 * Cap.toInt) + 1)(
            s"t${rnd.nextInt(9)}")
        })
      }
    for (round <- 1 to 24) {
      val n = rnd.nextInt(50) + 10
      val a = randomCorpus(n)
      // random mutation mix: change / remove / add / case-flip / clear
      val b0 = a.flatMap { case (k, tk) =>
        rnd.nextInt(10) match {
          case 0 => None // removed
          case 1 => Some(k -> (tk :+ "edit")) // changed (count shifts)
          case 2 => Some(k -> tk.map(_.toUpperCase)) // case-only
          case 3 => Some(k -> Seq.empty[String]) // cleared
          case _ => Some(k -> tk) // kept
        }
      }
      val b = b0 ++ (0 until rnd.nextInt(4)).map(j =>
        key(n + j) -> Seq.fill(rnd.nextInt(12))("new"))
      checkIncremental(a, b, s"fuzz round $round (n=$n)")
    }
  }

  test("duplicate order keys are rejected loudly on either side") {
    val clean = input(Seq(key(1) -> Seq("a"), key(2) -> Seq("b")))
    val dup = input(Seq(key(1) -> Seq("a"), key(1) -> Seq("b")))
    val manifest = Packing.shardManifest(
      Packing.packChunks(clean, "okey", "tk", Cap, GroupOf), Cps)
    val dir = Files.createTempDirectory("lcdup").toString + "/shards"
    val eNew = intercept[IllegalArgumentException] {
      Packing.incrementalRepack(clean.select("okey", "n_tokens", "fp"), dup,
        "okey", "tk", "fp", "n_tokens", Cap, GroupOf, Cps, dir, manifest)
    }
    assert(eNew.getMessage.contains("duplicate order key"))
    val eOld = intercept[IllegalArgumentException] {
      Packing.incrementalRepack(dup.select("okey", "n_tokens", "fp"), clean,
        "okey", "tk", "fp", "n_tokens", Cap, GroupOf, Cps, dir, manifest)
    }
    assert(eOld.getMessage.contains("duplicate order key"))
    val eDel = intercept[IllegalArgumentException] {
      Packing.deleteAndRepack(dup, "okey", "okey", "tk",
        Seq("0001").toDF("okey"), Cap, GroupOf, Cps, dir, manifest)
    }
    assert(eDel.getMessage.contains("duplicate order key"))
  }

  test("deleting never-ingested ids is a physical no-op with a durable record") {
    val all = Tables.documents(spark, sf("sf0.001"))
      .filter(pmod(col("doc_id"), lit(4)) === 0)
      .select("doc_id", "text", "lang")
    val base = Files.createTempDirectory("lcnoop").toString
    LifecycleOps.priorBuild(spark, base, all)
    val before = manifestRows(LifecycleOps.currentManifest(spark, base))
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def shardMtimes(): Map[String, Long] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$base/shards"), true)
      val m = scala.collection.mutable.Map.empty[String, Long]
      while (it.hasNext) { val f = it.next()
        if (!f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          m(f.getPath.toString) = f.getModificationTime }
      m.toMap
    }
    val mtimes = shardMtimes()
    val res = LifecycleOps.deleteDocs(spark, base,
      Seq(9999991L, 9999992L).toDF("doc_id"))
    // every shard kept, nothing rewritten, no file touched
    assert(res.filter(col("status") =!= "kept").count() == 0L)
    assert(manifestRows(LifecycleOps.currentManifest(spark, base)) == before)
    assert(shardMtimes() == mtimes, "a no-op deletion rewrote shard files")
    // but the right-to-be-forgotten record is durable (a later ingest
    // of those ids must stay masked)
    assert(IndexMaintenance.tombstoneIds(spark, base).get
      .filter(col("id").isin(9999991L, 9999992L)).count() == 2L)
    // and the cycle still committed a generation (state is consistent)
    assert(Generations.committed(spark, base) == Seq(0L, 1L))
  }

  test("a delta that deletes everything, then a fresh corpus re-grows") {
    val all = Tables.documents(spark, sf("sf0.001"))
      .filter(pmod(col("doc_id"), lit(4)) === 1)
      .select("doc_id", "text", "lang")
    val base = Files.createTempDirectory("lcall").toString
    LifecycleOps.priorBuild(spark, base, all)
    val res = LifecycleOps.deleteDocs(spark, base, all.select("doc_id"))
    assert(res.filter(col("status") =!= "removed").count() == 0L,
      "deleting the whole corpus left live shards in the manifest")
    assert(IndexMaintenance.dataFileCount(spark, s"$base/shards") == 0L,
      "deleting the whole corpus left shard files on disk")
    assert(LifecycleOps.currentManifest(spark, base).count() == 0L)
    // re-grow with FRESH ids (the old ones are tombstoned forever);
    // the refresh must rebuild from an empty stream without tripping
    // on the empty-old-side boundary arithmetic
    val regrow = all.select((col("doc_id") + 5000000L).as("doc_id"),
      col("text"), col("lang"))
    val r2 = LifecycleOps.refreshTo(spark, base, regrow)
    val (pack, _) = LifecycleOps.globalStages(LifecycleOps.docArtifacts(regrow))
    val want = manifestRows(Packing.shardManifest(
      Packing.packChunks(pack, "okey", "tk", 256,
        substring(col("okey"), 1, 8)), 4))
    assert(manifestRows(LifecycleOps.currentManifest(spark, base)) == want,
      "re-grown corpus != rebuild")
    assert(r2.filter(col("status") === "added").count() == want.size,
      "re-grown shards not all 'added'")
  }
}
