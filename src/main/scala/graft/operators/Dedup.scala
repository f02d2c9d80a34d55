package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * The reference dedupes with `dropDuplicates(business_key)` everywhere
  * (`batch/etl/kafka_to_bronze_tiktok.py:257,298,339`,
  * `tiktok_bronze_to_silver.py:151-163`), which keeps an *arbitrary* row.
  * SURVEY.md §7.4 (hard-part 3) calls for a deterministic tie-break instead:
  * `latestPerKey` is the engine's canonical replacement — a `row_number`
  * over a recency ordering, so results are reproducible and oracle-checkable.
  *
  * Beyond the reference, the near-duplicate family (MinHash-LSH, SimHash,
  * n-gram Jaccard) targets LLM-training-data cleanup at 100 TB: everything is
  * formulated as explode → hash → shuffle-on-short-keys joins, never a
  * pairwise cross product.
  */
object Dedup {

  /** Deterministic dropDuplicates: keep the first row per key under `order`.
    * One shuffle on `keys`; at scale this is the same cost as the
    * non-deterministic `dropDuplicates` but reproducible.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate groups by a normalized text column: one output row per
    * distinct normalized value, with the representative (min) id and the
    * multiplicity. Pure hash aggregation — a single shuffle on the md5 of
    * the normalized text (shuffling a 32-char digest, not the full text,
    * is the 100 TB trick; the text itself never moves).
    */
  def exactText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), normFingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min("id").as("rep_id"), count(lit(1)).as("n_copies"))

  /** Normalization+md5 fingerprint (see [[graft.functions.TextFunctions]]). */
  def normFingerprint(text: Column): Column =
    graft.functions.TextFunctions.fingerprint(text)

  /** Word tokens (delegates to [[graft.functions.TextFunctions.tokens]]). */
  def tokens(text: Column): Column = graft.functions.TextFunctions.tokens(text)

  /** Distinct w-word shingles (see [[graft.functions.TextFunctions.shingles]]). */
  def shingles(text: Column, w: Int = 3): Column =
    graft.functions.TextFunctions.shingles(text, w)

  // NOTE (measured, sf0.1): hashing shingles without materializing the
  // "a b c" strings — element_at inside a transform lambda, or arrays_zip
  // of shifted slices — is 3× SLOWER than slice+array_join string
  // shingles: lambda-bound references defeat common-subexpression
  // elimination and the struct-array zip costs more than the join. The
  // postings below therefore carry string shingles.

  /** n-gram (word-shingle) Jaccard near-duplicate detection via an inverted
    * index, blocked by `blockCol` (e.g. source): explode distinct shingles,
    * self-join postings within a block (a shingle only joins to itself, so
    * the shuffle key is (block, shingle) — never an all-pairs product),
    * count shared shingles per candidate pair, then Jaccard =
    * |A∩B| / (|A|+|B|−|A∩B|).
    *
    * Returns one row per candidate pair (≥1 shared shingle):
    * (block, id_a, id_b, n_a, n_b, n_shared, jaccard), id_a < id_b.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, w: Int = 3): DataFrame = {
    val base = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      shingles(col(textCol), w).as("sh"))
    val sizes = base.select(col("block"), col("id"), size(col("sh")).as("n_sh"))
    val postings = base.select(col("block"), col("id"), explode(col("sh")).as("shingle"))
    val a = postings.as("a")
    val b = postings.as("b")
    val shared = a.join(b,
        col("a.block") === col("b.block") &&
        col("a.shingle") === col("b.shingle") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.block").as("block"), col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
      .select("block", "id_a", "id_b", "n_a", "n_b", "n_shared", "jaccard")
  }

  /** MinHash signature of a shingle array: `perms` independent hash
    * permutations h_i(s) = xxhash64(s, seed=i), signature = min over the
    * array per permutation. Array-typed column of longs, computed without
    * leaving codegen'd builtins. (True per-permutation seeds: the
    * `functions.xxhash64` varargs form hashes extra args under the default
    * seed instead of seeding — see GraftSqlBridge.xxhash64Seeded.)
    *
    * NOTE: as a nested higher-order expression this re-evaluates
    * `shinglesCol` once per permutation when Catalyst collapses
    * projections — fine for ad-hoc column use, but bulk signatures must
    * go through [[minhashSignatures]] (hash-once explode+aggregate).
    */
  def minhashSignature(shinglesCol: Column, perms: Int): Column =
    array((0 until perms).map(seed =>
      array_min(transform(shinglesCol,
        sh => org.apache.spark.sql.GraftSqlBridge.xxhash64Seeded(sh, seed)))): _*)

  /** Bulk MinHash: (id, sig) with each shingle hashed exactly `perms`
    * times. Explode → per-permutation min aggregation: partial (map-side)
    * mins mean the shuffle carries only `perms` longs per doc — the
    * correct shape at 100 TB, and ~50× faster locally than the nested
    * higher-order expression, which Catalyst re-inlines per permutation.
    */
  /** Bulk signatures, default path: `perms` codegen'd `min(xxhash64_seeded)`
    * aggregates over hashed-shingle postings. Measured faster than the
    * single-buffer [[graft.plans.MinHashAggregate]] (see
    * [[minhashSignaturesViaAgg]]) because declarative mins stay inside
    * whole-stage codegen while a TypedImperativeAggregate forces
    * ObjectHashAggregate with interpreted per-row eval — 3× at sf0.1.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      perms: Int, shingleW: Int = 3): DataFrame = {
    // two-level hashing: the O(len) string hash happens once per posting
    // (materialized by the projection under the aggregate); the perms
    // permutations then hash that single long (O(1) each) — an equally
    // valid MinHash family at a fraction of the hashing cost
    val postings = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), shingleW)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
    val mins = (0 until perms).map(i =>
      min(org.apache.spark.sql.GraftSqlBridge.xxhash64Seeded(col("h"), i)).as(s"m$i"))
    postings.groupBy("id")
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until perms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Single-buffer [[graft.plans.MinHashAggregate]] variant — identical
    * signatures, one Array[Long] buffer instead of perms slots. Useful
    * when perms is large enough that per-slot buffer bookkeeping and plan
    * width dominate; at perms ≤ 32 the codegen'd [[minhashSignatures]]
    * wins.
    */
  def minhashSignaturesViaAgg(df: DataFrame, idCol: String, textCol: String,
      perms: Int, shingleW: Int = 3): DataFrame = {
    val postings = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), shingleW)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
    postings.groupBy("id")
      .agg(graft.plans.MinHashAgg.minhashAgg(col("h"), perms).as("sig"))
  }

  /** MinHash-LSH candidate pairs: band the signature (`bands` bands of
    * `rows` rows), bucket by (band, hash(band-slice)), and emit pairs that
    * share ≥1 bucket. Shuffle key is the band-bucket hash — postings-list
    * join, no cross product. Returns (id_a, id_b, n_bands_shared).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, shingleW: Int = 3): DataFrame = {
    val bucketed = bandBuckets(df, idCol, textCol, bands, rowsPerBand, shingleW)
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_bands_shared"))
  }

  /** (id, band, bucket) rows: each doc's LSH band buckets. Band count and
    * row-per-band are static, so the band slice/hash is unrolled at plan
    * build time (stays in whole-stage codegen).
    */
  private def bandBuckets(df: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, shingleW: Int): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, bands * rowsPerBand, shingleW)
    sig.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(array_join(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), ","))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** Per-band LSH bucket statistics — the scale-observability view of
    * [[minhashCandidates]] (bucket skew is what kills LSH at 100 TB).
    * Returns one row per band: n_buckets, max/avg bucket size, n candidate
    * pairs implied by the band (sum over buckets of C(size,2)).
    */
  def minhashBandStats(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, shingleW: Int = 3): DataFrame = {
    val bucketed = bandBuckets(df, idCol, textCol, bands, rowsPerBand, shingleW)
    bucketed.groupBy("band", "bucket").agg(count(lit(1)).as("sz"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_buckets"),
        max("sz").as("max_bucket"),
        round(avg("sz"), 4).as("avg_bucket"),
        sum(col("sz") * (col("sz") - 1) / 2).cast("long").as("n_cand_pairs"))
  }

  /** 64-bit SimHash of a token array: per token take xxhash64, then for each
    * bit position sum ±1 across tokens and keep the sign. Expressed with
    * aggregate() over the token array — stays inside whole-stage codegen.
    */
  def simhash(tokensCol: Column): Column = {
    // materialize token hashes once, then unroll the 64 bit positions as a
    // static Scala loop (shift amounts must be literal ints for codegen)
    val hs = transform(tokensCol, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val bitSum = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Bulk SimHash: (id, sig) hashing each token once via explode +
    * 64 conditional-sum aggregations (map-side combinable) — same
    * hash-once rationale as [[minhashSignatures]].
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"b$i"))
    hashed.groupBy("id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("sig"))
  }

  /** SimHash near-dup candidates: block on 16-bit chunks (two docs within
    * hamming distance 3 of each other share at least one of 4 chunks), then
    * verify the full distance. Returns (id_a, id_b, hamming).
    */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8): DataFrame = {
    val sigs = simhashSignatures(df, idCol, textCol)
    val chunked = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
