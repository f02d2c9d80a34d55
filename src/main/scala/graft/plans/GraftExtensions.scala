package graft.plans

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** The engine's `SparkSessionExtensions` hook: registers the custom
  * Catalyst expressions as SQL functions so `spark.sql` users get them
  * too. Deploy with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session.
  *
  *  - `cosine_f(a, b)` / `dot_f(a, b)` — the codegen'd single-pass
  *    float-vector cosine/dot ([[VectorExpressions]], 26.9× vs the HOF
  *    composition).
  *  - `minhash_agg(hashed_long, perms)` — all-permutation MinHash in one
  *    aggregation buffer ([[MinHashAggregate]]; the child must be the
  *    pre-hashed shingle long, see its scaladoc).
  *  - `subword_piece_count(text)` — greedy longest-prefix subword pieces
  *    over the checked-in vocab ([[SubwordPieceCount]], q61).
  *  - `minhash_sig(text, perms[, shingle_w])` /
  *    `minhash_sig_portable(text, perms[, shingle_w])` — one-pass MinHash
  *    signature kernels ([[MinHashSig]]; xxhash64 / md5-portable family).
  *  - `simhash_sig(text)` / `simhash_sig_portable32(text)` — one-pass
  *    SimHash signature kernels ([[SimHashSig]]).
  *  - `topn_min_agg(value, n)` — the n smallest values in one bounded
  *    aggregation buffer ([[TopNMinAggregate]]; keep-N-per-key without a
  *    window sort on hot keys).
  *  - `bloom_agg(hashed_long, expectedItems[, fpp])` /
  *    `bloom_might_contain(filter, hashed_long)` — mergeable Bloom
  *    membership filter + probe ([[BloomBuildAggregate]],
  *    [[BloomMightContainLong]]; the membership member of the sketch
  *    family next to `hll_union` and `cms_union_agg`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, b) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.plans.GraftExtensions", name),
          b))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  // SQL decimal literals (0.01) arrive as Decimal, not Double
  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_f" -> ((args: Seq[Expression]) => {
      val a = arity(args, 2, "cosine_f"); FloatVectorCosine(a(0), a(1))
    }),
    "dot_f" -> ((args: Seq[Expression]) => {
      val a = arity(args, 2, "dot_f"); FloatVectorDot(a(0), a(1))
    }),
    "minhash_agg" -> ((args: Seq[Expression]) => {
      val a = arity(args, 2, "minhash_agg")
      MinHashAggregate(a(0), intArg(a(1), "minhash_agg perms"))
        .toAggregateExpression()
    }),
    "subword_piece_count" -> ((args: Seq[Expression]) =>
      SubwordPieceCount(arity(args, 1, "subword_piece_count").head)),
    "minhash_sig" -> ((args: Seq[Expression]) => {
      val a = arity(args, 2, 3, "minhash_sig")
      MinHashSig(a(0), intArg(a(1), "minhash_sig perms"),
        if (a.length > 2) intArg(a(2), "minhash_sig shingle_w") else 3,
        portable = false)
    }),
    "minhash_sig_portable" -> ((args: Seq[Expression]) => {
      val a = arity(args, 2, 3, "minhash_sig_portable")
      MinHashSig(a(0), intArg(a(1), "minhash_sig_portable perms"),
        if (a.length > 2) intArg(a(2), "minhash_sig_portable shingle_w") else 3,
        portable = true)
    }),
    "srp_code" -> ((args: Seq[Expression]) => {
      val a = arity(args, 3, "srp_code")
      val nPlanes = intArg(a(1), "srp_code n_planes")
      val dim = intArg(a(2), "srp_code dim")
      require(nPlanes >= 1 && nPlanes <= 62,
        s"srp_code supports 1..62 planes, got $nPlanes")
      SrpPackedCode(a(0), Array.tabulate(nPlanes)(p =>
        graft.functions.VectorFunctions.hyperplaneWeights(p, dim)))
    }),
    "simhash_sig" -> ((args: Seq[Expression]) =>
      SimHashSig(arity(args, 1, "simhash_sig").head, portable = false)),
    "simhash_sig_portable32" -> ((args: Seq[Expression]) =>
      SimHashSig(arity(args, 1, "simhash_sig_portable32").head, portable = true)),
    "winnow_fingerprints" -> ((args: Seq[Expression]) => {
      val a = arity(args, 1, 3, "winnow_fingerprints")
      WinnowFingerprints(a(0),
        if (a.length > 1) intArg(a(1), "winnow_fingerprints k") else 8,
        if (a.length > 2) intArg(a(2), "winnow_fingerprints w") else 4)
    }),
    "winnow_fingerprint_positions" -> ((args: Seq[Expression]) => {
      val a = arity(args, 1, 3, "winnow_fingerprint_positions")
      WinnowFingerprintPositions(a(0),
        if (a.length > 1) intArg(a(1), "winnow_fingerprint_positions k") else 8,
        if (a.length > 2) intArg(a(2), "winnow_fingerprint_positions w") else 4)
    }),
    "cms_union_agg" -> ((args: Seq[Expression]) =>
      CmsUnionAggregate(arity(args, 1, "cms_union_agg").head).toAggregateExpression()),
    "cms_estimate" -> ((args: Seq[Expression]) => {
      val a = arity(args, 2, "cms_estimate"); CmsEstimate(a(0), a(1))
    }),
    "cms_total" -> ((args: Seq[Expression]) =>
      CmsTotal(arity(args, 1, "cms_total").head)),
    "topn_min_agg" -> ((args: Seq[Expression]) => {
      val a = arity(args, 2, "topn_min_agg")
      TopNMinAggregate(a(0), intArg(a(1), "topn_min_agg n"))
        .toAggregateExpression()
    }),
    "bloom_agg" -> ((args: Seq[Expression]) => {
      val a = arity(args, 2, 3, "bloom_agg")
      BloomBuildAggregate(a(0), longArg(a(1), "bloom_agg expectedItems"),
        if (a.length > 2) doubleArg(a(2), "bloom_agg fpp") else 0.01)
        .toAggregateExpression()
    }),
    "bloom_might_contain" -> ((args: Seq[Expression]) => {
      val a = arity(args, 2, "bloom_might_contain")
      BloomMightContainLong(a(0), a(1))
    }))

  /** Exact-arity check with a named error — a raw `args(1)` on a short
    * list would surface as a bare IndexOutOfBoundsException with no
    * mention of the function or its signature. Every builder above goes
    * through this (ADVICE r8: the guard originally covered only the cms_*
    * family, leaving the variadic registrations to throw bare).
    */
  private def arity(args: Seq[Expression], n: Int, name: String): Seq[Expression] =
    arity(args, n, n, name)

  /** Ranged arity for registrations with optional trailing arguments. */
  private def arity(args: Seq[Expression], min: Int, max: Int,
      name: String): Seq[Expression] = {
    if (args.length < min || args.length > max) throw new IllegalArgumentException(
      if (min == max) s"$name expects $min argument(s), got ${args.length}"
      else s"$name expects $min to $max arguments, got ${args.length}")
    args
  }

  /** Same registrations on an already-running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftSqlBridge.registerFunction(spark, name, b)
    }
}
