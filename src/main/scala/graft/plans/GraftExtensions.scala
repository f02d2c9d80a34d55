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

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_f" -> ((args: Seq[Expression]) => FloatVectorCosine(args(0), args(1))),
    "dot_f" -> ((args: Seq[Expression]) => FloatVectorDot(args(0), args(1))),
    "minhash_agg" -> ((args: Seq[Expression]) =>
      MinHashAggregate(args(0), intArg(args(1), "minhash_agg perms"))
        .toAggregateExpression()),
    "subword_piece_count" -> ((args: Seq[Expression]) => SubwordPieceCount(args(0))),
    "minhash_sig" -> ((args: Seq[Expression]) =>
      MinHashSig(args(0), intArg(args(1), "minhash_sig perms"),
        if (args.length > 2) intArg(args(2), "minhash_sig shingle_w") else 3,
        portable = false)),
    "minhash_sig_portable" -> ((args: Seq[Expression]) =>
      MinHashSig(args(0), intArg(args(1), "minhash_sig_portable perms"),
        if (args.length > 2) intArg(args(2), "minhash_sig_portable shingle_w") else 3,
        portable = true)),
    "simhash_sig" -> ((args: Seq[Expression]) => SimHashSig(args(0), portable = false)),
    "simhash_sig_portable32" -> ((args: Seq[Expression]) => SimHashSig(args(0), portable = true)),
    "winnow_fingerprints" -> ((args: Seq[Expression]) =>
      WinnowFingerprints(args(0),
        if (args.length > 1) intArg(args(1), "winnow_fingerprints k") else 8,
        if (args.length > 2) intArg(args(2), "winnow_fingerprints w") else 4)),
    "winnow_fingerprint_positions" -> ((args: Seq[Expression]) =>
      WinnowFingerprintPositions(args(0),
        if (args.length > 1) intArg(args(1), "winnow_fingerprint_positions k") else 8,
        if (args.length > 2) intArg(args(2), "winnow_fingerprint_positions w") else 4)),
    "cms_union_agg" -> ((args: Seq[Expression]) =>
      CmsUnionAggregate(arity(args, 1, "cms_union_agg").head).toAggregateExpression()),
    "cms_estimate" -> ((args: Seq[Expression]) => {
      val a = arity(args, 2, "cms_estimate"); CmsEstimate(a(0), a(1))
    }),
    "cms_total" -> ((args: Seq[Expression]) =>
      CmsTotal(arity(args, 1, "cms_total").head)))

  /** Exact-arity check with a named error — a raw `args(1)` on a short
    * list would surface as a bare IndexOutOfBoundsException with no
    * mention of the function or its signature.
    */
  private def arity(args: Seq[Expression], n: Int, name: String): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${args.length}")
    args
  }

  /** Same registrations on an already-running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftSqlBridge.registerFunction(spark, name, b)
    }
}
