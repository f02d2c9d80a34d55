package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * Built on `zip_with`/`aggregate` higher-order functions: no UDF, no
  * serialization boundary, works on any array length. Accumulation is in
  * double (promoted element-wise) and strictly left-to-right by index, so
  * results are deterministic and reproducible across runs and engines.
  * For the 100 TB path, a codegen'd Catalyst `Expression` over the raw
  * float arrays is the planned upgrade; the call sites only use this API.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with zero-vector guard (0.0 for zero norms). */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Euclidean distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, x) => acc + x))

  /** Sign bit of a deterministic random hyperplane `plane` applied to the
    * vector: weights w(plane, i) derived from xxhash64 — reproducible
    * without any RNG state, so every executor computes identical planes.
    */
  def hyperplaneBit(vec: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(
        vec,
        transform(sequence(lit(0), size(vec) - 1),
          i => (xxhash64(concat_ws("_", lit(plane), i)) % 1000L).cast("double") / 1000.0 - 0.5),
        (x, w) => x.cast("double") * w),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, 1).otherwise(0)
  }

  /** Random-hyperplane LSH bucket id from `nPlanes` sign bits. */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map(p => hyperplaneBit(vec, p) * (1 << p)).reduce(_ + _)
}
