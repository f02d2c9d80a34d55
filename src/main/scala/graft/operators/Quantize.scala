package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization of embedding columns — the
  * standard 4× storage/bandwidth reduction applied before an embedding
  * corpus is indexed or shipped (FAISS `SQ8` scheme: one positive scale
  * per vector, values quantized to [-127, 127]).
  *
  * At 100 TB of embeddings this is a map-only transform — no shuffle, no
  * state, runs at scan speed inside whole-stage codegen (all built-in
  * higher-order functions, no UDFs). The bit-portability discipline
  * follows q85's micro-unit trick: every cross-engine-visible number is
  * either an integer or produced by the exact IEEE sequence
  * `floor(x * 10^k + 0.5)` so DuckDB replays it bit-for-bit.
  *
  * Quantizer: `scale = max(|v_i|) / 127`; `q_i = floor(v_i/scale + 0.5)`
  * clamped to [-127, 127] (the clamp is provably a no-op for finite
  * inputs — |v_i/scale| ≤ 127 and floor(±127 + 0.5) stays in range — but
  * kept as armor against NaN/Inf upstream). All-zero vectors quantize to
  * all zeros with scale 0. Reconstruction error |v_i − q_i·scale| is
  * bounded by scale/2 per dimension ([[graft.ValidationOpsSpec]] pins it).
  */
object Quantize {

  private val Q = 127.0

  /** max(|v_i|) as DOUBLE (float abs/max are exact, the widening cast is
    * exact — the first inexact op anywhere downstream is the division).
    */
  def absMax(vec: Column): Column =
    array_max(transform(vec, v => abs(v))).cast("double")

  /** The per-vector scale: absMax / 127 (0.0 for all-zero vectors). */
  def scaleOf(vec: Column): Column = absMax(vec) / lit(Q)

  /** int8 codes as array<int> in [-127, 127]. */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, v =>
      when(scale === 0.0, lit(0))
        .otherwise(
          greatest(lit(-Q), least(lit(Q), floor(v.cast("double") / scale + 0.5)))
            .cast("int")))

  /** Per-dimension reconstruction error |v_i − q_i·scale| in integer
    * tenth-microunits: floor(err · 10^7 + 0.5) as array<long>. Integer
    * sums of these are order-free, hence engine-portable.
    */
  def errorMicros(vec: Column, codes: Column, scale: Column): Column =
    zip_with(vec, codes, (v, q) =>
      floor(abs(v.cast("double") - q.cast("double") * scale) * 1e7 + 0.5))

  /** Sum of an array<long> as BIGINT (0 for empty). */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0L), (acc, x) => acc + x)
}
