package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout: Z-order (Morton) clustering so that
  * parquet row-group/file min-max statistics prune on EVERY clustered
  * dimension, not just the leading sort key. Sorting 100 TB by
  * `(part, supplier)` lexicographically gives perfect pruning on
  * `part` and none on `supplier`; interleaving the two keys' bits
  * keeps both dimensions' per-file ranges narrow, which is what makes
  * a point/range predicate on either column skip most files at scan
  * time. Same layout idea as Delta/Iceberg OPTIMIZE ZORDER, built from
  * plain bit arithmetic.
  *
  * Everything here is exact integer arithmetic on BIGINT — codegen'd
  * built-ins only, bit-identical on any engine.
  */
object Layout {

  /** 2-D Morton key: the low `bits` bits of `x` and `y` interleaved
    * (x in even positions, y in odd). Inputs are expected already
    * quantized to [0, 2^bits) — pass `pmod(col, lit(1L << bits))` or a
    * range-bucketized value; high bits beyond `bits` are ignored.
    * 2·bits ≤ 62 keeps the key in a positive BIGINT.
    */
  def zOrderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL text (for oracles / SQL engines):
    * a `|`-chain of shift-mask-shift terms over `xExpr`/`yExpr`.
    */
  def zOrderKey2Sql(xExpr: String, yExpr: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($xExpr >> $i) & 1) << ${2 * i})",
        s"((($yExpr >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Cluster `df` for writing: range-partition by the Morton key into
    * `nFiles` output tasks and sort within each — the distributed
    * layout path (sampled range bounds, no global sort barrier, no
    * driver involvement beyond bound sampling). Write the result with
    * one file per partition and both dimensions' file-level min-max
    * stats stay narrow.
    */
  def clusterByZOrder(df: DataFrame, x: Column, y: Column, nFiles: Int,
      bits: Int = 16): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val keyed = df.withColumn("__zkey", zOrderKey2(x, y, bits))
    keyed.repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
