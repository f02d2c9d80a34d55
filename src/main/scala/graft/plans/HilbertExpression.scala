package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index kernel (John Skilling, "Programming the Hilbert
  * Curve", AIP Conf. Proc. 707, 2004 — the standard compact
  * axes-to-index algorithm) shared by the Catalyst expression below and
  * by [[graft.operators.Layout]]'s unrolled ANSI-SQL twin generator.
  *
  * The loop is inherently SEQUENTIAL state over the n coordinates
  * (each step's exchange/invert depends on the previous step's x₀), so
  * a composed-Column formulation would either blow up the expression
  * tree exponentially under projection collapse or fragment into
  * bits·n chained projections; one Expression with a static helper is
  * the (b)-tier custom-operator path — O(n·bits) work, ~30 bytecode
  * lines, JIT-friendly (the [[SrpPackedCode]] lesson).
  */
object HilbertOps {

  /** Hilbert index of the point `xs` on the n-dimensional curve with
    * `bits` levels per dimension. Coordinates are masked to the low
    * `bits` bits; the result occupies n·bits bits (callers enforce
    * n·bits ≤ 62 so it stays a positive BIGINT). MUTATES `xs`.
    */
  def index(bits: Int, xs: Array[Long]): Long = {
    val n = xs.length
    val mask = (1L << bits) - 1L
    var i = 0
    while (i < n) { xs(i) &= mask; i += 1 }
    // inverse undo (Skilling's AxestoTranspose, first loop): walk bit
    // levels high→low, per dimension either invert x0's low bits or
    // exchange them with this dimension's
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      i = 0
      while (i < n) {
        if ((xs(i) & q) != 0L) xs(0) ^= p
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) { if ((xs(n - 1) & q) != 0L) t ^= q - 1L; q >>= 1 }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // interleave the transpose: bit b of xs(i) lands at b·n + (n−1−i),
    // x₀ carrying the most significant bit of each n-bit group
    var h = 0L
    var b = 0
    while (b < bits) {
      i = 0
      while (i < n) {
        h |= ((xs(i) >> b) & 1L) << (b * n + (n - 1 - i))
        i += 1
      }
      b += 1
    }
    h
  }
}

/** `hilbert_index(bits; x₀, …, x_{n−1})` — BIGINT Hilbert index of an
  * n-dimensional point, null if any coordinate is null. Coordinates are
  * expected already quantized to [0, 2^bits) (the [[graft.operators
  * .Layout.zOrderKey2]] contract); high bits are masked off.
  */
case class HilbertIndex(children: Seq[Expression], bits: Int)
    extends Expression {

  require(children.size >= 2, s"hilbert_index needs >= 2 dims, got ${children.size}")
  require(bits >= 1 && children.size * bits <= 62,
    s"n*bits must fit a positive BIGINT: ${children.size} dims x $bits bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BIGINT coordinates, got ${c.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xs = new Array[Long](children.size)
    var i = 0
    while (i < xs.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertOps.index(bits, xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val xs = ctx.freshName("xs")
    val loads = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; } else { $xs[$i] = ${e.value}; }
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = 0L;
        |long[] $xs = new long[${children.size}];
        |$loads
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.plans.HilbertOps.index($bits, $xs);
        |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

object HilbertIndex {
  def column(bits: Int, coords: Seq[Column]): Column =
    GraftSqlBridge.column(
      HilbertIndex(coords.map(GraftSqlBridge.expression), bits))
}
