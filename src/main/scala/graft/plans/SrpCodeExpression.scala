package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All `nPlanes` SRP sign bits in ONE compact expression — the packed
  * binary code of [[graft.functions.VectorFunctions.srpCode]].
  *
  * Why an Expression and not 62 composed [[FloatVectorDot]]s: each dot
  * inlines its own 64-iteration loop into the enclosing codegen method,
  * and 62 of them nested under one CASE produce a generated method past
  * HotSpot's JIT threshold (DontCompileHugeMethods, ~8 KB bytecode) —
  * the whole stage then runs in the BYTECODE INTERPRETER, measured
  * ~194 s for 1M dim-64 rows where the JIT'd form is ~2 s. Expression
  * trees cannot be split mid-expression by Catalyst's splitExpressions,
  * so the fix is structural: one expression holding the full
  * nPlanes×dim weight matrix as a referenced object and emitting a
  * two-level loop — ~40 lines of bytecode, JIT-compiled, and faster
  * than 62 dispatches even before the JIT cliff.
  *
  * Semantics are bit-identical to the composed form: per plane a
  * double-accumulated left-to-right dot of the float/double vector
  * against the float weights, bit p set iff dot ≥ 0, bits OR-packed at
  * position p. Null vector → null code; width ≠ dim → null (callers
  * guard with the assert_true width check).
  */
case class SrpPackedCode(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "srp_packed_code"

  private def elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = planes(0).length
    if (v.numElements() != dim) return null
    val isFloat = elementType == FloatType
    var code = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      var dot = 0.0
      var i = 0
      while (i < dim) {
        val xi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += xi * w(i)
        i += 1
      }
      if (dot >= 0.0) code |= 1L << p
      p += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "float[][]")
    val elem = elementType match {
      case FloatType => (arr: String, i: String) => s"((double) $arr.getFloat($i))"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val w = ctx.freshName("w")
      val code = ctx.freshName("code")
      s"""
         |final int $dim = $planesRef[0].length;
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $code = 0L;
         |  for (int $p = 0; $p < $planesRef.length; $p++) {
         |    final float[] $w = $planesRef[$p];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += ${elem(v, i)} * $w[$i];
         |    }
         |    if ($dot >= 0.0) $code |= 1L << $p;
         |  }
         |  ${ev.value} = $code;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpPackedCode =
    copy(child = newChild)
}

object SrpCodeExpression {
  /** Column form: packed SRP code of an embedding column against a
    * plane×dim weight matrix.
    */
  def srpPackedCode(vec: Column, planes: Array[Array[Float]]): Column =
    GraftSqlBridge.column(SrpPackedCode(GraftSqlBridge.expression(vec), planes))
}
