package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar wrapper around [[graft.functions.SubwordBpe.countPieces]]: total
  * greedy longest-prefix vocab pieces across the whitespace tokens of a
  * string column. The vocab is a process-wide constant (classpath
  * resource), so the expression carries no state and codegen is a single
  * static call — the projection stays inside whole-stage codegen instead
  * of dropping to an interpreted UDF.
  */
case class SubwordPieceCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "subword_piece_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.SubwordBpe.countPieces(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordBpe.countPieces($c)")

  override protected def withNewChildInternal(newChild: Expression): SubwordPieceCount =
    copy(child = newChild)
}

object SubwordExpression {
  /** Column form over a string column. */
  def subwordPieces(text: Column): Column =
    GraftSqlBridge.column(SubwordPieceCount(GraftSqlBridge.expression(text)))
}
