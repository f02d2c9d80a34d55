package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface: Spark 4's Column is node-backed and
  * the Expression↔Column converters (`classic.ExpressionUtils`) are
  * package-private. Hosting this one-file adapter inside the sql package
  * is the established pattern for libraries that ship custom Catalyst
  * expressions (no internals are modified — only re-exported).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** xxhash64 with an explicit seed. `functions.xxhash64(c, lit(seed))` is
    * NOT seeded — it hashes both arguments under the default seed 42; the
    * seed is a constructor parameter of the XxHash64 expression only.
    */
  def xxhash64Seeded(c: Column, seed: Long): Column =
    column(new catalyst.expressions.XxHash64(
      Seq(expression(c)), seed))

  /** Assert non-nullability the caller has already established (e.g. by a
    * preceding filter): a no-op at runtime, but it makes every derived
    * expression non-nullable, so `InferFiltersFromConstraints` stops
    * synthesizing `isnotnull(<expensive expr>)` predicates that would
    * re-evaluate the expression below the projection. Only wrap values
    * that genuinely cannot be null — the optimizer takes this on trust.
    */
  def knownNotNull(c: Column): Column =
    column(catalyst.expressions.KnownNotNull(expression(c)))

  /** Register a SQL function on a LIVE session (sessionState is
    * `private[sql]`) — the same registration [[graft.plans.GraftExtensions]]
    * injects at session build for `spark.sql.extensions` deployments.
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
