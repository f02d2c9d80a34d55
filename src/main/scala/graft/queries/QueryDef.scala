package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a DataFrame builder over a testdata
  * scale-factor directory plus (where ANSI-SQL-expressible) the exact
  * DuckDB oracle the driver hash-compares against.
  *
  * Conventions that keep Spark and DuckDB hash-identical:
  *  - every computed double is `round(_, n)` with the same n on both sides
  *    (sums of money → 2dp, averages/scores/ratios → 4dp);
  *  - floating AVERAGES never use `round(_, 4)` — an avg can land exactly
  *    on the .xxxx5 grid (sum/24 did at sf0.1) where Spark's
  *    decimal-string HALF_UP and DuckDB's binary-double rounding part
  *    ways; use `TextFunctions.round4hu` and
  *    `floor(x * 10000.0 + 0.5) / 10000.0` instead (identical IEEE ops on
  *    both engines, no tie ambiguity). Reference score formulas keep
  *    `round` — there HALF_UP is the published semantic;
  *  - every aggregate/computed column carries the same alias on both sides;
  *  - integer sums are BIGINT on both sides (DuckDB sums to HUGEINT, so
  *    the oracle casts);
  *  - raw timestamps never appear in output — only formatted strings or
  *    epoch-second longs (the events table is nanosecond-precision parquet,
  *    which Spark reads at microseconds; both sides truncate identically);
  *  - any LIMIT has a total order (unique tie-break key) on both sides.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
