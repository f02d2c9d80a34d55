package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is surfaced here as a named
  * query over the driver's testdata; where the semantics are
  * ANSI-SQL-expressible the matching DuckDB oracle is in [[oracleSql]].
  */
object SparkEntry {

  private def modules: Seq[QueryDef] =
    Relational.all ++ Scoring.all ++ Windows.all ++ TextOps.all ++
      VectorOps.all ++ ServingOps.all ++ MedallionOps.all ++ CurationOps.all ++
      PipelineOps.all ++ ValidationOps.all ++ RankingOps.all ++
      TokenizerOps.all ++ LifecycleOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
