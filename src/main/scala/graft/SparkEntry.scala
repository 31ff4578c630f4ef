package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names carry SURVEY.md §2 operator ids (s*, p*, j*, a*, w*, o*, u*,
  * f*, m*, st*, x*) plus the LLM-pipeline extensions (dd*, ann*, tx*, mm*,
  * sp*, dq*) and the analytics view DAG (v_*).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    ScanProjQueries, AggQueries, WindowQueries, JoinQueries,
    SetOrderQueries, DmlQueries, ViewQueries, LlmQueries, SinkQueries,
    SamplingQueries, LayoutQueries)

  /** Flagship: the V5-analog individual budget-vs-actual view on sf0.001
    * (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame =
    ViewQueries.defs("v5_individual_budget")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
