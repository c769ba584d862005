package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine is organized as operator modules, each contributing named
  * queries (`graft.core.Q`) with optional DuckDB oracle SQL; this object
  * only concatenates them.
  */
object SparkEntry {

  private val modules: Seq[Seq[Q]] = Seq(
    RelationalQueries.all,
    AggQueries.all,
    FunctionQueries.all,
    WindowQueries.all,
    AdvancedQueries.all,
    WeatherQueries.all,
    TextQueries.all,
    DedupQueries.all,
    SimilarityQueries.all,
    EmbeddingQueries.all,
    SamplingQueries.all,
    MultimodalQueries.all,
    SqlQueries.all,
  )

  private val (queryMap, oracleMap) = registry(modules)

  /** Flagship query (the full WOW-record pipeline, SURVEY.md §2B
    * wx_wow_record) on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WeatherQueries.wowRecord(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queryMap

  /** Queries whose registered fn EXECUTES a Structured Streaming
    * pipeline at construction (flagged explicitly via `StreamQ` at the
    * registration site, not inferred from names) — ExplainAudit skips
    * them, Bench reports their summed fixed trigger overhead. */
  val streamingQueries: Set[String] =
    modules.flatten.filter(_.streaming).map(_.name).toSet

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleMap
}
