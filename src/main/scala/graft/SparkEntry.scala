package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator module contributes a `queries` map (named DataFrame
  * builders over a scale-factor directory) and an `oracles` map (DuckDB
  * ANSI SQL equivalents on the same parquet tables). This object is the
  * single aggregation point the driver harness reads.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    OperatorCatalog,
    PipelineQueries,
    DedupQueries,
    SimilarityQueries,
    TextAnalysisQueries,
    CurationQueries,
    EventQueries,
    AsOfQueries,
    GraphQueries,
    ExtendedCatalog,
    graft.multimodal.MultimodalQueries,
    graft.streaming.StreamQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.segmentation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}

/** Contract every operator module implements so SparkEntry can
  * aggregate its named queries and DuckDB oracles.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
