package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Curation, DmQueries, LlmEmbed, LlmText, MlQueries, PipelineQueries, Q, QuirkQueries, Relational, StreamingQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one entry in
  * [[queries]]; entries with an ANSI-SQL-expressible equivalent also appear
  * in [[oracleSql]] for the driver's DuckDB hash compare.
  */
object SparkEntry {

  /** All registered queries, in catalog order. */
  val catalog: Seq[Q] =
    Relational.queries ++ WarehouseQueries.queries ++
      DmQueries.queries ++ PipelineQueries.queries ++
      QuirkQueries.queries ++
      StreamingQueries.queries ++
      LlmText.queries ++ LlmEmbed.queries ++ Curation.queries ++
      MlQueries.queries

  /** Flagship: the `yearly_sales_profit` analogue — star join over the full
    * schema with exact rounded aggregates (SURVEY.md E2; bl_dm.sql:274-285).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("j7_star_year_region")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
