package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered query, grouped by SURVEY.md §2 Part-B family. */
  def registry: Seq[Q] =
    sources.Sources.all ++
      streaming.Streams.all ++
      operators.Projections.all ++
      operators.Joins.all ++
      operators.Aggregates.all ++
      operators.Windows.all ++
      operators.SetOps.all ++
      operators.LlmPipeline.all ++
      operators.Multimodal.all ++
      pipeline.Capstone.all ++
      functions.Scalars.all ++
      functions.Udfs.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Explicitly the TPC-H Q1-shaped hash aggregate (q30). */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "q30_hash_agg").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
