package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Assess, Catalog, Check, Compare, Migrate, Pipeline,
  Relational, TaskModes}
import graft.reverse.{Prepare, Reverse}
import graft.streaming.Cdc
import graft.functions.{CharsetConvert, Dedup, Multimodal, Similarity,
  TableFilter, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` aggregates every implemented operator's registry;
  * `oracleSql` the matching DuckDB SQL (omitted for non-SQL-expressible
  * operators, which the driver checks rows-only).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.j1RevenueByNation(spark, "/root/testdata/sf0.001")

  /** Per-module registries, named — the spec asserts no two modules
    * register the same query name (`++` would silently keep one and
    * shrink the verified surface) and that every query has an oracle.
    */
  private[graft] val queryRegistries
      : Seq[(String, Map[String, (SparkSession, String) => DataFrame])] = Seq(
    "Relational" -> Relational.queries, "Compare" -> Compare.queries,
    "Migrate" -> Migrate.queries, "Cdc" -> Cdc.queries,
    "TextAnalysis" -> TextAnalysis.queries, "Dedup" -> Dedup.queries,
    "Similarity" -> Similarity.queries, "Multimodal" -> Multimodal.queries,
    "Reverse" -> Reverse.queries, "Catalog" -> Catalog.queries,
    "Check" -> Check.queries, "TableFilter" -> TableFilter.queries,
    "CharsetConvert" -> CharsetConvert.queries, "Assess" -> Assess.queries,
    "Pipeline" -> Pipeline.queries, "Prepare" -> Prepare.queries,
    "TaskModes" -> TaskModes.queries)

  private[graft] val oracleRegistries: Seq[(String, Map[String, String])] =
    Seq(
      "Relational" -> Relational.oracles, "Compare" -> Compare.oracles,
      "Migrate" -> Migrate.oracles, "Cdc" -> Cdc.oracles,
      "TextAnalysis" -> TextAnalysis.oracles, "Dedup" -> Dedup.oracles,
      "Similarity" -> Similarity.oracles, "Multimodal" -> Multimodal.oracles,
      "Reverse" -> Reverse.oracles, "Catalog" -> Catalog.oracles,
      "Check" -> Check.oracles, "TableFilter" -> TableFilter.oracles,
      "CharsetConvert" -> CharsetConvert.oracles, "Assess" -> Assess.oracles,
      "Pipeline" -> Pipeline.oracles, "Prepare" -> Prepare.oracles,
      "TaskModes" -> TaskModes.oracles)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryRegistries.map(_._2).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    oracleRegistries.map(_._2).reduce(_ ++ _)
}
