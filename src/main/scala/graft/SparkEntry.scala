package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Assess, Catalog, Check, Compare, Migrate, Pipeline,
  Relational}
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

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Compare.queries ++ Migrate.queries ++
      Cdc.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Reverse.queries ++
      Catalog.queries ++ Check.queries ++ TableFilter.queries ++
      CharsetConvert.queries ++ Assess.queries ++ Pipeline.queries ++
      Prepare.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Compare.oracles ++ Migrate.oracles ++
      Cdc.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ Reverse.oracles ++
      Catalog.oracles ++ Check.oracles ++ TableFilter.oracles ++
      CharsetConvert.oracles ++ Assess.oracles ++ Pipeline.oracles ++
      Prepare.oracles
}
