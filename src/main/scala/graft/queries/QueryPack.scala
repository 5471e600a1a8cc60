package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of declared queries plus their DuckDB oracle SQL.
  * [[graft.SparkEntry]] concatenates all packs.
  *
  * Contract (driver): for each key in `queries` there may be a matching
  * `oracleSql` entry of ANSI SQL runnable by DuckDB over the same parquet
  * tables; column names/types must line up exactly (the driver sorts columns
  * by name before hashing values). Queries without oracle SQL get a weaker
  * rows-only check.
  */
trait QueryPack {
  type Query = (SparkSession, String) => DataFrame
  def queries: Map[String, Query]
  def oracleSql: Map[String, String]
}
