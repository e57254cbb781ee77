package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §0.3 and §2.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry;
  * SQL-expressible ones also get a DuckDB 1.0.0 `oracleSql` twin with
  * IDENTICAL output column names and a total row order (the driver
  * hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    AggOps.multiKeyPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_multi_key_pricing" -> (AggOps.multiKeyPricing _)
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables (table names are bare: `lineitem`, …).
    * Omitted for non-SQL-expressible or approximate ops. */
  def oracleSql: Map[String, String] = Map(
    "q_agg_multi_key_pricing" -> AggOps.multiKeyPricingSql
  )
}
