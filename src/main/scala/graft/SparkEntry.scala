package graft

import graft.core.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is exposed as a named query
  * over the `/root/testdata/sf*` parquet tables, with (where SQL can
  * express it) an equivalent DuckDB oracle statement. Column names and
  * values are constructed to hash-match the oracle exactly (see
  * [[graft.functions.Exact]] for the float-determinism strategy).
  *
  * Query registries live per domain under [[graft.queries]]; this object
  * just merges them.
  */
object SparkEntry {

  private def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    graft.queries.RelationalQueries.registry ++ graft.queries.ExtensionQueries.registry ++
      graft.queries.IoQueries.registry ++ graft.queries.MlQueries.registry

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.PricingSummary(Catalog(spark, "/root/testdata/sf0.001").lineitem)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get the driver's weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, (_, Some(sql))) => k -> sql }
}
