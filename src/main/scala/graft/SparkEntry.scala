package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 +
  * north-star extensions) to a DataFrame builder; `oracleSql` carries
  * the DuckDB-equivalent SQL for the driver's hash compare. Both sides
  * alias computed columns identically (driver compares by column name).
  */
object SparkEntry {

  /** Flagship: snapshot-diff change capture (the heart of the system,
    * SURVEY.md §2.9) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.captureDiff(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ AnalyticsQueries.queries ++ ExtensionQueries.queries

  def oracleSql: Map[String, String] =
    CdcQueries.oracle ++ AnalyticsQueries.oracle ++ ExtensionQueries.oracle

  /** Oracles whose SQL embeds artifacts the run itself trains (the BPE
    * merge table): not expressible as static strings, so Verify builds
    * them against the dump-time session + dataset and overlays them on
    * [[oracleSql]] when writing oracle_sql.json.
    */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    ExtensionQueries.dynamicOracle(spark, sfDir)
}
