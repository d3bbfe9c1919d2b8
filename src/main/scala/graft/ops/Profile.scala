package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the quality/inspection pass a
  * training-data pipeline runs before ingesting a source: per-column
  * counts, nulls, distincts (exact + HLL estimate), min/max. One scan,
  * all aggregates partial-merged; the HLL variant is the 100 TB path
  * (exact distinct shuffles, `approx_count_distinct` does not).
  */
object Profile {

  /** Long-format profile: one row per profiled column. Exact distinct
    * counts (oracle-comparable); use [[approx]] at scale.
    */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val per = cols.map { c =>
      df.agg(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
    }
    per.reduce(_ unionByName _)
  }

  /** HLL++ estimated distincts: identical shape, no distinct shuffle —
    * sketch estimates differ per engine, so this variant is checked
    * rows-only by the driver (no SQL oracle).
    */
  def approx(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    val per = cols.map { c =>
      df.agg(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        approx_count_distinct(col(c), rsd).as("n_distinct_est"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
    }
    per.reduce(_ unionByName _)
  }
}
