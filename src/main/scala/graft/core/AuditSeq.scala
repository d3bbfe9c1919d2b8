package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Dense, monotonic `audit_pk` assignment — the Spark analog of the
  * reference's per-table `auto_increment` sequence
  * (cdc_audit_gen_mysql.php:333,358-359). The ordering contract of the
  * whole pipeline is "order by audit_pk, never by timestamp"
  * (README.md:58-61), so the sequence must be dense (1,2,3,...) and
  * deterministic given a total order of the events.
  *
  * Two implementations (SURVEY.md §4, §7.4.1):
  *
  *  - [[assign]] — scale path. Global range-sort on the order columns,
  *    then `RDD.zipWithIndex` per-partition offsets: one lightweight
  *    count job over the sorted partitions computes cumulative
  *    offsets, then indexes stamp per-partition in parallel. No
  *    single-partition bottleneck. The RDD hop is deliberate: a pure
  *    Catalyst formulation (spark_partition_id + offset join) is
  *    UNSOUND under AQE, which may coalesce the range exchange
  *    differently in the count job and the stamping job, silently
  *    remapping partition ids between the two — zipWithIndex walks one
  *    materialized RDD, so its two jobs always agree.
  *
  *  - [[assignWindowed]] — small-data path with whole-stage-codegen:
  *    `row_number()` over an un-partitioned window. Spark plans this as
  *    a single-partition sort; correct at any size but serial in the
  *    final stage. Kept for cases where the input is already known
  *    to be small (e.g. one micro-batch of captured changes).
  *
  * Both produce byte-identical results for the same order columns; the
  * order columns must be a unique key of the input for the result to be
  * deterministic across runs (ties are forbidden, not broken silently).
  */
object AuditSeq {

  /** Append a dense `audit_pk` (base+1, base+2, ...) ordered by
    * `orderCols`. Scale path — see object doc.
    */
  def assign(df: DataFrame, orderCols: Seq[Column], base: Long = 0L,
             pkName: String = AuditSchema.PkCol): DataFrame = {
    val sorted = df.orderBy(orderCols: _*)
    val schema = StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField(pkName, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (base + idx + 1L))
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Append a dense `audit_pk` via an un-partitioned window —
    * codegen-friendly but single-partition in the final stage. Use only
    * for bounded micro-batches.
    */
  def assignWindowed(df: DataFrame, orderCols: Seq[Column], base: Long = 0L,
                     pkName: String = AuditSchema.PkCol): DataFrame = {
    val w = Window.orderBy(orderCols: _*)
    df.withColumn(pkName, row_number().over(w).cast(LongType) + lit(base))
  }
}
