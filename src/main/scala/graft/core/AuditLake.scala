package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed snapshot storage — the shuffle-elimination path for
  * snapshot-diff capture at scale (SURVEY.md §2.3 scale notes).
  *
  * CaptureDiff's full-outer join on the PK is the one exchange in the
  * whole core pipeline (SURVEY.md §3). When consecutive snapshots are
  * written bucketed by the PK into the same bucket count, Catalyst
  * recognizes both sides as co-partitioned and plans the sort-merge
  * join with NO Exchange on either side — at 100 TB that removes the
  * only full-data shuffle of the capture path (each task diff-joins
  * bucket i of the old snapshot against bucket i of the new one;
  * pinned by a plan test in BucketedCaptureSpec).
  *
  * The write costs one clustering pass (bucketBy requires it), which
  * the snapshot producer pays once; every downstream capture run —
  * usually many per snapshot pair, plus replays — joins for free.
  */
object AuditLake {

  /** Write a snapshot as a bucketed, bucket-sorted table. */
  def writeBucketedSnapshot(df: DataFrame, table: String, pk: Seq[String],
                            buckets: Int = 32): Unit =
    df.write
      .bucketBy(buckets, pk.head, pk.tail: _*)
      .sortBy(pk.head, pk.tail: _*)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(table)

  /** Capture between two bucketed snapshot tables: same semantics as
    * CaptureDiff.classify, exchange-free physical plan.
    */
  def captureBucketed(spark: SparkSession, oldTable: String, newTable: String,
                      pk: Seq[String]): DataFrame =
    CaptureDiff.classify(spark.table(oldTable), spark.table(newTable), pk)

  /** Write an audit log as a Hive-partitioned directory tree — the
    * 100 TB layout (SCALING.md): one partition per derived key (e.g.
    * the capture date), so retention drops whole directories and any
    * time-bounded read prunes partitions before touching a file.
    * `audit_pk` ordering within each partition keeps parquet min/max
    * stats tight for the watermark filter.
    */
  def writePartitionedLog(log: DataFrame, dir: String,
                          partitionCol: String): Unit =
    log.sortWithinPartitions(AuditSchema.PkCol)
      .write.mode("append")
      .partitionBy(partitionCol)
      .parquet(dir)

  /** Read the partitioned log with a partition-value filter — Catalyst
    * prunes non-matching partition directories at planning time (the
    * scan's `PartitionFilters`, pinned by PartitionedLogSpec).
    */
  def readPartition(spark: SparkSession, dir: String,
                    partitionCol: String, value: String): DataFrame =
    spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col(partitionCol) === value)
}
