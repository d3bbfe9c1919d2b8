package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * Every table is a plain parquet file; reads go through the DataFrame
  * reader so Catalyst gets full predicate pushdown / column pruning on
  * the scan. At 100 TB the same call pattern works against a
  * partitioned directory tree (parquet discovers partitions), so no
  * code here is test-scale-specific.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    // events.ts has been generated both as parquet TIMESTAMP(NANOS)
    // (finer than Spark's µs TimestampType — read as a raw nanos long
    // via nanosAsLong so the scan succeeds) and as TIMESTAMP(MICROS)
    // (reads as a real TimestampType; nanosAsLong is a no-op there).
    // Consumers that need an absolute time dispatch on the read dtype
    // (AnalyticsQueries.epochUs); the pipeline otherwise orders by
    // event_id/audit_pk, never by time.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
