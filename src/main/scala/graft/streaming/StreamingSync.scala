package graft.streaming

import graft.core.{AuditSchema, SyncJob}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming incremental sync — the streaming twin of
  * [[graft.core.SyncJob]] (SURVEY.md §2.8, §7.1.7).
  *
  * The reference's cron-loop sync (cdc_audit_sync_mysql.php:242-258,
  * README.md:194-195) is a hand-rolled micro-batch stream: each run
  * reads audit rows above a persisted watermark and appends them to a
  * CSV file. Structured Streaming gives the same contract natively:
  *
  *  - source: file stream over the audit-log directory (new parquet
  *    files are discovered per micro-batch; at 100 TB the listing cost
  *    is bounded with `maxFilesPerTrigger` back-pressure)
  *  - watermark: the checkpoint's offset log replaces the reference's
  *    CSV-tail cursor (which was defective anyway — SURVEY.md §2.5 W2)
  *  - delivery: the file-sink commit protocol upgrades the reference's
  *    at-least-once append to exactly-once per batch (SURVEY.md §2.8)
  *  - cadence: `Trigger.AvailableNow` = "cron run" (drain everything,
  *    stop); `ProcessingTime` = resident incremental daemon.
  *
  * No event-time windows are needed for the core contract: events are
  * totally ordered by `audit_pk` at capture time, so late data cannot
  * exist by construction (SURVEY.md §2.8 "Late data").
  */
object StreamingSync {

  /** Open the audit-log directory as a streaming source. The schema
    * must be supplied (file streams cannot infer) — by contract it is
    * an audit schema (audit cols last).
    */
  def source(spark: SparkSession, logDir: String, schema: StructType,
             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    require(AuditSchema.isAuditSchema(schema),
      s"not an audit schema: ${schema.fieldNames.mkString(",")}")
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(logDir)
  }

  /** Start the incremental CSV sync: audit-log dir -> CSV sink dir with
    * fputcsv-parity options, exactly-once via `checkpointDir`.
    *
    * @param availableNow true = drain-and-stop (the cron-run analog);
    *                     false = continuous micro-batches
    */
  def start(spark: SparkSession, logDir: String, schema: StructType,
            sinkDir: String, checkpointDir: String,
            availableNow: Boolean = true): StreamingQuery = {
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("10 seconds")
    source(spark, logDir, schema)
      .writeStream
      .format("csv")
      .options(SyncJob.CsvOptions)
      .option("checkpointLocation", checkpointDir)
      .option("path", sinkDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }

  /** One drain-everything sync run; blocks until the stream stops.
    * Re-running after new files land in `logDir` delivers exactly the
    * new rows (checkpointed offsets) — the reference's incremental
    * contract without its tail-read defect.
    */
  def runOnce(spark: SparkSession, logDir: String, schema: StructType,
              sinkDir: String, checkpointDir: String): Unit = {
    val q = start(spark, logDir, schema, sinkDir, checkpointDir)
    q.awaitTermination()
  }
}
