package graft

import graft.core.{AuditSchema, SyncJob}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Watermark sync to CSV: resume, idempotency, fputcsv parity
  * (SURVEY.md §2.1 S5-S7, §5.5).
  */
class SyncJobSpec extends SparkSpec {
  import spark.implicits._

  private def fixed = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))

  private def mkLog(pks: Range) =
    pks.map(i => (i, s"row$i", "insert"))
      .toDF("id", "x", "audit_event")
      .withColumn("audit_timestamp", fixed)
      .withColumn("audit_pk", col("id").cast("long"))
      .select("id", "x", "audit_event", "audit_timestamp", "audit_pk")

  private def readCsvLines(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".csv"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq

  test("empty sink -> watermark is -1, full log delivered") {
    val sink = tmpDir("sync")
    assert(SyncJob.watermark(spark, sink) === -1L)
    val n = SyncJob.syncTable(spark, mkLog(1 to 10), sink, singleFile = true)
    assert(n === 10)
    assert(SyncJob.watermark(spark, sink) === 10L)
  }

  test("incremental resume: only rows above the sink watermark move; " +
    "re-run with no new rows delivers nothing (idempotent)") {
    val sink = tmpDir("sync")
    assert(SyncJob.syncTable(spark, mkLog(1 to 10), sink, singleFile = true) === 10)
    assert(SyncJob.syncTable(spark, mkLog(1 to 10), sink, singleFile = true) === 0)
    assert(SyncJob.syncTable(spark, mkLog(1 to 25), sink, singleFile = true) === 15)
    assert(SyncJob.watermark(spark, sink) === 25L)
    // no duplicates: 25 data rows total (headers excluded)
    val dataLines = readCsvLines(sink).filterNot(_.startsWith("id,"))
    assert(dataLines.length === 25)
  }

  test("fputcsv parity: quote only when needed, \"\" escaping, NULL -> " +
    "empty field (sync_mysql.php:257; SURVEY.md §7.4.3)") {
    val sink = tmpDir("sync")
    val df = Seq(
      (1, "plain", "insert"),
      (2, "with,comma", "insert"),
      (3, "with\"quote", "insert"),
      (4, null.asInstanceOf[String], "insert")
    ).toDF("id", "x", "audit_event")
      .withColumn("audit_timestamp", fixed)
      .withColumn("audit_pk", col("id").cast("long"))
      .select("id", "x", "audit_event", "audit_timestamp", "audit_pk")
    SyncJob.syncTable(spark, df, sink, singleFile = true)
    val lines = readCsvLines(sink)
    assert(lines.head === "id,x,audit_event,audit_timestamp,audit_pk")
    assert(lines.contains("1,plain,insert,2020-01-01 00:00:00,1"))
    assert(lines.contains("2,\"with,comma\",insert,2020-01-01 00:00:00,2"))
    assert(lines.contains("3,\"with\"\"quote\",insert,2020-01-01 00:00:00,3"))
    assert(lines.contains("4,,insert,2020-01-01 00:00:00,4"))
  }

  test("syncAll selects audit tables by substring + include list (P4/P5)") {
    val root = tmpDir("syncall")
    val logs = Map(
      "orders_audit" -> mkLog(1 to 5),
      "nation"       -> mkLog(1 to 3), // not an audit table -> skipped
      "t_audit_x"    -> mkLog(1 to 2)  // substring match -> selected
    )
    val delivered = SyncJob.syncAll(spark, logs, root)
    assert(delivered === Map("orders_audit" -> 5L, "t_audit_x" -> 2L))
    val only = SyncJob.syncAll(spark, logs, root,
      include = Some(Set("orders_audit")))
    assert(only.keySet === Set("orders_audit"))
  }

  test("syncAll parallelism: tables submit CONCURRENTLY (all in flight " +
    "at once), results and per-table sidecars match the sequential " +
    "run, and one table's failure drains the others before rethrow") {
    val logs = (1 to 4).map(i => s"t${i}_audit" -> mkLog(1 to (i * 3))).toMap
    val seqRoot = tmpDir("syncpar-seq")
    val parRoot = tmpDir("syncpar-par")
    val sequential = SyncJob.syncAll(spark, logs, seqRoot)
    // the latch proves true overlap: every table must be in flight
    // before ANY can proceed — a sequential dispatcher deadlocks here
    // and fails the await instead
    val latch = new java.util.concurrent.CountDownLatch(4)
    val parallel = SyncJob.syncAll(spark, logs, parRoot, parallelism = 4,
      onTable = { _ =>
        latch.countDown()
        assert(latch.await(30, java.util.concurrent.TimeUnit.SECONDS),
          "tables were not all in flight concurrently")
      })
    assert(parallel === sequential)
    for ((name, n) <- sequential) {
      assert(SyncJob.watermark(spark, s"$parRoot/$name") === n,
        s"sidecar for $name")
      assert(spark.read.options(SyncJob.CsvOptions).option("header", "true")
        .csv(s"$parRoot/$name").count() === n)
    }
    // failure containment: poison one table, the rest still deliver
    val poisoned = logs + ("bad_audit" ->
      mkLog(1 to 2).withColumn("audit_pk",
        org.apache.spark.sql.functions.expr(
          "CAST(raise_error('boom') AS BIGINT)")))
    val failRoot = tmpDir("syncpar-fail")
    val e = intercept[Exception](
      SyncJob.syncAll(spark, poisoned, failRoot, parallelism = 4))
    assert(e.getMessage != null)
    for ((name, n) <- sequential)
      assert(spark.read.options(SyncJob.CsvOptions).option("header", "true")
        .csv(s"$failRoot/$name").count() === n,
        s"$name must complete despite the poisoned sibling")
  }
}
