package graft

import graft.core.AuditSchema
import graft.streaming.StreamingSync
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Structured-Streaming sync: exactly-once incremental delivery via
  * checkpointed offsets (SURVEY.md §2.8, §7.1.7).
  */
class StreamingSyncSpec extends SparkSpec {
  import spark.implicits._

  private def fixed = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))

  private def batch(pks: Range) =
    pks.map(i => (i, s"row$i"))
      .toDF("id", "x")
      .withColumn("audit_event", lit("insert"))
      .withColumn("audit_timestamp", fixed)
      .withColumn("audit_pk", col("id").cast("long"))

  private def countDataLines(dir: String): Int =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".csv") && Files.isRegularFile(p))
      .flatMap(p => Files.readAllLines(p).asScala)
      .count(l => l.nonEmpty && !l.startsWith("id,"))

  test("AvailableNow drains the log; a second run after new files " +
    "delivers only the new rows (checkpoint = watermark)") {
    val logDir = tmpDir("slog"); val sink = tmpDir("ssink"); val cp = tmpDir("scp")
    batch(1 to 10).write.mode("append").parquet(logDir)
    val schema = spark.read.parquet(logDir).schema
    assert(AuditSchema.isAuditSchema(schema))

    StreamingSync.runOnce(spark, logDir, schema, sink, cp)
    assert(countDataLines(sink) === 10)

    // second run, nothing new -> nothing delivered
    StreamingSync.runOnce(spark, logDir, schema, sink, cp)
    assert(countDataLines(sink) === 10)

    // land a new audit file -> exactly the delta flows
    batch(11 to 17).write.mode("append").parquet(logDir)
    StreamingSync.runOnce(spark, logDir, schema, sink, cp)
    assert(countDataLines(sink) === 17)
  }

  test("source refuses a non-audit schema (contract guard)") {
    val logDir = tmpDir("slog2")
    Seq((1, "x")).toDF("id", "x").write.mode("overwrite").parquet(logDir)
    val bad = spark.read.parquet(logDir).schema
    intercept[IllegalArgumentException] {
      StreamingSync.source(spark, logDir, bad)
    }
  }
}
