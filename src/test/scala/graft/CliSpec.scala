package graft

import graft.tools.{Cli, GenTool, SyncTool}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end CLI runs of the two reference-workflow entry points. */
class CliSpec extends SparkSpec {
  import spark.implicits._

  test("arg parsing and include lists") {
    val opts = Cli.parse(Array("--data", "/x", "-t", "a, b", "-o", "/y"))
    assert(opts === Map("--data" -> "/x", "-t" -> "a, b", "-o" -> "/y"))
    assert(Cli.include(opts) === Some(Set("a", "b")))
    assert(Cli.include(Map.empty) === None)
  }

  test("GenTool writes DDL artifacts for parquet tables, honoring -t") {
    val data = tmpDir("gendata"); val out = tmpDir("genout")
    Seq((1, "x")).toDF("id", "v").write.mode("overwrite").parquet(s"$data/alpha.parquet")
    Seq((2, 9.5)).toDF("id", "w").write.mode("overwrite").parquet(s"$data/beta.parquet")
    GenTool.main(Array("--data", data, "-o", out, "-t", "alpha"))
    assert(Files.exists(Paths.get(out, "alpha.audit.sql")))
    assert(!Files.exists(Paths.get(out, "beta.audit.sql")))
    val sql = Files.readString(Paths.get(out, "alpha.audit.sql"))
    assert(sql.contains("create table if not exists `alpha_audit`"))
    assert(sql.contains("`v` text null"))
  }

  test("SyncTool discovers audit dirs, syncs, and wipes with -w") {
    val logs = tmpDir("logs"); val sink = tmpDir("sinks")
    (1 to 12).map(i => (i, s"r$i", "insert")).toDF("id", "x", "audit_event")
      .withColumn("audit_timestamp", lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .withColumn("audit_pk", col("id").cast("long"))
      .write.mode("overwrite").parquet(s"$logs/t1_audit")
    SyncTool.main(Array("--logs", logs, "--sink", sink, "-w", "true"))
    // all rows in the sink, log compacted to one row
    assert(graft.core.SyncJob.watermark(spark, s"$sink/t1_audit") === 12L)
    assert(spark.read.parquet(s"$logs/t1_audit").count() === 1L)
  }
}
