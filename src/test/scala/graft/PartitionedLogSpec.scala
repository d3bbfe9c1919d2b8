package graft

import graft.core.AuditLake
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Partitioned audit-log layout: directory-per-key writes, plan-time
  * partition pruning on reads.
  */
class PartitionedLogSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitionedLog lays out one dir per key; readPartition " +
    "prunes at the scan (PartitionFilters, not data filters)") {
    val dir = tmpDir("plog")
    val log = (1 to 300).map(i => (i, s"r$i", "insert", s"2020-01-${i % 3 + 1}"))
      .toDF("id", "x", "audit_event", "dt")
      .withColumn("audit_timestamp",
        lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .withColumn("audit_pk", col("id").cast("long"))
    AuditLake.writePartitionedLog(log, dir, "dt")

    val dirs = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("dt=")).toSeq.sorted
    assert(dirs === Seq("dt=2020-01-1", "dt=2020-01-2", "dt=2020-01-3"))

    val one = AuditLake.readPartition(spark, dir, "dt", "2020-01-2")
    assert(one.count() === 100)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("dt") && plan.contains("2020-01-2"),
      s"expected partition pruning in:\n$plan")

    // appending another day only adds a directory; existing data intact
    val more = Seq((1000, "new", "insert", "2020-01-9"))
      .toDF("id", "x", "audit_event", "dt")
      .withColumn("audit_timestamp",
        lit(java.sql.Timestamp.valueOf("2020-01-09 00:00:00")))
      .withColumn("audit_pk", col("id").cast("long"))
    AuditLake.writePartitionedLog(more, dir, "dt")
    assert(spark.read.parquet(dir).count() === 301)
  }
}
