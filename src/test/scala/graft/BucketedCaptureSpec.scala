package graft

import graft.core.AuditLake
import org.apache.spark.sql.functions._

/** Pin the scale property: bucketed snapshots diff-join with NO
  * Exchange in the plan (SURVEY.md §2.3; the one shuffle of the core
  * pipeline, eliminated).
  */
class BucketedCaptureSpec extends SparkSpec {
  import spark.implicits._

  test("captureBucketed plans a sort-merge join with no Exchange and " +
    "classifies identically to the unbucketed path") {
    val oldSnap = (1 to 1000).map(i => (i, s"v$i")).toDF("id", "x")
    val newSnap = (1 to 1000).filter(_ % 7 != 0)
      .map(i => (i, if (i % 5 == 0) s"v$i!" else s"v$i")).toDF("id", "x")
    AuditLake.writeBucketedSnapshot(oldSnap, "snap_old", Seq("id"), buckets = 4)
    AuditLake.writeBucketedSnapshot(newSnap, "snap_new", Seq("id"), buckets = 4)

    val captured = AuditLake.captureBucketed(spark, "snap_old", "snap_new", Seq("id"))
    val plan = captured.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

    val events = captured.groupBy("audit_event").count()
      .as[(String, Long)].collect().toMap
    // deletes: multiples of 7 (142); updates: multiples of 5 not of 7
    // (200 - 28 multiples of 35 = 172)
    assert(events === Map("delete" -> 142L, "update" -> 172L))

    val unbucketed = graft.core.CaptureDiff.classify(oldSnap, newSnap, Seq("id"))
      .select("id", "x", "audit_event").as[(Int, String, String)]
      .collect().sortBy(_._1)
    val bucketed = captured.select("id", "x", "audit_event")
      .as[(Int, String, String)].collect().sortBy(_._1)
    assert(bucketed.toSeq === unbucketed.toSeq)

    spark.sql("DROP TABLE IF EXISTS snap_old")
    spark.sql("DROP TABLE IF EXISTS snap_new")
  }
}
