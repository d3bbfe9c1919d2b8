package graft

import graft.core.{AuditSchema, CaptureDiff, Replay, Retention}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keep-last retention variants + the replay round-trip property:
  * folding a captured audit log reconstructs the final table state
  * (SURVEY.md §5.3).
  */
class RetentionReplaySpec extends SparkSpec {
  import spark.implicits._

  private def fixed = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))

  private def log = Seq(
    (1, "a1", "insert", 1L), (2, "b1", "insert", 2L),
    (1, "a2", "update", 3L), (3, "c1", "insert", 4L),
    (2, null.asInstanceOf[String], "delete", 5L), (1, "a3", "update", 6L)
  ).toDF("id", "x", "audit_event", "audit_pk")
    .withColumn("audit_timestamp", fixed)
    .select("id", "x", "audit_event", "audit_timestamp", "audit_pk")

  test("keepLastGlobal keeps exactly the max-pk row (wipe post-condition, " +
    "sync:304-308)") {
    val kept = Retention.keepLastGlobal(log)
      .select("id", "audit_pk").as[(Int, Long)].collect()
    assert(kept.toSeq === Seq((1, 6L)))
  }

  test("keepLastPerKey == keepLastPerKeyWindowed (two physical plans, " +
    "one result)") {
    def canon(df: DataFrame) = df.select("id", "x", "audit_event", "audit_pk")
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val a = canon(Retention.keepLastPerKey(log, Seq("id")))
    val b = canon(Retention.keepLastPerKeyWindowed(log, Seq("id")))
    assert(a === b)
    assert(a === Seq((1, "a3", "update", 6L), (2, null, "delete", 5L),
      (3, "c1", "insert", 4L)))
  }

  test("replay folds the log to current state (deletes drop the key)") {
    val state = Replay.toState(log, Seq("id"))
      .as[(Int, String)].collect().sortBy(_._1)
    assert(state.toSeq === Seq((1, "a3"), (3, "c1")))
  }

  test("scd2: versions interval-partition each key's history — deletes " +
    "close without opening, re-inserts reopen, exactly one current " +
    "version per live key") {
    // key 2's history: insert(2) -> delete(5): no current version.
    // extend with a re-insert after the delete to cover reopening.
    val log2 = log.unionByName(Seq((2, "b2", "insert", 7L))
      .toDF("id", "x", "audit_event", "audit_pk")
      .withColumn("audit_timestamp", fixed)
      .select("id", "x", "audit_event", "audit_timestamp", "audit_pk"))
    val out = Replay.scd2(log2, Seq("id"))
      .select("id", "x", "version", "valid_from_pk", "valid_to_pk",
        "is_current")
      .as[(Int, String, Int, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(out === Seq(
      (1, "a1", 1, 1L, Some(3L), false),
      (1, "a2", 2, 3L, Some(6L), false),
      (1, "a3", 3, 6L, None, true),
      (2, "b1", 1, 2L, Some(5L), false),  // closed by the delete at pk 5
      (2, "b2", 2, 7L, None, true),       // reopened after the delete
      (3, "c1", 1, 4L, None, true)))
  }

  test("property: scd2 interval lookup at t == stateAsOf(t) for every " +
    "sequence point") {
    val hist = Replay.scd2(log, Seq("id"))
    for (t <- 1L to 6L) {
      val viaIntervals = hist
        .filter(col("valid_from_pk") <= t &&
          (col("valid_to_pk").isNull || col("valid_to_pk") > t))
        .select("id", "x").as[(Int, String)].collect().sortBy(_._1).toSeq
      val viaReplay = Replay.stateAsOf(log, Seq("id"), t)
        .select("id", "x").as[(Int, String)].collect().sortBy(_._1).toSeq
      assert(viaIntervals === viaReplay, s"as-of $t")
    }
  }

  test("property: capture(s1,s2) replayed over s1 == s2, for seeded " +
    "random DML sequences") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      val n = 200
      val s1 = (1 to n).map(i => (i, rnd.nextInt(1000), s"v${rnd.nextInt(50)}"))
      // random DML: ~15% delete, ~25% update, plus ~30 inserts
      val surviving = s1.filterNot(_ => rnd.nextDouble() < 0.15)
      val updated = surviving.map { case (id, a, b) =>
        if (rnd.nextDouble() < 0.25) (id, rnd.nextInt(1000), b) else (id, a, b)
      }
      val inserts = (n + 1 to n + 30).map(i => (i, rnd.nextInt(1000), s"new$i"))
      val s2 = updated ++ inserts

      val df1 = s1.toDF("id", "a", "b")
      val df2 = s2.toDF("id", "a", "b")
      val diff = CaptureDiff.capture(df1, df2, Seq("id"), clock = fixed)

      // apply the log onto s1: upsert insert/update images, delete by pk
      val df1Audit = df1
        .withColumn("audit_event", lit("insert"))
        .withColumn("audit_timestamp", fixed)
        .withColumn("audit_pk", lit(0L)) // base state sequenced before the diff
      val combined = df1Audit.unionByName(diff)
      val replayed = Replay.toState(combined, Seq("id"))
        .as[(Int, Int, String)].collect().sortBy(_._1).toSeq
      assert(replayed === s2.sortBy(_._1), s"round $round")
    }
  }

  test("keepLastPerKey preserves the audit-schema column order contract") {
    val out = Retention.keepLastPerKey(log, Seq("id"))
    assert(out.schema.fieldNames.toSeq === log.schema.fieldNames.toSeq)
    assert(AuditSchema.isAuditSchema(out.schema))
  }
}
