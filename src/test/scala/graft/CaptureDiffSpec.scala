package graft

import graft.core.{AuditSchema, CaptureDiff}
import org.apache.spark.sql.functions._

/** Event classification + image contract of snapshot-diff capture
  * (SURVEY.md §2.9, §5.2).
  */
class CaptureDiffSpec extends SparkSpec {
  import spark.implicits._

  private def fixed = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))

  test("classifies insert/update/delete with correct images") {
    val oldSnap = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
      .toDF("id", "name", "v")
    val newSnap = Seq((2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0))
      .toDF("id", "name", "v")
    val out = CaptureDiff.capture(oldSnap, newSnap, Seq("id"), clock = fixed)
      .select("id", "name", "v", "audit_event", "audit_pk")
      .as[(Int, String, Double, String, Long)].collect().sortBy(_._1)

    assert(out.toSeq === Seq(
      (1, "a", 10.0, "delete", 1L),  // pre-image (OLD.*)
      (3, "c", 99.0, "update", 2L),  // post-image (NEW.*), no pre-image
      (4, "d", 40.0, "insert", 3L))) // post-image
  }

  test("no-op updates are suppressed; audit_pk dense from base") {
    val s1 = Seq((1, "a"), (2, "b")).toDF("id", "x")
    val s2 = Seq((1, "a"), (2, "B")).toDF("id", "x")
    val out = CaptureDiff.capture(s1, s2, Seq("id"), clock = fixed, basePk = 100L)
    val rows = out.select("id", "audit_event", "audit_pk")
      .as[(Int, String, Long)].collect()
    assert(rows.toSeq === Seq((2, "update", 101L)))
  }

  test("null-safe change detection: null -> value and value -> null are updates, " +
    "null -> null is not") {
    val s1 = Seq((1, Option.empty[String]), (2, Some("x")), (3, Option.empty[String]))
      .toDF("id", "x")
    val s2 = Seq((1, Some("y")), (2, Option.empty[String]), (3, Option.empty[String]))
      .toDF("id", "x")
    val ev = CaptureDiff.classify(s1, s2, Seq("id"))
      .select("id", "audit_event").as[(Int, String)].collect().sortBy(_._1)
    assert(ev.toSeq === Seq((1, "update"), (2, "update"))) // id=3 suppressed
  }

  test("identical snapshots produce zero events") {
    val s = Seq((1, "a"), (2, "b")).toDF("id", "x")
    assert(CaptureDiff.classify(s, s, Seq("id")).isEmpty)
  }

  test("composite primary keys") {
    val s1 = Seq((1, 1, "a"), (1, 2, "b")).toDF("k1", "k2", "x")
    val s2 = Seq((1, 2, "b2"), (2, 1, "c")).toDF("k1", "k2", "x")
    val ev = CaptureDiff.classify(s1, s2, Seq("k1", "k2"))
      .select("k1", "k2", "audit_event").as[(Int, Int, String)].collect()
      .sortBy(r => (r._1, r._2))
    assert(ev.toSeq === Seq((1, 1, "delete"), (1, 2, "update"), (2, 1, "insert")))
  }

  test("classifyWithPreImages: old_* columns carry the pre-image on " +
    "update/delete, null on insert (extension beyond the reference)") {
    val s1 = Seq((1, "a"), (2, "b")).toDF("id", "x")
    val s2 = Seq((1, "a2"), (3, "c")).toDF("id", "x")
    val out = CaptureDiff.classifyWithPreImages(s1, s2, Seq("id"))
      .select("id", "x", "old_x", "audit_event")
      .as[(Int, String, String, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1, "a2", "a", "update"),   // post-image + pre-image
      (2, "b", "b", "delete"),    // pre-image in both
      (3, "c", null, "insert")))  // no pre-image exists
  }

  test("additiveEvolution accepts appended columns, rejects other drift") {
    import org.apache.spark.sql.types._
    val v1 = AuditSchema.derive(StructType(Seq(
      StructField("id", IntegerType), StructField("x", StringType))))
    val v2 = AuditSchema.derive(StructType(Seq(
      StructField("id", IntegerType), StructField("x", StringType),
      StructField("y", DoubleType))))
    assert(AuditSchema.additiveEvolution(v1, v2).map(_.name) === Seq("y"))
    assert(AuditSchema.additiveEvolution(v1, v1).isEmpty)
    val renamed = AuditSchema.derive(StructType(Seq(
      StructField("id", IntegerType), StructField("renamed", StringType))))
    intercept[IllegalArgumentException] {
      AuditSchema.additiveEvolution(v1, renamed)
    }
  }

  test("captureEvolved: added column null-pads the old side (backfilled " +
    "rows surface as updates, others suppress), dropped column " +
    "null-pads the new side, type change fails fast") {
    val fixed = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
    val o = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "x")
    // ALTER TABLE ADD y: backfilled only on id 2; id 3 deleted, 4 added
    val n = Seq((1, "a", null.asInstanceOf[String]), (2, "b", "Y2"),
      (4, "d", "Y4")).toDF("id", "x", "y")
    val out = CaptureDiff.captureEvolved(o, n, Seq("id"), clock = fixed)
      .select("id", "x", "y", "audit_event")
      .as[(Int, String, Option[String], String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      // id 1: null-padded old y == null new y -> suppressed (absent)
      (2, "b", Some("Y2"), "update"),   // the backfill IS the change
      (3, "c", None, "delete"),
      (4, "d", Some("Y4"), "insert")))
    // dropped column: old has y, new doesn't -> every surviving row
    // with a non-null y reads as an update to null
    val dropped = CaptureDiff.captureEvolved(
        Seq((1, "a", "gone")).toDF("id", "x", "y"),
        Seq((1, "a")).toDF("id", "x"), Seq("id"), clock = fixed)
      .select("id", "y", "audit_event")
      .as[(Int, Option[String], String)].collect().toSeq
    assert(dropped === Seq((1, None, "update")))
    // type change on a shared column is a rewrite, not evolution
    intercept[IllegalArgumentException] {
      CaptureDiff.captureEvolved(o,
        Seq((1, 9L)).toDF("id", "x"), Seq("id"), clock = fixed)
    }
  }

  test("threeWayMerge: the full presence/column matrix — one-side " +
    "edits, disjoint-column merge, column conflict (ours wins), " +
    "delete-vs-edit conflict, clean/both deletes, insert variants") {
    val base = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40),
      (5, "e", 50), (6, "f", 60), (7, "g", 70)).toDF("id", "x", "v")
    val ours = Seq((1, "a2", 10), (2, "b", 20), (3, "c", 31),
      (5, "e", 50), (6, "f2", 60), (8, "h", 80), (10, "j", 100))
      .toDF("id", "x", "v")                         // 4,7 deleted
    val theirs = Seq((1, "a", 10), (2, "b", 22), (3, "c", 32),
      (4, "d2", 40), (6, "f", 61), (8, "h", 80), (9, "i", 90),
      (10, "j", 101)).toDF("id", "x", "v")          // 5,7 deleted
    val out = CaptureDiff.threeWayMerge(base, ours, theirs, Seq("id"))
      .select("id", "x", "v", "audit_event", "merge_status")
      .as[(Int, String, Int, String, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1, "a2", 10, "update", "ours"),
      (2, "b", 22, "update", "theirs"),
      (3, "c", 31, "update", "conflict"),   // both edited v: ours wins
      (4, "d", 40, "delete", "conflict"),   // our delete vs their edit
      (5, "e", 50, "delete", "theirs"),     // their clean delete
      (6, "f2", 61, "update", "merged"),    // disjoint columns combine
      (7, "g", 70, "delete", "merged"),     // both deleted
      (8, "h", 80, "insert", "merged"),     // identical both-insert
      (9, "i", 90, "insert", "theirs"),
      (10, "j", 100, "insert", "conflict"))) // divergent both-insert: ours
  }

  test("threeWayMerge: their delete loses to our edit (update survives); " +
    "fully-unchanged keys are suppressed") {
    val base = Seq((1, "a", 10), (2, "b", 20)).toDF("id", "x", "v")
    val ours = Seq((1, "a9", 10), (2, "b", 20)).toDF("id", "x", "v")
    val theirs = Seq((2, "b", 20)).toDF("id", "x", "v") // deleted 1
    val out = CaptureDiff.threeWayMerge(base, ours, theirs, Seq("id"))
      .select("id", "x", "audit_event", "merge_status")
      .as[(Int, String, String, String)].collect().toSeq
    assert(out === Seq((1, "a9", "update", "conflict")))
  }

  test("output is a well-formed audit schema") {
    val s1 = Seq((1, "a")).toDF("id", "x")
    val s2 = Seq((2, "b")).toDF("id", "x")
    val out = CaptureDiff.capture(s1, s2, Seq("id"), clock = fixed)
    assert(AuditSchema.isAuditSchema(out.schema))
    assert(AuditSchema.sourceColumns(out.schema) === Seq("id", "x"))
  }
}
