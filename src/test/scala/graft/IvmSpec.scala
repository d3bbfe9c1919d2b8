package graft

import graft.core.{CaptureDiff, Ivm}
import org.apache.spark.sql.functions._

/** Incremental view maintenance semantics: hand-computed retraction+
  * addition deltas, including the cases the sf fixture cannot reach
  * (group-key migration, exact cancel-out suppression).
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  // view: sum(amount), count per grp.  Old state:
  //   grp 10 -> rows 1,2 (amounts 5.00, 7.00); grp 20 -> row 3 (9.00)
  //   grp 30 -> row 4 (1.00)
  private val oldSnap = Seq(
    (1L, 10L, "5.00"), (2L, 10L, "7.00"), (3L, 20L, "9.00"),
    (4L, 30L, "1.00")
  ).toDF("id", "grp", "amt")
    .select(col("id"), col("grp"), col("amt").cast("decimal(12,2)").as("amt"))

  // new state: row 2 amount bumped (update), row 3 MOVES grp 20->40
  // (key migration), row 4 deleted, row 5 inserted into grp 10
  private val newSnap = Seq(
    (1L, 10L, "5.00"), (2L, 10L, "8.50"), (3L, 40L, "9.00"),
    (5L, 10L, "2.00")
  ).toDF("id", "grp", "amt")
    .select(col("id"), col("grp"), col("amt").cast("decimal(12,2)").as("amt"))

  private def events =
    CaptureDiff.classifyWithPreImages(oldSnap, newSnap, Seq("id"))

  test("viewDelta: retraction+addition per event, key migration moves " +
    "mass between groups, net deltas sum per key") {
    val d = Ivm.viewDelta(events, "grp", "amt")
      .select(col("grp"), col("d_sum").cast("string"), col("d_n"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // grp 10: +1.50 (update) + 2.00 (insert row 5) = +3.50, dn +1
    // grp 20: -9.00, dn -1 (row 3 moved away)
    // grp 30: -1.00, dn -1 (row 4 deleted)
    // grp 40: +9.00, dn +1 (row 3 moved in)
    assert(d === Seq((10L, "3.50", 1L), (20L, "-9.00", -1L),
      (30L, "-1.00", -1L), (40L, "9.00", 1L)))
  }

  test("maintain: upsert/delete instruction set — update on touched " +
    "keys, insert for view-new keys, delete at count zero; untouched " +
    "keys never emitted") {
    val view = oldSnap.groupBy("grp").agg(
      count(lit(1)).as("n_rows"),
      sum(col("amt")).as("sum_val"))
    val out = Ivm.maintain(view, Ivm.viewDelta(events, "grp", "amt"), "grp")
      .select(col("grp"), col("n_rows"), col("sum_val").cast("string"),
        col("op"))
      .as[(Long, Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (10L, 3L, "15.50", "update"),  // 12.00 + 3.50
      (20L, 0L, "0.00", "delete"),   // emptied by the migration
      (30L, 0L, "0.00", "delete"),   // emptied by the delete
      (40L, 1L, "9.00", "insert")))  // created by the migration
  }

  test("viewDelta: exact cancel-out (insert+delete with equal value in " +
    "one group) nets to zero and is suppressed — matching a recompute") {
    val o = Seq((1L, 10L, "4.00"), (2L, 20L, "3.00")).toDF("id", "grp", "amt")
      .select(col("id"), col("grp"), col("amt").cast("decimal(12,2)").as("amt"))
    // row 1 deleted, row 9 inserted with the SAME group and amount;
    // row 2 untouched
    val n = Seq((9L, 10L, "4.00"), (2L, 20L, "3.00")).toDF("id", "grp", "amt")
      .select(col("id"), col("grp"), col("amt").cast("decimal(12,2)").as("amt"))
    val ev = CaptureDiff.classifyWithPreImages(o, n, Seq("id"))
    assert(Ivm.viewDelta(ev, "grp", "amt").count() === 0L)
  }

  test("maintain instruction set replayed onto the old view equals a " +
    "full recompute of the new view (MERGE semantics)") {
    val view = oldSnap.groupBy("grp").agg(
      count(lit(1)).as("n_rows"), sum(col("amt")).as("sum_val"))
    val instr = Ivm.maintain(view, Ivm.viewDelta(events, "grp", "amt"), "grp")
    // MERGE: drop deletes, upsert the rest over the old view
    val merged = view.join(instr.select(col("grp")), Seq("grp"), "left_anti")
      .unionByName(instr.filter(col("op") =!= "delete").drop("op"))
      .select(col("grp"), col("n_rows"), col("sum_val").cast("string"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val recomputed = newSnap.groupBy("grp").agg(
        count(lit(1)).as("n_rows"), sum(col("amt")).as("sum_val"))
      .select(col("grp"), col("n_rows"), col("sum_val").cast("string"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(merged === recomputed)
  }
}
