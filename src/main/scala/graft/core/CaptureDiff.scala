package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-diff change capture — the Spark-native replacement for the
  * reference's MySQL AFTER triggers (SURVEY.md §2.3, §2.9). Spark cannot
  * install triggers, so I/U/D events are classified by a full-outer
  * join of two consecutive snapshots on the primary key.
  *
  * Event taxonomy and row images match the generated triggers exactly
  * (cdc_audit_gen_mysql.php:489-499):
  *
  *  - key only in new snapshot  -> `insert`, post-image (NEW.*)
  *  - key in both, any non-key column changed -> `update`, post-image
  *    only — pre-images of updates are NOT captured, matching the
  *    reference (`update_vals = new_vals`, cdc_audit_gen_mysql.php:490;
  *    SURVEY.md §7.4.2)
  *  - key only in old snapshot  -> `delete`, pre-image (OLD.*)
  *
  * No-op updates (key present in both, all columns null-safe equal)
  * produce no event: a MySQL AFTER UPDATE trigger does fire on no-op
  * UPDATE statements, but a snapshot pair cannot observe them — this is
  * the documented semantic of snapshot capture.
  *
  * Scale notes (100 TB): the join is fact-fact on the PK -> Catalyst
  * plans a shuffle (sort-merge / AQE-shuffled-hash) partitioned by the
  * key; if both snapshots are written bucketed by PK the exchange is
  * avoided entirely. The change-detection predicate is a null-safe
  * column comparison, fully codegen'd; no UDFs anywhere.
  */
object CaptureDiff {

  /** Classify changes between two snapshots sharing a schema.
    *
    * @param oldSnap previous snapshot
    * @param newSnap current snapshot
    * @param pk      primary-key column names (join key)
    * @param clock   value for `audit_timestamp` — injectable for
    *                deterministic tests (SURVEY.md §7.4.5); defaults to
    *                capture-time `current_timestamp()` like the
    *                reference's CURRENT_TIMESTAMP
    *                (cdc_audit_gen_mysql.php:498-499)
    * @param basePk  `audit_pk` offset (last pk already in the log)
    * @return DataFrame in audit schema: source columns (image), then
    *         audit_event, audit_timestamp, audit_pk — audit_pk densely
    *         assigned ordered by the PK columns.
    */
  def capture(oldSnap: DataFrame, newSnap: DataFrame, pk: Seq[String],
              clock: Column = current_timestamp(),
              basePk: Long = 0L): DataFrame = {
    require(oldSnap.schema.fieldNames.sameElements(newSnap.schema.fieldNames),
      "snapshots must share a schema")
    val events = classify(oldSnap, newSnap, pk)
      .withColumn(AuditSchema.TimestampCol, clock)
    AuditSeq.assign(
      events,
      pk.map(col) :+ col(AuditSchema.EventCol),
      basePk)
  }

  /** Schema-evolution-tolerant capture — the reference's wished-for
    * "Auto-Detect schema changes to source table and apply to audit
    * table" (`README.md:224`, listed as a TODO; `README.md:210-212`
    * documents today's manual re-run). Snapshot-diff capture gets this
    * almost for free: the two snapshots' schemas are aligned by NAME —
    * a column present on one side only (ALTER TABLE ADD/DROP between
    * snapshots) null-pads the other side — and the ordinary classify
    * runs over the union schema. An added column backfilled on some
    * rows surfaces exactly those rows as updates (null IS DISTINCT
    * FROM value); rows untouched by the backfill stay suppressed.
    * Shared columns must keep their type — a type CHANGE is a rewrite,
    * not capturable from images, and fails fast like the sync drift
    * check (`SyncJob`).
    */
  def captureEvolved(oldSnap: DataFrame, newSnap: DataFrame,
                     pk: Seq[String],
                     clock: Column = current_timestamp(),
                     basePk: Long = 0L): DataFrame = {
    val oldF = oldSnap.schema.fields.map(f => f.name -> f.dataType).toMap
    val newF = newSnap.schema.fields.map(f => f.name -> f.dataType).toMap
    val shared = oldF.keySet intersect newF.keySet
    val mismatched = shared.filter(c => oldF(c) != newF(c))
    require(mismatched.isEmpty,
      s"schema drift beyond add/drop: type change on ${mismatched.mkString(",")}")
    require(pk.forall(shared.contains), "PK columns must exist on both sides")
    // union order: old's columns, then new-only columns
    val unionCols = oldSnap.schema.fieldNames.toSeq ++
      newSnap.schema.fieldNames.filterNot(oldF.contains)
    def pad(df: DataFrame, have: Map[String, org.apache.spark.sql.types.DataType])
        : DataFrame =
      df.select(unionCols.map(c => have.get(c) match {
        case Some(_) => col(c)
        case None    => lit(null).cast(oldF.getOrElse(c, newF(c))).as(c)
      }): _*)
    capture(pad(oldSnap, oldF), pad(newSnap, newF), pk, clock, basePk)
  }

  /** The join+classify core, without sequencing/timestamping: returns
    * source columns (correct image per event) + `audit_event`.
    * Expressed entirely in joinable/codegen-able expressions so Catalyst
    * keeps pushdown and AQE freedom.
    */
  def classify(oldSnap: DataFrame, newSnap: DataFrame,
               pk: Seq[String]): DataFrame = {
    val o = oldSnap.alias("o")
    val n = newSnap.alias("n")
    // plain equality, not null-safe: PKs are non-null by definition
    // (the presence tests below already rely on that), and an
    // equi-join keeps the plan bucket-join compatible (co-located
    // snapshots join without an Exchange — see AuditLake)
    val joinCond = pk.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val joined = o.join(n, joinCond, "full_outer")

    val cols    = oldSnap.schema.fieldNames.toSeq
    val nonKey  = cols.filterNot(pk.contains)
    // presence tests: any PK column non-null on that side (PKs are
    // non-null by definition, so null PK == side absent)
    val inOld = pk.map(k => col(s"o.$k").isNotNull).reduce(_ && _)
    val inNew = pk.map(k => col(s"n.$k").isNotNull).reduce(_ && _)
    val changed =
      if (nonKey.isEmpty) lit(false)
      else nonKey.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)

    val event = when(!inOld, lit("insert"))
      .when(!inNew, lit("delete"))
      .otherwise(lit("update"))

    // post-image for insert/update, pre-image for delete
    // (cdc_audit_gen_mysql.php:489-496)
    val image = cols.map { c =>
      when(event === "delete", col(s"o.$c")).otherwise(col(s"n.$c")).as(c)
    }

    joined
      .filter(!inOld || !inNew || changed) // suppress no-op updates
      .select(image :+ event.as(AuditSchema.EventCol): _*)
  }

  /** Capture WITH update pre-images — the deliberate extension beyond
    * the reference (which only stores post-images on update,
    * cdc_audit_gen_mysql.php:490; SURVEY.md §7.4.2): each non-key
    * column gains an `old_<col>` twin holding the pre-image on
    * update/delete events (null on insert). Snapshot-diff capture has
    * the pre-image for free — the reference's trigger model simply
    * chose not to keep it — so this closes its data-loss gap for
    * consumers that need before/after auditing.
    */
  def classifyWithPreImages(oldSnap: DataFrame, newSnap: DataFrame,
                            pk: Seq[String]): DataFrame = {
    val o = oldSnap.alias("o")
    val n = newSnap.alias("n")
    val joinCond = pk.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val joined = o.join(n, joinCond, "full_outer")

    val cols   = oldSnap.schema.fieldNames.toSeq
    val nonKey = cols.filterNot(pk.contains)
    val inOld = pk.map(k => col(s"o.$k").isNotNull).reduce(_ && _)
    val inNew = pk.map(k => col(s"n.$k").isNotNull).reduce(_ && _)
    val changed =
      if (nonKey.isEmpty) lit(false)
      else nonKey.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    val event = when(!inOld, lit("insert"))
      .when(!inNew, lit("delete"))
      .otherwise(lit("update"))
    val image = cols.map { c =>
      when(event === "delete", col(s"o.$c")).otherwise(col(s"n.$c")).as(c)
    }
    val preImages = nonKey.map { c =>
      when(event === "insert", lit(null)).otherwise(col(s"o.$c")).as(s"old_$c")
    }
    joined
      .filter(!inOld || !inNew || changed)
      .select(image ++ preImages :+ event.as(AuditSchema.EventCol): _*)
  }
}
