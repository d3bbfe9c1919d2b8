package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replay an audit log back into table state — the consumer-side dual
  * of capture, used by the property tests (SURVEY.md §5.3): folding
  * insert/update (upsert post-image) and delete (remove by PK) over the
  * log in `audit_pk` order reconstructs the source table.
  *
  * Because every event carries a full row image and a total per-key
  * order (`audit_pk`), the fold reduces to: take each key's latest
  * event, drop it if that event is a delete, else its image IS the row.
  * That makes replay a single hash-aggregate (max_by) — one shuffle on
  * the key, no iterative fold, scale-safe.
  */
object Replay {

  /** Reconstruct current state from an audit log.
    *
    * @param log audit-schema DataFrame (source cols + audit_event,
    *            audit_timestamp, audit_pk)
    * @param pk  source primary-key column names
    * @return DataFrame with the source columns only
    */
  def toState(log: DataFrame, pk: Seq[String]): DataFrame = {
    val latest = Retention.keepLastPerKey(log, pk)
    latest
      .filter(col(AuditSchema.EventCol) =!= "delete")
      .select(AuditSchema.sourceColumns(log.schema).map(col): _*)
  }

  /** Time travel: the table state as of sequence point `asOfPk` —
    * replay of the log prefix `audit_pk <= asOfPk`. The prefix filter
    * sits on the scan (parquet stats prune everything after the
    * as-of point, since the log is written in pk order), then the
    * same single hash-aggregate as [[toState]]. This is the
    * capability the audit log exists for (README.md:29-41: "recreate
    * the source table as it appeared at any given point in time").
    */
  def stateAsOf(log: DataFrame, pk: Seq[String], asOfPk: Long): DataFrame =
    toState(log.filter(col(AuditSchema.PkCol) <= asOfPk), pk)

  /** Slowly-changing-dimension Type-2 history from the audit log
    * (Kimball's SCD2: one row per VERSION of each key, with a validity
    * interval in sequence space). Every non-delete event opens a
    * version valid from its own `audit_pk`; the NEXT event on the same
    * key — update, delete, or re-insert — closes it (`valid_to_pk`,
    * null = still open). A delete closes the prior version without
    * opening one, so `is_current` = open interval. Versions number
    * densely per key in event order.
    *
    * This is the point-in-time dual of [[stateAsOf]]: instead of
    * replaying a prefix per question, the interval table answers any
    * as-of question with a range predicate
    * (`valid_from_pk <= t AND (valid_to_pk IS NULL OR valid_to_pk > t)`).
    *
    * Scale shape: both windows share one partitioning (the key) and
    * one sort (`audit_pk`) — a single Exchange, no global window, and
    * per-key state is one row in flight.
    */
  def scd2(log: DataFrame, pk: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(col(AuditSchema.PkCol))
    val srcCols = AuditSchema.sourceColumns(log.schema)
    log
      .withColumn("valid_to_pk", lead(col(AuditSchema.PkCol), 1).over(w))
      .filter(col(AuditSchema.EventCol) =!= "delete")
      .withColumn("version", row_number().over(w))
      .select(srcCols.map(col) ++ Seq(
        col("version"),
        col(AuditSchema.PkCol).as("valid_from_pk"),
        col("valid_to_pk"),
        col("valid_to_pk").isNull.as("is_current")): _*)
  }
}
