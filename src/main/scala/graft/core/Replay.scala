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
}
