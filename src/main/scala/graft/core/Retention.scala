package graft.core

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retention / compaction — the reference's "wipe" (keep only the
  * newest audit row, cdc_audit_sync_mysql.php:284-319, SURVEY.md §2.5
  * W1), rebuilt for immutable storage.
  *
  * The reference deletes in 100-row batches with 1 s sleeps purely to
  * bound MySQL lock contention (rationale comment
  * cdc_audit_sync_mysql.php:267-283); Spark rewrites immutable files,
  * so the batching/backoff has no analog — retention here is "compute
  * the retained set, rewrite the log directory" with snapshot isolation
  * provided by the file-listing snapshot.
  */
object Retention {

  /** Keep only the single greatest-`audit_pk` row — the reference wipe's
    * exact post-condition (never deletes the max row,
    * cdc_audit_sync_mysql.php:304-308).
    *
    * Implemented as an aggregate + broadcast semi-join rather than a
    * global sort: `max(audit_pk)` is a cheap partial-aggregated scan,
    * and the single-row result broadcasts, so at 100 TB this is one
    * pass over column stats (parquet footers can even answer the max
    * without reading data pages) + one pruned scan.
    */
  def keepLastGlobal(log: DataFrame,
                     pkCol: String = AuditSchema.PkCol): DataFrame = {
    val maxPk = log.agg(max(col(pkCol)).as("__max_pk"))
    log.join(broadcast(maxPk), col(pkCol) === col("__max_pk"))
      .drop("__max_pk")
  }

  /** Per-source-key variant: keep each key's latest audit row (the
    * "current state" materialization, SURVEY.md §2.4 extensions).
    * One shuffle on the key; `max_by(struct(*))` keeps it a single
    * hash-aggregate with map-side partials — no window sort needed.
    */
  def keepLastPerKey(log: DataFrame, keys: Seq[String],
                     pkCol: String = AuditSchema.PkCol): DataFrame = {
    val others = log.schema.fieldNames.filterNot(keys.contains)
    log.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.toIndexedSeq.map(col): _*), col(pkCol)).as("__row"))
      .select(keys.map(col) ++ others.map(c => col(s"__row.$c")): _*)
      // restore contract column order: source cols ..., audit cols last
      .select(log.schema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** Window-based per-key keep-last, kept for parity testing against
    * [[keepLastPerKey]] (same result, different physical plan: sort
    * within key partitions instead of hash-agg).
    */
  def keepLastPerKeyWindowed(log: DataFrame, keys: Seq[String],
                             pkCol: String = AuditSchema.PkCol): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(pkCol).desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
