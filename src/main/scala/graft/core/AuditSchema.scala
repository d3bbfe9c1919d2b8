package graft.core

import org.apache.spark.sql.types._

/** Audit-schema derivation: source schema -> audit-table schema.
  *
  * Reproduces the reference generator's schema contract
  * (cdc_audit_gen_mysql.php:331-333): all source columns in their
  * original order, then exactly three audit columns appended LAST —
  * `audit_event`, `audit_timestamp`, `audit_pk` — so `audit_pk` is
  * always the final column (the reference sync depends on that,
  * cdc_audit_sync_mysql.php:352). Source nullability and column
  * comments are preserved (cdc_audit_gen_mysql.php:341-361); primary-key
  * columns get the reference's comment text
  * (cdc_audit_gen_mysql.php:342-344).
  *
  * Pure metadata function — no SparkSession required; runs on the
  * driver in O(#columns) regardless of data scale.
  */
object AuditSchema {

  val EventCol     = "audit_event"
  val TimestampCol = "audit_timestamp"
  val PkCol        = "audit_pk"
  val AuditCols: Seq[String] = Seq(EventCol, TimestampCol, PkCol)

  /** The three-value event domain (enum in the reference,
    * cdc_audit_gen_mysql.php:331; StringType here — see SURVEY.md §1.2).
    */
  val Events: Seq[String] = Seq("insert", "update", "delete")

  /** Audit table name: `<prefix><table>_audit`
    * (cdc_audit_gen_mysql.php:534-536).
    */
  def auditTableName(table: String, prefix: String = ""): String =
    s"$prefix${table}_audit"

  /** Audit tables are recognized by `_audit` SUBSTRING — not suffix —
    * matching the reference's observable behavior exactly
    * (cdc_audit_gen_mysql.php:215-218, cdc_audit_sync_mysql.php:182-185;
    * pinned by a test per SURVEY.md §7.4.6).
    */
  def isAuditTable(name: String): Boolean = name.contains("_audit")

  /** Derive the audit schema from a source schema.
    *
    * @param source     source table schema (field order preserved)
    * @param pkColumns  primary-key column names in the source; their
    *                   comments are overridden like the reference does
    * @param table      source table name (used in the PK comment text)
    */
  def derive(source: StructType, pkColumns: Seq[String] = Nil,
             table: String = "t"): StructType = {
    val pkSet = pkColumns.toSet
    val srcFields = source.fields.map { f =>
      if (pkSet.contains(f.name))
        f.withComment(s"Primary key in source table $table")
      else f
    }
    StructType(srcFields ++ auditFields)
  }

  /** Just the three appended audit fields, in contract order. */
  def auditFields: Seq[StructField] = Seq(
    StructField(EventCol, StringType, nullable = false),
    StructField(TimestampCol, TimestampType, nullable = false),
    StructField(PkCol, LongType, nullable = false)
  )

  /** True iff `schema` is a well-formed audit schema: the three audit
    * columns present, in order, last — the invariant every downstream
    * operator (sync watermark, retention, replay) relies on.
    */
  def isAuditSchema(schema: StructType): Boolean = {
    val n = schema.fields.length
    n >= 3 &&
      schema.fields(n - 3).name == EventCol &&
      schema.fields(n - 2).name == TimestampCol &&
      schema.fields(n - 1).name == PkCol
  }

  /** Source-column names of an audit schema (everything before the
    * three audit fields).
    */
  def sourceColumns(audit: StructType): Seq[String] =
    audit.fields.dropRight(3).map(_.name).toSeq

  /** Fail-fast drift check (the reference's wished-for validation,
    * README.md:222 / SURVEY.md §1.2): the sink's existing schema must
    * equal the newly-derived one by name+type+order.
    */
  def checkCompatible(existing: StructType, derived: StructType): Unit = {
    val a = existing.fields.map(f => (f.name, f.dataType)).toSeq
    val b = derived.fields.map(f => (f.name, f.dataType)).toSeq
    require(a == b,
      s"audit schema drift: sink has ${a.mkString(",")} but source derives ${b.mkString(",")}")
  }

  /** Additive schema evolution — the improvement the reference wishes
    * for (schema drift silently breaks it, README.md:210-212,224):
    * a derived schema is an ADDITIVE evolution of the existing one
    * when every existing source column survives with its type and new
    * source columns only append (audit cols stay last by
    * construction). Returns the new columns; throws for any other
    * drift (renames, type changes, drops stay fail-fast — silent
    * guessing is how the reference broke).
    */
  def additiveEvolution(existing: StructType, derived: StructType): Seq[StructField] = {
    val oldSrc = existing.fields.dropRight(3).toSeq
    val newSrc = derived.fields.dropRight(3).toSeq
    require(isAuditSchema(existing) && isAuditSchema(derived),
      "both schemas must be audit schemas")
    require(newSrc.take(oldSrc.length).map(f => (f.name, f.dataType)) ==
      oldSrc.map(f => (f.name, f.dataType)),
      "non-additive drift: existing columns changed or moved — manual migration required")
    newSrc.drop(oldSrc.length)
  }
}
