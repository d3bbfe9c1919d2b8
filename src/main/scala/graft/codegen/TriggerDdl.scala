package graft.codegen

import org.apache.spark.sql.types._

/** Column metadata as the generator consumes it — the Spark-side stand-in
  * for one INFORMATION_SCHEMA.COLUMNS row (cdc_audit_gen_mysql.php:222).
  */
case class ColumnMeta(
    name: String,
    mysqlType: String,
    nullable: Boolean,
    isPrimaryKey: Boolean = false,
    comment: String = "")

/** One pre-existing AFTER trigger, as read from
  * INFORMATION_SCHEMA.TRIGGERS (cdc_audit_gen_mysql.php:230-235):
  * needed so regeneration preserves user trigger logic.
  */
case class TriggerMeta(name: String, event: String, statement: String)

/** MySQL DDL + trigger code generation — capability parity with the
  * reference generator (cdc_audit_gen_mysql.php), as a deterministic
  * pure-text function of the schema. No Spark execution: this runs on
  * the driver and its output is applied to MySQL out-of-band, exactly
  * like the reference's generate-then-apply split (README.md:174-176).
  *
  * Semantics reproduced (SURVEY.md §2.9):
  *  - audit table `<prefix><table>_audit` = source columns verbatim +
  *    audit_event enum / audit_timestamp / audit_pk auto_increment,
  *    appended last (gen:331-333)
  *  - PK columns: comment overridden, composite secondary index
  *    (gen:342-344,362-369); index on audit_timestamp (gen:370)
  *  - idempotent DDL: `create table if not exists`,
  *    `DROP TRIGGER IF EXISTS` (gen:322-326,403-407)
  *  - three AFTER triggers, each a single INSERT of NEW.* (insert/
  *    update) or OLD.* (delete) + event literal + CURRENT_TIMESTAMP;
  *    audit_pk omitted -> auto_increment assigns it (gen:409-439,480-508)
  *  - pre-existing trigger bodies survive regeneration: BEGIN/END
  *    stripped, lines mentioning the audit table removed (no comment
  *    markers — the mysql CLI strips comments, gen:443-475), residue
  *    spliced after the audit INSERT
  *  - comment text single-quotes escaped by doubling (gen:360)
  */
object TriggerDdl {

  def auditTableName(table: String, prefix: String = ""): String =
    s"$prefix${table}_audit"

  def auditSqlFileName(table: String, prefix: String = ""): String =
    s"$prefix$table.audit.sql"

  /** The three audit column descriptors the generator appends
    * (cdc_audit_gen_mysql.php:331-333).
    */
  val auditColumns: Seq[ColumnMeta] = Seq(
    ColumnMeta("audit_event", "enum('insert','update','delete')", nullable = false,
      comment = "Indicates event that occurred in source table"),
    ColumnMeta("audit_timestamp", "timestamp", nullable = false,
      comment = "Updated when record is inserted, updated or deleted in source table"),
    ColumnMeta("audit_pk", "int(11)", nullable = false,
      comment = "Audit table primary key, useful for sorting since mysql time data types are only granular to second level.")
  )

  private def escapeComment(s: String): String = s.replace("'", "''")

  /** Derive ColumnMeta from a Spark StructType — the reverse direction
    * of the reference (which reads MySQL's catalog); used when the
    * source of truth is a DataFrame schema. Types map conservatively.
    */
  def fromStructType(schema: StructType, pk: Seq[String] = Nil): Seq[ColumnMeta] = {
    val pkSet = pk.toSet
    schema.fields.toSeq.map { f =>
      val t = f.dataType match {
        case ByteType                => "tinyint"
        case ShortType               => "smallint"
        case IntegerType             => "int(11)"
        case LongType                => "bigint"
        case FloatType               => "float"
        case DoubleType              => "double"
        case d: DecimalType          => s"decimal(${d.precision},${d.scale})"
        case BooleanType             => "tinyint(1)"
        case DateType                => "date"
        case TimestampType           => "timestamp"
        case BinaryType              => "blob"
        case StringType              => "text"
        case other                   => sys.error(s"no MySQL mapping for $other")
      }
      ColumnMeta(f.name, t, f.nullable, pkSet.contains(f.name),
        f.getComment().getOrElse(""))
    }
  }

  /** `CREATE TABLE IF NOT EXISTS` DDL for the audit table. */
  def auditTableDdl(table: String, cols: Seq[ColumnMeta],
                    prefix: String = ""): String = {
    val audit = auditTableName(table, prefix)
    val all   = cols ++ auditColumns
    val colLines = all.map { c =>
      val comment =
        if (c.isPrimaryKey) s"Primary key in source table $table"
        else c.comment
      val nullSql = if (c.nullable) "null" else "not null"
      val pkSql   = if (c.name == "audit_pk") " primary key auto_increment" else ""
      s"  `${c.name}` ${c.mysqlType} $nullSql$pkSql comment '${escapeComment(comment)}'"
    }
    val pkIndex = {
      val pks = cols.filter(_.isPrimaryKey).map(c => s"`${c.name}`")
      if (pks.nonEmpty) Seq(s"   index (${pks.mkString(", ")})") else Nil
    }
    val tsIndex = Seq("   index (`audit_timestamp`)")
    val body = (colLines ++ pkIndex ++ tsIndex).mkString(",\n")
    s"""/**
       | * Audit table for table ($table).
       | *
       | * !!! DO NOT MODIFY THIS FILE MANUALLY !!!
       | * Auto-generated by graft.codegen.TriggerDdl.
       | */
       |create table if not exists `$audit` (
       |$body
       |);
       |""".stripMargin
  }

  /** Splice-prep of a pre-existing trigger body: strip a leading BEGIN
    * and trailing END (case-insensitive), drop every line mentioning
    * the audit table (idempotent regeneration), trim the residue.
    */
  def spliceBody(statement: String, auditTable: String): String = {
    var s = statement.trim
    // word-boundary matches only: a body like `begin_maintenance()` or
    // one ending in an identifier containing "end" must not be mangled
    if (s.matches("(?is)^begin\\b.*"))
      s = s.substring("begin".length)
    if (s.matches("(?is).*(^|[\\s;])end$"))
      s = s.substring(0, s.length - "end".length)
    s.split("\n", -1)
      .filterNot(_.contains(auditTable))
      .mkString("\n")
      .trim
  }

  /** The three AFTER triggers (+ drops of pre-existing ones). */
  def triggersDdl(table: String, cols: Seq[ColumnMeta],
                  existing: Seq[TriggerMeta] = Nil,
                  prefix: String = ""): String = {
    val audit = auditTableName(table, prefix)
    val drops = existing.filter(_.name.nonEmpty).map { t =>
      s"DROP TRIGGER IF EXISTS `${t.name}`;\n"
    }.mkString("\n")
    val spliced: Map[String, String] = existing
      .filter(t => t.event.nonEmpty && t.statement.trim.nonEmpty)
      .map(t => t.event.toLowerCase -> spliceBody(t.statement, audit))
      .toMap

    val names   = cols.map(_.name) ++ Seq("audit_event", "audit_timestamp")
    val colList = names.map(n => s"`$n`").mkString(", ")
    def vals(image: String, event: String): String =
      (cols.map(c => s"$image.`${c.name}`") ++
        Seq(s"'$event'", "CURRENT_TIMESTAMP")).mkString(", ")

    def one(event: String, image: String): String = {
      val residue = spliced.getOrElse(event, "")
      val extra   = if (residue.nonEmpty) s"\n  $residue\n" else "\n"
      s"""-- $table after ${event.toUpperCase} trigger.
         |DELIMITER @@
         |CREATE TRIGGER `${table}_after_$event` AFTER ${event.toUpperCase} ON `$table`
         | FOR EACH ROW BEGIN
         |  insert into `$audit` ($colList) values(${vals(image, event)});
         |$extra END;
         |@@
         |""".stripMargin
    }

    s"""/**
       | * Audit triggers for table ($table).
       | * Auto-generated by graft.codegen.TriggerDdl.
       | */
       |$drops
       |${one("insert", "NEW")}
       |${one("update", "NEW")}
       |${one("delete", "OLD")}""".stripMargin
  }

  /** Full per-table artifact: DDL then triggers — what the reference
    * writes to `<table>.audit.sql` (gen:376-382,522-528).
    */
  def generate(table: String, cols: Seq[ColumnMeta],
               existing: Seq[TriggerMeta] = Nil,
               prefix: String = ""): String =
    auditTableDdl(table, cols, prefix) + "\n" +
      triggersDdl(table, cols, existing, prefix)

  /** Generator-side table selection (cdc_audit_gen_mysql.php:210-218):
    * include-list membership, and skip audit tables by `_audit`
    * substring (P2/P3).
    */
  def selectSourceTables(all: Seq[String],
                         include: Option[Set[String]] = None): Seq[String] =
    all.filter(t => include.forall(_.contains(t)))
      .filterNot(_.contains("_audit"))
}
