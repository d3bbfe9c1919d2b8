package graft

import graft.codegen.{ColumnMeta, TriggerDdl, TriggerMeta}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-text tests for the DDL/trigger generator — shape parity with
  * cdc_audit_gen_mysql.php:314-326,403-439 (SURVEY.md §5.2).
  */
class TriggerDdlSpec extends AnyFunSuite {

  private val cols = Seq(
    ColumnMeta("id", "int(11)", nullable = false, isPrimaryKey = true),
    ColumnMeta("name", "varchar(64)", nullable = true, comment = "person's name")
  )

  test("audit table DDL: idempotent create, cols verbatim + 3 audit cols, " +
    "pk index + timestamp index, comment quote doubling") {
    val ddl = TriggerDdl.auditTableDdl("person", cols)
    assert(ddl.contains("create table if not exists `person_audit`"))
    assert(ddl.contains("`id` int(11) not null comment 'Primary key in source table person'"))
    assert(ddl.contains("`name` varchar(64) null comment 'person''s name'"))
    assert(ddl.contains("`audit_event` enum('insert','update','delete') not null"))
    assert(ddl.contains("`audit_timestamp` timestamp not null"))
    assert(ddl.contains("`audit_pk` int(11) not null primary key auto_increment"))
    assert(ddl.contains("index (`id`)"))
    assert(ddl.contains("index (`audit_timestamp`)"))
    // audit cols come after all source cols
    assert(ddl.indexOf("`name`") < ddl.indexOf("`audit_event`"))
    assert(ddl.indexOf("`audit_event`") < ddl.indexOf("`audit_timestamp`"))
    assert(ddl.indexOf("`audit_timestamp`") < ddl.indexOf("`audit_pk`"))
  }

  test("three AFTER triggers: NEW image for insert/update, OLD for delete, " +
    "one INSERT each, audit_pk omitted (gen:409-439,489-496)") {
    val t = TriggerDdl.triggersDdl("person", cols)
    for (ev <- Seq("insert", "update", "delete"))
      assert(t.contains(s"CREATE TRIGGER `person_after_$ev` AFTER ${ev.toUpperCase} ON `person`"))
    assert(t.contains("values(NEW.`id`, NEW.`name`, 'insert', CURRENT_TIMESTAMP)"))
    assert(t.contains("values(NEW.`id`, NEW.`name`, 'update', CURRENT_TIMESTAMP)"))
    assert(t.contains("values(OLD.`id`, OLD.`name`, 'delete', CURRENT_TIMESTAMP)"))
    // audit_pk never in the insert column list (auto_increment assigns it)
    assert(t.contains("(`id`, `name`, `audit_event`, `audit_timestamp`)"))
    assert(!t.contains("`audit_pk`)"))
  }

  test("pre-existing trigger bodies are spliced: BEGIN/END stripped, " +
    "audit-table lines dropped for idempotent regeneration (gen:443-475)") {
    val existing = Seq(TriggerMeta("person_after_update", "UPDATE",
      """BEGIN
        |  insert into `person_audit` (x) values (1);
        |  update counters set n = n + 1;
        |END""".stripMargin))
    val t = TriggerDdl.triggersDdl("person", cols, existing)
    assert(t.contains("DROP TRIGGER IF EXISTS `person_after_update`;"))
    assert(t.contains("update counters set n = n + 1;"))
    // the old audit insert was dropped, the new one is emitted exactly once
    val inserts = "insert into `person_audit`".r.findAllIn(t).length
    assert(inserts === 3) // one per generated trigger, no residue copy
  }

  test("spliceBody edge cases") {
    assert(TriggerDdl.spliceBody("BEGIN\nfoo;\nEND", "t_audit") === "foo;")
    assert(TriggerDdl.spliceBody("foo;", "t_audit") === "foo;")
    assert(TriggerDdl.spliceBody("BEGIN\ninsert into t_audit;\nEND", "t_audit") === "")
    // word boundaries: identifiers that merely contain begin/end
    // survive intact
    assert(TriggerDdl.spliceBody("begin_maintenance()", "t_audit") ===
      "begin_maintenance()")
    assert(TriggerDdl.spliceBody("update t set day = 'weekend'", "t_audit") ===
      "update t set day = 'weekend'")
  }

  test("fromStructType maps Spark types to MySQL") {
    val s = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType),
      StructField("c", DecimalType(12, 2)),
      StructField("d", TimestampType),
      StructField("e", BinaryType)))
    val m = TriggerDdl.fromStructType(s, pk = Seq("a"))
    assert(m.map(_.mysqlType) === Seq("bigint", "text", "decimal(12,2)", "timestamp", "blob"))
    assert(m.head.isPrimaryKey && !m(1).isPrimaryKey)
  }

  test("generator table selection: include list + _audit substring skip (P2/P3)") {
    val all = Seq("orders", "orders_audit", "x_audit_y", "nation")
    assert(TriggerDdl.selectSourceTables(all) === Seq("orders", "nation"))
    assert(TriggerDdl.selectSourceTables(all, Some(Set("orders"))) === Seq("orders"))
  }

  test("file naming parity (gen:534-543)") {
    assert(TriggerDdl.auditSqlFileName("person") === "person.audit.sql")
    assert(TriggerDdl.auditSqlFileName("person", "pfx_") === "pfx_person.audit.sql")
  }

  test("GOLDEN: the MySQL AFTER-trigger catalog query is pinned " +
    "verbatim — the one live-catalog statement no embedded database " +
    "executes in tests (clause map: SELECT list = " +
    "cdc_audit_gen_mysql.php:231, INFORMATION_SCHEMA.TRIGGERS = :230, " +
    "EVENT_OBJECT_TABLE bind = :232, ACTION_TIMING = 'AFTER' = :233)") {
    assert(graft.codegen.JdbcCatalog.MySqlTriggerSql ===
      "select TRIGGER_NAME, EVENT_MANIPULATION, ACTION_STATEMENT " +
        "from INFORMATION_SCHEMA.TRIGGERS " +
        "where EVENT_OBJECT_TABLE = ? and ACTION_TIMING = 'AFTER'")
  }

  test("GOLDEN: the complete MySQL-dialect artifact GenTool writes for " +
    "a two-column table, byte-for-byte — DDL header comment " +
    "(gen:314-326), audit-column block + indexes (gen:331-343), and " +
    "the three DELIMITER-wrapped AFTER triggers (gen:403-439)") {
    val golden =
      """/**
        | * Audit table for table (person).
        | *
        | * !!! DO NOT MODIFY THIS FILE MANUALLY !!!
        | * Auto-generated by graft.codegen.TriggerDdl.
        | */
        |create table if not exists `person_audit` (
        |  `id` int(11) not null comment 'Primary key in source table person',
        |  `name` varchar(64) null comment 'person''s name',
        |  `audit_event` enum('insert','update','delete') not null comment 'Indicates event that occurred in source table',
        |  `audit_timestamp` timestamp not null comment 'Updated when record is inserted, updated or deleted in source table',
        |  `audit_pk` int(11) not null primary key auto_increment comment 'Audit table primary key, useful for sorting since mysql time data types are only granular to second level.',
        |   index (`id`),
        |   index (`audit_timestamp`)
        |);
        |
        |/**
        | * Audit triggers for table (person).
        | * Auto-generated by graft.codegen.TriggerDdl.
        | */
        |
        |-- person after INSERT trigger.
        |DELIMITER @@
        |CREATE TRIGGER `person_after_insert` AFTER INSERT ON `person`
        | FOR EACH ROW BEGIN
        |  insert into `person_audit` (`id`, `name`, `audit_event`, `audit_timestamp`) values(NEW.`id`, NEW.`name`, 'insert', CURRENT_TIMESTAMP);
        |
        | END;
        |@@
        |
        |-- person after UPDATE trigger.
        |DELIMITER @@
        |CREATE TRIGGER `person_after_update` AFTER UPDATE ON `person`
        | FOR EACH ROW BEGIN
        |  insert into `person_audit` (`id`, `name`, `audit_event`, `audit_timestamp`) values(NEW.`id`, NEW.`name`, 'update', CURRENT_TIMESTAMP);
        |
        | END;
        |@@
        |
        |-- person after DELETE trigger.
        |DELIMITER @@
        |CREATE TRIGGER `person_after_delete` AFTER DELETE ON `person`
        | FOR EACH ROW BEGIN
        |  insert into `person_audit` (`id`, `name`, `audit_event`, `audit_timestamp`) values(OLD.`id`, OLD.`name`, 'delete', CURRENT_TIMESTAMP);
        |
        | END;
        |@@
        |""".stripMargin
    assert(TriggerDdl.generate("person", cols) === golden)
  }
}
