package graft

import graft.codegen.{ColumnMeta, PostgresDdl}
import org.scalatest.funsuite.AnyFunSuite

/** Golden-text tests for the PostgreSQL dialect generator — same
  * artifact shape as the MySQL twin (TriggerDdlSpec), PG syntax.
  */
class PostgresDdlSpec extends AnyFunSuite {

  private val cols = Seq(
    ColumnMeta("id", "int(11)", nullable = false, isPrimaryKey = true),
    ColumnMeta("name", "varchar(64)", nullable = true, comment = "person's name"),
    ColumnMeta("score", "double", nullable = true),
    ColumnMeta("flag", "tinyint(1)", nullable = true),
    ColumnMeta("payload", "blob", nullable = true),
    ColumnMeta("kind", "enum('a','b')", nullable = true),
    ColumnMeta("amount", "decimal(12,2)", nullable = true)
  )

  test("type translation: the generator's MySQL vocabulary maps to PG, " +
    "ANSI names pass through") {
    assert(PostgresDdl.pgType("int(11)") === "integer")
    assert(PostgresDdl.pgType("tinyint(1)") === "boolean")
    assert(PostgresDdl.pgType("tinyint") === "smallint")
    assert(PostgresDdl.pgType("double") === "double precision")
    assert(PostgresDdl.pgType("float") === "real")
    assert(PostgresDdl.pgType("blob") === "bytea")
    assert(PostgresDdl.pgType("datetime") === "timestamp")
    assert(PostgresDdl.pgType("decimal(12,2)") === "numeric(12,2)")
    assert(PostgresDdl.pgType("enum('a','b')") === "text")
    assert(PostgresDdl.pgType("varchar(64)") === "varchar(64)")
    assert(PostgresDdl.pgType("date") === "date")
  }

  test("audit table DDL: quoted idents, bigserial pk, event CHECK, " +
    "comments as statements, pk + timestamp indexes") {
    val ddl = PostgresDdl.auditTableDdl("person", cols)
    assert(ddl.contains("create table if not exists \"person_audit\""))
    assert(ddl.contains("\"id\" integer not null"))
    assert(ddl.contains("\"name\" varchar(64) null"))
    assert(ddl.contains("\"score\" double precision null"))
    assert(ddl.contains("\"flag\" boolean null"))
    assert(ddl.contains("\"payload\" bytea null"))
    assert(ddl.contains("\"kind\" text null"))
    assert(ddl.contains("\"amount\" numeric(12,2) null"))
    assert(ddl.contains(
      "\"audit_event\" text not null check (\"audit_event\" in ('insert','update','delete'))"))
    assert(ddl.contains("\"audit_pk\" bigserial primary key"))
    assert(ddl.contains(
      "comment on column \"person_audit\".\"id\" is 'Primary key in source table person';"))
    assert(ddl.contains(
      "comment on column \"person_audit\".\"name\" is 'person''s name';"))
    assert(ddl.contains(
      "create index if not exists \"person_audit_pk_idx\" on \"person_audit\" (\"id\");"))
    assert(ddl.contains(
      "create index if not exists \"person_audit_ts_idx\" on \"person_audit\" (\"audit_timestamp\");"))
    // audit columns come after all source columns
    assert(ddl.indexOf("\"amount\"") < ddl.indexOf("\"audit_event\""))
  }

  test("trigger DDL: one TG_OP-dispatching plpgsql function, OLD image " +
    "on delete, NEW on insert/update, dollar-quoted body, idempotent " +
    "trigger swap") {
    val ddl = PostgresDdl.triggerDdl("person", cols)
    assert(ddl.contains(
      "create or replace function \"person_audit_fn\"() returns trigger"))
    assert(ddl.contains("language plpgsql as $$"))
    assert(ddl.contains("if (TG_OP = 'DELETE') then"))
    assert(ddl.contains("values (OLD.\"id\", OLD.\"name\""))
    assert(ddl.contains("'delete', CURRENT_TIMESTAMP"))
    assert(ddl.contains("values (NEW.\"id\""))
    assert(ddl.contains("'update', CURRENT_TIMESTAMP"))
    assert(ddl.contains("'insert', CURRENT_TIMESTAMP"))
    assert(ddl.contains("drop trigger if exists \"person_audit_trg\" on \"person\";"))
    assert(ddl.contains("after insert or update or delete on \"person\""))
    assert(ddl.contains("for each row execute function \"person_audit_fn\"();"))
    // the dollar-quoted body closes
    assert("\\$\\$".r.findAllIn(ddl).length === 2)
  }

  test("generate = table DDL then trigger DDL (the per-table artifact)") {
    val all = PostgresDdl.generate("person", cols)
    assert(all.indexOf("create table") < all.indexOf("returns trigger"))
  }
}
