package graft

import graft.core.AuditSchema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §1.2 / §5.2: field order, audit cols last, nullability and
  * comments preserved, PK comment override, `_audit` substring pin.
  */
class AuditSchemaSpec extends AnyFunSuite {

  private val src = StructType(Seq(
    StructField("id", IntegerType, nullable = false).withComment("the key"),
    StructField("name", StringType, nullable = true),
    StructField("amount", DoubleType, nullable = true).withComment("eur")
  ))

  test("derive appends exactly the three audit fields, last, in order") {
    val a = AuditSchema.derive(src, pkColumns = Seq("id"), table = "acct")
    assert(a.fields.length === src.fields.length + 3)
    assert(a.fields.map(_.name).takeRight(3).toSeq ===
      Seq("audit_event", "audit_timestamp", "audit_pk"))
    assert(AuditSchema.isAuditSchema(a))
    assert(!AuditSchema.isAuditSchema(src))
  }

  test("source field order, types, nullability preserved") {
    val a = AuditSchema.derive(src)
    assert(a.fields.take(3).map(f => (f.name, f.dataType, f.nullable)).toSeq ===
      src.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq)
  }

  test("audit fields are not null (gen_mysql.php:331-333)") {
    assert(AuditSchema.auditFields.forall(!_.nullable))
    assert(AuditSchema.auditFields.map(_.dataType) ===
      Seq(StringType, TimestampType, LongType))
  }

  test("PK column comment overridden like the reference (gen:342-344)") {
    val a = AuditSchema.derive(src, pkColumns = Seq("id"), table = "acct")
    assert(a.fields(0).getComment().contains("Primary key in source table acct"))
    // non-PK comments untouched
    assert(a.fields(2).getComment().contains("eur"))
  }

  test("audit-table naming and SUBSTRING (not suffix) detection pin " +
    "(gen:215-218, sync:182-185; SURVEY.md §7.4.6)") {
    assert(AuditSchema.auditTableName("orders") === "orders_audit")
    assert(AuditSchema.auditTableName("orders", "x_") === "x_orders_audit")
    assert(AuditSchema.isAuditTable("orders_audit"))
    assert(AuditSchema.isAuditTable("_audit_weird_middle")) // substring!
    assert(!AuditSchema.isAuditTable("orders"))
  }

  test("sourceColumns inverts derive") {
    val a = AuditSchema.derive(src)
    assert(AuditSchema.sourceColumns(a) === Seq("id", "name", "amount"))
  }

  test("checkCompatible fails fast on drift (README.md:222 intent)") {
    val a = AuditSchema.derive(src)
    AuditSchema.checkCompatible(a, a) // no throw
    val drifted = StructType(a.fields.toSeq.patch(1,
      Seq(StructField("name", IntegerType, nullable = true)), 1))
    intercept[IllegalArgumentException] {
      AuditSchema.checkCompatible(drifted, a)
    }
  }
}
