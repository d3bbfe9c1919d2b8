package graft

import graft.codegen.JdbcCatalog
import graft.tools.GenTool
import java.sql.DriverManager

/** Live-catalog generator run against embedded Derby — the reference
  * generator's end-to-end shape (cdc_audit_gen_mysql.php:195-235):
  * enumerate base tables, read column/PK metadata, fetch pre-existing
  * AFTER trigger bodies, write `<table>.audit.sql` artifacts with the
  * user trigger logic spliced into the regenerated triggers.
  */
class GenJdbcSpec extends SparkSpec {

  private val dbDir = tmpDir("derby-gen") + "/db"
  private val url = s"jdbc:derby:$dbDir;create=true"

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  // Derby uppercases bare identifiers; quoted lowercase names keep the
  // generated DDL in the reference's lowercase table style
  withConn { c =>
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE "person" (
        |  "id" INT NOT NULL PRIMARY KEY,
        |  "name" VARCHAR(64),
        |  "bio" CLOB,
        |  "balance" DECIMAL(10,2),
        |  "created" TIMESTAMP NOT NULL)""".stripMargin)
    st.execute(
      """CREATE TABLE "pet" (
        |  "pet_id" BIGINT NOT NULL,
        |  "owner_id" INT,
        |  "tag" CHAR(8))""".stripMargin)
    // a pre-existing audit table must be SKIPPED by the _audit rule
    st.execute("""CREATE TABLE "person_audit" ("id" INT)""")
    // counters table for the user trigger's side effect
    st.execute("""CREATE TABLE "counters" ("n" INT)""")
    // a pre-existing AFTER trigger whose body must survive
    // regeneration (spliced after the audit INSERT), and a BEFORE...
    // Derby has no BEFORE row triggers with SQL bodies — NO CASCADE
    // BEFORE is DDL-restricted — so the AFTER-only filter is pinned by
    // the FIRINGTIME='A' query instead
    st.execute(
      """CREATE TRIGGER "person_touch" AFTER UPDATE ON "person"
        | FOR EACH ROW UPDATE "counters" SET "n" = "n" + 1""".stripMargin)
  }

  test("JdbcCatalog.baseTables lists base tables only; introspect " +
    "applies the _audit skip and include list") {
    withConn { c =>
      val all = JdbcCatalog.baseTables(c, Some("APP"))
      assert(all.toSet === Set("person", "pet", "person_audit", "counters"))
      val m = JdbcCatalog.introspect(c, Some("APP"))
      assert(m.keySet === Set("person", "pet", "counters"))
      val onlyPerson = JdbcCatalog.introspect(c, Some("APP"),
        include = Some(Set("person")))
      assert(onlyPerson.keySet === Set("person"))
    }
  }

  test("JdbcCatalog.columns maps JDBC types, nullability, and PK flags " +
    "from the live catalog") {
    withConn { c =>
      val cols = JdbcCatalog.columns(c, "person", Some("APP"))
      assert(cols.map(_.name) ===
        Seq("id", "name", "bio", "balance", "created"))
      val byName = cols.map(col => col.name -> col).toMap
      assert(byName("id").mysqlType === "int(11)")
      assert(byName("id").isPrimaryKey)
      assert(!byName("id").nullable)
      assert(byName("name").mysqlType === "varchar(64)")
      assert(byName("name").nullable)
      assert(byName("bio").mysqlType === "text")
      assert(byName("balance").mysqlType === "decimal(10,2)")
      assert(byName("created").mysqlType === "timestamp")
      assert(!byName("created").isPrimaryKey)
      val pet = JdbcCatalog.columns(c, "pet", Some("APP"))
      val petBy = pet.map(col => col.name -> col).toMap
      assert(petBy("pet_id").mysqlType === "bigint")
      assert(petBy("tag").mysqlType === "char(8)")
      assert(pet.forall(!_.isPrimaryKey)) // no PK declared on pet
    }
  }

  test("JdbcCatalog.afterTriggers fetches Derby AFTER trigger bodies " +
    "with normalized event names") {
    withConn { c =>
      val trigs = JdbcCatalog.afterTriggers(c, "person", Some("APP"))
      assert(trigs.map(_.name) === Seq("person_touch"))
      assert(trigs.head.event === "UPDATE")
      assert(trigs.head.statement.toUpperCase.contains("COUNTERS"))
      assert(JdbcCatalog.afterTriggers(c, "pet", Some("APP")).isEmpty)
    }
  }

  test("GenTool --jdbc generates artifacts from the live catalog " +
    "end-to-end: include list respected, _audit skipped, PK index " +
    "emitted, existing trigger body spliced and dropped") {
    val out = tmpDir("gen-jdbc-out")
    GenTool.main(Array("--jdbc", url, "-m", out,
      "--jdbc-schema", "APP", "-t", "person,pet", "-v", "0"))
    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(files.toSeq === Seq("person.audit.sql", "pet.audit.sql"))
    val person = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "person.audit.sql"))
    // audit table: source columns + the three audit columns
    assert(person.contains("create table if not exists `person_audit`"))
    assert(person.contains("`id` int(11) not null"))
    assert(person.contains("`balance` decimal(10,2) null"))
    assert(person.contains("`audit_pk` int(11) not null primary key auto_increment"))
    // PK from the live catalog: comment override + secondary index
    assert(person.contains("Primary key in source table person"))
    assert(person.contains("index (`id`)"))
    // three AFTER triggers with the right images
    assert(person.contains("CREATE TRIGGER `person_after_insert` AFTER INSERT"))
    assert(person.contains("NEW.`id`"))
    assert(person.contains("CREATE TRIGGER `person_after_delete` AFTER DELETE"))
    assert(person.contains("OLD.`id`"))
    // the pre-existing trigger: dropped by name, body spliced into the
    // regenerated UPDATE trigger after the audit INSERT
    assert(person.contains("DROP TRIGGER IF EXISTS `person_touch`"))
    val updateIdx = person.indexOf("`person_after_update`")
    // Derby stores the definition schema-qualified: "APP"."counters"
    val spliceIdx = person.indexOf("\"counters\" SET \"n\" = \"n\" + 1")
    assert(updateIdx >= 0 && spliceIdx > updateIdx,
      "user trigger body must be spliced inside the regenerated UPDATE trigger")
    val insertBlock = person.substring(
      person.indexOf("`person_after_insert`"), updateIdx)
    assert(!insertBlock.contains("counters"),
      "an UPDATE trigger's body must not leak into the INSERT trigger")
    // pet had no existing triggers: no DROP except none
    val pet = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "pet.audit.sql"))
    assert(!pet.contains("DROP TRIGGER"))
    assert(pet.contains("create table if not exists `pet_audit`"))
  }

  test("GenTool --jdbc --dialect postgres targets the PG generator " +
    "from the same live catalog (cross-dialect: introspect Derby, " +
    "emit plpgsql)") {
    val out = tmpDir("gen-jdbc-pg")
    GenTool.main(Array("--jdbc", url, "-m", out,
      "--jdbc-schema", "APP", "-t", "pet", "--dialect", "postgres", "-v", "0"))
    val pet = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "pet.audit.sql"))
    // PG forms, not MySQL: quoted idents, plpgsql capture function,
    // TG_OP dispatch, bigserial/ enum-free types
    assert(pet.contains("\"pet_audit\""))
    assert(pet.toLowerCase.contains("language plpgsql"))
    assert(pet.contains("TG_OP"))
    assert(!pet.contains("`"), "MySQL backticks must not leak into PG DDL")
    // the live-catalog types survived the dialect mapping
    assert(pet.toLowerCase.contains("bigint"))
    // unknown dialect fails fast
    val e = intercept[RuntimeException](GenTool.main(Array("--jdbc", url,
      "-m", out, "--jdbc-schema", "APP", "--dialect", "oracle", "-v", "0")))
    assert(e.getMessage.contains("unknown --dialect"))
  }
}
