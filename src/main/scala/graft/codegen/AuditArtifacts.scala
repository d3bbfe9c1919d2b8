package graft.codegen

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** File-artifact side of the generator — the reference's output-dir
  * handling (SURVEY.md §2.1 S8-S10):
  *
  *  - S10 dir bootstrap: create the output dir if missing
  *    (cdc_audit_gen_mysql.php:268-278)
  *  - S9 stale cleanup: delete prior `*.audit.sql` files before
  *    regeneration (cdc_audit_gen_mysql.php:173-189). The reference has
  *    an include-list guard bug there (it compares the path PREFIX, not
  *    the table name, so with `-t` set nothing is ever deleted —
  *    SURVEY.md §7.4.6); we implement the intent: with an include list,
  *    only the included tables' files are deleted.
  *  - S8 SQL-file sink: write `<prefix><table>.audit.sql`, DDL first,
  *    triggers appended (cdc_audit_gen_mysql.php:376-382,522-528).
  */
object AuditArtifacts {

  /** Create the output dir if missing; error if it exists as a file. */
  def ensureDir(outDir: String): Path = {
    val p = Paths.get(outDir)
    if (Files.exists(p) && !Files.isDirectory(p))
      sys.error(s"output path exists and is not a directory: $outDir")
    Files.createDirectories(p)
  }

  /** Delete stale `*.audit.sql` artifacts. With an include list, only
    * files belonging to included tables are removed (the reference's
    * documented INTENT; its prefix-compare bug is not replicated).
    */
  def cleanStale(outDir: String, include: Option[Set[String]] = None,
                 prefix: String = ""): Seq[String] = {
    val dir = Paths.get(outDir)
    if (!Files.isDirectory(dir)) return Nil
    val deleted = Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".audit.sql"))
      .filter { p =>
        val fn = p.getFileName.toString
        val table = fn.stripPrefix(prefix).stripSuffix(".audit.sql")
        include.forall(_.contains(table))
      }
      .toList
    deleted.foreach(Files.delete)
    deleted.map(_.getFileName.toString)
  }

  /** Artifact renderer for a target dialect — what `--dialect` selects.
    * MySQL is the reference dialect and the only one whose triggers
    * carry a pre-existing-body SPLICE (the reference semantic is
    * MySQL's INFORMATION_SCHEMA shape); the Postgres/SQLite generators
    * emit their native trigger forms and a caller holding live trigger
    * bodies is warned they do not transfer (the renderer ignores them).
    */
  def rendererFor(dialect: String)
      : (String, Seq[ColumnMeta], Seq[TriggerMeta], String) => String =
    dialect.toLowerCase match {
      case "mysql" =>
        (t, c, ex, p) => TriggerDdl.generate(t, c, ex, p)
      case "postgres" | "postgresql" =>
        (t, c, _, p) => PostgresDdl.generate(t, c, p)
      case "sqlite" =>
        (t, c, _, p) => SqliteDdl.generate(t, c, p)
      case other => sys.error(
        s"unknown --dialect '$other' (mysql, postgres, sqlite)")
    }

  /** Write one table's full artifact (DDL + triggers), returning the
    * file path. Overwrites: regeneration is idempotent by construction
    * (the output is a pure function of the schema).
    */
  def writeTable(outDir: String, table: String, cols: Seq[ColumnMeta],
                 existing: Seq[TriggerMeta] = Nil,
                 prefix: String = "",
                 render: (String, Seq[ColumnMeta], Seq[TriggerMeta], String) => String =
                   (t, c, ex, p) => TriggerDdl.generate(t, c, ex, p)): Path = {
    ensureDir(outDir)
    val file = Paths.get(outDir, TriggerDdl.auditSqlFileName(table, prefix))
    Files.writeString(file, render(table, cols, existing, prefix))
    file
  }

  /** Full generator run over a table set: bootstrap, clean, write —
    * entry point 1 of the reference (SURVEY.md §3), minus the MySQL
    * connection (schemas come from the caller).
    */
  def generateAll(outDir: String,
                  tables: Map[String, Seq[ColumnMeta]],
                  include: Option[Set[String]] = None,
                  prefix: String = "",
                  dialect: String = "mysql"): Seq[Path] = {
    generateAllWithTriggers(outDir,
      tables.map { case (t, cols) => t -> (cols, Seq.empty[TriggerMeta]) },
      include, prefix, dialect)
  }

  /** [[generateAll]] for a live-catalog run ([[JdbcCatalog.introspect]]):
    * each table carries its pre-existing AFTER triggers, whose bodies
    * are spliced into the regenerated ones (gen:443-475 semantics via
    * [[TriggerDdl.spliceBody]]) and whose names get DROP IF EXISTS.
    */
  def generateAllWithTriggers(outDir: String,
                  tables: Map[String, (Seq[ColumnMeta], Seq[TriggerMeta])],
                  include: Option[Set[String]] = None,
                  prefix: String = "",
                  dialect: String = "mysql"): Seq[Path] = {
    ensureDir(outDir)
    cleanStale(outDir, include, prefix)
    val render = rendererFor(dialect)
    val selected = TriggerDdl.selectSourceTables(tables.keys.toSeq.sorted, include)
    selected.map { t =>
      val (cols, trigs) = tables(t)
      writeTable(outDir, t, cols, trigs, prefix, render)
    }
  }
}
