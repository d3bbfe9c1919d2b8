package graft.codegen

import java.sql.{Connection, DatabaseMetaData, Types}

/** Live-database catalog introspection for the generator — the
  * Spark-side twin of the reference generator's MySQL session
  * (cdc_audit_gen_mysql.php:195-235): `SHOW FULL TABLES WHERE
  * Table_type = 'BASE TABLE'` (:205), the INFORMATION_SCHEMA.COLUMNS
  * pull (:222) and the AFTER-trigger fetch from
  * INFORMATION_SCHEMA.TRIGGERS (:230-235). Instead of hand-written
  * MySQL queries, enumeration goes through [[java.sql.DatabaseMetaData]]
  * — the portable JDBC catalog API, so the same generator runs against
  * MySQL, Derby, Postgres, ... with one code path. Only the TRIGGER
  * BODY fetch is dialect-specific (JDBC has no standard trigger API);
  * known dialects are handled below and unknown ones degrade to
  * "no pre-existing triggers" with the caller warned, never to a crash.
  *
  * Everything here is driver-side JDBC (bounded: one row per
  * table/column/trigger of one schema — catalog cardinality, not data
  * cardinality), exactly like the reference's generator connection;
  * the DATA path stays in Spark ([[graft.sources.AuditSource]]).
  */
object JdbcCatalog {

  /** The MySQL/MariaDB AFTER-trigger catalog query, verbatim — the
    * one live-catalog statement no embedded database can execute in
    * tests (Derby exercises its own branch), so it is pinned as a
    * GOLDEN STRING in `JdbcCatalogSpec` against drift. Clause map to
    * the reference (cdc_audit_gen_mysql.php:230-235):
    *   - `TRIGGER_NAME, EVENT_MANIPULATION, ACTION_STATEMENT` — the
    *     reference SELECTs exactly these three (:231);
    *   - `from INFORMATION_SCHEMA.TRIGGERS` — same catalog view (:230);
    *   - `EVENT_OBJECT_TABLE = ?` — the reference's per-table bind
    *     (:232, its `:table` parameter);
    *   - `ACTION_TIMING = 'AFTER'` — the reference captures and
    *     re-splices AFTER triggers only (:233); BEFORE triggers are
    *     left untouched by regeneration.
    */
  val MySqlTriggerSql: String =
    "select TRIGGER_NAME, EVENT_MANIPULATION, ACTION_STATEMENT " +
      "from INFORMATION_SCHEMA.TRIGGERS " +
      "where EVENT_OBJECT_TABLE = ? and ACTION_TIMING = 'AFTER'"

  /** Base tables of the connection's current catalog/schema —
    * `getTables(..., types = TABLE)` is the portable form of the
    * reference's `SHOW FULL TABLES WHERE Table_type = 'BASE TABLE'`
    * (cdc_audit_gen_mysql.php:205). Views, synonyms and system tables
    * are excluded by the type filter, audit tables are NOT filtered
    * here — [[TriggerDdl.selectSourceTables]] owns that rule (P2/P3).
    */
  def baseTables(conn: Connection, schema: Option[String] = None): Seq[String] = {
    val md = conn.getMetaData
    val rs = md.getTables(conn.getCatalog, schema.orNull, "%", Array("TABLE"))
    val out = Seq.newBuilder[String]
    try while (rs.next()) out += rs.getString("TABLE_NAME")
    finally rs.close()
    out.result().sorted
  }

  /** Map a JDBC catalog column description to the MySQL type string
    * [[ColumnMeta]] carries — same conservative mapping discipline as
    * [[TriggerDdl.fromStructType]], but from `java.sql.Types` codes
    * (what `DatabaseMetaData.getColumns` reports) instead of Spark
    * types. Unknown codes fall back to the driver's own TYPE_NAME
    * lowercased, so an exotic column still generates *something*
    * reviewable rather than failing the whole table.
    */
  def sqlTypeToMysql(jdbcType: Int, typeName: String,
                     size: Int, scale: Int): String = jdbcType match {
    case Types.TINYINT                     => "tinyint"
    case Types.SMALLINT                    => "smallint"
    case Types.INTEGER                     => "int(11)"
    case Types.BIGINT                      => "bigint"
    case Types.REAL                        => "float"
    case Types.FLOAT | Types.DOUBLE        => "double"
    case Types.DECIMAL | Types.NUMERIC     => s"decimal($size,$scale)"
    case Types.BIT | Types.BOOLEAN         => "tinyint(1)"
    case Types.DATE                        => "date"
    case Types.TIME                        => "time"
    case Types.TIMESTAMP                   => "timestamp"
    case Types.TIMESTAMP_WITH_TIMEZONE     => "timestamp"
    case Types.CHAR | Types.NCHAR          => s"char($size)"
    // MySQL caps VARCHAR rows at 65535 bytes; oversized declared
    // lengths (Derby LONG VARCHAR reports as VARCHAR(32700)) map to
    // text like the reference schema's own unbounded strings
    case Types.VARCHAR | Types.NVARCHAR if size > 0 && size <= 16383 =>
      s"varchar($size)"
    case Types.VARCHAR | Types.NVARCHAR |
         Types.LONGVARCHAR | Types.CLOB    => "text"
    case Types.BINARY | Types.VARBINARY |
         Types.LONGVARBINARY | Types.BLOB  => "blob"
    case _                                 => typeName.toLowerCase
  }

  /** One table's column metadata, ordinal-ordered, with primary-key
    * flags from `getPrimaryKeys` and comments from REMARKS — the
    * portable equivalent of the reference's INFORMATION_SCHEMA.COLUMNS
    * row (Field/Type/Null/Key/Comment, cdc_audit_gen_mysql.php:222).
    */
  def columns(conn: Connection, table: String,
              schema: Option[String] = None): Seq[ColumnMeta] = {
    val md = conn.getMetaData
    val pks: Set[String] = {
      val rs = md.getPrimaryKeys(conn.getCatalog, schema.orNull, table)
      val b = Set.newBuilder[String]
      try while (rs.next()) b += rs.getString("COLUMN_NAME")
      finally rs.close()
      b.result()
    }
    val rs = md.getColumns(conn.getCatalog, schema.orNull, table, "%")
    val out = Seq.newBuilder[(Int, ColumnMeta)]
    try while (rs.next()) {
      val name = rs.getString("COLUMN_NAME")
      val t = sqlTypeToMysql(rs.getInt("DATA_TYPE"), rs.getString("TYPE_NAME"),
        rs.getInt("COLUMN_SIZE"), rs.getInt("DECIMAL_DIGITS"))
      val nullable =
        rs.getInt("NULLABLE") != DatabaseMetaData.columnNoNulls
      val comment = Option(rs.getString("REMARKS")).getOrElse("")
      out += rs.getInt("ORDINAL_POSITION") ->
        ColumnMeta(name, t, nullable, pks.contains(name), comment)
    } finally rs.close()
    out.result().sortBy(_._1).map(_._2)
  }

  /** Pre-existing AFTER triggers on a table — the dialect-specific
    * half (JDBC standardizes tables/columns/keys but not triggers).
    * Mirrors the reference's `ACTION_TIMING = 'AFTER'` filter
    * (cdc_audit_gen_mysql.php:230-235): BEFORE triggers are not
    * captured and not re-emitted, so regeneration leaves them alone.
    * Unknown dialects return empty — generation proceeds, existing
    * trigger logic is simply not spliced (the caller logs this).
    */
  def afterTriggers(conn: Connection, table: String,
                    schema: Option[String] = None): Seq[TriggerMeta] = {
    val product = conn.getMetaData.getDatabaseProductName.toLowerCase
    if (product.contains("mysql") || product.contains("mariadb"))
      queryTriggers(conn, JdbcCatalog.MySqlTriggerSql, table, identity)
    else if (product.contains("derby"))
      // Derby: SYS.SYSTRIGGERS joined to SYSTABLES; FIRINGTIME 'A' =
      // AFTER, EVENT is one of I/U/D; TRIGGERDEFINITION holds the
      // action statement (the FOR-EACH-ROW body), same shape as
      // MySQL's ACTION_STATEMENT
      queryTriggers(conn,
        "select t.TRIGGERNAME, t.EVENT, t.TRIGGERDEFINITION " +
          "from SYS.SYSTRIGGERS t join SYS.SYSTABLES tb " +
          "on t.TABLEID = tb.TABLEID " +
          "where tb.TABLENAME = ? and t.FIRINGTIME = 'A'",
        table, {
          case "I" => "INSERT"
          case "U" => "UPDATE"
          case "D" => "DELETE"
          case other => other
        })
    else if (product.contains("postgres"))
      // information_schema.triggers is SQL-standard; Postgres
      // implements it (MySQL's query transfers nearly verbatim)
      queryTriggers(conn,
        "select trigger_name, event_manipulation, action_statement " +
          "from information_schema.triggers " +
          "where event_object_table = ? and action_timing = 'AFTER'",
        table, identity)
    else Seq.empty
  }

  private def queryTriggers(conn: Connection, sql: String, table: String,
                            eventOf: String => String): Seq[TriggerMeta] = {
    val ps = conn.prepareStatement(sql)
    try {
      ps.setString(1, table)
      val rs = ps.executeQuery()
      val out = Seq.newBuilder[TriggerMeta]
      try while (rs.next())
        out += TriggerMeta(rs.getString(1), eventOf(rs.getString(2)),
          Option(rs.getString(3)).getOrElse(""))
      finally rs.close()
      out.result()
    } finally ps.close()
  }

  /** Full generator-input introspection: every base table (include
    * list and `_audit` skip applied via
    * [[TriggerDdl.selectSourceTables]], matching
    * cdc_audit_gen_mysql.php:210-218) with its columns and existing
    * AFTER triggers.
    */
  def introspect(conn: Connection, schema: Option[String] = None,
                 include: Option[Set[String]] = None)
      : Map[String, (Seq[ColumnMeta], Seq[TriggerMeta])] =
    TriggerDdl.selectSourceTables(baseTables(conn, schema), include)
      .map(t => t -> (columns(conn, t, schema), afterTriggers(conn, t, schema)))
      .toMap
}
