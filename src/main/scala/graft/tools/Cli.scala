package graft.tools

import graft.codegen.{AuditArtifacts, TriggerDdl}
import graft.core.SyncJob
import graft.sources.AuditSource
import org.apache.spark.sql.SparkSession

/** CLI twins of the reference's two entry points (SURVEY.md §2.11):
  * `cdc_audit_gen_mysql.php` -> [[GenTool]],
  * `cdc_audit_sync_mysql.php` -> [[SyncTool]]. Flag names follow the
  * reference where they transfer (`-t` include list, `-o` output,
  * `-w` wipe, cdc_audit_gen_mysql.php:54-89 / sync:55-91); connection
  * flags (-d/-h/-u/-p) are replaced by data paths, since sources here
  * are parquet directories (JDBC constructors live in
  * [[graft.sources.AuditSource]]).
  */
object Cli {
  def parse(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap

  /** (session, ownedByUs): only stop sessions this process created —
    * under tests getOrCreate returns the suite's shared session.
    */
  private[tools] def session(): (SparkSession, Boolean) = {
    val preexisting = SparkSession.getDefaultSession.isDefined
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    (s, !preexisting)
  }

  def include(opts: Map[String, String]): Option[Set[String]] =
    opts.get("-t").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
}

/** Generate per-table audit DDL + trigger SQL artifacts from parquet
  * schemas. Usage:
  * `runMain graft.tools.GenTool --data <dir-of-parquet> -o <outDir>
  *  [-t tbl1,tbl2] [--prefix p_]`
  */
object GenTool {
  def main(args: Array[String]): Unit = {
    val opts = Cli.parse(args)
    val data = opts("--data")
    val out  = opts("-o")
    val prefix = opts.getOrElse("--prefix", "")
    val (spark, owned) = Cli.session()
    try {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val tables = fs.listStatus(new org.apache.hadoop.fs.Path(data))
        .map(_.getPath.getName).filter(_.endsWith(".parquet"))
        .map(_.stripSuffix(".parquet")).sorted
      val metas = tables.map { t =>
        val schema = spark.read.parquet(s"$data/$t.parquet").schema
        t -> TriggerDdl.fromStructType(schema)
      }.toMap
      val written = AuditArtifacts.generateAll(out, metas, Cli.include(opts), prefix)
      written.foreach(p => println(s"[gen] wrote $p"))
    } finally if (owned) spark.stop()
  }
}

/** Incrementally sync parquet audit-log directories to CSV sinks.
  * Usage:
  * `runMain graft.tools.SyncTool --logs <root> --sink <root>
  *  [-t tbl1,tbl2] [-w true]`
  * Log layout: parquet files under `<logs>/<table>_audit/`
  * (discovered by the `_audit` substring rule, P4).
  */
object SyncTool {
  def main(args: Array[String]): Unit = {
    val opts = Cli.parse(args)
    val logsRoot = opts("--logs")
    val sinkRoot = opts("--sink")
    val wipe = opts.get("-w").exists(_.toBoolean)
    val inc = Cli.include(opts)
    val (spark, owned) = Cli.session()
    try {
      val tables = AuditSource.discoverAuditDirs(spark, logsRoot)
        .filter(t => inc.forall(_.contains(t)))
      tables.foreach { t =>
        val logDir = s"$logsRoot/$t"
        val sink   = s"$sinkRoot/$t"
        if (wipe) {
          val (d, r) = SyncJob.syncAndWipe(spark, logDir, sink)
          println(s"[sync] $t: delivered $d rows, wiped to $r")
        } else {
          val d = SyncJob.syncTable(spark, spark.read.parquet(logDir), sink)
          println(s"[sync] $t: delivered $d rows")
        }
      }
    } finally if (owned) spark.stop()
  }
}
