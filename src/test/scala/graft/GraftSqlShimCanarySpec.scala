package graft

import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

/** Spark-private-API CANARY. [[GraftSqlShim]] is the one file in the
  * tree allowed to touch Spark 4's `private[sql]` surface
  * (`classic.ExpressionUtils`, `classic.Dataset.ofRows`,
  * `SQLConf.withExistingConf`, `execution.LogicalRDD`) — the standard
  * third-party-library bridge, but one a Spark minor bump can break
  * silently. Each case here exercises one shim entry and fails with a
  * message NAMING the private API that moved, so an upgrade reads one
  * line instead of debugging 13 Catalyst kernels at once. Supported
  * range pinned in DIALECT.md ("Spark private-API shim").
  *
  * A bump usually breaks at COMPILE time (the shim references the
  * classes directly); these cases catch the binary-incompatibility
  * shapes that compile but fail at call time.
  */
class GraftSqlShimCanarySpec extends SparkSpec {
  import spark.implicits._

  private def canary[T](api: String)(f: => T): T =
    try f catch {
      case e: LinkageError => fail(
        s"Spark private API moved: GraftSqlShim.$api no longer links " +
          s"against Spark ${spark.version} — update GraftSqlShim.scala " +
          s"(one file) and the DIALECT.md supported-range note: $e")
    }

  test("supported Spark line: the shim is written against the Spark 4 " +
    "classic API (DIALECT.md pins the range)") {
    assert(spark.version.startsWith("4."),
      s"GraftSqlShim targets Spark 4.x private APIs; running on " +
        s"${spark.version} — re-verify every shim entry against the " +
        "new classic/Dataset/SQLConf layout before trusting this build")
  }

  test("column/expression round-trip (classic.ExpressionUtils)") {
    val c = canary("column")(GraftSqlShim.column(Literal(7)))
    assert(Seq(1).toDF("x").select(c.as("v")).as[Int].head() === 7)
    // Column -> Expression -> Column round-trip evaluates unchanged
    // (Spark 4 may wrap in a lazy ColumnNodeExpression — evaluation,
    // not tree equality, is the contract the kernels rely on)
    val e = canary("expression")(GraftSqlShim.expression(lit(3)))
    assert(Seq(1).toDF("x")
      .select(GraftSqlShim.column(e).as("v")).as[Int].head() === 3)
  }

  test("ofRows over a hand-built logical plan (classic.Dataset.ofRows)") {
    val plan = spark.range(3).toDF("id").queryExecution.logical
    val df = canary("ofRows")(GraftSqlShim.ofRows(spark, plan))
    assert(df.count() === 3L)
  }

  test("withConfString scopes a thread-local SQLConf copy " +
    "(SQLConf.withExistingConf) and restores ambient state") {
    val key = "spark.graft.canary.flag"
    val inside = canary("withConfString")(
      GraftSqlShim.withConfString(spark, key, "42") {
        org.apache.spark.sql.internal.SQLConf.get.getConfString(key, "unset")
      })
    assert(inside === "42")
    assert(org.apache.spark.sql.internal.SQLConf.get
      .getConfString(key, "unset") === "unset")
  }

  test("cloneWithConf yields an independent session conf sharing the " +
    "context (classic.SparkSession.cloneSession) — the streaming " +
    "replays size their state partitions through it") {
    val key = "spark.sql.shuffle.partitions"
    val ambient = spark.conf.get(key)
    val cloned = canary("cloneWithConf")(
      GraftSqlShim.cloneWithConf(spark, key -> "7",
        // AQE would coalesce the tiny probe shuffle below back to 1
        // partition — disable it on the CLONE only, which is itself
        // more evidence the clone's conf is independent
        "spark.sql.adaptive.enabled" -> "false"))
    assert(cloned.conf.get(key) === "7")
    assert(spark.conf.get(key) === ambient,
      "cloneWithConf leaked its override into the parent session")
    assert(cloned.sparkContext eq spark.sparkContext)
    // the override steers real plans on the clone (state partitioning
    // in the live replays rides exactly this conf)
    val shuffled = cloned.range(100).groupBy(col("id") % 3).count()
    assert(shuffled.rdd.getNumPartitions === 7)
  }

  test("countJobs listener plumbing (scheduler listener bus)") {
    val (n, jobs) = canary("countJobs")(
      GraftSqlShim.countJobs(spark)(spark.range(10).count()))
    assert(n === 10L)
    assert(jobs >= 1, s"count() started $jobs jobs")
    val (_, none) = GraftSqlShim.countJobs(spark)(())
    assert(none === 0)
  }

  test("unpersistCheckpoint reaches the LogicalRDD's cached blocks " +
    "(execution.LogicalRDD)") {
    val df = spark.range(16).toDF("id").localCheckpoint()
    val rdd = df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      case other => fail(
        "Spark private API moved: localCheckpoint no longer plans as " +
          s"execution.LogicalRDD (got ${other.getClass.getName}) — " +
          "GraftSqlShim.unpersistCheckpoint is a silent no-op now")
    }
    assert(rdd.getStorageLevel.useMemory)
    canary("unpersistCheckpoint")(GraftSqlShim.unpersistCheckpoint(df))
    assert(rdd.getStorageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }
}
