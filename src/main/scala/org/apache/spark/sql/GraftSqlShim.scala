package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column <-> Expression converters —
  * the standard technique third-party Spark libraries use to register
  * native Catalyst expressions (Spark 4 hides the Column(expr)
  * constructor behind `private[sql]` classic.ExpressionUtils).
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a hand-built logical plan (custom nodes like
    * [[graft.plans.AsofJoin]]) — `classic.Dataset.ofRows` is
    * `private[sql]` in Spark 4.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Run `f` under a THREAD-LOCAL copy of the session's SQLConf with
    * `key` set — the race-free alternative to mutating the shared
    * session conf around an optimization (`SQLConf.get`, which every
    * optimizer rule reads, consults the thread-local before the
    * session). A plan optimized inside `f` sees the flag; a query
    * planned concurrently on the SAME session from another thread
    * never does. The copy inherits every other session setting, so
    * only `key` differs from ambient behavior.
    */
  def withConfString[T](spark: SparkSession, key: String, value: String)
                       (f: => T): T = {
    val cloned = spark.sessionState.conf.clone()
    cloned.setConfString(key, value)
    internal.SQLConf.withExistingConf(cloned)(f)
  }

  /** Session clone (shared context, independent SQLConf) with the
    * given conf overrides — the race-free way to run a STREAMING query
    * under its own `spark.sql.shuffle.partitions`: a stream's
    * incremental planner reads the conf of the session that starts it,
    * so a thread-local [[withConfString]] (which only covers plan-time
    * `SQLConf.get` reads on the calling thread) cannot reach the
    * stream-execution thread. `cloneSession()` is `private[sql]` in
    * Spark 4's classic session, hence this shim.
    */
  def cloneWithConf(spark: SparkSession, kvs: (String, String)*): SparkSession = {
    val c = spark.asInstanceOf[classic.SparkSession].cloneSession()
    kvs.foreach { case (k, v) => c.conf.set(k, v) }
    c
  }

  /** Run `f` while counting Spark JOBS started on this context —
    * test-only observability for "this plan-time step launched no new
    * job" pins (e.g. the range-join width memo). Drains the listener
    * bus before reading the counter, so the count is exact.
    */
  def countJobs[T](spark: SparkSession)(f: => T): (T, Int) = {
    val sc = spark.sparkContext
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    sc.addSparkListener(l)
    try {
      val r = f
      sc.listenerBus.waitUntilEmpty(30000)
      (r, n.get())
    } finally sc.removeSparkListener(l)
  }

  /** Release the cached blocks behind a `localCheckpoint()`'d frame.
    * The checkpoint persists its materialized RDD for the session
    * lifetime; `Dataset.unpersist` cannot reach it (it only consults
    * the CacheManager), so an evicting memo must unpersist the
    * `LogicalRDD`'s underlying RDD directly or the blocks linger until
    * context shutdown. No-op for non-checkpointed plans.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Id of the persisted RDD behind a `localCheckpoint()`'d frame —
    * what a block-hygiene sweep needs to tell session-owned memo
    * blocks apart from invocation-local ones. None for plans that are
    * not checkpoint leaves.
    */
  def checkpointRddId(df: DataFrame): Option[Int] =
    df.queryExecution.logical match {
      case l: execution.LogicalRDD => Some(l.rdd.id)
      case _ => None
    }
}
