package graft.queries

import graft.Tables
import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-verifiable queries exercising the CDC core (SURVEY.md §2).
  * Every query here has a DuckDB oracle in [[CdcQueries.oracle]]; the
  * pair must produce identical values under the driver's
  * sort-columns-then-hash compare, so:
  *   - all aggregates are aliased identically on both sides
  *   - double arithmetic is either per-row (bit-identical in any
  *     engine) or routed through exact decimal casts before summing
  *   - nondeterministic audit_timestamp is never part of the output
  *     (SURVEY.md §7.4.5)
  */
object CdcQueries {

  /** Non-timestamp event columns (ns-timestamp representation across
    * engines is the one avoidable parity risk).
    */
  private val eventCols = Seq("event_id", "user_id", "event_type", "value", "props")

  /** Audit-log projection of a source table: the "initial load" —
    * every row becomes an `insert` event with a dense audit_pk
    * (AuditSchema + AuditSeq; SURVEY.md §2.2 P9).
    */
  def auditLog(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.customer(s, dir)
    val tagged = src.withColumn(AuditSchema.EventCol, lit("insert"))
    AuditSeq.assign(tagged, Seq(col("c_custkey")))
  }

  /** Snapshot-diff change capture over orders (SURVEY.md §2.9, §7.2):
    * old = orders minus keys divisible by 97; new = orders minus keys
    * divisible by 89, with totalprice bumped by +10.0 on keys divisible
    * by 7. Full-outer-join classification into I/U/D with the
    * reference's image rules.
    */
  def captureDiff(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val oldSnap = base.filter(col("o_orderkey") % 97 =!= 0)
    val newSnap = base.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
    CaptureDiff.capture(oldSnap, newSnap, Seq("o_orderkey"))
      .drop(AuditSchema.TimestampCol)
  }

  /** Snapshot-diff capture WITH update/delete pre-images (`old_*`
    * columns) — the extension closing the reference's update-history
    * gap (SURVEY.md §7.4.2). Same snapshot pair as q_capture_diff.
    */
  def capturePreImage(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val oldSnap = base.filter(col("o_orderkey") % 97 =!= 0)
    val newSnap = base.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
    CaptureDiff.classifyWithPreImages(oldSnap, newSnap, Seq("o_orderkey"))
      .orderBy("o_orderkey", "audit_event")
  }

  /** Schema-evolution capture ([[CaptureDiff.captureEvolved]]): the
    * new snapshot carries a column the old one lacks (ALTER TABLE ADD
    * between snapshots), backfilled only on keys divisible by 11 — so
    * the diff shows exactly the backfilled rows as updates alongside
    * the usual I/U/D set, and pre-ALTER rows stay suppressed. The
    * reference's README:224 wish, done by schema alignment.
    */
  def captureEvolve(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val oldSnap = base.filter(col("o_orderkey") % 97 =!= 0)
    val newSnap = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        when(col("o_orderkey") % 11 === 0, col("o_orderpriority"))
          .as("o_orderpriority"))
      .filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
    CaptureDiff.captureEvolved(oldSnap, newSnap, Seq("o_orderkey"))
      .drop(AuditSchema.TimestampCol)
      .orderBy("audit_pk")
  }

  /** Three-way merge capture ([[CaptureDiff.threeWayMerge]]): two
    * writers diverge from the base snapshot — ours bumps price on
    * keys %7 and deletes %41; theirs bumps price on %13, flips status
    * on %5, deletes %43 — so the fixture covers one-side edits,
    * disjoint-column merges (%35), column conflicts (%91),
    * delete-vs-edit conflicts, and clean deletes, all hash-gated.
    */
  def threeWayQ(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 97 =!= 0)
    val ours = base.filter(col("o_orderkey") % 41 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
    val theirs = base.filter(col("o_orderkey") % 43 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 20.0)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 5 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
    CaptureDiff.threeWayMerge(base, ours, theirs, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** Incremental view maintenance from the change events alone
    * ([[Ivm]]): the per-custkey (order count, total price) view,
    * maintained from the q_capture_preimage event batch as an
    * O(changes) upsert/delete instruction set — the oracle recomputes
    * both snapshot aggregates wholesale and diffs them, so a wrong
    * retraction, a missed pre-image, or an inexact money sum all
    * break the hash. Money math runs in DECIMAL(12,2) casts per
    * event/row on both sides (never summed as double).
    */
  def incrAgg(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val oldSnap = base.filter(col("o_orderkey") % 97 =!= 0)
    val newSnap = base.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
    val events =
      CaptureDiff.classifyWithPreImages(oldSnap, newSnap, Seq("o_orderkey"))
    val view = oldSnap.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      sum(col("o_totalprice").cast("decimal(12,2)")).as("sum_price"))
    // maintain() consumes delta TWICE (broadcast semi probe + the
    // full-outer merge), and delta's lineage carries the full-outer
    // snapshot-classify join — without a barrier that join ran twice
    // (5 orders scans in the before-plan, see plans/r15). The delta
    // is touched-keys-sized, so the checkpoint is small by design.
    val delta = Ivm.viewDelta(events, "o_custkey", "o_totalprice")
      .localCheckpoint()
    Ivm.maintain(view, delta, "o_custkey", sumCol = "sum_price",
        cntCol = "n_orders")
      // exact decimal all the way; DOUBLE only at the output edge
      // (the q1 pattern — see oracle side)
      .select(col("o_custkey"), col("n_orders"),
        col("sum_price").cast("double").as("sum_price"), col("op"))
      .orderBy("o_custkey")
  }

  /** Audit-log integrity audit ([[Profile.logIntegrity]]) over a
    * deliberately corrupted sequence — events %101 double-delivered,
    * events %103 lost — so the duplicate and gap counters both fire
    * and the healthy flag goes false, all hash-gated.
    */
  def logIntegrityQ(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("event_id")
    val corrupted = ev.filter(col("event_id") % 103 =!= 0)
      .unionByName(ev.filter(col("event_id") % 101 === 0 &&
        col("event_id") % 103 =!= 0))
    graft.ops.Profile.logIntegrity(corrupted, "event_id")
  }

  /** Watermark incremental read (S5/P6): events above max(pk)/2,
    * with the watermark computed as a broadcast scalar join (no
    * driver-side collect).
    */
  def syncWatermark(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(eventCols.map(col): _*)
    val wm = ev.agg((max(col("event_id")) / 2).as("__wm"))
    ev.join(broadcast(wm), col("event_id") > col("__wm")).drop("__wm")
      .orderBy("event_id")
  }

  /** Wipe probe (A1): count/min/max of the sequence column. */
  def aggProbe(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(
      count(col("event_id")).as("n_events"),
      min(col("event_id")).as("min_pk"),
      max(col("event_id")).as("max_pk"))

  /** Keep-last retention, global top-1 by pk (W1). */
  def keepLast(s: SparkSession, dir: String): DataFrame =
    Retention.keepLastGlobal(
      Tables.events(s, dir).select(eventCols.map(col): _*), "event_id")

  /** Per-key latest-state materialization (SURVEY.md §2.4 ext). */
  def latestState(s: SparkSession, dir: String): DataFrame =
    Retention.keepLastPerKey(
      Tables.events(s, dir).select(eventCols.map(col): _*),
      Seq("user_id"), "event_id")
      .orderBy("user_id")

  /** Replay the event log into current state, reading `error` events as
    * deletes (audit-log fold, SURVEY.md §5.3 property as a query).
    */
  def replay(s: SparkSession, dir: String): DataFrame = {
    val log = Tables.events(s, dir).select(
      col("user_id"), col("value"), col("props"),
      when(col("event_type") === "error", lit("delete"))
        .otherwise(lit("update")).as(AuditSchema.EventCol),
      col("ts").as(AuditSchema.TimestampCol),
      col("event_id").as(AuditSchema.PkCol))
    Replay.toState(log, Seq("user_id")).orderBy("user_id")
  }

  /** SCD Type-2 interval history of the event-log fold
    * ([[Replay.scd2]]): one row per version of each user with its
    * validity interval in sequence space — `error` events read as
    * deletes close the open version without opening one.
    */
  def scdHistory(s: SparkSession, dir: String): DataFrame = {
    val log = Tables.events(s, dir).select(
      col("user_id"), col("value"), col("props"),
      when(col("event_type") === "error", lit("delete"))
        .otherwise(lit("update")).as(AuditSchema.EventCol),
      col("ts").as(AuditSchema.TimestampCol),
      col("event_id").as(AuditSchema.PkCol))
    Replay.scd2(log, Seq("user_id")).orderBy("user_id", "version")
  }

  /** Time travel (README.md:29-41): state of the event-log fold as of
    * the log's midpoint sequence number — half the history replayed,
    * the rest pruned at the scan.
    */
  def stateAsOf(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val log = ev.select(
      col("user_id"), col("value"), col("props"),
      when(col("event_type") === "error", lit("delete"))
        .otherwise(lit("update")).as(AuditSchema.EventCol),
      col("ts").as(AuditSchema.TimestampCol),
      col("event_id").as(AuditSchema.PkCol))
    // explicit floor: Spark's double->long cast truncates but DuckDB's
    // CAST rounds — floor() makes both sides identical on odd maxima
    val mid = ev.agg(floor(max(col("event_id")) / 2).cast("long")).head().getLong(0)
    Replay.stateAsOf(log, Seq("user_id"), mid).orderBy("user_id")
  }

  /** Per-key wipe statistics: what a per-key retention pass would
    * delete vs keep (W1 per-key variant).
    */
  def retentionWipe(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg((count(lit(1)) - 1).as("n_wiped"), max(col("event_id")).as("kept_pk"))
      .orderBy("user_id")

  /** Age-based retention ([[Retention.keepYoungerThan]] — the
    * reference wipe's own @TODO, sync:289): keep the trailing 7 days
    * of the log BY ITS OWN newest timestamp (deterministic, no wall
    * clock) plus the max-pk row. The fixture's ts values carry exactly
    * microsecond precision, so the 7-day interval subtracts to the
    * same instant on both engines; the retained set is the whole
    * gated output (ts itself stays out of it — §7.4.5).
    */
  def retentionAge(s: SparkSession, dir: String): DataFrame =
    Retention.keepYoungerThan(
        Tables.events(s, dir).select((eventCols :+ "ts").map(col): _*),
        maxAge = expr("INTERVAL 7 DAYS"),
        pkCol = "event_id", tsCol = "ts")
      .select(eventCols.map(col): _*)
      .orderBy("event_id")

  val oracle: Map[String, String] = Map(
    "q_audit_log" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  'insert' AS audit_event,
        |  row_number() OVER (ORDER BY c_custkey) AS audit_pk
        |FROM customer ORDER BY audit_pk""".stripMargin,
    "q_capture_diff" ->
      """WITH s_old AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |s_new AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |ev AS (
        |  SELECT
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_orderkey ELSE n.o_orderkey END AS o_orderkey,
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_custkey ELSE n.o_custkey END AS o_custkey,
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus ELSE n.o_orderstatus END AS o_orderstatus,
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice ELSE n.o_totalprice END AS o_totalprice,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |         WHEN n.o_orderkey IS NULL THEN 'delete'
        |         ELSE 'update' END AS audit_event
        |  FROM s_old o FULL OUTER JOIN s_new n ON o.o_orderkey = n.o_orderkey
        |  WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |     OR o.o_custkey IS DISTINCT FROM n.o_custkey
        |     OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |     OR o.o_totalprice IS DISTINCT FROM n.o_totalprice)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, audit_event,
        |  row_number() OVER (ORDER BY o_orderkey, audit_event) AS audit_pk
        |FROM ev ORDER BY audit_pk""".stripMargin,
    "q_sync_watermark" ->
      """SELECT event_id, user_id, event_type, value, props FROM events
        |WHERE event_id > (SELECT max(event_id) / 2 FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_agg_probe" ->
      """SELECT count(event_id) AS n_events, min(event_id) AS min_pk,
        |  max(event_id) AS max_pk FROM events""".stripMargin,
    "q_keep_last" ->
      """SELECT event_id, user_id, event_type, value, props FROM events
        |WHERE event_id = (SELECT max(event_id) FROM events)""".stripMargin,
    "q_latest_state" ->
      """SELECT event_id, user_id, event_type, value, props FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_replay" ->
      """SELECT user_id, value, props FROM (
        |  SELECT user_id, value, props,
        |    CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS audit_event,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 AND audit_event <> 'delete' ORDER BY user_id""".stripMargin,
    "q_retention_wipe" ->
      """SELECT user_id, count(*) - 1 AS n_wiped, max(event_id) AS kept_pk
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_retention_age" ->
      """WITH b AS (SELECT max(event_id) AS mpk, max(ts) AS mts FROM events)
        |SELECT event_id, user_id, event_type, value, props FROM events, b
        |WHERE ts >= mts - INTERVAL 7 DAY OR event_id = mpk
        |ORDER BY event_id""".stripMargin,
    "q_log_integrity" ->
      """WITH lg AS (
        |  SELECT event_id FROM events WHERE event_id % 103 <> 0
        |  UNION ALL
        |  SELECT event_id FROM events
        |  WHERE event_id % 101 = 0 AND event_id % 103 <> 0)
        |SELECT 'all' AS scope, count(*) AS n_events,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
        |  min(event_id) AS min_seq, max(event_id) AS max_seq,
        |  count(*) - count(DISTINCT event_id) AS n_duplicates,
        |  max(event_id) - min(event_id) + 1 - count(DISTINCT event_id) AS n_gaps,
        |  (count(*) = count(DISTINCT event_id) AND
        |   max(event_id) - min(event_id) + 1 = count(DISTINCT event_id)) AS healthy
        |FROM lg""".stripMargin,
    "q_scd2" ->
      """WITH ev AS (SELECT user_id, value, props, event_id,
        |    CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS audit_event,
        |    lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to_pk
        |  FROM events)
        |SELECT user_id, value, props,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS INT) AS version,
        |  event_id AS valid_from_pk, valid_to_pk,
        |  valid_to_pk IS NULL AS is_current
        |FROM ev WHERE audit_event <> 'delete'
        |ORDER BY user_id, version""".stripMargin,
    "q_three_way" -> {
      val nonKey = Seq("o_custkey", "o_orderstatus", "o_totalprice")
      val oursRow = nonKey.map(c => s"o.$c IS DISTINCT FROM b.$c").mkString(" OR ")
      val theirsRow = nonKey.map(c => s"t.$c IS DISTINCT FROM b.$c").mkString(" OR ")
      val colConf = nonKey.map(c =>
        s"(o.$c IS DISTINCT FROM b.$c AND t.$c IS DISTINCT FROM b.$c AND o.$c IS DISTINCT FROM t.$c)")
        .mkString(" OR ")
      val sameImage = nonKey.map(c => s"o.$c IS NOT DISTINCT FROM t.$c").mkString(" AND ")
      val images = nonKey.map(c =>
        s"""CASE WHEN b.o_orderkey IS NULL THEN COALESCE(o.$c, t.$c)
           |     WHEN deleted THEN b.$c
           |     WHEN t.o_orderkey IS NULL THEN o.$c
           |     ELSE CASE WHEN o.$c IS DISTINCT FROM b.$c THEN o.$c
           |               WHEN t.$c IS DISTINCT FROM b.$c THEN t.$c
           |               ELSE b.$c END END AS $c""".stripMargin).mkString(",\n")
      s"""WITH bse AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         |  FROM orders WHERE o_orderkey % 97 <> 0),
         |o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
         |         ELSE o_totalprice END AS o_totalprice
         |  FROM bse WHERE o_orderkey % 41 <> 0),
         |t AS (SELECT o_orderkey, o_custkey,
         |    CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 20.0
         |         ELSE o_totalprice END AS o_totalprice
         |  FROM bse WHERE o_orderkey % 43 <> 0),
         |j AS (
         |  SELECT b.o_orderkey IS NOT NULL AS in_b,
         |    o.o_orderkey IS NOT NULL AS in_o, t.o_orderkey IS NOT NULL AS in_t,
         |    ($oursRow) AS ours_row, ($theirsRow) AS theirs_row,
         |    ($colConf) AS col_conf, ($sameImage) AS same_image,
         |    (o.o_orderkey IS NULL OR
         |     (t.o_orderkey IS NULL AND NOT ($oursRow))) AS deleted,
         |    COALESCE(b.o_orderkey, o.o_orderkey, t.o_orderkey) AS o_orderkey,
         |    $images
         |  FROM bse b
         |  FULL OUTER JOIN o ON b.o_orderkey = o.o_orderkey
         |  FULL OUTER JOIN t ON COALESCE(b.o_orderkey, o.o_orderkey) = t.o_orderkey)
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |  CASE WHEN NOT in_b THEN 'insert'
         |       WHEN deleted THEN 'delete' ELSE 'update' END AS audit_event,
         |  CASE WHEN NOT in_b AND in_o AND in_t THEN
         |         CASE WHEN same_image THEN 'merged' ELSE 'conflict' END
         |       WHEN NOT in_b THEN CASE WHEN in_o THEN 'ours' ELSE 'theirs' END
         |       WHEN NOT in_o AND NOT in_t THEN 'merged'
         |       WHEN NOT in_o THEN CASE WHEN theirs_row THEN 'conflict' ELSE 'ours' END
         |       WHEN NOT in_t THEN CASE WHEN ours_row THEN 'conflict' ELSE 'theirs' END
         |       WHEN col_conf THEN 'conflict'
         |       WHEN ours_row AND theirs_row THEN 'merged'
         |       WHEN ours_row THEN 'ours'
         |       ELSE 'theirs' END AS merge_status
         |FROM j
         |WHERE NOT in_b OR NOT in_o OR NOT in_t OR ours_row OR theirs_row
         |ORDER BY o_orderkey""".stripMargin
    },
    "q_capture_evolve" ->
      """WITH s_old AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    CAST(NULL AS VARCHAR) AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |s_new AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 11 = 0 THEN o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |ev AS (
        |  SELECT
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_orderkey ELSE n.o_orderkey END AS o_orderkey,
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_custkey ELSE n.o_custkey END AS o_custkey,
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus ELSE n.o_orderstatus END AS o_orderstatus,
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice ELSE n.o_totalprice END AS o_totalprice,
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_orderpriority ELSE n.o_orderpriority END AS o_orderpriority,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |         WHEN n.o_orderkey IS NULL THEN 'delete'
        |         ELSE 'update' END AS audit_event
        |  FROM s_old o FULL OUTER JOIN s_new n ON o.o_orderkey = n.o_orderkey
        |  WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |     OR o.o_custkey IS DISTINCT FROM n.o_custkey
        |     OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |     OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |     OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderpriority, audit_event,
        |  row_number() OVER (ORDER BY o_orderkey, audit_event) AS audit_pk
        |FROM ev ORDER BY audit_pk""".stripMargin,
    "q_incr_agg" ->
      """WITH s_old AS (
        |  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |s_new AS (
        |  SELECT o_custkey,
        |    CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS DECIMAL(12,2)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |oa AS (SELECT o_custkey, count(*) AS n, sum(p) AS s FROM s_old GROUP BY 1),
        |na AS (SELECT o_custkey, count(*) AS n, sum(p) AS s FROM s_new GROUP BY 1)
        |SELECT COALESCE(oa.o_custkey, na.o_custkey) AS o_custkey,
        |  CAST(COALESCE(na.n, 0) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(na.s, 0) AS DOUBLE) AS sum_price,
        |  CASE WHEN na.o_custkey IS NULL THEN 'delete'
        |       WHEN oa.o_custkey IS NULL THEN 'insert'
        |       ELSE 'update' END AS op
        |FROM oa FULL OUTER JOIN na ON oa.o_custkey = na.o_custkey
        |WHERE COALESCE(oa.n, 0) <> COALESCE(na.n, 0)
        |   OR COALESCE(oa.s, 0) <> COALESCE(na.s, 0)
        |ORDER BY o_custkey""".stripMargin,
    "q_capture_preimage" ->
      """WITH s_old AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |s_new AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 89 <> 0)
        |SELECT
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_orderkey ELSE n.o_orderkey END AS o_orderkey,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_custkey ELSE n.o_custkey END AS o_custkey,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus ELSE n.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice ELSE n.o_totalprice END AS o_totalprice,
        |  CASE WHEN o.o_orderkey IS NULL THEN NULL ELSE o.o_custkey END AS old_o_custkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN NULL ELSE o.o_orderstatus END AS old_o_orderstatus,
        |  CASE WHEN o.o_orderkey IS NULL THEN NULL ELSE o.o_totalprice END AS old_o_totalprice,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |       WHEN n.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS audit_event
        |FROM s_old o FULL OUTER JOIN s_new n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |   OR o.o_custkey IS DISTINCT FROM n.o_custkey
        |   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |ORDER BY o_orderkey, audit_event""".stripMargin,
    "q_state_asof" ->
      """WITH prefix AS (
        |  SELECT user_id, value, props,
        |    CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS audit_event,
        |    event_id
        |  FROM events
        |  WHERE event_id <= (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events))
        |SELECT user_id, value, props FROM (
        |  SELECT user_id, value, props, audit_event,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM prefix) t
        |WHERE rn = 1 AND audit_event <> 'delete' ORDER BY user_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audit_log"      -> (auditLog _),
    "q_capture_diff"   -> (captureDiff _),
    "q_capture_preimage" -> (capturePreImage _),
    "q_incr_agg"       -> (incrAgg _),
    "q_scd2"           -> (scdHistory _),
    "q_capture_evolve" -> (captureEvolve _),
    "q_three_way"      -> (threeWayQ _),
    "q_log_integrity"  -> (logIntegrityQ _),
    "q_sync_watermark" -> (syncWatermark _),
    "q_agg_probe"      -> (aggProbe _),
    "q_keep_last"      -> (keepLast _),
    "q_latest_state"   -> (latestState _),
    "q_replay"         -> (replay _),
    "q_retention_wipe" -> (retentionWipe _),
    "q_retention_age"  -> (retentionAge _),
    "q_state_asof"     -> (stateAsOf _)
  )
}
