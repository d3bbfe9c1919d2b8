package graft

import graft.codegen.{AuditArtifacts, TriggerDdl}
import graft.core._
import graft.streaming.StreamingSync
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The complete reference workflow, end to end, on one table:
  * generate DDL artifacts -> capture two snapshot diffs -> sequence
  * with watermark resume -> land in a partitioned parquet log ->
  * stream-sync to CSV exactly once -> replay the log back to the
  * final table state. Every stage is the real operator, no mocks.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def fixed = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))

  test("generate -> capture -> sequence -> log -> stream-sync -> replay " +
    "round-trips to the final state") {
    // three table versions: base, v2 (update+delete+insert), v3 (more)
    val v1 = (1 to 100).map(i => (i, s"name$i", i * 10.0))
    val v2 = v1.filterNot(_._1 % 10 == 0) // delete multiples of 10
      .map { case (id, n, v) => if (id % 7 == 0) (id, n, v + 1.0) else (id, n, v) }
      .:+((101, "name101", 1010.0))
    val v3 = v2.map { case (id, n, v) => if (id % 3 == 0) (id, s"$n!", v) else (id, n, v) }
    def df(s: Seq[(Int, String, Double)]) = s.toDF("id", "name", "v")

    // 1. generator artifacts (the reference's entry point 1)
    val ddlDir = tmpDir("e2e-ddl")
    AuditArtifacts.writeTable(ddlDir, "acct",
      TriggerDdl.fromStructType(df(v1).schema, pk = Seq("id")))
    assert(Files.readString(Paths.get(ddlDir, "acct.audit.sql"))
      .contains("create table if not exists `acct_audit`"))

    // 2. capture the two diffs, sequencing the second above the first
    val d12 = CaptureDiff.capture(df(v1), df(v2), Seq("id"), clock = fixed)
    val n12 = d12.count()
    val d23 = CaptureDiff.capture(df(v2), df(v3), Seq("id"), clock = fixed,
      basePk = n12)

    // 3. land both batches in a partitioned audit log
    val logDir = tmpDir("e2e-log")
    AuditLake.writePartitionedLog(d12.withColumn("batch", lit("b1")), logDir, "batch")
    AuditLake.writePartitionedLog(d23.withColumn("batch", lit("b2")), logDir, "batch")
    val log = spark.read.parquet(logDir).drop("batch")
    assert(AuditSchema.isAuditSchema(log.schema))
    val pks = log.select("audit_pk").as[Long].collect().sorted
    assert(pks.toSeq === (1L to pks.length)) // dense across batches

    // 4. stream-sync the log to CSV, exactly once across two runs.
    // Partitioned reads append the partition column AFTER audit_pk —
    // re-order it ahead of the audit columns in the explicit stream
    // schema so the audit-cols-last invariant holds.
    val readSchema = spark.read.parquet(logDir).schema
    val (auditF, dataF) = readSchema.fields.partition(f =>
      AuditSchema.AuditCols.contains(f.name))
    val streamSchema = org.apache.spark.sql.types.StructType(dataF ++ auditF)
    val sink = tmpDir("e2e-sink"); val cp = tmpDir("e2e-cp")
    StreamingSync.runOnce(spark, logDir, streamSchema, sink, cp)
    StreamingSync.runOnce(spark, logDir, streamSchema, sink, cp) // no-op re-run
    val delivered = Files.walk(Paths.get(sink)).iterator().asScala
      .filter(p => p.toString.endsWith(".csv") && Files.isRegularFile(p))
      .flatMap(p => Files.readAllLines(p).asScala)
      .count(l => l.nonEmpty && !l.startsWith("id,"))
    assert(delivered === pks.length)

    // 5. replay the full log -> exactly the v3 state
    val replayed = Replay.toState(log, Seq("id"))
      .as[(Int, String, Double)].collect().toSet
    // keys never touched after v1 are absent from a pure diff log, so
    // seed the replay with the v1 baseline as insert events (pk 0)
    val baseline = df(v1)
      .withColumn("audit_event", lit("insert"))
      .withColumn("audit_timestamp", fixed)
      .withColumn("audit_pk", lit(0L))
    val full = Replay.toState(baseline.unionByName(log), Seq("id"))
      .as[(Int, String, Double)].collect().toSet
    assert(full === v3.toSet)
    assert(replayed.subsetOf(full))
  }

  test("CDC feeds curation end-to-end: a captured documents diff " +
    "routes inserts/updates through the incremental provenance judge " +
    "and deletes through the ledger erasure audit — the mission " +
    "workload driving the extension surface") {
    import graft.queries.ExtensionQueries.provenanceIncrLedger
    val longText = (c: Char) => (0 until 25).map(k => s"$c$k").mkString(" ")
    // yesterday's snapshot IS the curated lake
    val oldSnap = Seq(
      1L -> longText('x'), 2L -> longText('z'), 3L -> longText('w'))
      .toDF("doc_id", "text")
    // today's: doc 2 edited, doc 3 deleted, docs 4 (dup of 1) and 5 new
    val newSnap = Seq(
      1L -> longText('x'), 2L -> (longText('z') + " edited"),
      4L -> longText('x'), 5L -> longText('q'))
      .toDF("doc_id", "text")
    val diff = CaptureDiff.classify(oldSnap, newSnap, Seq("doc_id"))
    val ev = col(AuditSchema.EventCol)

    // inserts + updates carry post-images: exactly what the judge reads
    val arriving = diff.filter(ev =!= "delete").select("doc_id", "text")
    val ledger = provenanceIncrLedger(arriving, oldSnap)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(ledger.map(r => r._1 -> r._3).toMap === Map(
      2L -> "kept",        // edited content is genuinely new — re-judged
      4L -> "duplicate",   // content of curated doc 1 under a new id
      5L -> "kept"))

    // the delete's pre-image drives the forget pass: its ledger row
    // (and any persisted per-doc artifact) must surface in the audit
    val forgotten = diff.filter(ev === "delete").select("doc_id")
    assert(forgotten.as[Long].collect().toSeq === Seq(3L))
    val oldLedger = graft.queries.ExtensionQueries
      .provenanceLedger(oldSnap)
    val hits = graft.ops.Profile.erasureAudit(forgotten, "doc_id",
        Seq(("ledger", oldLedger, Seq("doc_id"))))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(hits("ledger") === 1L,
      "the deleted doc's verdict row must be flagged for erasure")
  }

  test("ANN index lifecycle composes end-to-end on the real fixture: " +
    "assignment -> health -> decision -> split -> swap-in, conserving " +
    "membership and touching only the flagged list") {
    import graft.ops.{Profile, Similarity}
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val assignment = Similarity.assignToCentroids(embs).localCheckpoint()
    val n = assignment.count()
    // the fixture's stride quantizer is well balanced, so tighten the
    // skew bar until the biggest list flags, and aim the probe traffic
    // at it — the operators themselves are unmodified
    val health = Profile.indexHealth(assignment, "centroid_id",
      skewPermille = 1200L)
    val biggest = health.orderBy(col("n_items").desc, col("list_key"))
      .select("list_key").as[String].head()
    assert(health.filter(col("skewed")).count() >= 1L)
    val loads = assignment.filter(col("vec_id") % 2 === 1)
      .groupBy(col("centroid_id").cast("string").as("list_key"))
      .agg(count(lit(1)).as("n_probes"))
      .withColumn("n_probes", // concentrate traffic on the big list
        when(col("list_key") === biggest, col("n_probes") * 50L)
          .otherwise(col("n_probes")))
    val decisions = Profile.rebuildDecision(health, loads)
    val flagged = decisions.filter(col("decision") === "split_now")
      .select("list_key").as[String].collect().toSet
    assert(flagged.contains(biggest))
    val splits = Similarity.splitHotLists(assignment, decisions, k = 2)
    assert(splits.count() === flagged.size * 2L)
    val updated = Similarity.applyListSplits(assignment, splits)
    assert(updated.count() === n) // membership conserved
    val newKeys = updated.select("list_key").distinct()
      .as[String].collect().toSet
    flagged.foreach { lk =>
      assert(!newKeys.contains(lk), s"flagged list $lk must be replaced")
      assert(newKeys.contains(s"$lk:0") || newKeys.contains(s"$lk:1"))
    }
    // unflagged lists keep their members bit-for-bit
    val before = assignment
      .withColumn("list_key", col("centroid_id").cast("string"))
      .filter(!col("list_key").isin(flagged.toSeq: _*))
      .select("vec_id", "list_key").as[(Long, String)].collect().toSet
    val after = updated
      .filter(!col("list_key").rlike(":"))
      .as[(Long, String)].collect().toSet
    assert(after === before)

    // 2nd act — the SERVING path: promote the split into the shared
    // memo every q_ann_ivf* consumer reads, run the real query through
    // it, then reset and prove the pre-refresh path is restored
    import graft.queries.ExtensionQueries
    val d = "/root/testdata/sf0.001"
    val pre = ExtensionQueries.annIvf(spark, d).collect().toSeq
    assert(pre.size === 50)
    ExtensionQueries.refreshIvfServing(spark, d, splits)
    val post = ExtensionQueries.annIvf(spark, d).collect().toSeq
    try {
      // same serving contract (10 queries x top-5, ranked)
      assert(post.size === 50)
      assert(post.map(_.getLong(0)).distinct.size === 10)
      // the flagged list is really gone from the layout being served:
      // the swapped-in assignment keys its members "<list>:<sub>"
      val servedKeys = ExtensionQueries
        .sharedPeek(spark, d, "ivf_assign").get
        .select(col("centroid_id").cast("string"))
        .distinct().as[String].collect().toSet
      flagged.foreach { lk =>
        assert(!servedKeys.contains(lk), s"split list $lk still served")
        assert(servedKeys.exists(_.startsWith(s"$lk:")))
      }
      // membership conserved through the swap-in on the serving copy
      assert(ExtensionQueries.sharedPeek(spark, d, "ivf_assign")
        .get.count() === n)
    } finally ExtensionQueries.resetIvfServing(spark, d)
    // reset restores the exact pre-refresh serving results
    val restored = ExtensionQueries.annIvf(spark, d).collect().toSeq
    assert(restored === pre)
  }
}
