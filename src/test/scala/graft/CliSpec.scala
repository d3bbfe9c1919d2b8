package graft

import graft.tools.{Cli, CurateTool, GenTool, IndexTool, SyncTool}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end CLI runs of the two reference-workflow entry points. */
class CliSpec extends SparkSpec {
  import spark.implicits._

  test("arg parsing and include lists") {
    val opts = Cli.parse(Array("--data", "/x", "-t", "a, b", "-o", "/y"))
    assert(opts === Map("--data" -> "/x", "-t" -> "a, b", "-o" -> "/y"))
    assert(Cli.include(opts) === Some(Set("a", "b")))
    assert(Cli.include(Map.empty) === None)
  }

  test("bare flags parse as true instead of swallowing the next flag; " +
    "stray positionals are ignored") {
    assert(Cli.parse(Array("-w", "-t", "a,b")) ===
      Map("-w" -> "true", "-t" -> "a,b"))
    assert(Cli.parse(Array("--logs", "/l", "-w")) ===
      Map("--logs" -> "/l", "-w" -> "true"))
    assert(Cli.parse(Array("stray", "-v", "2", "orphan")) === Map("-v" -> "2"))
  }

  test("leveled logging: -v thresholds match the reference's 0-3 scale, " +
    "debug appends source location, --log redirects to a file") {
    def capture(v: Int)(f: Cli.Logger => Unit): String = {
      val bos = new java.io.ByteArrayOutputStream()
      val log = new Cli.Logger(v, new java.io.PrintStream(bos, true, "UTF-8"),
        owned = false)
      f(log); bos.toString("UTF-8")
    }
    def emitAll(l: Cli.Logger): Unit = {
      l.error("E"); l.warn("W"); l.info("I"); l.debug("D")
    }
    assert(capture(0)(emitAll) === "E\n")
    assert(capture(1)(emitAll) === "E\nW\n")           // the default
    assert(capture(2)(emitAll) === "E\nW\nI\n")
    val dbg = capture(3)(emitAll)
    assert(dbg.startsWith("E\nW\nI\nD  -- CliSpec.scala : "))
    // --log FILE redirect; bare -v (no value) falls back to default 1
    val f = Paths.get(tmpDir("clilog"), "run.log").toString
    val log = Cli.logger(Map("--log" -> f, "-v" -> "true"))
    assert(log.verbosity === 1)
    log.warn("to-file"); log.close()
    assert(Files.readString(Paths.get(f)).trim === "to-file")
  }

  test("GenTool writes DDL artifacts for parquet tables, honoring -t") {
    val data = tmpDir("gendata"); val out = tmpDir("genout")
    Seq((1, "x")).toDF("id", "v").write.mode("overwrite").parquet(s"$data/alpha.parquet")
    Seq((2, 9.5)).toDF("id", "w").write.mode("overwrite").parquet(s"$data/beta.parquet")
    GenTool.main(Array("--data", data, "-o", out, "-t", "alpha"))
    assert(Files.exists(Paths.get(out, "alpha.audit.sql")))
    assert(!Files.exists(Paths.get(out, "beta.audit.sql")))
    val sql = Files.readString(Paths.get(out, "alpha.audit.sql"))
    assert(sql.contains("create table if not exists `alpha_audit`"))
    assert(sql.contains("`v` text null"))
  }

  test("SyncTool discovers audit dirs, syncs, and wipes with -w") {
    val logs = tmpDir("logs"); val sink = tmpDir("sinks")
    (1 to 12).map(i => (i, s"r$i", "insert")).toDF("id", "x", "audit_event")
      .withColumn("audit_timestamp", lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .withColumn("audit_pk", col("id").cast("long"))
      .write.mode("overwrite").parquet(s"$logs/t1_audit")
    SyncTool.main(Array("--logs", logs, "--sink", sink, "-w", "true"))
    // all rows in the sink, log compacted to one row
    assert(graft.core.SyncJob.watermark(spark, s"$sink/t1_audit") === 12L)
    assert(spark.read.parquet(s"$logs/t1_audit").count() === 1L)
    // --par N: concurrent fan-out delivers every table with intact
    // per-table sidecars (the overlap itself is latch-pinned in
    // SyncJobSpec; here the CLI wiring)
    val logs2 = tmpDir("logs-par"); val sink2 = tmpDir("sinks-par")
    for (t <- Seq("a_audit", "b_audit", "c_audit"))
      (1 to 6).map(i => (i, s"r$i", "insert")).toDF("id", "x", "audit_event")
        .withColumn("audit_timestamp",
          lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
        .withColumn("audit_pk", col("id").cast("long"))
        .write.mode("overwrite").parquet(s"$logs2/$t")
    SyncTool.main(Array("--logs", logs2, "--sink", sink2, "--par", "3"))
    for (t <- Seq("a_audit", "b_audit", "c_audit"))
      assert(graft.core.SyncJob.watermark(spark, s"$sink2/$t") === 6L)
  }

  test("IndexTool builds the artifact library; --check validates it and " +
    "loud-fails against a different corpus") {
    val out = tmpDir("indexlib")
    val sf = "/root/testdata/sf0.001"
    IndexTool.main(Array("--data", sf, "--out", out))
    // the published library passes the pre-serve gate on the SAME corpus
    IndexTool.main(Array("--data", sf, "--out", out, "--check"))
    // build is a versioned publish: v1 committed via _LATEST
    assert(graft.ops.ArtifactStore.latestDir(out).exists(_.endsWith("/v1")))
    assert(Files.exists(
      Paths.get(out, "v1", "kmeans_cent", "_graft_manifest.json")))
    assert(Files.exists(
      Paths.get(out, "v1", "bpe_merges", "_graft_manifest.json")))
    // and loud-fails when the corpus under it changed
    val e = intercept[IllegalStateException](IndexTool.main(
      Array("--data", "/root/testdata/sf0.01", "--out", out, "--check")))
    assert(e.getMessage.contains("STALE"))
    // an EMPTY/absent library fails the gate too (typoed path must not
    // read as "OK: 0 artifacts installed")
    val eEmpty = intercept[IllegalStateException](IndexTool.main(
      Array("--data", sf, "--out", tmpDir("empty-lib"), "--check")))
    assert(eEmpty.getMessage.contains("no artifacts"))
    // --prune keeps the committed version (v1 is both newest and
    // committed here — nothing to delete, and the gate still passes)
    IndexTool.main(Array("--data", sf, "--out", out, "--check",
      "--prune", "1"))
    assert(graft.ops.ArtifactStore.latestDir(out).exists(_.endsWith("/v1")))
  }

  test("CurateTool: --bootstrap opens the lake, later batches judge " +
    "against it (arrival-order duplicates), a missing lake without " +
    "--bootstrap loud-fails") {
    import spark.implicits._
    val longText = (c: Char) => (0 until 25).map(k => s"$c$k").mkString(" ")
    val b1Dir = tmpDir("cur-b1"); val b2Dir = tmpDir("cur-b2")
    val lake = tmpDir("cur-lake") + "/lake"   // does not exist yet
    val ledger = tmpDir("cur-ledger")
    Seq(1L -> longText('x'), 2L -> "s1 s2 s3").toDF("doc_id", "text")
      .write.mode("overwrite").parquet(b1Dir)
    Seq(3L -> longText('x'), 4L -> longText('y')).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(b2Dir)
    // missing lake without --bootstrap: loud refusal, nothing written
    val e = intercept[IllegalStateException](CurateTool.main(
      Array("--batch", b1Dir, "--lake", lake, "--ledger", ledger)))
    assert(e.getMessage.contains("--bootstrap"))
    CurateTool.main(Array("--batch", b1Dir, "--lake", lake,
      "--ledger", ledger, "--bootstrap"))
    CurateTool.main(Array("--batch", b2Dir, "--lake", lake,
      "--ledger", ledger))
    val got = spark.read.parquet(ledger).select("doc_id", "verdict")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toMap === Map(
      1L -> "kept", 2L -> "too_short",
      3L -> "duplicate",   // content curated in batch 1 — arrival wins
      4L -> "kept"))
    assert(spark.read.parquet(lake).count() === 4L)
    // retry of an already-applied batch: idempotent no-op — no
    // duplicate ledger rows, no re-judging against the grown lake
    // (which would flip batch 2's kept docs to duplicates), no
    // double-admission
    CurateTool.main(Array("--batch", b2Dir, "--lake", lake,
      "--ledger", ledger))
    assert(spark.read.parquet(ledger).count() === 4L)
    assert(spark.read.parquet(lake).count() === 4L)
    // mid-batch crash repair: ledger rows exist but the lake append
    // was lost — a retry must restore the lake half WITHOUT re-judging
    val b3Dir = tmpDir("cur-b3")
    Seq(5L -> longText('z')).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(b3Dir)
    CurateTool.main(Array("--batch", b3Dir, "--lake", lake,
      "--ledger", ledger))
    // simulate the crash: surgically remove batch 3 from the lake
    val keep = spark.read.parquet(lake).filter($"doc_id" =!= 5L)
      .localCheckpoint()
    keep.write.mode("overwrite").parquet(lake)
    assert(spark.read.parquet(lake).count() === 4L)
    CurateTool.main(Array("--batch", b3Dir, "--lake", lake,
      "--ledger", ledger))
    assert(spark.read.parquet(lake).count() === 5L)   // repaired
    assert(spark.read.parquet(ledger).count() === 5L) // not re-judged
    assert(spark.read.parquet(ledger)
      .filter($"doc_id" === 5L && $"verdict" === "kept").count() === 1L)
    // PARTIAL mid-job-commit crash: some of the batch's part files
    // landed before the crash — the repair must append ONLY the
    // missing rows; re-appending the whole batch would silently
    // duplicate every doc that already made it into the lake
    val b4Dir = tmpDir("cur-b4")
    Seq(6L -> longText('q'), 7L -> longText('r')).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(b4Dir)
    CurateTool.main(Array("--batch", b4Dir, "--lake", lake,
      "--ledger", ledger))
    assert(spark.read.parquet(lake).count() === 7L)
    val keep2 = spark.read.parquet(lake).filter($"doc_id" =!= 7L)
      .localCheckpoint()
    keep2.write.mode("overwrite").parquet(lake)
    CurateTool.main(Array("--batch", b4Dir, "--lake", lake,
      "--ledger", ledger))
    assert(spark.read.parquet(lake).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(spark.read.parquet(ledger).count() === 7L) // not re-judged
  }

  test("IndexTool --forget-store surgically erases ids from the " +
    "posting-list layout and requires --ids") {
    import spark.implicits._
    val store = tmpDir("cli-forget")
    (0 until 10).map(i => (i.toLong, (i / 5).toLong,
        Array.fill(2)(1.0), 1.0))
      .toDF("vec_id", "centroid_id", "cv", "cn")
      .write.mode("overwrite").partitionBy("centroid_id").parquet(store)
    intercept[IllegalArgumentException](
      IndexTool.main(Array("--forget-store", store)))
    IndexTool.main(Array("--forget-store", store, "--ids", "1, 7"))
    assert(spark.read.parquet(store).select("vec_id").as[Long]
      .collect().sorted.toSeq === Seq(0L, 2L, 3L, 4L, 5L, 6L, 8L, 9L))
  }

  test("IndexTool --compact-store runs the OPTIMIZE pass over a " +
    "posting-list layout and leaves a compact store a no-op") {
    import spark.implicits._
    val store = tmpDir("cli-store")
    val asg = (0 until 12).map(i =>
        (i.toLong, 0L, Array.fill(2)(1.0), 1.0))
      .toDF("vec_id", "centroid_id", "cv", "cn")
    // two appends fragment list 0
    asg.filter($"vec_id" < 6).coalesce(1).write.mode("overwrite")
      .partitionBy("centroid_id").parquet(store)
    asg.filter($"vec_id" >= 6).coalesce(1).write.mode("append")
      .partitionBy("centroid_id").parquet(store)
    assert(graft.ops.IndexStore.fileAudit(spark, store)
      .as[(Long, Long, Long)].head()._3 === 2L)
    IndexTool.main(Array("--compact-store", store, "--target-rows", "12"))
    assert(graft.ops.IndexStore.fileAudit(spark, store)
      .as[(Long, Long, Long)].head() === ((0L, 12L, 1L)))
    assert(spark.read.parquet(store).count() === 12L)
    // second pass: already compact, nothing rewritten
    IndexTool.main(Array("--compact-store", store, "--target-rows", "12"))
    assert(graft.ops.IndexStore.fileAudit(spark, store)
      .as[(Long, Long, Long)].head() === ((0L, 12L, 1L)))
  }
}
