package graft

import graft.ops.ArtifactStore
import graft.queries.{ExtensionQueries, FrameMemo}

/** The round-12 persistence contract: session index artifacts (trained
  * quantizer, MinHash band/signature index, ANN ground truth, BPE
  * merges, ...) save to parquet with a params+fingerprint manifest,
  * and a FRESH session that loads them serves BIT-IDENTICAL results
  * without rebuilding anything — the build-once/serve-many lifecycle a
  * 100 TB deployment runs. Staleness (corpus or params drift) must
  * loud-fail at load, never serve silently wrong.
  */
class ArtifactStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fingerprint is order/partitioning-free and change-sensitive") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "t")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("id", "t").repartition(3)
    assert(ArtifactStore.fingerprint(a, Seq("id", "t")) ==
      ArtifactStore.fingerprint(b, Seq("id", "t")))
    // a value edit, a row drop, and an insert each move the fingerprint
    val edited = Seq((1L, "x"), (2L, "Y"), (3L, "z")).toDF("id", "t")
    val dropped = Seq((1L, "x"), (2L, "y")).toDF("id", "t")
    val grown = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w")).toDF("id", "t")
    val fpA = ArtifactStore.fingerprint(a, Seq("id", "t"))
    for (other <- Seq(edited, dropped, grown))
      assert(ArtifactStore.fingerprint(other, Seq("id", "t")) != fpA)
    // MULTISET sensitivity (the reason the fold is a sum, not a XOR):
    // a double-loaded corpus and a double-loaded EDITED corpus have the
    // same row count, and a XOR fold would cancel both to zero — the
    // sum tells them apart, and tells single from double apart too
    val doubled = a.unionAll(a)
    val doubledEdited = edited.unionAll(edited)
    val fpD = ArtifactStore.fingerprint(doubled, Seq("id", "t"))
    assert(fpD != ArtifactStore.fingerprint(doubledEdited, Seq("id", "t")))
    assert(fpD != fpA)
  }

  test("save/load round-trips rows and column order; mismatches " +
    "loud-fail naming the offending field") {
    val dir = tmpDir("graft-artifact")
    val frame = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val fp = ArtifactStore.fingerprint(frame, Seq("vec_id", "embedding"))
    ArtifactStore.save(frame, dir, "emb50", Map("k" -> "1"), fp)
    assert(ArtifactStore.exists(dir, "emb50"))
    val back = ArtifactStore.load(spark, dir, "emb50", Map("k" -> "1"), fp)
    assert(back.columns.toSeq == frame.columns.toSeq)
    assert(back.orderBy("vec_id").collect().toSeq ==
      frame.orderBy("vec_id").collect().toSeq)
    val eParam = intercept[IllegalStateException](
      ArtifactStore.load(spark, dir, "emb50", Map("k" -> "2"), fp))
    assert(eParam.getMessage.contains("param 'k'"))
    val eFp = intercept[IllegalStateException](
      ArtifactStore.load(spark, dir, "emb50", Map("k" -> "1"), "9-feed"))
    assert(eFp.getMessage.contains("fingerprint"))
    val eMissing = intercept[IllegalStateException](
      ArtifactStore.load(spark, dir, "nope", Map.empty, fp))
    assert(eMissing.getMessage.contains("no manifest"))
  }

  test("a FRESH session loads the saved library and serves the trained " +
    "index and MinHash dedup bit-identically, with zero index rebuilds") {
    val dir = tmpDir("graft-artifact-lib")
    val ivfLive = ExtensionQueries.queries("q_ivf_trained")(spark, sf)
      .collect().toSeq
    val mhLive = ExtensionQueries.queries("q_dedup_minhash")(spark, sf)
      .collect().toSeq
    val saved = ExtensionQueries.saveArtifacts(spark, sf, dir)
    assert(saved >= 20, s"expected the full catalog to save, got $saved")

    // newSession = fresh memo keys (FrameMemo keys on the session):
    // the restart-and-serve shape without booting a second JVM
    val s2 = spark.newSession()
    val installed = ExtensionQueries.loadArtifacts(s2, sf, dir)
    assert(installed == saved, s"saved $saved but loaded $installed")

    val logMark = FrameMemo.buildLog.size
    val ivfFresh = ExtensionQueries.queries("q_ivf_trained")(s2, sf)
      .collect().toSeq
    val mhFresh = ExtensionQueries.queries("q_dedup_minhash")(s2, sf)
      .collect().toSeq
    val rebuilds = FrameMemo.buildLog.drop(logMark).map(_._1)
    val indexKeys = Seq("kmeans_cent", "kmeans_assign", "mh_sigs",
      "mh_bands", "mh_pairs", "ann_truth")
    assert(!rebuilds.exists(k => indexKeys.exists(k.contains)),
      s"fresh session rebuilt a loaded index: $rebuilds")
    assert(ivfFresh == ivfLive)
    assert(mhFresh == mhLive)
  }

  test("loading a library built from a DIFFERENT corpus loud-fails on " +
    "the fingerprint before installing anything") {
    val dir = tmpDir("graft-artifact-stale")
    ExtensionQueries.saveArtifacts(spark, sf, dir)
    val s2 = spark.newSession()
    val e = intercept[IllegalStateException](
      ExtensionQueries.loadArtifacts(s2, "/root/testdata/sf0.01", dir))
    assert(e.getMessage.contains("STALE"))
    assert(e.getMessage.contains("fingerprint"))
  }

  test("incrementalIvfRefresh grows the persisted index O(new): frozen " +
    "centroids, appended assignment bit-equal to a full re-assign, " +
    "manifests re-stamped to the grown corpus; a mutated indexed row " +
    "refuses the append and demands a rebuild") {
    import graft.ops.Similarity
    import org.apache.spark.sql.functions._
    val dir = tmpDir("graft-incr-lib")
    val km = Map("k" -> "16", "iters" -> "2")
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    val c0 = all.filter(col("vec_id") % 3 =!= 0) // bootstrap corpus
    val fp0 = ArtifactStore.fingerprint(c0, Seq("vec_id", "embedding"))
    val cent = Similarity.kmeansExact(c0, k = 16, iters = 2)
    val assign0 = Similarity.assignToCentroids(c0,
      centroids = Some(cent.select("centroid_id", "centv")))
    ArtifactStore.save(cent, dir, "kmeans_cent", km, fp0)
    ArtifactStore.save(assign0, dir, "kmeans_assign", km, fp0)

    // grow: the %3 slice arrives; refresh appends WITHOUT retraining
    val fp1 = ArtifactStore.fingerprint(all, Seq("vec_id", "embedding"))
    val (nOld, nNew) = ArtifactStore.incrementalIvfRefresh(
      spark, dir, all, km, fp1)
    assert(nOld === c0.count())
    assert(nNew === all.count() - c0.count())
    assert(nNew > 0)

    // a refreshed library is NOT interchangeable with a trained-on-
    // this-corpus build (frozen centroids != a retrain): plain build
    // params loud-fail on the lineage marker, consumers opt in
    val eLineage = intercept[IllegalStateException](
      ArtifactStore.load(spark, dir, "kmeans_cent", km, fp1))
    assert(eLineage.getMessage.contains("lineage"))
    val kmI = km + (ArtifactStore.LineageKey -> ArtifactStore.LineageIncremental)

    // the grown library validates against the GROWN corpus and its
    // assignment is bit-equal to a from-scratch assign against the
    // same frozen centroids (per-row purity of the quantizer)
    val loadedCent = ArtifactStore.load(spark, dir, "kmeans_cent", kmI, fp1)
    val loaded = ArtifactStore.load(spark, dir, "kmeans_assign", kmI, fp1)
    assert(loadedCent.orderBy("centroid_id").collect().toSeq ===
      cent.orderBy("centroid_id").collect().toSeq)
    val expected = Similarity.assignToCentroids(all,
        centroids = Some(cent.select("centroid_id", "centv")))
      .select("vec_id", "centroid_id").orderBy("vec_id").collect().toSeq
    assert(loaded.select("vec_id", "centroid_id").orderBy("vec_id")
      .collect().toSeq === expected)

    // mutation guard: one already-indexed vector changes -> loud refusal
    val mutated = all.withColumn("embedding",
      when(col("vec_id") % 3 === 1,
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float")))
        .otherwise(col("embedding")))
    val e = intercept[IllegalStateException](
      ArtifactStore.incrementalIvfRefresh(spark, dir, mutated, km,
        ArtifactStore.fingerprint(mutated, Seq("vec_id", "embedding"))))
    assert(e.getMessage.contains("REBUILD"))
  }

  test("incrementalMinhashRefresh appends new docs' signatures and band " +
    "rows bit-equal to a full rebuild over the grown corpus") {
    import graft.ops.Dedup
    import org.apache.spark.sql.functions._
    val dir = tmpDir("graft-mh-incr")
    val mh = Map("numHashes" -> "16", "bands" -> "2")
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val c0 = all.filter(col("doc_id") % 4 =!= 0)
    val fpCols = Seq("doc_id", "text")
    val fp0 = ArtifactStore.fingerprint(c0, fpCols)
    val sigs0 = Dedup.minhashSignatureFrame(c0, 16)
    val bands0 = Dedup.minhashBandsWithKeys(c0, 16, 2,
      sigIndex = Some(sigs0))
    ArtifactStore.save(sigs0, dir, "mh_sigs", Map("numHashes" -> "16"), fp0)
    ArtifactStore.save(bands0, dir, "mh_bands", mh, fp0)

    val fp1 = ArtifactStore.fingerprint(all, fpCols)
    val (nOld, nNew) = ArtifactStore.incrementalMinhashRefresh(
      spark, dir, all, mh, fp1, fpCols)
    assert(nOld === c0.count() && nNew === all.count() - c0.count())
    assert(nNew > 0)

    // grown library == full rebuild over the grown corpus, row for row
    // (signatures/bands are per-row pure, so unlike the IVF case the
    // content is rebuild-identical — the lineage marker still records
    // how the library was produced)
    val inc = Map(ArtifactStore.LineageKey -> ArtifactStore.LineageIncremental)
    val sigsAll = Dedup.minhashSignatureFrame(all, 16)
    val loadedSigs = ArtifactStore.load(spark, dir, "mh_sigs",
      Map("numHashes" -> "16") ++ inc, fp1)
    assert(loadedSigs.orderBy("doc_id").collect().toSeq ===
      sigsAll.orderBy("doc_id").collect().toSeq)
    val bandsAll = Dedup.minhashBandsWithKeys(all, 16, 2,
      sigIndex = Some(sigsAll))
    val loadedBands = ArtifactStore.load(spark, dir, "mh_bands", mh ++ inc, fp1)
    assert(loadedBands.orderBy("doc_id", "b").collect().toSeq ===
      bandsAll.orderBy("doc_id", "b").collect().toSeq)

    // mutated indexed doc -> loud refusal
    val mutated = all.withColumn("text",
      when(col("doc_id") % 4 === 1, concat(col("text"), lit(" tampered")))
        .otherwise(col("text")))
    val e = intercept[IllegalStateException](
      ArtifactStore.incrementalMinhashRefresh(spark, dir, mutated, mh,
        ArtifactStore.fingerprint(mutated, fpCols), fpCols))
    assert(e.getMessage.contains("REBUILD"))
  }

  test("versioned publish: readers resolve _LATEST atomically; an " +
    "uncommitted build is invisible; commit swaps in one step") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-publish")
    assert(ArtifactStore.latestDir(root).isEmpty)
    val frame = spark.range(10).select(col("id"))
    val fp = ArtifactStore.fingerprint(frame, Seq("id"))

    val v1 = ArtifactStore.newVersionDir(root)
    assert(v1.endsWith("/v1"))
    ArtifactStore.save(frame, v1, "a", Map("p" -> "1"), fp)
    // not yet committed: readers still see nothing
    assert(ArtifactStore.latestDir(root).isEmpty)
    ArtifactStore.commitVersion(root, "v1")
    assert(ArtifactStore.latestDir(root).contains(v1))

    // a second build lands in v2 and becomes visible only on commit
    val v2 = ArtifactStore.newVersionDir(root)
    assert(v2.endsWith("/v2"))
    ArtifactStore.save(frame.withColumn("id", col("id") + 100), v2, "a",
      Map("p" -> "2"), fp)
    assert(ArtifactStore.latestDir(root).contains(v1))
    ArtifactStore.commitVersion(root, "v2")
    assert(ArtifactStore.latestDir(root).contains(v2))
    val served = ArtifactStore.load(spark, ArtifactStore.latestDir(root).get,
      "a", Map("p" -> "2"), fp)
    assert(served.agg(min(col("id"))).head().getLong(0) === 100L)

    intercept[IllegalArgumentException](
      ArtifactStore.commitVersion(root, "not-a-version"))
    // committing a version that was never written is a bug, not a swap
    intercept[IllegalArgumentException](
      ArtifactStore.commitVersion(root, "v99"))

    // GC: publish v3 and v4, point _LATEST at v3, prune keep=1 —
    // the newest (v4) and the COMMITTED (v3) both survive; v1/v2 go
    for (v <- Seq("v3", "v4")) {
      ArtifactStore.save(frame, s"$root/$v", "a", Map("p" -> "1"), fp)
    }
    ArtifactStore.commitVersion(root, "v3")
    val pruned = ArtifactStore.pruneVersions(root, keep = 1)
    assert(pruned.toSet === Set("v1", "v2"))
    assert(new java.io.File(s"$root/v4").exists())
    assert(new java.io.File(s"$root/v3").exists(), "committed must survive")
    assert(!new java.io.File(s"$root/v1").exists())
    assert(ArtifactStore.load(spark, ArtifactStore.latestDir(root).get,
      "a", Map("p" -> "1"), fp).count() === 10L)
    intercept[IllegalArgumentException](
      ArtifactStore.pruneVersions(root, keep = 0))
  }

  test("erasureScan finds forgotten ids inside the persisted library " +
    "(signatures, bands, pair/cluster rows) and reports clean for " +
    "ids the library never indexed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("graft-erasure-lib")
    ExtensionQueries.saveArtifacts(spark, sf, dir)
    val names = ArtifactStore.artifacts(dir)
    assert(names.contains("mh_sigs") && names.contains("bpe_merges"))

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val forgotten = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"))
    val report = ArtifactStore.erasureScan(spark, dir, forgotten,
        "doc_id", Seq("doc_id", "doc_a", "doc_b", "src", "dst"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // the per-doc index artifacts must surface the forgotten rows
    assert(report("mh_sigs") > 0L)
    assert(report("mh_bands") > 0L)
    assert(report("mh_clusters") > 0L)
    // the persisted provenance ledger is itself per-doc data — the
    // forgotten doc's verdict row must surface in the audit too
    assert(report("prov_ledger") > 0L)
    // aggregate-only artifacts (curves, centroids) are correctly absent
    assert(!report.contains("kmeans_cent") && !report.contains("ann_truth"))

    // ids never indexed -> every scanned artifact reports zero
    val ghost = Seq(999999901L, 999999902L).toDF("doc_id")
    val clean = ArtifactStore.erasureScan(spark, dir, ghost,
        "doc_id", Seq("doc_id", "doc_a", "doc_b", "src", "dst"))
      .agg(sum(col("n_refs_deleted"))).head().getLong(0)
    assert(clean === 0L)

    // a library with no row-reference artifacts is a CLEAN audit (zero
    // rows), never a crash — automated sweeps must keep going
    val noneScannable = ArtifactStore.erasureScan(spark, dir, forgotten,
      "doc_id", Seq("no_such_column"))
    assert(noneScannable.columns.toSeq ===
      Seq("artifact", "n_rows", "n_refs_deleted"))
    assert(noneScannable.count() === 0L)
  }

  test("q_trained_persist serves from the loaded frames and matches the " +
    "live trained index row for row") {
    val live = ExtensionQueries.queries("q_ivf_trained")(spark, sf)
      .collect().toSeq
    val persisted = ExtensionQueries.queries("q_trained_persist")(spark, sf)
      .collect().toSeq
    assert(persisted.nonEmpty)
    assert(persisted == live)
  }
}
