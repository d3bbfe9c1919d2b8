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
