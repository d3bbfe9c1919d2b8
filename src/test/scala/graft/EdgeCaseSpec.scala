package graft

import graft.core.{AuditSeq, CaptureDiff, Retention, SyncJob}
import graft.ops.{Dedup, Similarity, TextStats}
import org.apache.spark.sql.functions._

/** Boundary behavior: empty inputs, initial loads, full deletes. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def fixed = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))

  test("capture from an empty old snapshot = initial load (all inserts)") {
    val empty = Seq.empty[(Int, String)].toDF("id", "x")
    val snap = Seq((1, "a"), (2, "b")).toDF("id", "x")
    val out = CaptureDiff.capture(empty, snap, Seq("id"), clock = fixed)
      .select("id", "audit_event", "audit_pk").as[(Int, String, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((1, "insert", 1L), (2, "insert", 2L)))
  }

  test("capture into an empty new snapshot = full delete (pre-images)") {
    val empty = Seq.empty[(Int, String)].toDF("id", "x")
    val snap = Seq((1, "a"), (2, "b")).toDF("id", "x")
    val out = CaptureDiff.capture(snap, empty, Seq("id"), clock = fixed)
      .select("id", "x", "audit_event").as[(Int, String, String)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((1, "a", "delete"), (2, "b", "delete")))
  }

  test("capture of two empty snapshots and AuditSeq over empty input") {
    val empty = Seq.empty[(Int, String)].toDF("id", "x")
    assert(CaptureDiff.capture(empty, empty, Seq("id"), clock = fixed).isEmpty)
    assert(AuditSeq.assign(empty, Seq(col("id"))).isEmpty)
  }

  test("sync of an empty log delivers nothing and leaves no sink files") {
    val sink = tmpDir("esink")
    val emptyLog = Seq.empty[(Int, String, String, java.sql.Timestamp, Long)]
      .toDF("id", "x", "audit_event", "audit_timestamp", "audit_pk")
    assert(SyncJob.syncTable(spark, emptyLog, sink, singleFile = true) === 0L)
    assert(SyncJob.watermark(spark, sink) === -1L)
  }

  test("retention on empty and single-row logs") {
    val one = Seq((1, "a", 5L)).toDF("id", "x", "audit_pk")
    assert(Retention.keepLastGlobal(one).count() === 1)
    val empty = Seq.empty[(Int, String, Long)].toDF("id", "x", "audit_pk")
    assert(Retention.keepLastGlobal(empty).isEmpty)
    assert(Retention.keepLastPerKey(empty, Seq("id")).isEmpty)
  }

  test("dedup and text ops on an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(empty).isEmpty)
    assert(Dedup.ngramJaccard(empty, 0.8).isEmpty)
    assert(Dedup.minhashLsh(empty).isEmpty)
    assert(TextStats.languageId(empty).isEmpty)
  }

  test("single-document corpus yields no pairs anywhere") {
    val one = Seq((1L, "only doc here")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccard(one, 0.5).isEmpty)
    assert(Dedup.minhashLsh(one).isEmpty)
    assert(Dedup.simhash(one).count() === 1)
  }

  test("connectedComponents with no pairs labels every doc as itself; " +
    "empty docs yield an empty result") {
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val nodes = Seq(3L, 8L).toDF("doc_id")
    val cc = Dedup.connectedComponents(noPairs, nodes)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(cc.toSeq === Seq((3L, 3L), (8L, 8L)))
    val emptyDocs = Seq.empty[Long].toDF("doc_id")
    assert(Dedup.connectedComponents(noPairs, emptyDocs).isEmpty)
  }

  test("packSequences: empty input yields empty output; null token " +
    "counts occupy zero width but keep their position") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("doc_id", "chunk_idx", "n_tokens")
    assert(graft.ops.Pack.packSequences(empty, budget = 8L).isEmpty)
    val withNull = Seq(
      (1L, 0L, java.lang.Long.valueOf(5L)),
      (1L, 1L, null.asInstanceOf[java.lang.Long]),
      (2L, 0L, java.lang.Long.valueOf(4L))
    ).toDF("doc_id", "chunk_idx", "n_tokens")
    val out = graft.ops.Pack.packSequences(withNull, budget = 8L)
      .select("doc_id", "chunk_idx", "tok_start")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // the null chunk starts at 5 and advances nothing
    assert(out.toSeq === Seq((1L, 0L, 0L), (1L, 1L, 5L), (2L, 0L, 5L)))
  }

  test("asOfJoin with an empty left side is empty; left rows with null " +
    "time never match") {
    val l = Seq.empty[(Long, String, java.lang.Long)].toDF("id", "user", "t")
    val r = Seq(("u1", 5L, 10L)).toDF("user", "rid", "rt")
    assert(graft.ops.TemporalJoins.asOfJoin(l, r, Seq("user"), "t", "rt",
      Seq("rid")).isEmpty)
    val l2 = Seq((1L, "u1", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "user", "t")
    val out = graft.ops.TemporalJoins.asOfJoin(l2, r, Seq("user"), "t", "rt",
        Seq("rid"))
      .as[(Long, String, Option[Long], Option[Long])].collect()
    assert(out.head._4 === None)
  }

  test("contamination against an empty benchmark flags nothing") {
    val corpus = Seq((1L, "some words in a row here")).toDF("doc_id", "text")
    val noBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextStats.contamination(corpus, noBench).isEmpty)
  }

  test("chunk drops null-text docs entirely (matching the oracle's " +
    "empty range) instead of fabricating a chunk") {
    val d = Seq((1L, Option("a b c")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = TextStats.chunk(d, chunkSize = 2, stride = 2)
      .select("doc_id").as[Long].collect()
    assert(out.toSeq.sorted === Seq(1L, 1L)) // two chunks of doc 1, none of doc 2
  }

  test("splitByGroup at fraction extremes sends everything one way; " +
    "scrub propagates null text as null") {
    import graft.ops.Sampling
    val df = (1 to 50).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "grp")
    assert(Sampling.splitByGroup(df, "grp", 0.0)
      .filter(col("split") === "test").isEmpty)
    assert(Sampling.splitByGroup(df, "grp", 1.0)
      .filter(col("split") === "train").isEmpty)
    val withNull = Seq((1L, Option("a  b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = withNull.select(TextStats.scrub(col("text")).as("c"))
      .as[Option[String]].collect()
    assert(out.toSet === Set(Some("a b"), None))
  }

  test("corpusDiff with null text: present-with-null-text is not " +
    "'added'/'removed' — null==null is unchanged, null vs text is " +
    "changed, and presence still drives added/removed") {
    import graft.ops.Dedup
    val base = Seq((1L, Option.empty[String]), (2L, Option("x")),
                   (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val cur = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
                  (4L, Option("new")))
      .toDF("doc_id", "text")
    val out = Dedup.corpusDiff(base, cur)
      .select("doc_id", "status").as[(Long, String)].collect().sortBy(_._1)
    // 1: null -> null = unchanged (suppressed); 2: text -> null = changed;
    // 3: removed; 4: added
    assert(out.toSeq === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("null/short text flows through the new text ops without " +
    "fabricated rows: duplicateSpans, winnow, qualityClassifier") {
    val d = Seq((1L, Option("a b c d")), (2L, Option.empty[String]),
                (3L, Option("")))
      .toDF("doc_id", "text")
    assert(TextStats.duplicateSpans(d, windowLen = 3)
      .select("doc_id").as[Long].collect().toSeq === Seq(1L))
    assert(TextStats.winnow(d, k = 2, w = 2)
      .select("doc_id").as[Long].collect().toSet === Set(1L))
    // classifier: null text -> null token count -> dropped; empty text
    // splits to [""] (1 token) and scores it
    val q = TextStats.qualityClassifier(d)
      .select("doc_id").as[Long].collect().toSet
    assert(q === Set(1L, 3L))
  }

  test("editDistancePairs: null text dropped, empty corpus empty, " +
    "identical short strings pair at dist 0 via the short-doc side") {
    val d = Seq((1L, Option("ab")), (2L, Option("ab")),
      (3L, Option.empty[String]), (4L, Option("zzzz")))
      .toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(d, maxDist = 1)
      .as[(Long, Long, Long)].collect().sorted
    // "ab" docs are shorter than k*q+q-1 -> short path; null text gone
    assert(out.toSeq === Seq((1L, 2L, 0L)))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(empty, maxDist = 2).count() === 0L)
  }

  test("gopherRules on empty/degenerate text never divides by zero " +
    "and fails the word-count gate") {
    val d = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
    val out = TextStats.gopherRules(d)
      .select("doc_id", "n_words", "ok_words", "pass")
      .as[(Long, Int, Boolean, Boolean)].collect().sortBy(_._1)
    // "" splits to [""] (1 token of length 0) — still a defined row
    assert(out.toSeq === Seq((1L, 1, false, false), (2L, 1, false, false)))
  }

  test("gopherRules on NULL text emits false rule booleans, never null " +
    "(conjunctive-pass contract: a consumer counting pass=false sees it)") {
    val d = Seq((1L, null: String), (2L, "x")).toDF("doc_id", "text")
    val rows = TextStats.gopherRules(d)
      .select("doc_id", "ok_words", "ok_mean_len", "ok_stop", "ok_alpha", "pass")
      .collect().sortBy(_.getLong(0))
    rows.foreach { r =>
      (1 to 5).foreach(i => assert(!r.isNullAt(i), s"null boolean at $i for doc ${r.getLong(0)}"))
      assert(!r.getBoolean(5))
    }
  }

  test("canonicalByScore and clusterReport break score ties by LOWEST " +
    "id with STRING doc ids (no numeric negation of the id column)") {
    val cl = Seq(("zb", 1L), ("aa", 1L), ("zc", 1L))
      .toDF("doc_id", "cluster_id")
    val canon = Dedup.canonicalByScore(cl, lit(5L))
      .select("canonical_id").distinct().as[String].collect()
    assert(canon.toSeq === Seq("aa"))
    val best = Dedup.clusterReport(cl,
        Seq(("zb", 9L), ("aa", 9L), ("zc", 9L)).toDF("doc_id", "score"),
        "score")
      .select("best_doc").as[String].head()
    assert(best === "aa")
  }

  test("bm25WandTopDocs: a vocabulary smaller than nQueryTerms still " +
    "certifies (every list exhausts), a single-doc corpus returns " +
    "rank-1 rows, and an empty corpus fails loudly") {
    val tiny = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = TextStats.bm25WandTopDocs(tiny, nQueryTerms = 9,
      nQueries = 3, k = 10, d0 = 1)
    // 3 terms, dealt into bags 0/1/2 — every matching doc ranks
    assert(out.count() === 4L) // x:{1}, y:{1,2}, z:{2}
    val one = TextStats.bm25WandTopDocs(
      Seq((5L, "a b")).toDF("doc_id", "text"), d0 = 1)
    assert(one.select("rank").as[Int].collect().forall(_ === 1))
    intercept[IllegalArgumentException] {
      TextStats.bm25WandTopDocs(
        Seq.empty[(Long, String)].toDF("doc_id", "text"))
    }
  }

  test("bradleyTerry with no decidable duels (all ties/self-pairs) " +
    "returns an empty frame, not a crash; dawidSkene on a one-doc " +
    "frame stays inside [1, 1e6-1] ppm everywhere") {
    val ev = Seq((1L, 1L, "A", 2.0), (1L, 2L, "A", 3.0),
      (1L, 3L, "B", 3.0)).toDF("user_id", "event_id", "event_type", "value")
    // (A,A) self-pair drops, (A,B) ties at 3.0 and drops
    assert(graft.queries.ExtensionQueries.bradleyTerry(ev).count() === 0L)
    val ds = graft.queries.ExtensionQueries.dawidSkene(
      Seq((1L, 1, 0, 1)).toDF("doc_id", "vl", "vv", "vh"))
      .select("alpha_ppm", "beta_ppm").as[(Long, Long)].collect()
    assert(ds.forall { case (a, b) =>
      a >= 1 && a < 1000000 && b >= 1 && b < 1000000 })
  }

  test("knnGraph with k exceeding the corpus emits all neighbors; " +
    "clusterReport on a single-member cluster reclaims nothing") {
    val rnd = new scala.util.Random(3)
    val emb = (0L to 3L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(emb, k = 99, nprobe = 1, dim = 16)
    assert(g.count() === 4L * 3L) // every vector pairs with every other
    val rep = Dedup.clusterReport(
      Seq((7L, 7L)).toDF("doc_id", "cluster_id"),
      Seq((7L, 42L)).toDF("doc_id", "n_tokens"), "n_tokens")
      .select("n_docs", "dup_score").as[(Long, Long)].head()
    assert(rep === ((1L, 0L)))
  }
}
