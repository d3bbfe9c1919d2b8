package graft

import graft.ops.{Graph, Sketch, Skew}
import org.apache.spark.sql.functions._

/** Round-8 corpus-statistics ops: count–min sketch (vs a driver-side
  * reference sketch and the CMS one-sided-error guarantee), the
  * Heaps-law vocabulary growth curve, and the binned interval-overlap
  * join (vs brute force).
  */
class SketchGraphSpec extends SparkSpec {
  import spark.implicits._

  private def md5Bucket(r: Int, key: String, width: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$r:$key".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(6)
    java.lang.Long.parseLong(hex, 16) % width
  }

  test("cmsBucket matches a driver-side md5 reference for every row") {
    val keys = Seq("alpha", "beta", "gamma", "the", "x")
    val df = keys.toDF("k")
    for (r <- 0 until 4) {
      val got = df.select(col("k"), Sketch.cmsBucket(col("k"), r, 1024).as("b"))
        .as[(String, Long)].collect().toMap
      keys.foreach { k => assert(got(k) === md5Bucket(r, k, 1024), s"r=$r k=$k") }
    }
  }

  test("cms estimates equal a brute-force driver sketch and never undercount") {
    val docs = Seq(
      (1L, "a a a b c"),
      (2L, "a b b d d d"),
      (3L, "c c e f g h")
    ).toDF("doc_id", "text")
    val depth = 4
    val width = 4 // tiny width to force collisions (8 keys, 4 buckets/row)
    val toks = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).toSeq
    val exact = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // driver-side reference sketch
    val cells = Array.fill(depth, width)(0L)
    for ((k, c) <- exact; r <- 0 until depth)
      cells(r)(md5Bucket(r, k, width).toInt) += c
    val refEst = exact.keys.map { k =>
      k -> (0 until depth).map(r => cells(r)(md5Bucket(r, k, width).toInt)).min
    }.toMap

    val out = Sketch.cmsHeavyHitters(docs, depth, width, k = 100)
      .select("term", "est", "exact", "err")
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSet === exact.keySet)
    out.foreach { case (t, est, ex, err) =>
      assert(ex === exact(t), s"exact($t)")
      assert(est === refEst(t), s"est($t)")
      assert(err === est - ex && err >= 0, s"one-sided error($t)")
    }
    // tiny width MUST collide somewhere (8 keys into 4 buckets/row —
    // every row has >= 4 colliding keys, and min-over-rows cannot dodge
    // all of them for every key):
    assert(out.exists(_._4 > 0), "expected at least one collision overcount")
  }

  test("vocabGrowth: hand-computed buckets, new types, cumulative curve") {
    val docs = Seq(
      (0L, "a b a"), (1L, "b c"),  // bucket 0
      (2L, "c d d"), (3L, "e")     // bucket 1
    ).toDF("doc_id", "text")
    val out = graft.ops.TextStats.vocabGrowth(docs, buckets = 2)
      .select("bucket", "n_docs", "n_tokens", "new_types",
        "cum_tokens", "cum_types", "ttr_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 5L, 3L, 5L, 3L, 600000L),   // a,b,c new; 3e6/5
      (1L, 2L, 4L, 2L, 9L, 5L, 555555L)))  // d,e new; 5e6/9
  }

  test("binnedIntervalJoin equals brute force for any binWidth, " +
    "negative bounds included, no duplicate pairs") {
    val l = Seq((1L, -50L, 10L), (2L, 0L, 5L), (3L, 100L, 120L),
      (4L, -200L, -150L)).toDF("l_id", "l_lo", "l_hi")
    val r = Seq((10L, -60L, -45L), (11L, 4L, 8L), (12L, 9L, 99L),
      (13L, 130L, 140L), (14L, -1000L, 1000L)).toDF("r_id", "r_lo", "r_hi")
    val brute = l.crossJoin(r)
      .filter(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Skew.binnedIntervalJoin(l, "l_lo", "l_hi", r, "r_lo", "r_hi", w)
        .select("l_id", "r_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at w=$w")
      assert(got.toSet === brute, s"pair set at w=$w")
    }
  }

  test("pageRank: one hand-computed integer iteration is exact") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val out = Graph.pageRank(edges, nodes, iterations = 1, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    // r0 = 333333 each; base = 50000
    // c(1) = 333333 (from 3); c(2) = 166666 (from 1, outdeg 2);
    // c(3) = 166666 + 333333 = 499999
    assert(out === Map(
      1L -> (50000L + 85L * 333333L / 100L),
      2L -> (50000L + 85L * 166666L / 100L),
      3L -> (50000L + 85L * 499999L / 100L)))
  }

  test("personalizedPageRank: hand-computed seed-teleport iteration; " +
    "off-node-set seeds ignored; empty effective seed set fails loudly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val seeds = Seq(1L).toDF("node")
    // nS=1: r0 = (1e6, 0, 0, 0); baseS = 150000 lands ONLY on the seed;
    // iter1 shares: 1 -> 2 carries the full 1e6
    val out = Graph.personalizedPageRank(edges, nodes, seeds,
        iterations = 1, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(
      1L -> 150000L,
      2L -> (85L * 1000000L / 100L),
      3L -> 0L, 4L -> 0L))
    // a seed id outside the node set contributes nothing (nS stays 1)
    val out2 = Graph.personalizedPageRank(edges, nodes,
        Seq(1L, 99L).toDF("node"), iterations = 1, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(out2 === out)
    // all seeds off the node set = ranking against nothing: loud fail
    assertThrows[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, nodes, Seq(99L).toDF("node"))
    }
  }

  test("pageRank: hub of a star graph wins; isolated node sits at the " +
    "teleport floor") {
    // 2..6 all point at 1; 7 is isolated (no edges at all)
    val edges = (2L to 6L).map(i => (i, 1L)).toDF("src", "dst")
    val nodes = (1L to 7L).toDF("node")
    val pr = Graph.pageRank(edges, nodes, iterations = 3).as[(Long, Long)]
      .collect().toMap
    assert(pr(1L) > pr(2L), "hub must outrank spokes")
    assert((2L to 6L).map(pr).toSet.size === 1, "spokes tie exactly")
    assert(pr(7L) === pr(2L),
      "an isolated node and a no-inlink spoke both sit at the floor")
  }

  test("rrfFuse: hand-computed integer fusion, absent lists score 0") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "cand_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "cand_id", "rank")
    val out = graft.ops.Similarity.rrfFuse(a, b, "a_rank", "b_rank", k = 5)
      .select("query_id", "cand_id", "rrf_score", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    // 10: 1e6/61 = 16393; 11: 1e6/62 + 1e6/61 = 16129 + 16393 = 32522;
    // 12: 1e6/62 = 16129
    assert(out.toSeq === Seq(
      (1L, 11L, 32522L, 1), (1L, 10L, 16393L, 2), (1L, 12L, 16129L, 3)))
  }

  test("tokenOverlapTopK: shared-distinct-token ranking, self excluded") {
    val corpus = Seq((1L, "a b c"), (2L, "a b x x"), (3L, "c d"), (4L, "z"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextStats
      .tokenOverlapTopK(corpus.filter($"doc_id" === 1), corpus, k = 2)
      .select("query_id", "cand_id", "shared", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    // doc 2 shares {a,b} (x's dup doesn't double-count), doc 3 shares {c}
    assert(out.toSeq === Seq((1L, 2L, 2L, 1), (1L, 3L, 1L, 2)))
  }

  test("labelPropagation: two triangles with a bridge — synchronous " +
    "rounds with min-label tiebreak, hand-traced") {
    // triangle {1,2,3}, triangle {4,5,6}, bridge 3-4 (undirected op:
    // giving each edge once is enough)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val nodes = (1L to 6L).toDF("node")
    val out = Graph.labelPropagation(edges, nodes, iterations = 2)
      .as[(Long, Long)].collect().toMap
    // round 1: 1->2, 2->1, 3->1, 4->3, 5->4, 6->4
    // round 2: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
  }

  test("quantileCalibrate: exact percentiles per group, singleton " +
    "group pins to 0") {
    val df = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g1", 30L),
      (4L, "g2", 99L)).toDF("doc_id", "source", "score_ppm")
    val out = graft.ops.Profile
      .quantileCalibrate(df, "score_ppm", "source", "doc_id")
      .select("doc_id", "pct_ppm").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 500000L, 3L -> 1000000L, 4L -> 0L))
  }

  test("cooccurrence: document-level pair lift, min-doc floor, " +
    "hand-computed") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c"), (4L, "c d"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextStats
      .cooccurrence(docs, topVocab = 10, minPairDocs = 2L, k = 10)
      .select("w1", "w2", "n_xy", "n_x", "n_y", "lift_ppm")
      .as[(String, String, Long, Long, Long, java.math.BigDecimal)].collect()
    // only (a,b) survives the floor: n_xy=3, n_x=n_y=3, N=4
    // lift = 3*4*1e6 div 9 = 1333333
    assert(out.length === 1)
    val r = out.head
    assert((r._1, r._2, r._3, r._4, r._5) === ("a", "b", 3L, 3L, 3L))
    assert(r._6.longValueExact() === 1333333L)
  }

  test("interleaveBySource: positions rotate through sources and " +
    "strictly increase") {
    val docs = Seq((1L, "s0"), (2L, "s0"), (3L, "s0"), (4L, "s1"), (5L, "s1"))
      .toDF("doc_id", "source")
    val out = graft.ops.Sampling.interleaveBySource(docs)
      .select("doc_id", "source", "round", "src_idx", "global_pos")
      .as[(Long, String, Int, Long, Long)].collect().sortBy(_._5)
    assert(out.map(_._2).toSeq === Seq("s0", "s1", "s0", "s1", "s0"))
    assert(out.map(_._5).distinct.length === 5, "positions are unique")
    assert(out.map(_._5).toSeq === out.map(_._5).sorted.toSeq)
    // each source's rounds are 1..n in position order
    assert(out.filter(_._2 == "s0").map(_._3).toSeq === Seq(1, 2, 3))
    assert(out.filter(_._2 == "s1").map(_._3).toSeq === Seq(1, 2))
  }

  test("mmrRerank: hand-traced greedy — a diverse mid-relevance result " +
    "beats a redundant high-relevance one") {
    val cand = Seq((1L, 10L, 9000L), (1L, 11L, 8900L), (1L, 12L, 5000L))
      .toDF("query_id", "cand_id", "rel_q")
    // 11 points the same direction as 10 (cos exactly 1); 12 orthogonal
    val vecs = Seq(
      (10L, Seq(1f, 0f, 0f, 0f)), (11L, Seq(2f, 0f, 0f, 0f)),
      (12L, Seq(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.mmrRerank(cand, vecs, picks = 3, dim = 4)
      .select("pick", "cand_id", "mmr_q")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // pick 1: argmax rel = 10, mmr 7*9000 = 63000
    // pick 2: 11 scores 7*8900-3*10000 = 32300; 12 scores 7*5000-0 =
    //         35000 -> DIVERSE 12 wins over redundant 11
    // pick 3: 11, still 32300 (max sim to {10,12} is 10000)
    assert(out.toSeq === Seq((1, 10L, 63000L), (2, 12L, 35000L),
      (3, 11L, 32300L)))
  }

  test("HilbertKey: bijection and unit-step adjacency on the full " +
    "16x16 grid; generated code matches the static kernel") {
    import graft.functions.HilbertKey
    val bits = 4
    val n = 1 << bits
    val cells = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertKey.compute(x, y, bits) -> (x, y)).toMap
    assert(cells.size === n * n, "bijection onto [0, n^2)")
    assert(cells.keys.min === 0L && cells.keys.max === (n * n - 1).toLong)
    for (d <- 0L until (n * n - 1).toLong) {
      val (x1, y1) = cells(d); val (x2, y2) = cells(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve step $d -> ${d + 1} must move one cell")
    }
    // Column expression (codegen path) == static kernel
    val df = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        HilbertKey(col("x"), col("y"), 3).as("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) =>
      assert(d === HilbertKey.compute(x, y, 3), s"($x,$y)")
    }
  }

  test("hilbertReport: preserves rows, stays inside global envelopes, " +
    "and beats the unsorted layout's span on both dims") {
    val rows = (0 until 2000).map { i =>
      (i.toLong % 97, (i.toLong * 31) % 89)
    }.toDF("a", "b")
    val rep = graft.ops.Layout.hilbertReport(rows, "a", "b",
        bits = 8, nFiles = 16)
      .select("file_id", "n_rows", "a_span_ppm", "b_span_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(rep.map(_._2).sum === 2000L)
    assert(rep.forall(r => r._3 <= 1000000L && r._4 <= 1000000L))
    // locality: average per-file span must be well under the full range
    // on BOTH dimensions (an unsorted layout would sit near 1e6 on both)
    val meanA = rep.map(_._3).sum / rep.length
    val meanB = rep.map(_._4).sum / rep.length
    assert(meanA < 600000L, s"a spans should tighten, got mean $meanA")
    assert(meanB < 600000L, s"b spans should tighten, got mean $meanB")
  }

  test("IndexStore: the saved IVF index round-trips bit-identically " +
    "into search, and probing a list plans a PartitionFilter") {
    import graft.ops.{IndexStore, Similarity}
    val embs = (0 until 100)
      .map(i => (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7) % 17 - 8).toFloat)))
      .toDF("vec_id", "embedding")
    val asg = Similarity.assignToCentroids(embs, centroidStride = 10, dim = 8)
    val dir = tmpDir("ivf-index")
    IndexStore.saveIvf(asg, dir)
    val loaded = IndexStore.loadIvf(spark, dir)
    val q = embs.filter($"vec_id" % 20 === 0)
    def search(idx: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(q, embs, k = 3, centroidStride = 10, dim = 8,
          nprobe = 2, corpusAssigned = Some(idx))
        .select("query_id", "neighbor_id", "rank", "cos_q")
        .as[(Long, Long, Int, Long)].collect().sortBy(t => (t._1, t._3))
    assert(search(loaded).toSeq === search(asg).toSeq,
      "served-from-disk == served-from-memo")
    // posting-list pruning: filtering one list pushes a partition filter
    val probePlan = loaded.filter($"centroid_id" === 0L)
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters") &&
      probePlan.contains("centroid_id"), probePlan)
    assert(!probePlan.contains("PartitionFilters: []"), probePlan)
  }

  test("IndexStore compaction: fragmented posting lists collapse to " +
    "exactly the plan's file counts, untouched lists keep their files " +
    "byte-for-byte, data bit-equal, second pass a no-op") {
    import graft.ops.IndexStore
    val dir = tmpDir("ivf-compact")
    val asg = (0 until 25).map { i =>
      (i.toLong, if (i < 20) 0L else 1L,
        Array.tabulate(4)(d => (i * 4 + d).toDouble), 1.0)
    }.toDF("vec_id", "centroid_id", "cv", "cn")
    // list 0 arrives in four micro-batch appends (the stream-to-lake
    // fragmentation shape); list 1 lands whole in one
    Seq(0 until 5, 5 until 10, 10 until 15, 15 until 20).zipWithIndex
      .foreach { case (r, i) =>
        asg.filter($"vec_id" >= r.start && $"vec_id" < r.end).coalesce(1)
          .write.mode(if (i == 0) "overwrite" else "append")
          .partitionBy("centroid_id").parquet(dir)
      }
    asg.filter($"centroid_id" === 1L).coalesce(1)
      .write.mode("append").partitionBy("centroid_id").parquet(dir)

    val before = IndexStore.fileAudit(spark, dir)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(before === Map(0L -> ((20L, 4L)), 1L -> ((5L, 1L))))

    val plan = IndexStore.compactionPlan(asg, targetRowsPerFile = 8L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(plan === Map(0L -> 3L, 1L -> 1L)) // ceil(20/8)=3, ceil(5/8)=1

    // the decision surface agrees with what compact will do: list 0
    // (4 files > 3 target) -> compact, list 1 (1 <= 1) -> ok
    val report = IndexStore.maintenanceReport(spark, dir, 8L)
      .select("centroid_id", "action").as[(Long, String)]
      .collect().toMap
    assert(report === Map(0L -> "compact", 1L -> "ok"))

    val list1Dir = new java.io.File(s"$dir/centroid_id=1")
    val list1Before = list1Dir.listFiles().map(f => (f.getName, f.lastModified)).toSet
    val dataBefore = spark.read.parquet(dir)
      .select("vec_id", "cv").as[(Long, Array[Double])]
      .collect().sortBy(_._1).map(t => (t._1, t._2.toSeq))

    val summary = IndexStore.compact(spark, dir, targetRowsPerFile = 8L)
      .as[(Long, Long, Long, Long)].collect()
    assert(summary.toSeq === Seq((0L, 20L, 4L, 3L)),
      "only the fragmented list is rewritten")

    val after = IndexStore.fileAudit(spark, dir)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(after === Map(0L -> ((20L, 3L)), 1L -> ((5L, 1L))),
      "actual post-compaction file counts match the plan exactly")
    assert(list1Dir.listFiles().map(f => (f.getName, f.lastModified)).toSet
      === list1Before, "untouched list's files are not rewritten")

    val dataAfter = spark.read.parquet(dir)
      .select("vec_id", "cv").as[(Long, Array[Double])]
      .collect().sortBy(_._1).map(t => (t._1, t._2.toSeq))
    assert(dataAfter.toSeq === dataBefore.toSeq, "compaction moves bytes, not data")

    assert(IndexStore.compact(spark, dir, targetRowsPerFile = 8L).isEmpty,
      "a compact store compacts to a no-op")
  }

  test("IndexStore.forget: surgical erasure rewrites only the lists " +
    "holding forgotten vectors, untouched lists keep their files, a " +
    "fully-forgotten list's directory disappears, unknown ids no-op") {
    import graft.ops.IndexStore
    val dir = tmpDir("ivf-forget")
    val asg = (0 until 30).map { i =>
      (i.toLong, (i / 10).toLong,   // lists 0,1,2 with 10 rows each
        Array.fill(2)(1.0), 1.0)
    }.toDF("vec_id", "centroid_id", "cv", "cn")
    IndexStore.saveIvf(asg, dir)
    val list2Dir = new java.io.File(s"$dir/centroid_id=2")
    val list2Files = list2Dir.listFiles().map(f => (f.getName, f.lastModified)).toSet

    // forget one id from list 0 and two from list 1
    val s1 = IndexStore.forget(spark, dir, Seq(3L, 12L, 17L))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(s1.toSeq === Seq((0L, 1L, 9L), (1L, 2L, 8L)))
    assert(spark.read.parquet(dir).select("vec_id").as[Long]
      .collect().sorted.toSeq ===
      (0L until 30L).filterNot(Set(3L, 12L, 17L)))
    assert(list2Dir.listFiles().map(f => (f.getName, f.lastModified)).toSet
      === list2Files, "untouched list's files must not be rewritten")

    // forget the REST of list 1: its directory must vanish entirely
    val s2 = IndexStore.forget(spark, dir,
        (10L until 20L).filterNot(Set(12L, 17L)))
      .as[(Long, Long, Long)].collect()
    assert(s2.toSeq === Seq((1L, 8L, 0L)))
    assert(!new java.io.File(s"$dir/centroid_id=1").exists(),
      "an emptied list's stale files must not survive the forget pass")
    assert(spark.read.parquet(dir)
      .select(col("centroid_id").cast("long")).distinct()
      .as[Long].collect().sorted.toSeq === Seq(0L, 2L))

    // ids the store never held: empty summary, data unchanged
    assert(IndexStore.forget(spark, dir, Seq(999L)).isEmpty)
    assert(spark.read.parquet(dir).count() === 19L)
  }

  test("IndexStore compaction with clusterBy: rewritten files carry " +
    "DISJOINT vec_id ranges (point lookups skip all but one file on " +
    "footer stats), where the raw appends interleaved them") {
    import graft.ops.IndexStore
    val dir = tmpDir("ivf-compact-cluster")
    val asg = (0 until 24).map(i =>
        (i.toLong, 0L, Array.fill(2)(1.0), 1.0))
      .toDF("vec_id", "centroid_id", "cv", "cn")
    // four appends that INTERLEAVE the id space (append k holds
    // id % 4 == k) — every file's (min,max) spans ~the whole range,
    // so footer stats skip nothing, AND the list is fragmented past
    // the 3-file target, so compaction fires
    (0 until 4).foreach { k =>
      asg.filter($"vec_id" % 4 === k).coalesce(1)
        .write.mode(if (k == 0) "overwrite" else "append")
        .partitionBy("centroid_id").parquet(dir)
    }
    def fileRanges() = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"vec_id").as("lo"), max($"vec_id").as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val rawRanges = fileRanges()
    assert(rawRanges.size === 4 &&
      rawRanges.forall { case (lo, hi) => lo <= 3 && hi >= 20 },
      s"precondition: interleaved appends overlap fully, got $rawRanges")

    IndexStore.compact(spark, dir, targetRowsPerFile = 8L,
      clusterBy = Some("vec_id"))
    val ranges = fileRanges()
    assert(ranges.size === 3, s"ceil(24/8) files, got $ranges")
    assert(ranges.sliding(2).forall {
      case Seq((_, hi1), (lo2, _)) => hi1 < lo2
      case _                       => true
    }, s"clustered files must have disjoint id ranges: $ranges")
    // data conserved
    assert(spark.read.parquet(dir).select("vec_id").as[Long]
      .collect().sorted.toSeq === (0L until 24L))
  }

  test("IndexStore: PQ codebooks and codes round-trip unchanged") {
    import graft.ops.{IndexStore, Similarity}
    val embs = (0 until 60)
      .map(i => (i.toLong, Array.tabulate(8)(d => ((i * 13 + d * 5) % 11 - 5).toFloat)))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(embs, m = 2, dim = 8)
    val codes = Similarity.pqEncode(embs, cb, m = 2, dim = 8)
    val dir = tmpDir("pq-index")
    IndexStore.savePq(cb, codes, dir)
    val (cb2, codes2) = IndexStore.loadPq(spark, dir)
    assert(cb2.collect().map(_.toString).sorted.toSeq ===
      cb.collect().map(_.toString).sorted.toSeq)
    assert(codes2.collect().map(_.toString).sorted.toSeq ===
      codes.collect().map(_.toString).sorted.toSeq)
  }

  // driver-side HLL reference: bucket = 24 md5 bits mod m,
  // rho = 41 - bitlength(40 tail bits)
  private def hllRef(keys: Seq[String], m: Int): Map[Long, Int] = {
    def parts(k: String): (Long, Int) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.take(6), 16) % m
      val tail = java.lang.Long.parseLong(hex.slice(6, 16), 16)
      (bucket, 41 - java.lang.Long.toBinaryString(tail).length +
        (if (tail == 0) 1 else 0))
    }
    // toBinaryString(0) = "0" (length 1) but rho for a zero tail is 41
    keys.map(parts).groupBy(_._1).map { case (b, v) => b -> v.map(_._2).max }
  }

  test("hllRegisters matches a driver-side md5 reference, duplicates and all") {
    val keys = Seq("alpha", "beta", "gamma", "delta", "the", "x", "alpha",
      "beta", "beta")
    val got = Sketch.hllRegisters(keys.toDF("k"), "k", b = 4)
      .as[(Long, Int)].collect().toMap
    assert(got === hllRef(keys.distinct, 16))
  }

  test("hll per-source registers max-merge to exactly the global build") {
    val rows = (1 to 200).map(i => (s"s${i % 3}", s"key$i"))
    val df = rows.toDF("source", "k")
    val perSrc = Sketch.hllRegisters(df, "k", b = 5, Seq("source"))
    val merged = Sketch.hllMerge(perSrc)
      .as[(Long, Int)].collect().toSet
    val global = Sketch.hllRegisters(df, "k", b = 5)
      .as[(Long, Int)].collect().toSet
    assert(merged === global)
  }

  test("hllEstimate equals the exact-rational driver formula and tracks " +
    "cardinality") {
    val m = 64
    val small = (1 to 300).map(i => s"a$i")
    val large = (1 to 3000).map(i => s"b$i")
    def estOf(keys: Seq[String]): Long = {
      val regs = hllRef(keys, m)
      val alphaPpm = math.floor(1e6 * 0.7213 / (1 + 1.079 / m)).toLong
      val num = BigInt(alphaPpm) * m * m * (BigInt(1) << 41)
      val s = regs.values.map(r => BigInt(1) << (41 - r)).sum +
        BigInt(m - regs.size) * (BigInt(1) << 41)
      (num / (s * 1000000)).toLong
    }
    for (keys <- Seq(small, large)) {
      val got = Sketch.hllEstimate(
        Sketch.hllRegisters(keys.toDF("k"), "k", b = 6), b = 6)
        .as[(Long, Long)].collect()
      assert(got.length === 1)
      assert(got.head._2 === estOf(keys))
      // raw HLL at n >> m: within ~35% of truth (1.04/sqrt(64) = 13% sd)
      val n = keys.size.toDouble
      assert(math.abs(got.head._2 - n) / n < 0.35, s"est=${got.head._2} n=$n")
    }
    // and the estimate must actually order the two corpora
    assert(estOf(large) > estOf(small))
  }

  test("BottomK aggregator: bottom-k distinct under any partitioning, " +
    "duplicates absorbed, merge == single-pass") {
    val vals = (1 to 500).map(i => ((i * 7919) % 997).toLong) // dups included
    val ref = vals.distinct.sorted.take(16)
    for (parts <- Seq(1, 4, 13)) {
      val df = vals.toDF("h").repartition(parts)
      val bk = udaf(graft.functions.BottomK(16),
        org.apache.spark.sql.Encoders.scalaLong)
      val got = df.groupBy().agg(bk(col("h"))).as[Seq[Long]].head()
      assert(got === ref, s"parts=$parts")
    }
  }

  test("kmvSketch + kmvPairOverlap: below-k pairs report EXACT set " +
    "algebra; estimates track planted overlap") {
    // two sources sharing exactly 10 of 30 keys each — well under k=64,
    // so the sketch IS the set and union/intersection must be exact
    val rows = ((1 to 30).map(i => ("a", s"k$i")) ++
      (21 to 50).map(i => ("b", s"k$i")) ++
      (21 to 50).map(i => ("b", s"k$i"))).toSeq // duplicate b rows: absorbed
    val sk = Sketch.kmvSketch(rows.toDF("source", "g"), "g", 64, Seq("source"))
    val out = Sketch.kmvPairOverlap(sk, "source", 64)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.length === 1)
    val (a, b, nK, sharedK, unionEst, interEst) = out.head
    assert((a, b) === ("a", "b"))
    assert(nK === 50L) // |union| = 50 < k
    assert(sharedK === 10L)
    assert(unionEst === 50L) // exact below k
    assert(interEst === 10L * 50L / 64L) // J-scaled: (shared*union) div k
    // large case: estimates land within 40% of a planted truth
    val big = ((1 to 2000).map(i => ("x", s"v$i")) ++
      (1001 to 3000).map(i => ("y", s"v$i"))).toSeq
    val sk2 = Sketch.kmvSketch(big.toDF("source", "g"), "g", 64, Seq("source"))
    val o2 = Sketch.kmvPairOverlap(sk2, "source", 64)
      .as[(String, String, Long, Long, Long, Long)].head()
    assert(math.abs(o2._5 - 3000.0) / 3000.0 < 0.4, s"union_est=${o2._5}")
    assert(o2._6 > 0L, "planted 1000-key intersection must register")
  }

  test("cms sketch built from weighted counts equals one built from raw rows") {
    val raw = Seq("x", "x", "y", "z", "z", "z").toDF("term")
      .withColumn("one", lit(1L))
    val weighted = raw.groupBy("term").agg(sum("one").as("c"))
    val a = Sketch.cmsCells(raw, "term", "one", 4, 16)
      .as[(Int, Long, Long)].collect().toSet
    val b = Sketch.cmsCells(weighted, "term", "c", 4, 16)
      .as[(Int, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("bitextMargin: candidates are cross-label knn edges only, one per " +
    "query, margins positive and ordered, bounded at 50") {
    val out = graft.queries.ExtensionQueries
      .bitextMargin(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty && out.length <= 50)
    assert(out.forall(r =>
      r.getAs[Int]("src_label") != r.getAs[Int]("dst_label")))
    assert(out.map(_.getAs[Long]("src")).distinct.length === out.length)
    val margins = out.map(_.getAs[Long]("margin_ppm"))
    assert(margins.forall(_ > 0))
    assert(margins.sameElements(margins.sortBy(-_)))
  }

  test("pqRerankTopK: exact stage re-scores only the ADC shortlist; " +
    "cos values agree with brute force; the re-rank genuinely reorders") {
    import graft.ops.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") % 50 === 0)
    val rerank = Similarity.pqRerankTopK(q, e, k = 5, shortlist = 50).collect()
    val shortlistPairs = Similarity.pqTopK(q, e, k = 50).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(rerank.forall(r => shortlistPairs(
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))))
    val brute = Similarity.bruteForceTopK(q, e, k = e.count().toInt).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Long]("cos_q")).toMap
    assert(rerank.forall(r => brute(
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))) ===
      r.getAs[Long]("cos_q")))
    // compression mis-orders at least one pair somewhere (else the
    // refine stage would be pointless on this fixture)
    assert(rerank.exists(r => r.getAs[Int]("rank") !=
      r.getAs[Int]("adc_rank")))
  }
}
