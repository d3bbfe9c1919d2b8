package graft

import graft.ops.{Dedup, Sampling, TextStats}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: scrub -> dedup (exact + near-dup
  * clusters) -> leakage-safe split -> chunk, composed over one
  * synthetic corpus with planted PII, exact dups, and near dups —
  * asserting the invariants a training-data build relies on across
  * operator BOUNDARIES (each op's own semantics are unit-tested
  * elsewhere).
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 3 near-dup families x 10 docs (one-token variations), 5 exact dups
  // of doc 1, plus planted PII in every text
  private def corpus = {
    val families = for {
      f <- 0 until 3
      i <- 0 until 10
    } yield (f * 100L + i,
      s"contact f$f@example.com " +
        (0 until 12).map(k => s"fam${f}tok$k").mkString(" ") + s" var$i")
    val exactDups = (0 until 5).map(j => (500L + j, families.head._2))
    (families ++ exactDups).toDF("doc_id", "text")
  }

  test("scrub -> dedup -> split -> chunk composes with conserved " +
    "invariants across operator boundaries") {
    val raw = corpus
    val n = raw.count()

    // 1. scrub first: no raw emails survive; row count conserved
    val clean = raw.select(col("doc_id"), TextStats.scrub(col("text")).as("text"))
    assert(clean.count() === n)
    assert(clean.filter(col("text").rlike("@example\\.com")).isEmpty)
    assert(clean.filter(col("text").contains("<EMAIL>")).count() === n)

    // 2. exact dedup on the SCRUBBED text: the 5 copies of doc 1 and
    // doc 1 itself collapse to one canonical group of 6
    val exact = Dedup.exact(clean)
    val dupGroup = exact.filter(col("n_copies") === 6).collect()
    assert(dupGroup.length === 1 && dupGroup.head.getAs[Long]("canonical_id") === 0L)

    // 3. near-dup clusters over 0.7-Jaccard pairs: each family (and
    // the exact dups of its member) lands in ONE cluster labeled by
    // its min doc id
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccard(clean, 0.7), clean)
    val byCluster = clusters.as[(Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.keySet === Set(0L, 100L, 200L))
    assert(byCluster(0L) === ((0L until 10L).toSet ++ (500L until 505L).toSet))
    assert(byCluster(100L) === (100L until 110L).toSet)

    // 4. leakage-safe split keyed on the CLUSTER: no cluster straddles
    val splitDf = Sampling.splitByGroup(
      clean.join(clusters, Seq("doc_id")), "cluster_id", 0.5)
    val sides = splitDf.select("cluster_id", "split").as[(Long, String)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(sides.values.forall(_.size == 1))

    // 5. chunking conserves tokens (stride == size: no overlap)
    val chunked = TextStats.chunk(clean, chunkSize = 8, stride = 8)
    val chunkTokens = chunked.agg(sum(col("n_tokens"))).as[Long].head()
    val docTokens = clean.select(size(split(col("text"), " ")).cast("long"))
      .as[Long].collect().sum
    assert(chunkTokens === docTokens)

    // 6. packing the chunk stream: the token axis is gapless (each
    // start = previous start + previous width), sequence offsets stay
    // under the budget, and the last sequence's id says the axis length
    // is exactly the conserved token total
    val budget = 16L
    val packed = graft.ops.Pack.packSequences(
        chunked.select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("n_tokens").cast("long").as("n_tokens")),
        budget = budget)
      .select("doc_id", "chunk_idx", "n_tokens", "tok_start", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    packed.sliding(2).foreach {
      case Array(a, b) => assert(b._4 === a._4 + a._3, s"gap between $a and $b")
      case _ =>
    }
    assert(packed.forall(r => r._6 < budget && r._6 === r._4 % budget))
    assert(packed.last._4 + packed.last._3 === docTokens)
  }

  test("provenance ledger: every doc gets its FIRST drop stage in " +
    "pipeline order, and the funnel conserves docs and tokens") {
    val kept = (0 until 25).map(k => s"k$k").mkString(" ")      // 25 distinct
    val bench = (0 until 25).map(k => s"b$k").mkString(" ")     // the heldout doc
    val contam = "b0 b1 b2 b3 " +                               // 2 shared trigrams
      (0 until 21).map(k => s"c$k").mkString(" ")
    val shortT = "s1 s2 s3"
    val lowDiv = Seq.fill(30)("x").mkString(" ")                // 1/30 < 0.3
    val df = Seq(
      1L -> kept, 2L -> kept,          // 2 duplicates of 1 -> 1 kept, 2 dup
      3L -> shortT, 4L -> lowDiv,
      5L -> contam, 8L -> contam,      // 8 is a dup of 5 -> duplicate BEFORE contaminated
      6L -> shortT, 7L -> shortT,      // short dups -> too_short BEFORE duplicate
      100L -> bench                    // %100==0 -> heldout benchmark
    ).toDF("doc_id", "text")
    val ledger = graft.queries.ExtensionQueries.provenanceLedger(df)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(ledger.map(r => r._1 -> r._3).toMap === Map(
      1L -> "kept", 2L -> "duplicate", 3L -> "too_short",
      4L -> "low_diversity", 5L -> "contaminated", 6L -> "too_short",
      7L -> "too_short", 8L -> "duplicate", 100L -> "heldout_benchmark"))
    // stage index mirrors the verdict order
    assert(ledger.collect { case (_, st, "kept") => st }.toSet === Set(6L))
    assert(ledger.collect { case (_, st, "duplicate") => st }.toSet === Set(4L))
    assert(ledger.collect { case (_, st, "heldout_benchmark") => st }.toSet === Set(1L))

    // a null text dies at stage 0, and nothing downstream NPEs on it
    val withNull = df.union(Seq((9L, null: String)).toDF("doc_id", "text"))
    val nullRow = graft.queries.ExtensionQueries.provenanceLedger(withNull)
      .filter(col("doc_id") === 9L).as[(Long, Long, String)].head()
    assert(nullRow === ((9L, 0L, "unreadable")))
  }

  test("incremental provenance: arrival beats id for base duplicates, " +
    "batch canonical within the batch, and judging batch-by-batch " +
    "composes to the whole-batch ledger") {
    import graft.queries.ExtensionQueries.provenanceIncrLedger
    val longText = (c: Char) => (0 until 25).map(k => s"$c$k").mkString(" ")
    val bench = longText('b')
    val base = Seq(
      50L -> longText('x'),            // content X curated long ago
      51L -> longText('z'),
      200L -> bench                     // the heldout benchmark doc
    ).toDF("doc_id", "text")
    val incoming = Seq(
      // same content as base doc 50 but a SMALLER id: arrival-order
      // semantics must call the NEW doc the duplicate
      10L -> longText('x'),
      // brand-new content arriving twice in one batch: min-id canonical
      20L -> longText('y'), 30L -> longText('y'),
      // shares 2 distinct trigrams with the base bench doc
      11L -> ("b0 b1 b2 b3 " + (0 until 21).map(k => s"c$k").mkString(" ")),
      12L -> longText('w')              // clean -> kept
    ).toDF("doc_id", "text")
    val got = provenanceIncrLedger(incoming, base)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._3).toMap === Map(
      10L -> "duplicate", 11L -> "contaminated", 12L -> "kept",
      20L -> "kept", 30L -> "duplicate"))

    // composition: judging [batch1; batch2] one at a time against the
    // growing base equals the one-shot ledger over the union (arrival
    // order = id order, all bench docs already in base)
    val batch1 = incoming.filter($"doc_id" <= 12L)
    val batch2 = incoming.filter($"doc_id" > 12L)
    val stepwise =
      provenanceIncrLedger(batch1, base).unionByName(
        provenanceIncrLedger(batch2, base.unionByName(batch1)))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(stepwise.toSeq === got.toSeq,
      "batch-at-a-time judging must compose to the whole-batch ledger")
  }
}
