package graft

import graft.functions.BpeApply
import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer training + encoding: the kernel against hand-computed
  * merge traces, the trainer against the classic worked example, and
  * the lossless round-trip invariant on real fixture data.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def applyMerges(word: String,
                          merges: Seq[(String, String)]): Seq[String] = {
    val syms = word.map(_.toString) :+ "</w>"
    Seq(syms).toDF("s")
      .select(BpeApply(col("s"), merges).as("out"))
      .as[Seq[String]].head()
  }

  test("BpeApply replays the standard greedy-by-rank merge loop " +
    "(hand-computed traces, rank priority over position)") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    // low: [l,o,w,</w>] -> [lo,w,</w>] -> [low,</w>] -> [low</w>]
    assert(applyMerges("low", merges) === Seq("low</w>"))
    // lower: merges stop once no ranked pair remains
    assert(applyMerges("lower", merges) === Seq("low", "e", "r", "</w>"))
    // rank beats position: in "lol", (o,l) outranks (l,o), so the
    // LATER pair merges first and (l,o) never becomes adjacent-mergeable
    val ranked = Seq(("o", "l"), ("l", "o"))
    assert(applyMerges("lol", ranked) === Seq("l", "ol", "</w>"))
    // all non-overlapping occurrences merge in one step, left to right:
    // "aaaa" with (a,a) -> [aa, aa, </w>] -> [aaaa, </w>] via (aa,aa)
    assert(applyMerges("aaaa", Seq(("a", "a"))) === Seq("aa", "aa", "</w>"))
    assert(applyMerges("aaaa", Seq(("a", "a"), ("aa", "aa"))) ===
      Seq("aaaa", "</w>"))
    // odd run: trailing singleton survives the pass
    assert(applyMerges("aaa", Seq(("a", "a"))) === Seq("aa", "a", "</w>"))
    // empty merge list is the identity on the char split
    assert(applyMerges("ab", Nil) === Seq("a", "b", "</w>"))
  }

  test("train reproduces the classic worked example (weighted pair " +
    "counts, lexicographic tie-break) and stops when no pair repeats") {
    val docs = Seq((1L, "low low low"), (2L, "lower lowest"))
      .toDF("doc_id", "text")
    // round-by-round: (l o):5 ties (o w):5 -> lexicographic; then
    // (lo w):5; then (low </w>):3; then (low e):2; then every pair is
    // a hapax -> early stop despite numMerges = 10
    val merges = Bpe.train(docs, numMerges = 10)
    assert(merges === Seq(("l", "o"), ("lo", "w"), ("low", "</w>"),
      ("low", "e")))
    // a smaller budget is a prefix of the same sequence
    assert(Bpe.train(docs, numMerges = 2) === merges.take(2))
    assert(Bpe.train(docs, numMerges = 0) === Nil)
  }

  test("encode flattens per-word encodings in order; round-trip audit " +
    "is empty for any merge list and flags a tampered encoding") {
    val docs = Seq((1L, "low lower"), (2L, "low  low")) // double space
      .toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val enc = Bpe.encode(docs, merges)
    val row1 = enc.filter(col("doc_id") === 1L)
      .select("bpe_tokens", "n_bpe_tokens")
      .as[(Seq[String], Long)].head()
    assert(row1._1 === Seq("low</w>", "low", "e", "r", "</w>"))
    assert(row1._2 === 5L)
    assert(Bpe.roundTripViolations(enc, docs).isEmpty)
    // encoding is lossless under ANY ranked list, trained or not
    assert(Bpe.roundTripViolations(Bpe.encode(docs, Nil), docs).isEmpty)
    // a corrupted token surfaces as a violation row
    val tampered = enc.withColumn("bpe_tokens",
      when(col("doc_id") === 2L, array(lit("oops</w>")))
        .otherwise(col("bpe_tokens")))
    val bad = Bpe.roundTripViolations(tampered, docs)
      .select("doc_id").as[Long].collect()
    assert(bad.toSeq === Seq(2L))
    // a doc MISSING from the encoding is a violation, never silently
    // unaudited
    val partial = enc.filter(col("doc_id") =!= 2L)
    assert(Bpe.roundTripViolations(partial, docs)
      .select("doc_id").as[Long].collect().toSeq === Seq(2L))
    // null text and in-token control characters round-trip clean: the
    // tokenizer splits on ' ' only, so a tab stays inside its token,
    // and normalization collapses SPACE runs only
    val edge = Seq((1L, null: String), (2L, "a\tb c")).toDF("doc_id", "text")
    assert(Bpe.roundTripViolations(Bpe.encode(edge, merges), edge).isEmpty)
    // literal "</w>" in corpus text round-trips clean: the audit
    // strips end-marks per token (suffix-anchored), so the marker's
    // unmerged single-char tokens never reassemble into a phantom
    // word boundary
    val inBand = Seq((1L, "a</w>b"), (2L, "</w> x</w>"))
      .toDF("doc_id", "text")
    assert(Bpe.roundTripViolations(Bpe.encode(inBand, merges), inBand)
      .isEmpty)
    // the one ambiguity left (documented): a merge list that spells
    // the exact marker out of pure text characters — that token is
    // indistinguishable from a word boundary and still false-flags
    val markerMerges = Seq(("<", "/"), ("</", "w"), ("</w", ">"))
    val spelled = Seq((1L, "a</w> b")).toDF("doc_id", "text")
    assert(Bpe.roundTripViolations(
      Bpe.encode(spelled, markerMerges), spelled).count() === 1L)
  }

  test("vocab enumerates exactly the emittable symbols with dense " +
    "deterministic ids, and every encoded token is in-vocab") {
    val docs = Seq((1L, "low lower lowest")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val v = Bpe.vocab(docs, merges).as[(String, Long)].collect().sortBy(_._2)
    // base chars sorted, then end mark, then merge products in rank order
    assert(v.map(_._1).toSeq === Seq("e", "l", "o", "r", "s", "t", "w",
      "</w>", "lo", "low", "low</w>"))
    assert(v.map(_._2).toSeq === (0L until 11L))
    // closure: everything encode emits resolves to a vocab id
    val emitted = Bpe.encode(docs, merges)
      .select(explode(col("bpe_tokens")).as("t"))
      .distinct().as[String].collect().toSet
    assert(emitted.subsetOf(v.map(_._1).toSet), emitted)
    // duplicate merge product keeps the earlier id (no double entry)
    val dup = Bpe.vocab(docs, merges :+ ("l", "o"))
    assert(dup.count() === 11L)
  }

  test("driver-path, sequential-distributed, and batched-distributed " +
    "trainers produce bit-identical merge lists (real corpus + the " +
    "adversarial case where naive disjoint-batching reorders)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val driver = Bpe.train(docs, numMerges = 24) // vocab fits the bound
    val seq = Bpe.train(docs, numMerges = 24, driverVocabBound = 0,
      batchK = 1)
    val batched = Bpe.train(docs, numMerges = 24, driverVocabBound = 0)
    assert(seq === driver)
    assert(batched === driver)
    // word "xab" x100, word "cd" x50: merging (a,b) spawns (x,ab) and
    // (ab,</w>) at count 100, which must both outrank (c,d):50 — a
    // batch that grabbed [(a,b),(c,d)] because they share no symbol
    // would mis-order the list; the safe prefix stops after (a,b)
    val adv = ((1 to 100).map(i => (i.toLong, "xab")) :+
      (200L, Seq.fill(50)("cd").mkString(" ")))
      .toDF("doc_id", "text")
    val advSeq = Bpe.train(adv, numMerges = 5, driverVocabBound = 0,
      batchK = 1)
    val advBat = Bpe.train(adv, numMerges = 5, driverVocabBound = 0)
    val advDrv = Bpe.train(adv, numMerges = 5)
    assert(advSeq === Seq(("a", "b"), ("ab", "</w>"), ("x", "ab</w>"),
      ("c", "d"), ("cd", "</w>")))
    assert(advBat === advSeq)
    assert(advDrv === advSeq)
  }

  test("pinned well-formed merge list: greedy-by-rank kernel equals " +
    "sequential replace-to-fixpoint (the q_bpe_encode_fixed oracle's " +
    "construction) on adversarial words") {
    val fixed = Seq("t" -> "a", "ta" -> "b", "s" -> "l")
    // the oracle's construction: space-joined char symbols + end mark,
    // one replace-all per merge in rank order
    def oracle(word: String): Seq[String] =
      (word.map(_.toString).mkString(" ") + " </w>")
        .replace("t a", "ta").replace("ta b", "tab").replace("s l", "sl")
        .split(" ").toSeq
    // repeats, partial prefixes, products adjacent to their own
    // components, merges interleaved, and the spurious-substring traps
    // (a word where "a b" sits inside "ta b", and "l" after a merged
    // product) — every case where a boundary-naive replace would lie
    val words = Seq("tab", "ta", "t", "ab", "tta", "tatab", "tabtab",
      "atab", "taab", "sl", "ssl", "slsl", "stab", "tasb", "tastasl",
      "batsla", "ttaabb", "slta", "tabs", "stale", "table", "slab")
    for (w <- words)
      assert(applyMerges(w, fixed) === oracle(w), s"word=$w")
  }

  /** The q_bpe_encode DYNAMIC oracle's semantics, mirrored in Scala:
    * delimiter-wrapped symbols over the whole document, one literal
    * replace-all per merge in rank order (java.lang.String.replace is
    * leftmost non-overlapping — the same contract as DuckDB replace),
    * token count = open-delimiter count.
    */
  private def delimitedOracleCount(text: String,
                                   merges: Seq[(String, String)]): Long = {
    def sym(s: String) = "\u0002" + s + "\u0003"
    val s0 = text.split(" ").filter(_.nonEmpty).map { w =>
      val cps = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      cps.map(sym).mkString + sym("</w>")
    }.mkString
    val s = merges.foldLeft(s0) { case (acc, (l, r)) =>
      acc.replace(sym(l) + sym(r), sym(l + r))
    }
    s.count(_ == '\u0002')
  }

  test("sequentialReplaceUnsafe accepts trained lists and rejects each " +
    "documented hazard by name") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 24)
    assert(Bpe.sequentialReplaceUnsafe(merges) === None)
    // later product equals an earlier pair's component: with
    // [(ab,c), (a,b)] greedy encodes "abc" as [abc] (rank-1 creates
    // the adjacency rank-0 then consumes) but sequential passes stop
    // at [ab, c] — exactly the divergence the check guards
    assert(Bpe.sequentialReplaceUnsafe(
      Seq("ab" -> "c", "a" -> "b")).exists(_.contains("earlier merge")))
    // left component carrying the end mark (cross-word replace hazard)
    assert(Bpe.sequentialReplaceUnsafe(
      Seq("t</w>" -> "x")).exists(_.contains("end mark")))
    // representation guards
    assert(Bpe.sequentialReplaceUnsafe(
      Seq("a b" -> "c")).exists(_.contains("space")))
    assert(Bpe.sequentialReplaceUnsafe(
      Seq("" -> "c")).exists(_.contains("empty")))
  }

  test("delimited sequential-replace oracle equals the greedy kernel " +
    "on the TRAINED sf0.001 merges (whole corpus) and on the boundary " +
    "trap a space-joined replace gets wrong") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 24)
    assert(Bpe.sequentialReplaceUnsafe(merges) === None)
    val kernel = Bpe.encode(docs, merges)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    val texts = docs.as[(Long, String)].collect()
    assert(texts.nonEmpty)
    for ((id, text) <- texts)
      assert(delimitedOracleCount(Option(text).getOrElse(""), merges)
        === kernel(id), s"doc_id=$id")
    // merges (a,b) then (b,c) on "abc": greedy yields [ab, c, </w>]
    // (b,c never becomes adjacent) = 3 tokens; a space-joined oracle
    // would falsely match "b c" inside "ab c" and claim 2 — the
    // delimiter wrapping is what makes the trained oracle exact
    val trap = Seq("a" -> "b", "b" -> "c")
    assert(Bpe.sequentialReplaceUnsafe(trap) === None)
    assert(applyMerges("abc", trap) === Seq("ab", "c", "</w>"))
    assert(delimitedOracleCount("abc", trap) === 3L)
    // and the oracle builder refuses exactly when the checker does
    import graft.queries.ExtensionQueries
    assert(ExtensionQueries.bpeEncodeOracleSql(merges).isDefined)
    assert(ExtensionQueries.bpeEncodeOracleSql(
      Seq("ab" -> "c", "a" -> "b")).isEmpty)
  }

  test("fertilityByGroup aggregates hand-computed words/tokens/chars " +
    "per language, counting null text as empty") {
    // merges: a+b. Per doc ([sym]</w> per word):
    //   en "ab ab": 2 words, 4 chars, [ab,</w>] x2 -> 4 tokens
    //   en "a":     1 word,  1 char,  [a,</w>]     -> 2 tokens
    //   de null:    0 words, 0 chars, 0 tokens
    //   de "abc x": 2 words, 4 chars, [ab,c,</w>] + [x,</w>] -> 5 tokens
    val docs = Seq(
      ("en", Some("ab ab")), ("en", Some("a")),
      ("de", None), ("de", Some("abc x")))
      .toDF("lang", "text")
    val f = Bpe.fertilityByGroup(docs, Seq("a" -> "b"))
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(f.toSeq === Seq(
      ("de", 2L, 2L, 5L, 4L, 2.5, 0.8),
      ("en", 2L, 3L, 6L, 5L, 2.0, 5.0 / 6.0)))
  }

  test("trained tokenizer round-trips the sf0.001 documents corpus " +
    "losslessly (train on the corpus, encode the corpus, zero " +
    "violations) and compresses vs the char split") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 30)
    assert(merges.nonEmpty && merges.size <= 30)
    val enc = Bpe.encode(docs, merges)
    assert(Bpe.roundTripViolations(enc, docs).isEmpty)
    // merges must actually compress: fewer BPE tokens than characters
    val (bpe, chars) = enc.join(docs, "doc_id")
      .agg(sum(col("n_bpe_tokens")), sum(length(regexp_replace(col("text"), " ", ""))))
      .as[(Long, Long)].head()
    assert(bpe < chars, s"no compression: $bpe bpe tokens vs $chars chars")
  }
}
