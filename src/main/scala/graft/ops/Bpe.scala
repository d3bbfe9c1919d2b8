package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.{BpeApply, WordNgrams}

/** BPE tokenizer TRAINING and ENCODING over a corpus — the
  * freeze-the-tokenizer step a training-data pipeline runs between
  * curation and packing (Sennrich et al., ACL'16: learn merges from a
  * word-frequency table; GPT-2's public encoder applies them greedily
  * by rank).
  *
  * Scale shape — the part that matters at 100 TB:
  *   - the corpus is scanned ONCE, into the word-frequency table
  *     (partial-agged hash aggregation on the word; output is
  *     VOCABULARY-sized, independent of corpus size);
  *   - every training round then runs over that vocab table only
  *     (re-encode with current merges via the native [[BpeApply]]
  *     kernel, count weighted symbol pairs via [[WordNgrams]], take
  *     the global top pair) — `numMerges` small jobs whose cost does
  *     not grow with the corpus;
  *   - encoding is a pure projection (merge table shipped in the plan
  *     as expression state, no join, no shuffle, codegen'd kernel) —
  *     exactly how a frozen tokenizer should meet a 100 TB corpus.
  *
  * Determinism: pair counts are exact longs; the winning pair breaks
  * count ties lexicographically; word splitting is character-level
  * with an explicit end-of-word marker symbol.
  */
object Bpe {

  /** The classic BPE training set: (word, n) — one row per DISTINCT
    * word. The `endMark` travels as a separate terminal symbol, so
    * word-final merges stay distinct from word-internal ones.
    */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextStats.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Character symbols of a word plus the terminal marker — the round-0
    * encoding every merge grows from.
    */
  private def charSymbols(word: org.apache.spark.sql.Column, endMark: String) =
    concat(split(word, ""), array(lit(endMark)))

  /** Learn `numMerges` merges from the corpus. Returns the RANKED merge
    * list (earlier = higher priority). Stops early when no pair occurs
    * twice (merging hapax pairs memorizes the corpus, not a
    * vocabulary).
    *
    * Two bit-identical paths, picked by vocabulary size — the same
    * adaptive discipline as [[Dedup.smallVocab]]:
    *   - **driver path** (distinct words <= `driverVocabBound`): the
    *     word-frequency table — already vocabulary-sized by design —
    *     is collected once and the greedy loop runs in memory, exactly
    *     the reference algorithm (Sennrich ACL'16 learns from a vocab
    *     dict in memory). One Spark job total instead of one per merge.
    *   - **distributed path** (big vocab, or `driverVocabBound = 0`):
    *     per-round vocab-table jobs as before, but each round collects
    *     the top-`batchK` ranked pairs and merges the longest SAFE
    *     ranked prefix in one pass (multi-merge BPE). A prefix
    *     [p1..pk] is safe iff the pairs are pairwise symbol-disjoint
    *     AND no unselected pair that overlaps an earlier selection's
    *     symbols has count >= the candidate's: a merge of (a,b) can
    *     only create pairs whose count is bounded by an OLD pair
    *     overlapping a or b (every occurrence of `l·ab` was `l·a`
    *     before), so under that guard the candidate still strictly
    *     outranks everything the earlier merges spawn, and the batched
    *     merge list is bit-identical to the sequential one. Ties stop
    *     the prefix (a spawned pair could tie and win the lexicographic
    *     break); rows below the collected cutoff are unverifiable, so
    *     the prefix also stops at the cutoff count unless the whole
    *     table was collected.
    *
    * Both loops are driver-bounded (same discipline as
    * [[Similarity.kmeans]]); ranking ties break on the UTF-8 byte order
    * of the "left right" pair key on both paths (Spark string sorts
    * compare UTF-8 bytes, i.e. code points — NOT Java's UTF-16 code
    * units, which order supplementary characters differently).
    */
  def train(docs: DataFrame, numMerges: Int,
            textCol: String = "text",
            endMark: String = "</w>",
            batchK: Int = 64,
            driverVocabBound: Int = 1 << 16): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    require(driverVocabBound >= 0,
      s"driverVocabBound must be >= 0, got $driverVocabBound")
    // pair keys are "left right" strings, so a space inside the end
    // mark would corrupt the split-on-first-space parse below
    require(!endMark.contains(' '), s"endMark must not contain a space: '$endMark'")
    // localCheckpoint: the rounds (or the driver collect) re-read this
    // table; without it every consumer re-scans the corpus
    val wf = wordFreq(docs, textCol).localCheckpoint()
    val small = driverVocabBound > 0 &&
      wf.limit(driverVocabBound + 1).count() <= driverVocabBound
    if (small) trainDriver(wf, numMerges, endMark)
    else trainDistributed(wf, numMerges, endMark, batchK)
  }

  /** UTF-8 byte order — what Spark's string comparison uses. Driver and
    * distributed rankings must break count ties identically.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** In-memory exact greedy trainer over the collected vocab table.
    * Symbols come out of the SAME `charSymbols` expression the
    * distributed path feeds the kernel, so word splitting cannot
    * diverge between paths. Counts are recomputed per round — O(vocab
    * x word length) per merge, bounded by `driverVocabBound`.
    */
  private def trainDriver(wf: DataFrame, numMerges: Int,
                          endMark: String): Seq[(String, String)] = {
    val words: Array[(Array[String], Long)] = wf
      .select(charSymbols(col("word"), endMark).as("syms"), col("n"))
      .collect()
      .map(r => (r.getSeq[String](0).toArray, r.getLong(1)))
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val cnt = new java.util.HashMap[String, Long]()
      for ((syms, n) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          cnt.merge(syms(i) + " " + syms(i + 1), n, (a, b) => a + b)
          i += 1
        }
      }
      var best: String = null
      var bestC = 1L // floor: a winning pair must occur at least twice
      cnt.forEach { (p, c) =>
        if (c > bestC || (c == bestC && best != null && utf8Less(p, best))) {
          best = p; bestC = c
        }
      }
      if (best == null) done = true
      else {
        val Array(l, r) = best.split(" ", 2)
        merges += ((l, r))
        // apply the merge in place, leftmost-first — the kernel's rule
        for (wi <- words.indices) {
          val syms = words(wi)._1
          if (syms.exists(_ == l)) {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            words(wi) = (out.result(), words(wi)._2)
          }
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Per-round distributed trainer with safe-prefix multi-merge
    * batching (see [[train]] for the safety argument).
    */
  private def trainDistributed(wf: DataFrame, numMerges: Int,
                               endMark: String,
                               batchK: Int): Seq[(String, String)] = {
    val merges = Vector.newBuilder[(String, String)]
    var cur = Seq.empty[(String, String)]
    var merged = 0
    var done = false
    while (merged < numMerges && !done) {
      val top = wf
        .select(col("n"),
          explode(WordNgrams(
            BpeApply(charSymbols(col("word"), endMark), cur), 2)).as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("cnt"))
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(batchK)
        .collect()
      if (top.isEmpty) done = true
      else {
        val rows = top.map(r => (r.getString(0), r.getLong(1)))
        val fullTable = rows.length < batchK
        val cMin = rows.last._2
        val touched = scala.collection.mutable.Set.empty[String]
        val selected = scala.collection.mutable.Set.empty[String]
        val batch = Vector.newBuilder[(String, String)]
        var nSel = 0
        var stop = false
        var i = 0
        while (i < rows.length && !stop && merged + nSel < numMerges) {
          val (pairStr, c) = rows(i)
          val Array(l, r) = pairStr.split(" ", 2)
          if (nSel == 0) {
            batch += ((l, r)); selected += pairStr
            touched += l; touched += r; nSel += 1
          } else if (touched(l) || touched(r)) stop = true
          else if (!fullTable && c <= cMin) stop = true // below the cutoff: unverifiable
          else {
            val risky = rows.exists { case (q, qc) =>
              qc >= c && !selected(q) && {
                val Array(ql, qr) = q.split(" ", 2)
                touched(ql) || touched(qr)
              }
            }
            if (risky) stop = true
            else {
              batch += ((l, r)); selected += pairStr
              touched += l; touched += r; nSel += 1
            }
          }
          i += 1
        }
        val b = batch.result()
        merges ++= b
        cur = cur ++ b
        merged += b.length
      }
    }
    merges.result()
  }

  /** Whether a RANKED merge list admits the sequential-replace oracle
    * form: applying each merge once, in rank order, as a replace-all
    * over the delimiter-wrapped symbol string of a whole document is
    * then bit-identical to the kernel's greedy-by-rank loop. Returns
    * `None` when safe, `Some(reason)` naming the first violated
    * condition otherwise.
    *
    * The argument (extends [[graft.queries.ExtensionQueries]]'s
    * BpeFixedMerges proof from 3 pinned merges to any trained list):
    * each symbol is rendered `\u0002 sym \u0003`, so a pair pattern
    * `\u0002 l \u0003 \u0002 r \u0003` can only match two whole adjacent
    * symbols — never across symbol boundaries (the open/close
    * delimiters are distinct, so adjacent matches share no characters
    * and leftmost non-overlapping replace-all equals the kernel's
    * leftmost non-overlapping merge sweep, including the l == r case).
    * One replace-all pass per merge reaches that merge's fixpoint: a
    * replacement only creates adjacencies (x, lr) and (lr, y), and
    * lr is strictly longer than l and r, so the SAME pair never
    * reappears. Greedy-by-rank then equals rank-order sequential
    * passes iff no LATER merge can create an adjacency an EARLIER pair
    * matches — i.e. no later product equals an earlier pair's
    * component (condition 1 below). Whole-document (rather than
    * per-word) replacement is safe iff no left component can be a
    * word-terminal symbol — terminal symbols always carry `endMark` as
    * a suffix and nothing else does (condition 2; training on per-word
    * sequences can never emit such a pair, because a terminal symbol
    * has no right neighbor). Components that are NOT single characters
    * or earlier products are harmless: their delimited pattern simply
    * never matches on either side. Conditions 3-4 are representation
    * guards for the delimiters and the pair keys.
    */
  def sequentialReplaceUnsafe(merges: Seq[(String, String)],
                              endMark: String = "</w>"): Option[String] = {
    var i = 0
    while (i < merges.length) {
      val (l, r) = merges(i)
      if (l.isEmpty || r.isEmpty)
        return Some(s"merge $i has an empty component")
      if (Seq(l, r).exists(_.exists(ch =>
            ch == ' ' || ch == '\u0002' || ch == '\u0003')))
        return Some(s"merge $i component contains a space or a " +
          "\\u0002/\\u0003 delimiter character")
      if (l.endsWith(endMark))
        return Some(s"merge $i left component ends with the end mark " +
          s"'$endMark' — whole-document replace could merge across words")
      val prod = l + r
      var j = 0
      while (j < i) {
        val (lj, rj) = merges(j)
        if (prod == lj || prod == rj)
          return Some(s"merge $i product '$prod' equals a component of " +
            s"earlier merge $j — sequential replace diverges from " +
            "greedy-by-rank")
        j += 1
      }
      i += 1
    }
    None
  }

  /** Encode a corpus with a FROZEN merge list: (id, bpe_tokens,
    * n_bpe_tokens) — per word, the ranked-merge loop runs in the
    * native kernel; per document, the word encodings flatten in order.
    * Pure projection: nothing shuffles, the tokenizer rides the plan.
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             idCol: String = "doc_id", textCol: String = "text",
             endMark: String = "</w>"): DataFrame =
    docs.select(
        col(idCol).as("doc_id"),
        bpeTokens(col(textCol), merges, endMark).as("bpe_tokens"))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))

  /** [[encode]]'s core expression as a reusable COLUMN — the encoded
    * token array for any text column (document text, chunk text, a
    * query string). Pure projection; the merge table rides the plan.
    */
  def bpeTokens(text: org.apache.spark.sql.Column,
                merges: Seq[(String, String)],
                endMark: String = "</w>"): org.apache.spark.sql.Column = {
    require(!endMark.contains(' '), s"endMark must not contain a space: '$endMark'")
    // empty words (multi-space text) carry no symbols — drop them
    // before the kernel, mirroring wordFreq's filter
    flatten(transform(
      filter(TextStats.tokens(text), w => length(w) > 0),
      w => BpeApply(charSymbols(w, endMark), merges)))
  }

  /** Per-group tokenizer fertility audit (Ács 2019 "Exploring BERT's
    * vocabulary"; Rust et al., ACL 2021 "How Good is Your Tokenizer?"):
    * for each group — typically language — the corpus totals of
    * whitespace words, BPE tokens under `merges`, and non-space
    * characters, plus the two ratios a multilingual tokenizer review
    * reads: **fertility** (BPE tokens per word; 1.0 = every word
    * encodes as one token) and **chars-per-token** (compression). A
    * tokenizer that fragments one language 3× more than another both
    * shrinks its effective context window and inflates its share of
    * the training-token bill — this is the audit that surfaces the
    * skew before a run is provisioned.
    *
    * Shape for scale: one corpus scan; every per-doc quantity is a
    * scan-side expression (the encode kernel rides the projection —
    * no join, no second pass), and the group-by partial-aggregates
    * map-side into a languages-sized result. The ratios divide two
    * exact BIGINT sums as doubles (IEEE-identical in any engine);
    * null text counts as empty; empty groups divide-guard via
    * greatest(·,1).
    */
  def fertilityByGroup(docs: DataFrame, merges: Seq[(String, String)],
                       groupCol: String = "lang",
                       textCol: String = "text",
                       endMark: String = "</w>"): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    docs.select(col(groupCol),
        size(filter(TextStats.tokens(txt), w => length(w) > 0))
          .cast("long").as("w"),
        size(bpeTokens(txt, merges, endMark)).cast("long").as("t"),
        length(translate(txt, " ", "")).cast("long").as("c"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("n_words"),
        sum(col("t")).as("n_bpe_tokens"),
        sum(col("c")).as("n_chars"),
        (sum(col("t")).cast("double") / greatest(sum(col("w")), lit(1L)))
          .as("fertility"),
        (sum(col("c")).cast("double") / greatest(sum(col("t")), lit(1L)))
          .as("chars_per_token"))
  }

  /** The shippable tokenizer VOCAB: every symbol [[encode]] can emit —
    * the corpus's base characters, the end-of-word marker, and each
    * merge's product — with a deterministic dense id (base symbols in
    * lexicographic order, then merge products in rank order; a merge
    * product equal to an earlier symbol keeps the earlier id). This is
    * the (token, token_id) artifact an embedding table is sized
    * against. One corpus scan for the character set (distinct over
    * single chars — tiny), driver-side assembly bounded by
    * |chars| + |merges|.
    */
  def vocab(docs: DataFrame, merges: Seq[(String, String)],
            textCol: String = "text",
            endMark: String = "</w>"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chars = docs
      .select(explode(split(regexp_replace(col(textCol), " ", ""), ""))
        .as("ch"))
      .filter(length(col("ch")) > 0)
      .distinct().as[String].collect().sorted
    val base = chars.toVector :+ endMark
    val withMerges = merges.foldLeft(base) { case (v, (l, r)) =>
      val prod = l + r
      if (v.contains(prod)) v else v :+ prod
    }
    withMerges.zipWithIndex
      .map { case (t, i) => (t, i.toLong) }
      .toDF("token", "token_id")
  }

  /** Round-trip audit of an encoding: concatenating a document's BPE
    * tokens (end marks restored to spaces) must reproduce its
    * SPACE-normalized text — the invariant that proves the tokenizer
    * is lossless. Emits only the violating rows (empty = healthy), so
    * the audit is O(corpus scan), O(violations) output.
    *
    * Contract details that keep the audit honest:
    *   - normalization collapses ASCII space runs ONLY (the tokenizer
    *     splits on ' ' — a tab/newline stays inside its token and
    *     round-trips byte-for-byte, so \s+ normalization would flag
    *     faithful encodings);
    *   - docs ABSENT from `encoded` are violations, not silently
    *     unaudited (LEFT join from docs + presence marker): an audit
    *     over a partial encoding must not report "healthy";
    *   - null-text docs encode to null tokens and PASS (both sides
    *     normalize to the empty string);
    *   - the end-mark decodes PER TOKEN (suffix-anchored), not over
    *     the concatenated doc: the terminal `endMark` symbol only ever
    *     merges as a token SUFFIX, so "ends with endMark" identifies
    *     word-final tokens — and corpus text that merely CONTAINS the
    *     literal marker (as unmerged single-char tokens, or mid-token)
    *     round-trips clean instead of false-flagging. The one decode
    *     ambiguity left is a merge list that assembles the exact
    *     marker string out of pure text characters (e.g. "<"+"/w>"):
    *     such a token is indistinguishable from a word boundary and
    *     still false-flags. Pick an endMark outside the corpus
    *     alphabet to rule even that out.
    */
  def roundTripViolations(encoded: DataFrame, docs: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          endMark: String = "</w>"): DataFrame = {
    val endRe = java.util.regex.Pattern.quote(endMark) + "$"
    val rebuilt = encoded.select(col("doc_id"), lit(true).as("_enc"),
      // word-final tokens drop their end-mark for a space, the rest
      // join bare: ["low</w>","ha","t</w>"] -> "low ha t " -> trimmed
      coalesce(rtrim(concat_ws("",
        transform(col("bpe_tokens"), t => regexp_replace(t, endRe, " ")))),
        lit(""))
        .as("rebuilt"))
    docs.select(col(idCol).as("doc_id"),
        coalesce(trim(regexp_replace(col(textCol), " +", " ")), lit(""))
          .as("norm_text"))
      .join(rebuilt, Seq("doc_id"), "left")
      .filter(col("_enc").isNull || not(col("norm_text") === col("rebuilt")))
      .drop("_enc")
  }
}
