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
    * vocabulary). The driver loop is bounded by `numMerges` — each
    * round is one vocab-table-sized Spark job ending in a single-row
    * collect (same bounded-driver-loop discipline as
    * [[Similarity.kmeans]]).
    */
  def train(docs: DataFrame, numMerges: Int,
            textCol: String = "text",
            endMark: String = "</w>"): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    // pair keys are "left right" strings, so a space inside the end
    // mark would corrupt the split-on-first-space parse below
    require(!endMark.contains(' '), s"endMark must not contain a space: '$endMark'")
    // localCheckpoint: numMerges rounds re-read this table; without it
    // every round re-scans the corpus and re-aggregates
    val wf = wordFreq(docs, textCol).localCheckpoint()
    val merges = Vector.newBuilder[(String, String)]
    var cur = Seq.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val top = wf
        .select(col("n"),
          explode(WordNgrams(
            BpeApply(charSymbols(col("word"), endMark), cur), 2)).as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("cnt"))
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .collect()
      top.headOption match {
        case Some(row) =>
          val Array(l, r) = row.getString(0).split(" ", 2)
          merges += ((l, r))
          cur = cur :+ (l, r)
          round += 1
        case None => done = true
      }
    }
    merges.result()
  }

  /** Encode a corpus with a FROZEN merge list: (id, bpe_tokens,
    * n_bpe_tokens) — per word, the ranked-merge loop runs in the
    * native kernel; per document, the word encodings flatten in order.
    * Pure projection: nothing shuffles, the tokenizer rides the plan.
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             idCol: String = "doc_id", textCol: String = "text",
             endMark: String = "</w>"): DataFrame = {
    require(!endMark.contains(' '), s"endMark must not contain a space: '$endMark'")
    docs.select(
        col(idCol).as("doc_id"),
        // empty words (multi-space text) carry no symbols — drop them
        // before the kernel, mirroring wordFreq's filter
        flatten(transform(
          filter(TextStats.tokens(col(textCol)), w => length(w) > 0),
          w => BpeApply(charSymbols(w, endMark), merges))).as("bpe_tokens"))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
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
    *   - LIMITATION: `endMark` is in-band — corpus text containing
    *     the literal marker string makes the concat decode ambiguous
    *     and false-flags here. Pick an endMark outside the corpus
    *     alphabet (the audit itself will tell you: such docs flag).
    */
  def roundTripViolations(encoded: DataFrame, docs: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          endMark: String = "</w>"): DataFrame = {
    val rebuilt = encoded.select(col("doc_id"), lit(true).as("_enc"),
      // tokens joined bare, then end-marks become spaces: "lo w</w>ha t</w>"
      // -> "low hat " -> trimmed
      coalesce(rtrim(regexp_replace(concat_ws("", col("bpe_tokens")),
        java.util.regex.Pattern.quote(endMark), " ")), lit(""))
        .as("rebuilt"))
    docs.select(col(idCol).as("doc_id"),
        coalesce(trim(regexp_replace(col(textCol), " +", " ")), lit(""))
          .as("norm_text"))
      .join(rebuilt, Seq("doc_id"), "left")
      .filter(col("_enc").isNull || not(col("norm_text") === col("rebuilt")))
      .drop("_enc")
  }
}
