package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators over a document corpus —
  * north-star extensions (BASELINE.json) for LLM-training-data
  * pipelines. All variants are expressed in codegen-friendly built-in
  * expressions (no Scala UDFs) and designed so the oracle can compute
  * the identical result in portable SQL:
  *
  *  - hashes are md5 hex strings (identical in every engine),
  *  - minhash = lexicographic MIN over md5(seed:token),
  *  - simhash bits come from integer arithmetic over md5 hex digits,
  *  - similarity ratios are divisions of exact integers.
  *
  * Scale design (100 TB): every variant is one scan + one shuffle-by-
  * key (hash/band/bucket). Candidate generation NEVER does a cartesian
  * join: exact dedup groups by content hash; MinHash groups by LSH band
  * key; n-gram Jaccard uses PPJoin-style prefix filtering before the
  * token equi-join. Verification (exact Jaccard / cosine) runs only on
  * in-bucket candidate pairs.
  */
object Dedup {

  /** Distinct-token array of a whitespace-tokenized text column. */
  def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  /** Exact dedup by content hash: one hash-groupBy. At scale: map-side
    * partial agg on md5(text), tiny shuffle. Canonical id = min doc id.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** N-gram (token-set) Jaccard near-dup pairs at `threshold`, with a
    * PPJoin-style prefix filter: a pair can reach Jaccard >= t only if
    * it shares a token among each side's first `n - ceil(t*n) + 1`
    * tokens (sorted order). The equi-join therefore runs on prefix
    * tokens only — the 100 TB story, since full-token inverted joins
    * explode on common tokens.
    */
  def ngramJaccard(docs: DataFrame, threshold: Double,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      array_sort(tokenSet(col(textCol))).as("ts"))
      .withColumn("n", size(col("ts")))
      .withColumn("prefix",
        slice(col("ts"), lit(1),
          (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int")))

    val pa = toks.select(col("doc_id"), explode(col("prefix")).as("tok"))
    val pb = pa.withColumnRenamed("doc_id", "doc_b_")
    val cand = pa.join(pb, pa("tok") === pb("tok") && pa("doc_id") < pb("doc_b_"))
      .select(pa("doc_id").as("doc_a"), pb("doc_b_").as("doc_b"))
      .distinct()

    val x = toks.select(col("doc_id").as("doc_a"), col("ts").as("ts_a"), col("n").as("n_a"))
    val y = toks.select(col("doc_id").as("doc_b"), col("ts").as("ts_b"), col("n").as("n_b"))
    cand.join(x, "doc_a").join(y, "doc_b")
      .withColumn("inter", size(array_intersect(col("ts_a"), col("ts_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash signature column: `numHashes` lexicographic minima of
    * md5("k:token"). Identical in any engine with md5 — the portable
    * stand-in for k random permutations.
    */
  def minhashSignature(tokens: Column, numHashes: Int): Column =
    transform(sequence(lit(1), lit(numHashes)),
      k => array_min(transform(tokens,
        t => md5(concat(k.cast("string"), lit(":"), t)))))

  /** MinHash + LSH banding: signature of `numHashes`, split into
    * `bands` bands; docs sharing any band key are candidate near-dups.
    * One shuffle on (band index, band key) — never all-pairs.
    */
  def minhashLsh(docs: DataFrame, numHashes: Int = 16, bands: Int = 4,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val rows = numHashes / bands
    val sig = docs.select(
      col(idCol).as("doc_id"),
      minhashSignature(tokenSet(col(textCol)), numHashes).as("mh"))
    val banded = sig.select(
      col("doc_id"),
      explode(sequence(lit(1), lit(bands))).as("b"))
      .join(sig, "doc_id")
      .select(col("doc_id"), col("b"),
        md5(concat_ws("|",
          slice(col("mh"), (col("b") - 1) * rows + 1, lit(rows)))).as("band_key"))
    val other = banded
      .withColumnRenamed("doc_id", "doc_b_")
    banded.join(other,
        banded("band_key") === other("band_key") &&
          banded("b") === other("b") &&
          banded("doc_id") < other("doc_b_"))
      .select(banded("doc_id").as("doc_a"), col("doc_b_").as("doc_b"))
      .distinct()
  }

  /** 32-bit SimHash fingerprint per document, from md5 hex digits of
    * each distinct token: bit b of the hash contributes +1/-1, the
    * fingerprint keeps the sign of each bit-sum. Pure integer
    * arithmetic over hex characters — engine-portable.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokenSet(col(textCol))).as("t"))
    val bits = tok
      .select(col("doc_id"), md5(col("t")).as("h"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("hexval",
        instr(lit("0123456789abcdef"),
          substring(col("h"), (col("b") / 4).cast("int") + 1, lit(1))) - 1)
      .withColumn("w",
        when((floor(col("hexval") /
          pow(lit(2), lit(3) - col("b") % 4)).cast("long") % 2) === 1, 1)
          .otherwise(-1))
    bits.groupBy(col("doc_id"), col("b"))
      .agg(sum(col("w")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0,
        pow(lit(2), col("b")).cast("long")).otherwise(0L)).as("simhash"))
  }

  /** Embedding-cosine near-dup pairs, candidate-limited to shared
    * hyperplane-LSH buckets (see [[Similarity.lshBucket]]): pairs are
    * generated by an equi-join on the bucket id, cosine verified only
    * in-bucket. Output score is floor(cos * 10000) so last-ulp
    * accumulation differences can't flip a comparison across engines.
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double,
                       planes: Int = 8,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("bucket", Similarity.lshBucket(col("v"), planes, 64))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("bucket"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"),
        floor(col("cos") * 10000).cast("long").as("cos_q"))
  }
}
