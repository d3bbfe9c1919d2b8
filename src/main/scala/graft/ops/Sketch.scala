package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the fixed-memory answer to "what
  * are the heavy hitters in 100 TB of tokens" when the vocabulary (or
  * URL/host/ngram key space) is too large to aggregate exactly.
  *
  * Count–min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): a
  * depth×width counter matrix; each key increments one counter per
  * row (row-keyed hash); a key's estimate is the MIN over its depth
  * counters. Estimates never undercount (every counter the key
  * touches holds its true count plus nonnegative collision mass), and
  * overcount by > 2N/width with probability <= (1/2)^depth — fixed
  * memory, one-sided error, and cell-wise addition merges sketches
  * across partitions, executors, or days.
  *
  * Determinism: the row hashes are md5-derived (first 6 hex chars →
  * 24-bit int, mod width) — the same portable construction the dedup
  * oracles use — so a DuckDB oracle rebuilds the sketch bit-for-bit
  * and the whole estimate table sits under the hash gate.
  */
object Sketch {

  /** Row-`r` bucket for a key: 24 md5 bits mod `width`. */
  def cmsBucket(key: Column, r: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$r:"), key)), 1, 6), 16, 10)
      .cast("long"), lit(width.toLong))

  private[graft] def bucketStructs(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { r =>
      struct(lit(r).as("r"), cmsBucket(key, r, width).as("bucket"))
    }: _*)

  /** The sketch itself, built from a WEIGHTED key table (key, cnt):
    * each key adds its count to one cell per row — at most depth×width
    * rows out, regardless of input size. At 100 TB the raw token
    * stream folds straight into these cells through map-side partial
    * aggregation (the cells are the only shuffle payload); building
    * from a pre-aggregated count table — as [[cmsHeavyHitters]] does,
    * because it needs the exact counts anyway for its audit — yields
    * the identical sketch by additivity.
    */
  def cmsCells(counts: DataFrame, keyCol: String, cntCol: String,
               depth: Int, width: Int): DataFrame =
    counts.select(col(cntCol).as("__c"),
        explode(bucketStructs(col(keyCol), depth, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(sum(col("__c")).as("cnt"))

  /** Point estimates for a candidate key set against a built sketch:
    * min over the key's depth cells. The sketch is broadcast (it is
    * <= depth×width rows by construction); candidates never shuffle.
    */
  def cmsEstimate(cells: DataFrame, candidates: DataFrame,
                  keyCol: String, depth: Int, width: Int): DataFrame =
    candidates
      .select(col("*"), explode(bucketStructs(col(keyCol), depth, width)).as("rb"))
      .select(col("*"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .drop("rb")
      .join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(keyCol)
      .agg(min(col("cnt")).as("est"))

  /** Heavy-hitter audit over a token corpus: the top-`k` tokens by
    * CMS estimate, with the exact count and the collision overcount
    * alongside — the table that says whether a `depth`×`width` sketch
    * is big enough for this corpus before the exact aggregation is
    * retired at scale. `est >= exact` always (the CMS guarantee, and
    * a spec invariant).
    */
  def cmsHeavyHitters(docs: DataFrame, depth: Int = 4, width: Int = 1024,
                      k: Int = 20, textCol: String = "text"): DataFrame = {
    require(depth >= 1 && width >= 1 && k >= 1, "depth/width/k must be >= 1")
    // exact token counts: needed for the audit columns, and (by cell
    // additivity) a valid weighted input for the sketch build — ONE
    // corpus scan feeds both
    val exact = docs
      .select(explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact"))
      .localCheckpoint()
    val cells = cmsCells(exact, "term", "exact", depth, width)
    cmsEstimate(cells, exact, "term", depth, width)
      .join(exact, Seq("term"))
      .withColumn("err", col("est") - col("exact"))
      .orderBy(col("est").desc, col("term"))
      .limit(k)
      .select("term", "est", "exact", "err")
  }
}
