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

  // ---------------------------------------------------------------- HLL

  /** HyperLogLog register index for a key: the first 24 md5 bits mod
    * `m` — the same portable hex→int construction as [[cmsBucket]].
    */
  def hllBucket(key: Column, m: Int): Column =
    pmod(conv(substring(md5(key), 1, 6), 16, 10).cast("long"), lit(m.toLong))

  /** HyperLogLog rank for a key: 1 + leading zeros of a 40-bit tail
    * (md5 hex chars 7–16), i.e. `41 - bitlength(tail)`; an all-zero
    * tail ranks 41. `bin()` renders positive longs without leading
    * zeros on both engines, so `41 - length(ltrim(bin(t),'0'))` is the
    * bit-exact rank — no float log2 anywhere.
    */
  def hllRho(key: Column): Column = {
    val t = conv(substring(md5(key), 7, 10), 16, 10).cast("long")
    (lit(41) - length(ltrim(bin(t), "0"))).cast("int")
  }

  /** HyperLogLog register table (Flajolet–Fusy–Gandouet–Meunier,
    * AofA 2007) per optional group: at most `2^b` rows per group
    * regardless of input size, built by ONE bucket-keyed max
    * aggregation. Duplicates are absorbed by the max itself — unlike
    * exact count-distinct there is NO distinct pass and NO shuffle of
    * the key space; the only shuffle payload is the register table.
    * That is the whole 100 TB story: distinct-cardinality tracking
    * whose cost is a map-side partial max into `2^b` cells.
    */
  def hllRegisters(keys: DataFrame, keyCol: String, b: Int,
                   groupCols: Seq[String] = Nil): DataFrame = {
    require(b >= 4 && b <= 12, "b (log2 registers) must be in [4,12]")
    val m = 1 << b
    keys.select(groupCols.map(col) :+ hllBucket(col(keyCol), m).as("bucket")
        :+ hllRho(col(keyCol)).as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("m_reg"))
  }

  /** Register max-merge across groups — the mergeability that makes
    * HLL a lake artifact: per-source (or per-day, per-shard) register
    * tables union and max into the global sketch without touching the
    * corpus again. `hllMerge(hllRegisters(keys, bySource)) ==
    * hllRegisters(keys)` exactly (max is associative/commutative/
    * idempotent), a spec-pinned property.
    */
  def hllMerge(regs: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    regs.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("m_reg")).as("m_reg"))

  /** Raw-HLL cardinality estimate per group, integer-exact end to end
    * so the whole table sits under the hash gate: the indicator sum
    * `S = Σ_j 2^(-M_j)` is computed as the EXACT integer
    * `Σ 2^(41-M_j)` over common denominator `2^41` (absent registers
    * contribute `2^41`), and the estimate is one DECIMAL(38,0)
    * truncating division `⌊α_ppm·m²·2^41 / (S·10^6)⌋` with the alpha
    * constant pinned at ppm precision. No float enters: `2^(41-M)` is
    * a bigint shift, not a pow. The small-range linear-counting
    * correction is deliberately NOT folded in — `zero_regs` is
    * emitted so the consumer (and the spec) can see when the raw
    * estimate leaves its calibrated range.
    */
  def hllEstimate(regs: DataFrame, b: Int,
                  groupCols: Seq[String] = Nil): DataFrame = {
    val m = 1 << b
    val alphaPpm = math.floor(1e6 * 0.7213 / (1 + 1.079 / m)).toLong
    val num = BigInt(alphaPpm) * m * m * (BigInt(1) << 41)
    val grouped =
      if (groupCols.isEmpty) regs.groupBy()
      else regs.groupBy(groupCols.map(col): _*)
    grouped
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 41 - m_reg)")).as("s_present"))
      .withColumn("zero_regs", (lit(m) - col("n_regs")).cast("long"))
      .withColumn("est", expr(
        s"""CAST(CAST('$num' AS DECIMAL(38,0))
           |  div (CAST(s_present + zero_regs * ${1L << 41}L AS DECIMAL(38,0))
           |       * 1000000) AS BIGINT)""".stripMargin))
      .select(groupCols.map(col) :+ col("zero_regs") :+ col("est"): _*)
  }

  // ---------------------------------------------------------------- KMV

  /** 48-bit md5 value for the KMV sketch — 12 hex chars, the same
    * portable ladder the oracles rebuild.
    */
  def kmvHash(key: Column): Column =
    conv(substring(md5(key), 1, 12), 16, 10).cast("long")

  /** KMV (k-minimum-values / bottom-k) sketch per group: the k
    * smallest DISTINCT 48-bit hashes of the keys, one array row per
    * group. Built by the bounded mergeable
    * [[graft.functions.BottomK]] aggregator — map-side partials carry
    * at most k longs per group, so the shuffle payload is groups × k
    * values, NEVER the distinct key space (the reason this exists
    * next to [[hllRegisters]]: HLL unions, but only KMV's value-level
    * summary supports INTERSECTION estimates between groups).
    */
  def kmvSketch(keys: DataFrame, keyCol: String, k: Int,
                groupCols: Seq[String]): DataFrame = {
    val bk = udaf(graft.functions.BottomK(k),
      org.apache.spark.sql.Encoders.scalaLong)
    keys.select(groupCols.map(col) :+ kmvHash(col(keyCol)).as("h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(bk(col("h")).as("hs"))
  }

  /** Pairwise distinct-set overlap between groups from their KMV
    * sketches alone (Beyer et al., "On synopses for distinct-value
    * estimation under multiset operations", SIGMOD 2007): for every
    * group pair a<b, the bottom-k of the UNION of the two sketches
    * gives θ (the k-th minimum) and the union estimate
    * `(k-1)·2^48 / θ`; the fraction of those k values present in BOTH
    * sketches estimates Jaccard, and their product the intersection —
    * all integer arithmetic, all from sketch arrays. The pair frame
    * is a BROADCAST triangular self-join over the groups-sized sketch
    * table (groups × (k+1) longs); union/slice/membership are
    * codegen'd array expressions per pair row — no explode, no
    * shuffle. Groups with fewer than k distinct values short-circuit
    * to the exact union count (every value is in the sketch).
    */
  def kmvPairOverlap(sketch: DataFrame, groupCol: String,
                     k: Int): DataFrame = {
    val a = sketch.select(col(groupCol).as("src_a"), col("hs").as("hs_a"))
    val b = sketch.select(col(groupCol).as("src_b"), col("hs").as("hs_b"))
    val num = (BigInt(k) - 1) * (BigInt(1) << 48)
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("sl", slice(array_sort(array_union(col("hs_a"), col("hs_b"))),
        1, k))
      .withColumn("n_k", size(col("sl")).cast("long"))
      .withColumn("shared_k",
        size(filter(col("sl"), x =>
          array_contains(col("hs_a"), x) && array_contains(col("hs_b"), x)))
          .cast("long"))
      .withColumn("theta", element_at(col("sl"), -1))
      .withColumn("union_est",
        when(col("n_k") < k, col("n_k"))
          .otherwise(expr(s"CAST('$num' AS DECIMAL(38,0)) div nullif(theta, 0)")
            .cast("long")))
      .withColumn("inter_est",
        expr(s"CAST(shared_k * union_est div $k AS BIGINT)"))
      .select("src_a", "src_b", "n_k", "shared_k", "union_est", "inter_est")
  }

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
