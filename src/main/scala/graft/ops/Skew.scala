package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (SCALING.md "Skew"): AQE handles
  * sort-merge-join skew automatically, but aggregation hot keys and
  * broadcast-side fan-out still need manual salting at 100 TB. Both
  * forms here are deterministic (salt = pmod(hash(...), k), no RNG) so
  * results are reproducible and oracle-comparable.
  */
object Skew {

  /** Two-phase (salted) aggregation: groupBy(keys + salt) partial ->
    * groupBy(keys) final. A hot key's rows spread over `salts`
    * reducers in phase 1 instead of melting one task. Supports the
    * algebraic aggregates the CDC pipeline uses (count/sum/min/max —
    * pass the phase-2 merge for each phase-1 column).
    *
    * The salt derives from a deterministic hash of `saltSource` (e.g.
    * a unique row id) — NOT from rand(), so re-runs and retries agree.
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], saltSource: Column,
                  salts: Int,
                  phase1: Seq[Column], phase2: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
  }

  /** Binned range join: `facts` rows against `bands` intervals
    * (`lo <= v < hi`). A naive interval join is a broadcast
    * nested-loop (every row probes every band — O(n*m)); binning turns
    * it into an equi-join: each band explodes into the fixed-width
    * bins it overlaps, each fact row computes its single bin, and the
    * residual interval predicate runs only on bin-mates. Each matching
    * (row, band) pair appears in exactly one bin — the row's — so no
    * dedup pass is needed. This is the standard range-join
    * optimization (cf. engine range-join hints), expressed in plain
    * DataFrame ops.
    *
    * @param binWidth tuning knob: >= the typical band width keeps the
    *        per-band explode to O(1) bins
    */
  def binnedRangeJoin(facts: DataFrame, valueCol: String,
                      bands: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    val binned = bands.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    facts
      .withColumn("__bin", floor(col(valueCol) / binWidth).cast("long"))
      .join(broadcast(binned), Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval-interval OVERLAP join — the two-sided sibling of
    * [[binnedRangeJoin]] (that one is point-in-interval with a small
    * band side; this one joins two LARGE interval sets, so neither
    * side broadcasts). Standard bin decomposition (the same idea
    * engines ship as a range-join hint): each interval explodes into
    * the fixed-width bins it touches, candidates meet by bin
    * EQUI-join (both sides hash-partition on the bin — one shuffle
    * each, never a nested loop), and the exact closed-interval
    * predicate `lLo <= rHi AND rLo <= lHi` verifies bin-mates.
    *
    * A pair sharing several bins would emit duplicates; the
    * `bin == max(floor(lLo/w), floor(rLo/w))` filter keeps each pair
    * exactly once (its first shared bin) WITHOUT a distinct shuffle —
    * the standard dedup-free decomposition.
    *
    * Bounds are integer columns (micro-units upstream); bin index is
    * exact floor division built from pmod, so negative bounds bin
    * correctly. `binWidth` tunes fan-out: >= the typical interval
    * width keeps the per-row explode O(1). Hot bins (a popular time
    * window) are AQE skew-join territory — document-level salting is
    * not needed because the bin key already spreads uniform load.
    */
  def binnedIntervalJoin(left: DataFrame, lLo: String, lHi: String,
                         right: DataFrame, rLo: String, rHi: String,
                         binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be > 0")
    // exact floor division (pmod keeps it right for negative bounds)
    def fdiv(c: Column): Column =
      ((c - pmod(c, lit(binWidth))) / binWidth).cast("long")
    // each side's START bin is computed once per ROW and carried as a
    // column: the first-shared-bin dedup predicate then compares
    // attributes instead of re-running two pmod+divide+cast chains per
    // candidate PAIR (the join condition evaluates once per bin-mate,
    // which is the hot count here)
    val lb = left.withColumn("__bin0l", fdiv(col(lLo)))
      .withColumn("__bin",
        explode(sequence(col("__bin0l"), fdiv(col(lHi)))))
    val rb = right.withColumn("__bin0r", fdiv(col(rLo)))
      .withColumn("__bin",
        explode(sequence(col("__bin0r"), fdiv(col(rHi)))))
    lb.join(rb, Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") === greatest(col("__bin0l"), col("__bin0r")))
      .drop("__bin", "__bin0l", "__bin0r")
  }

  /** Salted equi-join for a skewed LEFT side against a small RIGHT
    * side: the right side is replicated `salts` times (it is small —
    * that is why it is the dimension side), the left side picks one
    * replica deterministically, so a hot join key's rows land on
    * `salts` different reducers.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltSource: Column, salts: Int): DataFrame = {
    val l = large.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, keys :+ "__salt").drop("__salt")
  }
}
