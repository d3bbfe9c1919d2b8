package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded mergeable bottom-k-distinct aggregator — the accumulator
  * behind the KMV (k-minimum-values) distinct sketch (Bar-Yossef et
  * al., "Counting distinct elements in a data stream", RANDOM 2002;
  * the Theta-sketch family's base summary). State is the sorted
  * ascending sequence of the k SMALLEST DISTINCT values seen, never
  * more than k longs, so map-side partial aggregation carries a
  * bounded buffer per group no matter how many rows flow through —
  * unlike an exact distinct, whose state is the key space. Merge is a
  * fold of one buffer into the other (commutative/associative/
  * idempotent on the value level: duplicates are dropped by the
  * distinct test), so partial buffers combine in any order to the
  * identical sketch — which is what makes the result deterministic
  * under any partitioning and lets lake shards publish sketches that
  * union without rescanning data.
  *
  * O(k) insert via binary search + copy — k is tens-to-hundreds; the
  * per-row cost is a bounded array splice, no heap allocation beyond
  * the buffer itself.
  */
case class BottomK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1, "k must be >= 1")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] = insert(b, a)

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    b2.foldLeft(b1)(insert)

  override def finish(r: Seq[Long]): Seq[Long] = r

  private def insert(b: Seq[Long], a: Long): Seq[Long] = {
    // sorted-ascending invariant: binary search for the insert point
    var lo = 0; var hi = b.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < a) lo = mid + 1 else hi = mid
    }
    if (lo < b.size && b(lo) == a) b // distinct: already present
    else if (b.size == k && lo == k) b // larger than the current k-th min
    else {
      val nb = (b.take(lo) :+ a) ++ b.drop(lo)
      if (nb.size > k) nb.take(k) else nb
    }
  }

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
