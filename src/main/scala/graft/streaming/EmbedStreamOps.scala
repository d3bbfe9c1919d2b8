package graft.streaming

import org.apache.spark.sql.Dataset

/** Live embedding gates — the streaming twins of the batch
  * [[graft.ops.Similarity]] screens, in the same stateless
  * typed-mapPartitions shape as [[MediaStreamOps]]: per-row work with
  * same-micro-batch emission, no watermark, windowed monitors compose
  * on top.
  */
object EmbedStreamOps {

  /** Per-vector contamination audit row: the best benchmark match (by
    * quantized cosine, ties to the larger bench id — the batch form's
    * exact argmax order) when any match reaches the threshold, and the
    * admit verdict (`pass` = semantically clear of the benchmark).
    */
  final case class ContamAudit(ts: java.sql.Timestamp, vec_id: Long,
                               best_bench: Option[Long],
                               cos_q: Option[Long],
                               n_matches: Long,
                               pass: Boolean)

  /** LIVE embedding-space decontamination gate: every arriving vector
    * is screened against the benchmark BEFORE admission — the
    * streaming twin of [[graft.ops.Similarity.embedContamination]]
    * (paraphrased benchmark leakage the n-gram monitor cannot see),
    * with bit-identical scoring: the dot product folds in index order,
    * per-vector norms hoisted, `floor(dot/(na*nb) * 10000)` — so a
    * vector the batch screen flags is exactly a vector this gate
    * rejects at the same threshold (spec-pinned).
    *
    * The benchmark rides the CLOSURE (a plain array): benchmarks are
    * constant-sized, so this is the broadcast-small-side plan in
    * streaming form — per-row cost O(benchmark · dim), independent of
    * stream volume, no state, no shuffle.
    */
  def streamingContamGate(
      vecs: Dataset[(java.sql.Timestamp, Long, Array[Double])],
      benchmark: Array[(Long, Array[Double])],
      thresholdQ: Long): Dataset[ContamAudit] = {
    import vecs.sparkSession.implicits._
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    // hoist benchmark norms once (closure-evaluated per executor)
    val bench = benchmark.map { case (id, v) => (id, v, math.sqrt(dot(v, v))) }
    vecs.mapPartitions { it =>
      it.map { case (ts, id, v) =>
        val nv = math.sqrt(dot(v, v))
        var bestId = -1L
        var bestCos = Long.MinValue
        var matches = 0L
        var i = 0
        while (i < bench.length) {
          val (bid, bv, bn) = bench(i)
          // zero-norm guard: the batch form's SQL division yields null
          // for a zero vector and the row drops out of the match set —
          // mirror that as "no match" instead of letting NaN floor to 0
          // (which a threshold <= 0 would spuriously flag)
          val cos = if (nv == 0.0 || bn == 0.0) Long.MinValue
                    else math.floor(dot(v, bv) / (nv * bn) * 10000).toLong
          if (cos >= thresholdQ) {
            matches += 1
            if (cos > bestCos || (cos == bestCos && bid > bestId)) {
              bestCos = cos; bestId = bid
            }
          }
          i += 1
        }
        ContamAudit(ts, id,
          if (matches > 0) Some(bestId) else None,
          if (matches > 0) Some(bestCos) else None,
          matches, pass = matches == 0)
      }
    }
  }
}
