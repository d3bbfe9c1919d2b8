package graft.streaming

import graft.ops.Inference
import org.apache.spark.sql.Dataset

/** Live batched model serving — the streaming twin of
  * [[graft.ops.Inference.inferBatched]], in the same stateless typed
  * `mapPartitions` shape as [[MediaStreamOps]]: each micro-batch's
  * partitions pack arriving docs into fixed-size forward batches (one
  * session call per batch — the GPU-amortization shape survives the
  * move to streaming because batching happens WITHIN the partition
  * iterator, not across triggers), emit in the same micro-batch, no
  * state, no watermark. Both paths call the ONE
  * [[graft.ops.Inference.forward]] seam, so the live gate and the
  * batch re-score are bit-identical on every document (spec-pinned).
  */
object InferStreamOps {

  /** Per-doc serving audit row: prediction (None for null text — the
    * bypass contract) and the admit verdict against `keepClass`.
    */
  final case class InferAudit(ts: java.sql.Timestamp, doc_id: Long,
                              pred_class: Option[Int],
                              logit_q: Option[Long],
                              pass: Boolean)

  /** LIVE classification gate: every arriving doc is scored by the
    * batched session and admitted iff it predicts `keepClass` — the
    * quality-/language-/topic-router a live ingest runs before a doc
    * lands in the lake. Null texts fail closed (no features, no
    * verdict to trust).
    */
  def streamingInferGate(
      docs: Dataset[(java.sql.Timestamp, Long, String)],
      keepClass: Int, dim: Int = 64, classes: Int = 4,
      batchSize: Int = 32): Dataset[InferAudit] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      // the same pack/forward/unpack loop as the batch server, over
      // the typed iterator: buffer up to batchSize rows, one forward
      // per flush, nulls bypass (order preserved by flushing first)
      new Iterator[InferAudit] {
        private val out = new java.util.ArrayDeque[InferAudit]()
        private val pending =
          new java.util.ArrayList[((java.sql.Timestamp, Long), Array[Int])]()
        private def featurize(text: String): Array[Int] = {
          val x = new Array[Int](dim)
          val toks = text.split(" ")
          var i = 0
          while (i < toks.length) {
            if (toks(i).nonEmpty) x(Inference.bucketOf(toks(i), dim)) += 1
            i += 1
          }
          x
        }
        private def runBatch(): Unit = {
          if (pending.isEmpty) return
          val xs = new Array[Array[Int]](pending.size)
          var i = 0
          while (i < pending.size) { xs(i) = pending.get(i)._2; i += 1 }
          val logits = Inference.forward(xs, dim, classes)
          i = 0
          while (i < pending.size) {
            val ((ts, id), _) = pending.get(i)
            val l = logits(i)
            var best = 0; var c = 1
            while (c < classes) { if (l(c) > l(best)) best = c; c += 1 }
            out.add(InferAudit(ts, id, Some(best), Some(l(best)),
              pass = best == keepClass))
            i += 1
          }
          pending.clear()
        }
        private def fill(): Unit = {
          while (out.isEmpty && it.hasNext) {
            val (ts, id, text) = it.next()
            if (text == null) {
              runBatch() // preserve input order around the bypass
              out.add(InferAudit(ts, id, None, None, pass = false))
            } else {
              pending.add(((ts, id), featurize(text)))
              if (pending.size >= batchSize) runBatch()
            }
          }
          if (out.isEmpty && !it.hasNext) runBatch()
        }
        override def hasNext: Boolean = { fill(); !out.isEmpty }
        override def next(): InferAudit = { fill(); out.poll() }
      }
    }
  }
}
