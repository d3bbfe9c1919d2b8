package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Batched model serving — the plumbing shape every large-scale
  * inference pass over a corpus uses (reference scope: the north-star
  * LLM-pipeline surface; the reference engine itself has no model
  * serving, cdc_audit_sync_mysql.php is pure CDC).
  *
  * A GPU/ONNX session amortizes per-call overhead by packing MANY rows
  * into one forward call, so the Spark-side contract is NOT per-row
  * `udf(text)` — it is an Iterator→Iterator `mapPartitions` that
  * (1) packs rows into fixed-size batches (one session, one packed
  * input matrix per call), (2) runs ONE forward per batch, (3) unpacks
  * row-aligned outputs, (4) flushes the final partial batch, and
  * (5) lets null inputs bypass the model entirely (a real session
  * would reject them; they must neither crash the batch nor waste a
  * slot). Results are REQUIRED to be batch-boundary invariant — the
  * spec pins equality across batch sizes — because a model whose
  * output depends on its batch neighbors cannot be served from a
  * repartitionable corpus.
  *
  * The MODEL here is deliberately a deterministic integer network —
  * hashed bag-of-tokens features into a quantized linear head, W
  * derived arithmetically from (bucket, class) — so the whole serving
  * path sits under the DuckDB oracle gate (`q_infer_batch`): a packing
  * bug, an alignment bug, or a flush bug changes real outputs and
  * breaks the hash. Swapping in a real session is replacing
  * [[Inference.forward]]; every contract around it stays.
  *
  * Scale shape: pure per-partition projection — no shuffle, no
  * collect, model rides the closure (a real one would ride a
  * broadcast); cost is linear in rows with batch-size-amortized call
  * overhead, identical on 32 partitions or 32k.
  */
object Inference {

  /** Output schema: predicted class + its quantized logit; null text
    * serves null prediction (bypassed, never batched).
    */
  val inferSchema: StructType = StructType(Seq(
    StructField("pred_class", IntegerType, nullable = true),
    StructField("logit_q", LongType, nullable = true)
  ))

  /** Feature bucket of one token: first 5 hex digits of
    * `md5("bkt:" + token)` mod `dim` — the engine-portable hash
    * convention ([[graft.queries.ExtensionQueries]] uses the same
    * md5-prefix trick for Gumbel noise and sampling).
    */
  def bucketOf(token: String, dim: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(("bkt:" + token).getBytes("UTF-8"))
    // first 5 hex digits = 20 bits: bytes 0,1 and the high nibble of 2
    val v = ((md(0) & 0xff) << 12) | ((md(1) & 0xff) << 4) |
      ((md(2) & 0xf0) >>> 4)
    v % dim
  }

  /** The quantized linear head, derived arithmetically — W(b, c) in
    * [-999, 999]. Knuth's multiplicative constant spreads buckets;
    * both engines compute it with plain BIGINT ops (all-positive
    * operands, so `%` agrees).
    */
  def weight(b: Int, c: Int): Long =
    (b.toLong * 2654435761L + (c + 1).toLong * 40503L) % 1999L - 999L

  /** ONE forward call: packed (rows × dim) integer features in,
    * per-row logits out — `logits[i][c] = Σ_b x[i][b] · W(b, c)`.
    * This is the seam a real session replaces; everything upstream
    * (packing, alignment, flush) and downstream (unpack, null
    * bypass) is the serving contract under test.
    */
  def forward(batch: Array[Array[Int]], dim: Int,
              classes: Int): Array[Array[Long]] =
    batch.map { x =>
      val logits = new Array[Long](classes)
      var b = 0
      while (b < dim) {
        val xb = x(b)
        if (xb != 0) {
          var c = 0
          while (c < classes) {
            logits(c) += xb.toLong * weight(b, c); c += 1
          }
        }
        b += 1
      }
      logits
    }

  /** Batched inference over a text column: adds `pred_class` (argmax
    * logit, ties to the smallest class — deterministic) and `logit_q`.
    * `onForward` is a test seam observing each forward's batch size
    * (executor-side; defaults to nothing).
    */
  def inferBatched(df: DataFrame, textCol: String, dim: Int = 64,
                   classes: Int = 4, batchSize: Int = 32,
                   onForward: Int => Unit = _ => ()): DataFrame = {
    require(dim >= 1 && classes >= 1 && batchSize >= 1,
      s"dim/classes/batchSize must be >= 1: $dim/$classes/$batchSize")
    val outSchema = StructType(df.schema.fields ++ inferSchema.fields)
    val txtIdx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { rows =>
      new Iterator[Row] {
        // rows owed to the caller: unpacked results of the last
        // forward, emitted before the next batch is packed
        private var out: java.util.ArrayDeque[Row] =
          new java.util.ArrayDeque[Row]()
        private def featurize(text: String): Array[Int] = {
          val x = new Array[Int](dim)
          var i = 0
          val toks = text.split(" ")
          while (i < toks.length) {
            if (toks(i).nonEmpty) x(bucketOf(toks(i), dim)) += 1
            i += 1
          }
          x
        }
        private def runBatch(pending: java.util.ArrayList[(Row, Array[Int])])
            : Unit = {
          if (pending.isEmpty) return
          val xs = new Array[Array[Int]](pending.size)
          var i = 0
          while (i < pending.size) { xs(i) = pending.get(i)._2; i += 1 }
          onForward(xs.length)
          val logits = forward(xs, dim, classes)
          i = 0
          while (i < pending.size) {
            val l = logits(i)
            var best = 0; var c = 1
            while (c < classes) { if (l(c) > l(best)) best = c; c += 1 }
            // explicit boxing: Seq(best, l(best)) would numeric-widen
            // the Int to Long and corrupt the pred_class column type
            out.add(Row.fromSeq(pending.get(i)._1.toSeq ++
              Seq(Int.box(best), Long.box(l(best)))))
            i += 1
          }
          pending.clear()
        }
        private val pending = new java.util.ArrayList[(Row, Array[Int])]()
        private def fill(): Unit = {
          // pack until a full batch is ready, a null bypasses, or the
          // partition drains (flush of the final partial batch)
          while (out.isEmpty && rows.hasNext) {
            val r = rows.next()
            if (r.isNullAt(txtIdx)) {
              // nulls bypass the session — but rows already packed
              // must flush FIRST to preserve input order
              runBatch(pending)
              out.add(Row.fromSeq(r.toSeq ++ Seq(null, null)))
            } else {
              pending.add((r, featurize(r.getString(txtIdx))))
              if (pending.size >= batchSize) runBatch(pending)
            }
          }
          if (out.isEmpty && !rows.hasNext) runBatch(pending)
        }
        override def hasNext: Boolean = { fill(); !out.isEmpty }
        override def next(): Row = { fill(); out.poll() }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
