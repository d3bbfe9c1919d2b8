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
  * collect; the arithmetic head derives its weights in-place (zero
  * closure bytes) and [[Inference.inferBatchedBroadcast]] is the
  * real-model deployment shape (weights ride a broadcast, the task
  * closure carries only the handle); cost is linear in rows with
  * batch-size-amortized call overhead, identical on 32 partitions
  * or 32k.
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

  /** Hashed bag-of-tokens featurizer — whitespace tokens into
    * md5-bucketed counts. Shared by the DataFrame server and the
    * streaming gate so the two paths cannot drift.
    */
  def featuresOf(text: String, dim: Int): Array[Int] = {
    val x = new Array[Int](dim)
    val toks = text.split(" ")
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) x(bucketOf(toks(i), dim)) += 1
      i += 1
    }
    x
  }

  /** Dense flat-array forward — same math as [[forward]], but W comes
    * from a row-major `(dim × classes)` weights array: the shape a
    * REAL model ships as, built once on the driver (or loaded from a
    * checkpoint) and shipped to executors via
    * `sparkContext.broadcast`, never serialized into every task
    * closure.
    */
  def forwardDense(batch: Array[Array[Int]], weights: Array[Long],
                   dim: Int, classes: Int): Array[Array[Long]] = {
    require(weights.length == dim * classes,
      s"weights must be row-major dim*classes = ${dim * classes}: " +
        s"got ${weights.length}")
    batch.map { x =>
      val logits = new Array[Long](classes)
      var b = 0
      while (b < dim) {
        val xb = x(b)
        if (xb != 0) {
          val off = b * classes
          var c = 0
          while (c < classes) {
            logits(c) += xb.toLong * weights(off + c); c += 1
          }
        }
        b += 1
      }
      logits
    }
  }

  /** The arithmetic head materialized as the dense array
    * [[forwardDense]] serves — row-major `W(b, c)`. Driver-side, tiny
    * (dim·classes longs); [[forwardDense]] over this array is
    * bit-identical to [[forward]] (spec-pinned).
    */
  def denseWeights(dim: Int, classes: Int): Array[Long] = {
    val w = new Array[Long](dim * classes)
    var b = 0
    while (b < dim) {
      var c = 0
      while (c < classes) { w(b * classes + c) = weight(b, c); c += 1 }
      b += 1
    }
    w
  }

  /** The serving loop, factored ONCE — both the DataFrame server
    * ([[inferBatched]]) and the live gate
    * ([[graft.streaming.InferStreamOps.streamingInferGate]]) delegate
    * here, so a fix to the batching contract cannot land in one path
    * only. Packs rows whose `featurize` is non-null into fixed-size
    * batches, runs ONE `runForward` per batch, unpacks row-aligned
    * (argmax ties to the smallest class — deterministic), flushes the
    * final partial batch; a null featurization bypasses the session
    * (flushing packed rows FIRST so input order is preserved).
    * `onForward` observes each forward's batch size (test seam).
    */
  def batchedServe[I, O](rows: Iterator[I], batchSize: Int,
                         featurize: I => Array[Int],
                         runForward: Array[Array[Int]] => Array[Array[Long]],
                         emit: (I, Int, Long) => O,
                         emitBypass: I => O,
                         onForward: Int => Unit = _ => ()): Iterator[O] = {
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    new Iterator[O] {
      // rows owed to the caller: unpacked results of the last
      // forward, emitted before the next batch is packed
      private val out = new java.util.ArrayDeque[O]()
      private val pending = new java.util.ArrayList[(I, Array[Int])]()
      private def runBatch(): Unit = {
        if (pending.isEmpty) return
        val xs = new Array[Array[Int]](pending.size)
        var i = 0
        while (i < pending.size) { xs(i) = pending.get(i)._2; i += 1 }
        onForward(xs.length)
        val logits = runForward(xs)
        i = 0
        while (i < pending.size) {
          val l = logits(i)
          var best = 0; var c = 1
          while (c < l.length) { if (l(c) > l(best)) best = c; c += 1 }
          out.add(emit(pending.get(i)._1, best, l(best)))
          i += 1
        }
        pending.clear()
      }
      private def fill(): Unit = {
        // pack until a full batch is ready, a bypass interrupts, or
        // the partition drains (flush of the final partial batch)
        while (out.isEmpty && rows.hasNext) {
          val r = rows.next()
          val x = featurize(r)
          if (x == null) {
            // bypass rows skip the session — but rows already packed
            // must flush FIRST to preserve input order
            runBatch()
            out.add(emitBypass(r))
          } else {
            pending.add((r, x))
            if (pending.size >= batchSize) runBatch()
          }
        }
        if (out.isEmpty && !rows.hasNext) runBatch()
      }
      override def hasNext: Boolean = { fill(); !out.isEmpty }
      override def next(): O = { fill(); out.poll() }
    }
  }

  /** Batched inference over a text column: adds `pred_class` (argmax
    * logit, ties to the smallest class — deterministic) and `logit_q`.
    * `onForward` is a test seam observing each forward's batch size
    * (executor-side; defaults to nothing).
    */
  def inferBatched(df: DataFrame, textCol: String, dim: Int = 64,
                   classes: Int = 4, batchSize: Int = 32,
                   onForward: Int => Unit = _ => ()): DataFrame = {
    require(dim >= 1 && classes >= 1,
      s"dim/classes must be >= 1: $dim/$classes")
    val outSchema = StructType(df.schema.fields ++ inferSchema.fields)
    val txtIdx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { rows =>
      batchedServe[Row, Row](rows, batchSize,
        r => if (r.isNullAt(txtIdx)) null
             else featuresOf(r.getString(txtIdx), dim),
        xs => forward(xs, dim, classes),
        // explicit boxing: Seq(best, logit) would numeric-widen the
        // Int to Long and corrupt the pred_class column type
        (r, best, logit) => Row.fromSeq(r.toSeq ++
          Seq(Int.box(best), Long.box(logit))),
        r => Row.fromSeq(r.toSeq ++ Seq(null, null)),
        onForward)
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Broadcast-model variant — the REAL-model deployment shape: the
    * weights array is built/loaded ONCE on the driver and shipped via
    * `sparkContext.broadcast`, so every task closure carries only the
    * broadcast handle (a few bytes), not the model. With
    * `weights = broadcast(denseWeights(dim, classes))` this is
    * bit-identical to [[inferBatched]] (spec-pinned); with a trained
    * checkpoint it is the production path. Same serving contract —
    * same [[batchedServe]] loop, same schema, same null bypass.
    */
  def inferBatchedBroadcast(
      df: DataFrame, textCol: String,
      weights: org.apache.spark.broadcast.Broadcast[Array[Long]],
      dim: Int = 64, classes: Int = 4, batchSize: Int = 32,
      onForward: Int => Unit = _ => ()): DataFrame = {
    require(dim >= 1 && classes >= 1,
      s"dim/classes must be >= 1: $dim/$classes")
    require(weights.value.length == dim * classes,
      s"weights must be row-major dim*classes = ${dim * classes}: " +
        s"got ${weights.value.length}") // driver-side, fails before launch
    val outSchema = StructType(df.schema.fields ++ inferSchema.fields)
    val txtIdx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val w = weights.value // resolved executor-side from the broadcast
      batchedServe[Row, Row](rows, batchSize,
        r => if (r.isNullAt(txtIdx)) null
             else featuresOf(r.getString(txtIdx), dim),
        xs => forwardDense(xs, w, dim, classes),
        (r, best, logit) => Row.fromSeq(r.toSeq ++
          Seq(Int.box(best), Long.box(logit))),
        r => Row.fromSeq(r.toSeq ++ Seq(null, null)),
        onForward)
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
