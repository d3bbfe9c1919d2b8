package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spectral statistics of an embedding lake: the exact second-moment
  * (Gram) matrix and its leading eigenvector by power iteration
  * (von Mises & Pollaczek-Geiringer 1929; PCA per Pearson 1901) — the
  * drift axis / whitening direction / anisotropy probe an embedding
  * pipeline tracks next to its mean ([[Similarity]] ops).
  *
  * Exactness contract (the [[Similarity.randomProject]] discipline):
  * vectors quantize to micro-fixed-point longs BEFORE any sum, the
  * mean is the truncated integer mean, and every Gram cell is an
  * exact integer — order-free, partitioning-free, bit-identical in
  * any engine. The power iteration then runs on the driver over the
  * collected d×d matrix in BigInt (d² values — corpus-size
  * INDEPENDENT, the same bounded-driver shape as
  * [[TextStats.trainLinearProbe]]'s weight rounds), renormalizing to
  * a 10^6-scaled infinity-norm unit vector each round with
  * truncation TOWARD ZERO, so the whole trajectory — and therefore
  * the reported eigenvector — sits under the hash gate via unrolled
  * oracle CTEs.
  *
  * Scale: the corpus-sized work is ONE `mapPartitions` pass that
  * folds each partition's vectors into a d×d long accumulator and
  * emits it as (i, j, partial) rows — the map-side combine a 100 TB
  * Gram needs (shuffle payload = partitions × d² rows, never the
  * vectors). Accumulators flush every [[Spectral.FlushRows]] rows so
  * long arithmetic cannot overflow regardless of partition size
  * (|c| <= ~2^23 micro-units ⇒ 2^46 per product ⇒ 2^17 rows safe;
  * flushing at 10^5 keeps 10× headroom). Partials re-aggregate in
  * DECIMAL(38,0).
  */
object Spectral {

  /** Rows between accumulator flushes in the Gram pass — bounds the
    * magnitude a per-partition long cell can reach (see class doc).
    */
  val FlushRows: Int = 100000

  /** Exact centered Gram matrix of the micro-quantized embeddings:
    * one row per (i, j) with `g = Σ_v (q_i - μ_i)(q_j - μ_j)` as
    * DECIMAL(38,0), where `q = floor(x·10^6)` and `μ` is the
    * truncated-toward-zero integer mean. Two corpus scans: the
    * per-dim sums (for μ) and the Gram fold.
    */
  def gramMatrix(emb: DataFrame, vecCol: String = "embedding",
                 flushRows: Int = FlushRows): DataFrame = {
    require(flushRows >= 1, "flushRows must be >= 1")
    val spark = emb.sparkSession
    val probe = emb.agg(max(size(col(vecCol))).as("d")).head()
    require(!probe.isNullAt(0) && probe.getInt(0) > 0,
      "gramMatrix needs at least one non-null, non-empty vector")
    val d = probe.getInt(0)
    // micro-quantized complete vectors only (a short/null vector has no
    // defined coordinates; visible in count, not silently zero-padded)
    val q = emb
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === d &&
        !exists(col(vecCol), x => x.isNull))
      .select(transform(col(vecCol),
        x => floor(x.cast("double") * 1000000).cast("long")).as("q"))
    import spark.implicits._
    val qds = q.as[Seq[Long]].localCheckpoint() // feeds μ AND the Gram fold
    val agg = qds.mapPartitions { it =>
      val s = new Array[Long](d); var n = 0L
      it.foreach { v => var i = 0; while (i < d) { s(i) += v(i); i += 1 }; n += 1 }
      if (n == 0) Iterator.empty
      else Iterator.single((n, s.toSeq))
    }.collect()
    val n = agg.map(_._1).sum
    require(n > 0, "gramMatrix needs at least one complete vector")
    val mu = Array.tabulate(d) { i =>
      val s = agg.map(_._2(i)).sum
      s / n // JVM long division truncates toward zero, like Spark's div
    }
    val grams = qds.mapPartitions { it =>
      val acc = new Array[Long](d * d)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
      def flush(): Unit = {
        var i = 0
        while (i < d * d) {
          if (acc(i) != 0) out += ((i / d, i % d, acc(i)))
          acc(i) = 0; i += 1
        }
      }
      var rows = 0
      it.foreach { v =>
        val c = Array.tabulate(d)(i => v(i) - mu(i))
        var i = 0
        while (i < d) {
          var j = 0
          while (j < d) { acc(i * d + j) += c(i) * c(j); j += 1 }
          i += 1
        }
        rows += 1
        if (rows % flushRows == 0) flush()
      }
      flush()
      out.iterator
    }.toDF("i", "j", "p")
    grams.groupBy("i", "j")
      .agg(sum(col("p").cast("decimal(38,0)")).as("g"))
  }

  /** Leading eigenvector of the centered Gram by `iters` rounds of
    * integer power iteration, plus the eigenvalue estimate: one row
    * per dimension `(dim, comp_q, lambda_q)` where `comp_q` is the
    * 10^6-scaled infinity-norm-unit component after the final round
    * and `lambda_q = ⌊max|G·x|/10^12⌋` from one further multiply
    * (micro² scaling folded out). Start vector is all-ones — the
    * deterministic seed that makes the whole trajectory replayable.
    * Convergence after `iters` bounded rounds is approximate by
    * design (the spec pins accuracy on a planted-spike fixture); what
    * is EXACT is the arithmetic, so any engine replaying the rounds
    * lands on the identical vector.
    */
  def topComponent(emb: DataFrame, iters: Int = 3,
                   vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = emb.sparkSession
    val gdf = gramMatrix(emb, vecCol)
    val cells = gdf.collect() // d² rows — corpus-size independent
    val d = cells.map(_.getInt(0)).max + 1
    val g = Array.ofDim[BigInt](d, d)
    for (i <- 0 until d; j <- 0 until d) g(i)(j) = BigInt(0)
    cells.foreach { r =>
      g(r.getInt(0))(r.getInt(1)) = BigInt(r.getDecimal(2).toBigInteger)
    }
    val scale = BigInt(1000000)
    def matvec(x: Array[BigInt]): Array[BigInt] =
      Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * x(j)).sum)
    // truncation toward zero at every renormalize — the oracle's CASE
    // sign-split replays it exactly
    def truncDiv(a: BigInt, b: BigInt): BigInt =
      if (a.signum >= 0) a / b else -((-a) / b)
    var x = Array.fill(d)(scale)
    var lastMax = scale
    for (_ <- 1 to iters) {
      val y = matvec(x)
      lastMax = y.map(_.abs).max
      require(lastMax.signum > 0, "power iteration collapsed to zero")
      x = y.map(v => truncDiv(v * scale, lastMax))
    }
    val lambda = matvec(x).map(_.abs).max / BigInt("1000000000000")
    val rows = (0 until d).map { i =>
      Row(i, x(i).toLong, lambda.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("dim", IntegerType, nullable = false),
        StructField("comp_q", LongType, nullable = false),
        StructField("lambda_q", LongType, nullable = false))))
  }
}
