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
                   vecCol: String = "embedding"): DataFrame =
    topComponentFromGram(gramMatrix(emb, vecCol), iters)

  /** [[topComponent]] over an already-built (possibly memoized) Gram
    * frame — the split that lets one Gram materialization serve every
    * spectral consumer.
    */
  def topComponentFromGram(gram: DataFrame, iters: Int = 3): DataFrame = {
    val spark = gram.sparkSession
    val (x, lambda) = powerVec(gram, iters)
    val rows = x.indices.map { i => Row(i, x(i).toLong, lambda.toLong) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("dim", IntegerType, nullable = false),
        StructField("comp_q", LongType, nullable = false),
        StructField("lambda_q", LongType, nullable = false))))
  }

  /** The bounded driver-side power iteration itself: collect the d×d
    * Gram (corpus-size independent), run `iters` truncating rounds
    * from the all-ones seed, return the 10^6-scaled infinity-norm
    * eigenvector and the 10^12-scaled-down eigenvalue estimate.
    */
  private[ops] def powerVec(gram: DataFrame,
                            iters: Int): (Array[BigInt], BigInt) = {
    require(iters >= 1, "iters must be >= 1")
    val cells = gram.collect()
    val d = cells.map(_.getInt(0)).max + 1
    val g = Array.fill(d, d)(BigInt(0))
    cells.foreach { r =>
      g(r.getInt(0))(r.getInt(1)) = BigInt(r.getDecimal(2).toBigInteger)
    }
    val scale = BigInt(1000000)
    def matvec(x: Array[BigInt]): Array[BigInt] =
      Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * x(j)).sum)
    var x = Array.fill(d)(scale)
    for (_ <- 1 to iters) {
      val y = matvec(x)
      val m = y.map(_.abs).max
      require(m.signum > 0, "power iteration collapsed to zero")
      // truncation toward zero at every renormalize — the oracle's
      // CASE sign-split replays it exactly
      x = y.map(v => truncDiv(v * scale, m))
    }
    val lambda = matvec(x).map(_.abs).max / BigInt("1000000000000")
    (x, lambda)
  }

  private[ops] def truncDiv(a: BigInt, b: BigInt): BigInt =
    if (a.signum >= 0) a / b else -((-a) / b)

  /** The truncated-mean micro-quantized center of the complete
    * vectors — the same filter and the same truncation as
    * [[gramMatrix]]'s internal centering, exposed so
    * [[removeTopComponent]] centers identically.
    */
  private[ops] def meanVector(emb: DataFrame,
                              vecCol: String): (Int, Array[Long]) = {
    val probe = emb.agg(max(size(col(vecCol))).as("d")).head()
    require(!probe.isNullAt(0) && probe.getInt(0) > 0,
      "meanVector needs at least one non-null, non-empty vector")
    val d = probe.getInt(0)
    val sums = emb
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === d &&
        !exists(col(vecCol), x => x.isNull))
      .select(transform(col(vecCol),
        x => floor(x.cast("double") * 1000000).cast("long")).as("q"))
      .groupBy()
      .agg(count(lit(1)).as("n"),
        array((0 until d).map(i =>
          sum(element_at(col("q"), i + 1))): _*).as("s"))
      .head()
    val n = sums.getLong(0)
    require(n > 0, "meanVector needs at least one complete vector")
    val s = sums.getSeq[Long](1)
    (d, Array.tabulate(d)(i => s(i) / n)) // JVM trunc-toward-zero
  }

  /** All-but-the-top embedding post-processing (Mu & Viswanath,
    * "All-but-the-Top: Simple and Effective Postprocessing for Word
    * Representations", ICLR 2018): remove the mean and the projection
    * onto the leading principal axis from every vector — the cheap
    * isotropy fix that measurably improves similarity search over
    * anisotropic embedding spaces. Per vector this emits the
    * projection coefficient onto the top axis and the squared norm
    * before/after removal (micro²-unit longs) plus the isotropy
    * ratio — the audit that says how much variance the top axis was
    * hoarding.
    *
    * Exactness: centering uses [[meanVector]]'s truncated means; the
    * axis is [[powerVec]]'s integer eigenvector; the per-component
    * correction `c − ⌊proj·x_i / (x·x)⌋` truncates toward zero via a
    * sign-split — so the whole table hash-gates against an oracle
    * replaying the same rounds. Scale: μ, x, and x·x ride the plan as
    * LITERALS (d-sized, driver-collected, corpus-independent), making
    * the per-vector pass a pure codegen'd projection — no join, no
    * shuffle, streaming-safe.
    */
  def removeTopComponent(emb: DataFrame, gram: DataFrame, iters: Int = 3,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val (d, mu) = meanVector(emb, vecCol)
    val (x, _) = powerVec(gram, iters)
    require(x.length == d, s"gram dim ${x.length} != vector dim $d")
    val xArr = array(x.map(v => lit(v.toLong)): _*)
    val muArr = array(mu.map(lit): _*)
    val xx = x.map(v => v * v).sum.toLong // <= d·10^12
    val qvec = transform(col(vecCol),
      v => floor(v.cast("double") * 1000000).cast("long"))
    val cvec = zip_with(qvec, muArr, (a, b) => a - b)
    val xList = x.map(_.toLong).mkString(",")
    emb
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === d &&
        !exists(col(vecCol), v => v.isNull))
      .select(col(idCol).as("vec_id"), cvec.as("c"))
      .withColumn("proj_q",
        aggregate(zip_with(col("c"), xArr, (a, b) => a * b),
          lit(0L), (acc, v) => acc + v))
      // Spark's `div` on DECIMAL truncates toward zero (divideToIntegral),
      // exactly BigInt's quotient — the oracle's CASE sign-split replays
      // it over DuckDB's flooring //
      .withColumn("corr", expr(
        s"""zip_with(c, array($xList), (cv, xi) ->
           |  cv - (CAST(proj_q AS DECIMAL(38,0)) * xi) div ${xx}L)"""
          .stripMargin))
      .withColumn("n2_before",
        aggregate(transform(col("c"), v => v * v), lit(0L), (a, v) => a + v))
      .withColumn("n2_after",
        aggregate(transform(col("corr"), v => v * v), lit(0L), (a, v) => a + v))
      .select(col("vec_id"), col("proj_q"),
        col("n2_before"), col("n2_after"),
        expr("CAST(CAST(n2_after AS DECIMAL(38,0)) * 1000000" +
          " div nullif(n2_before, 0) AS BIGINT)").as("iso_ppm"))
  }
}
