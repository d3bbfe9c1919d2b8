package graft

import graft.ops.Spectral
import org.apache.spark.sql.functions._

/** Spectral ops: the exact integer Gram matrix (vs a brute-force
  * driver computation, flush-interval-invariant) and the power
  * iteration's direction-finding on a planted-spike fixture.
  */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-noise in [-0.5, 0.5) from (row, dim)
  private def noise(r: Int, d: Int): Float =
    (((r * 1103515245 + d * 12345 + 6789) & 0x7fffffff).toDouble /
      0x7fffffff.toDouble - 0.5).toFloat

  private def fixture(n: Int, d: Int, spikeDim: Int,
                      spike: Double): Seq[(Long, Seq[Float])] =
    (0 until n).map { r =>
      val sign = if (r % 2 == 0) 1.0 else -1.0
      (r.toLong, (0 until d).map { i =>
        val base = noise(r, i) * 0.2f
        if (i == spikeDim) (base + sign * spike).toFloat else base
      })
    }

  test("gramMatrix equals the brute-force driver Gram (truncated-mean " +
    "centering) and is flush-interval invariant") {
    val rows = fixture(n = 37, d = 5, spikeDim = 2, spike = 1.0)
    val df = rows.toDF("vec_id", "embedding")
    // driver reference: micro-quantize, truncated mean, exact products
    val q = rows.map(_._2.map(x => math.floor(x.toDouble * 1e6).toLong))
    val n = q.size
    val mu = (0 until 5).map { i =>
      val s = q.map(_(i)).sum
      s / n // JVM division truncates toward zero, matching the op
    }
    val ref = (for (i <- 0 until 5; j <- 0 until 5) yield {
      val g = q.map(v => BigInt(v(i) - mu(i)) * BigInt(v(j) - mu(j))).sum
      (i, j) -> g
    }).toMap
    for (flush <- Seq(1, 4, Spectral.FlushRows)) {
      val got = Spectral.gramMatrix(df, flushRows = flush).collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          BigInt(r.getDecimal(2).toBigInteger)).toMap
      assert(got === ref, s"flush=$flush")
    }
  }

  test("gramMatrix drops null/short/null-element vectors and requires one " +
    "complete vector") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, null.asInstanceOf[Seq[Float]]),
      (3L, Seq(9.0f)) // short — dropped
    ).toDF("vec_id", "embedding")
    val g = Spectral.gramMatrix(df).collect()
    // one surviving vector, centered on itself -> all-zero Gram cells
    assert(g.forall(_.getDecimal(2).longValueExact() == 0L))
    val none = Seq((1L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](Spectral.gramMatrix(none).collect())
  }

  test("removeTopComponent: norms never grow, the planted axis' variance " +
    "is substantially removed, and projections split by the planted sign") {
    val rows = fixture(n = 200, d = 8, spikeDim = 3, spike = 2.0)
    val df = rows.toDF("vec_id", "embedding")
    val gram = Spectral.gramMatrix(df)
    val out = Spectral.removeTopComponent(df, gram, iters = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 200)
    out.foreach { case (id, _, nb, na, iso) =>
      assert(na <= nb, s"vec $id: norm grew $na > $nb")
      assert(iso >= 0L && iso <= 1000000L)
    }
    // the spike dominates every vector's energy: removing the top axis
    // must strip well over half the total squared norm
    val totB = out.map(_._3).sum.toDouble
    val totA = out.map(_._4).sum.toDouble
    assert(totA / totB < 0.35, s"only ${1 - totA / totB} of energy removed")
    // the fixture alternates the spike sign by row parity — projections
    // onto the top axis must split accordingly (one sign per parity)
    val bySign = out.groupBy(_._1 % 2).view.mapValues(_.map(_._2)).toMap
    assert(bySign(0L).forall(p => p.signum == bySign(0L).head.signum))
    assert(bySign(1L).forall(p => p.signum == bySign(1L).head.signum))
    assert(bySign(0L).head.signum * bySign(1L).head.signum === -1)
  }

  test("topComponent finds a planted variance spike and is deterministic") {
    val d = 8
    val rows = fixture(n = 200, d = d, spikeDim = 3, spike = 2.0)
    val df = rows.toDF("vec_id", "embedding")
    val out = Spectral.topComponent(df, iters = 3).collect()
      .sortBy(_.getInt(0))
    assert(out.length === d)
    val comps = out.map(_.getLong(1))
    // infinity-norm unit: the max-|component| is exactly 10^6 and it is
    // the planted dimension
    assert(comps.map(math.abs).max === 1000000L)
    assert(comps.indexWhere(c => math.abs(c) == 1000000L) === 3)
    // all other dims carry only the small noise loading
    comps.zipWithIndex.filter(_._2 != 3).foreach { case (c, i) =>
      assert(math.abs(c) < 250000L, s"dim $i loading $c")
    }
    // bit-determinism: a second run lands on the identical vector
    val again = Spectral.topComponent(df, iters = 3).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1))
    assert(again.toSeq === comps.toSeq)
    // lambda is positive on a non-degenerate fixture
    assert(out.head.getLong(2) >= 0L)
  }
}
