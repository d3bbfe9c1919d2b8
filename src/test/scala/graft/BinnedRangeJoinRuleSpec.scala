package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.plans.BinnedRangeJoinRule]]: the conf-gated rewrite of a
  * plain inequality join into the binned equi-join — plan shape,
  * result equivalence against the un-rewritten nested-loop plan, and
  * the eligibility guards.
  */
class BinnedRangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private val ConfKey = "spark.graft.rangeJoin.binWidth"

  private def withBinWidth[A](w: String)(body: => A): A = {
    spark.conf.set(ConfKey, w)
    try body finally spark.conf.unset(ConfKey)
  }

  private val points = Seq(
    (1L, -120.5), (2L, -50.0), (3L, 0.0), (4L, 0.1), (5L, 49.999),
    (6L, 50.0), (7L, 99.9), (8L, 250.0), (9L, 777.0)
  ).toDF("id", "v")
  private val bandsDf = Seq(
    ("neg", -200.0, -40.0), ("low", 0.0, 50.0), ("mid", 50.0, 100.0),
    ("empty", 30.0, 30.0), ("wide", -100.0, 800.0)
  ).toDF("band", "lo", "hi")

  private def theta(p: DataFrame, b: DataFrame): DataFrame =
    p.join(b, col("v") >= col("lo") && col("v") < col("hi"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("conf off: plain theta join stays a nested-loop join") {
    val plan = theta(points, bandsDf).queryExecution.executedPlan.toString
    assert(plan.contains("NestedLoop"), plan)
  }

  test("conf on: plan becomes Generate + bin equi-join (no nested loop), " +
    "results identical to the nested-loop answer, open/closed bounds " +
    "and negative values exact") {
    val expected = rows(theta(points, bandsDf))
    withBinWidth("50.0") {
      val df = theta(points, bandsDf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), plan)
      assert(plan.contains("Generate"), plan)
      assert(rows(df) === expected)
    }
  }

  test("bin width does not change the answer (covering is width-" +
    "independent), including widths misaligned with the data") {
    val expected = rows(theta(points, bandsDf))
    for (w <- Seq("1.0", "7.3", "500.0"))
      withBinWidth(w) { assert(rows(theta(points, bandsDf)) === expected, s"w=$w") }
  }

  test("null points and null bounds drop, matching inner-join semantics") {
    val p = Seq((1L, Option(25.0)), (2L, None: Option[Double])).toDF("id", "v")
    val b = Seq(("a", Option(0.0), Option(50.0)),
      ("b", None: Option[Double], Option(50.0))).toDF("band", "lo", "hi")
    val expected = rows(theta(p, b))
    withBinWidth("10.0") {
      val df = theta(p, b)
      assert(rows(df) === expected)
      assert(df.count() === 1L) // only (id=1, band=a)
    }
  }

  test("guard: a join that already has a cross-side equality is left alone") {
    val p = Seq((1L, "k1", 25.0)).toDF("id", "k", "v")
    val b = Seq(("k1", "a", 0.0, 50.0)).toDF("k", "band", "lo", "hi")
    withBinWidth("50.0") {
      val df = p.join(b, p("k") === b("k") &&
        col("v") >= col("lo") && col("v") < col("hi"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bin"), plan)
      assert(df.count() === 1L)
    }
  }

  test("guard: a null-safe cross-side equality (a <=> b) is an equi " +
    "key too — the join is left alone") {
    val p = Seq((1L, Option("k1"), 25.0), (2L, None, 25.0))
      .toDF("id", "k", "v")
    val b = Seq((Option("k1"), "a", 0.0, 50.0), (None, "n", 0.0, 50.0))
      .toDF("k", "band", "lo", "hi")
    withBinWidth("50.0") {
      val df = p.join(b, p("k") <=> b("k") &&
        col("v") >= col("lo") && col("v") < col("hi"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bin"), plan)
      assert(df.count() === 2L) // null <=> null matches
    }
  }

  test("auto width memo: re-planning the same query text launches NO " +
    "sampling job (fingerprint survives fresh exprIds); a two-sided " +
    "overlap records both sides") {
    import org.apache.spark.sql.GraftSqlShim
    graft.plans.BinnedRangeJoinRule.clearWidthMemoForTest()
    def freshTheta() = theta(
      points.select(col("id"), col("v")),
      bandsDf.select(col("band"), col("lo"), col("hi")))
    withBinWidth("auto") {
      val (_, warm) = GraftSqlShim.countJobs(spark) {
        freshTheta().queryExecution.optimizedPlan
      }
      assert(warm > 0, "first planning should run the sampling job")
      val memoAfterFirst = graft.plans.BinnedRangeJoinRule.widthMemoSize
      assert(memoAfterFirst >= 1)
      // brand-new DataFrame objects, same query text -> memo hit
      val (_, cached) = GraftSqlShim.countJobs(spark) {
        freshTheta().queryExecution.optimizedPlan
      }
      assert(cached === 0, "re-planning must not re-sample")
      assert(graft.plans.BinnedRangeJoinRule.widthMemoSize === memoAfterFirst)

      // two-sided overlap: both sides sampled (one combined job) and
      // both memoized; re-planning is again job-free
      val li = Seq((1L, 0.0, 30.0), (2L, 25.0, 60.0)).toDF("lid", "llo", "lhi")
      val ri = Seq((10L, 20.0, 40.0), (11L, -15.0, 5.0)).toDF("rid", "rlo", "rhi")
      def ov() = li.join(ri, col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      ov().queryExecution.optimizedPlan
      val memoAfterOverlap = graft.plans.BinnedRangeJoinRule.widthMemoSize
      assert(memoAfterOverlap >= memoAfterFirst + 2, s"$memoAfterOverlap")
      val (_, ovCached) = GraftSqlShim.countJobs(spark) {
        ov().queryExecution.optimizedPlan
      }
      assert(ovCached === 0)
    }
  }

  test("guard: unsupported join shapes and non-numeric points are left alone") {
    withBinWidth("50.0") {
      // LEFT OUTER with the point on the RIGHT: the preserved side is
      // the interval side, which binning would explode — not rewritten
      val outerIntervalPreserved = bandsDf.join(points,
        col("v") >= col("lo") && col("v") < col("hi"), "left")
      assert(!outerIntervalPreserved.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"))
      // FULL OUTER: neither side may explode
      val full = points.join(bandsDf,
        col("v") >= col("lo") && col("v") < col("hi"), "full")
      assert(!full.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      val sp = Seq((1L, "m")).toDF("id", "s")
      val sb = Seq(("a", "a", "z")).toDF("band", "slo", "shi")
      val strJoin = sp.join(sb, col("s") >= col("slo") && col("s") < col("shi"))
      assert(!strJoin.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(strJoin.count() === 1L)
    }
  }

  test("LEFT OUTER with the point on the left rewrites: unmatched and " +
    "null-point rows surface once with null interval columns, answer " +
    "matches the nested-loop left join") {
    val p = Seq((1L, Option(25.0)), (2L, Option(999999.0)),
      (3L, None: Option[Double])).toDF("id", "v")
    def lj(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("v") >= col("lo") && col("v") < col("hi"), "left")
    val expected = rows(lj(p, bandsDf))
    withBinWidth("50.0") {
      val df = lj(p, bandsDf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), plan)
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(rows(df) === expected)
    }
    // mixed-band fixture too (the standard points): every left row once
    val expected2 = rows(lj(points, bandsDf))
    withBinWidth("50.0") { assert(rows(lj(points, bandsDf)) === expected2) }
  }

  test("RIGHT OUTER with the point on the right rewrites and matches " +
    "the nested-loop answer") {
    def rj(b: DataFrame, a: DataFrame): DataFrame =
      b.join(a, col("v") >= col("lo") && col("v") < col("hi"), "right")
    val expected = rows(rj(bandsDf, points))
    withBinWidth("50.0") {
      val df = rj(bandsDf, points)
      assert(!df.queryExecution.executedPlan.toString.contains("NestedLoop"))
      assert(rows(df) === expected)
    }
  }

  test("LEFT SEMI and LEFT ANTI (events with / with NO covering " +
    "interval) rewrite and match the nested-loop answers") {
    def semi(a: DataFrame, b: DataFrame) =
      a.join(b, col("v") >= col("lo") && col("v") < col("hi"), "left_semi")
    def anti(a: DataFrame, b: DataFrame) =
      a.join(b, col("v") >= col("lo") && col("v") < col("hi"), "left_anti")
    val expSemi = rows(semi(points, bandsDf))
    val expAnti = rows(anti(points, bandsDf))
    withBinWidth("50.0") {
      val ds = semi(points, bandsDf)
      val da = anti(points, bandsDf)
      assert(!ds.queryExecution.executedPlan.toString.contains("NestedLoop"))
      assert(!da.queryExecution.executedPlan.toString.contains("NestedLoop"))
      assert(rows(ds) === expSemi)
      assert(rows(da) === expAnti)
      // the two partitions cover the points exactly
      assert(ds.count() + da.count() === points.count())
    }
  }

  test("auto width: binWidth=auto samples the interval side at plan " +
    "time — rewrite lands with no hand-set width, same answer") {
    val expected = rows(theta(points, bandsDf))
    withBinWidth("auto") {
      val df = theta(points, bandsDf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), plan)
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(rows(df) === expected)
    }
  }

  test("auto width: all-degenerate (zero-width) intervals fall back to " +
    "a usable width; an empty interval side skips the rewrite but " +
    "still answers") {
    val pts = Seq((1L, 30.0), (2L, 31.0)).toDF("id", "v")
    val degenerate = Seq(("a", 30.0, 30.0), ("b", 31.0, 31.0))
      .toDF("band", "lo", "hi")
    // closed-closed so the zero-width intervals can actually match
    def cc(a: DataFrame, b: DataFrame) =
      a.join(b, col("v") >= col("lo") && col("v") <= col("hi"))
    val expected = rows(cc(pts, degenerate))
    withBinWidth("auto") {
      assert(rows(cc(pts, degenerate)) === expected)
      val empty = degenerate.filter(col("lo") > 1e9)
      val df = cc(pts, empty)
      assert(df.count() === 0L)
    }
  }

  test("point side can be the RIGHT side of the join") {
    val expected = rows(theta(points, bandsDf))
    withBinWidth("50.0") {
      val df = bandsDf.join(points, col("v") >= col("lo") && col("v") < col("hi"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), plan)
      // same rows modulo column order
      assert(df.count() === expected.size)
    }
  }

  test("interval-OVERLAP join rewrites too: both sides explode, each " +
    "matching pair appears exactly once, answer matches nested-loop") {
    val li = Seq((1L, 0.0, 30.0), (2L, 25.0, 60.0), (3L, 200.0, 210.0),
      (4L, -80.0, -10.0)).toDF("lid", "llo", "lhi")
    val ri = Seq((10L, 20.0, 40.0), (11L, -15.0, 5.0), (12L, 500.0, 600.0),
      (13L, 0.0, 300.0)).toDF("rid", "rlo", "rhi")
    def overlap(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
    val expected = rows(overlap(li, ri))
    withBinWidth("50.0") {
      val df = overlap(li, ri)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), plan)
      assert(plan.contains("Generate"), plan)
      val got = rows(df)
      assert(got === expected)                       // same pairs
      assert(got.size === got.distinct.size)         // exactly once each
    }
    // width smaller than the intervals: pairs share MANY bins — the
    // first-shared-bin conjunct must still emit each pair once
    withBinWidth("3.0") {
      assert(rows(overlap(li, ri)) === expected)
    }
  }

  test("contract: an open-ended sentinel interval fails LOUDLY under " +
    "the rewrite (never silently wrong) — pre-filter sentinels or " +
    "leave the conf off for such data") {
    val p = Seq((1L, 25.0)).toDF("id", "v")
    val b = Seq(("open", Double.NegativeInfinity, 50.0)).toDF("band", "lo", "hi")
    withBinWidth("10.0") {
      val ex = intercept[Exception] {
        p.join(b, col("v") >= col("lo") && col("v") < col("hi")).collect()
      }
      assert(ex.getMessage != null)
    }
    // conf off: the same query answers fine through the nested loop
    val ok = p.join(b, col("v") >= col("lo") && col("v") < col("hi")).count()
    assert(ok === 1L)
  }

  test("large randomized case agrees with the nested-loop answer") {
    val rnd = new scala.util.Random(7)
    val p = (1 to 2000).map(i => (i.toLong, rnd.nextDouble() * 1000 - 200))
      .toDF("id", "v")
    val b = (1 to 60).map { i =>
      val lo = rnd.nextDouble() * 900 - 200
      (s"b$i", lo, lo + rnd.nextDouble() * 80)
    }.toDF("band", "lo", "hi")
    val expected = rows(theta(p, b))
    withBinWidth("40.0") { assert(rows(theta(p, b)) === expected) }
  }
}
