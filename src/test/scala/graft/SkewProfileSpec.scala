package graft

import graft.ops.{Profile, Skew}
import org.apache.spark.sql.functions._

/** Salted aggregation/join equivalence and profile correctness. */
class SkewProfileSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = (1 to 5000).map { i =>
    // 80% of rows share one hot key
    (if (i % 5 == 0) s"k${i % 50}" else "HOT", i.toLong, i * 1.5)
  }.toDF("k", "id", "v")

  test("twoPhaseAgg == direct groupBy for count/sum/min/max on a hot key") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1)
    val salted = Skew.twoPhaseAgg(skewed, Seq("k"), col("id"), salts = 16,
      phase1 = Seq(count(lit(1)).as("pc"), sum(col("id")).as("ps"),
        min(col("v")).as("pmn"), max(col("v")).as("pmx")),
      phase2 = Seq(sum(col("pc")).as("n"), sum(col("ps")).as("s"),
        min(col("pmn")).as("mn"), max(col("pmx")).as("mx")))
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(salted.toSeq === direct.toSeq)
  }

  test("saltedJoin == plain join against a small dimension") {
    val dim = Seq(("HOT", "hot!"), ("k5", "five")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).select("k", "id", "label")
      .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2))
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), col("id"), salts = 8)
      .select("k", "id", "label")
      .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(salted.toSeq === plain.toSeq)
  }

  test("binnedRangeJoin == naive interval join, incl. bands wider than " +
    "the bin and boundary values") {
    val facts = Seq((1L, 0.0), (2L, 49.99), (3L, 50.0), (4L, 120.0), (5L, 250.0))
      .toDF("id", "v")
    val bands = Seq(("a", 0.0, 50.0), ("b", 50.0, 200.0), ("wide", 0.0, 300.0))
      .toDF("band", "lo", "hi")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "band").as[(Long, String)].collect().sorted.toSeq
    val naive = canon(facts.join(bands, col("v") >= col("lo") && col("v") < col("hi")))
    val binned = canon(Skew.binnedRangeJoin(facts, "v", bands, "lo", "hi", 50.0))
    assert(binned === naive)
    assert(naive.contains((3L, "b")) && !naive.contains((2L, "b"))) // boundary
  }

  test("Profile.exact computes counts/nulls/distincts/min/max per column") {
    val df = Seq((1, Some("a")), (2, Some("b")), (3, None), (4, Some("a")))
      .toDF("id", "s")
    val p = Profile.exact(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, String, String)].collect().sortBy(_._1)
    assert(p.toSeq === Seq(
      ("id", 4L, 4L, 4L, "1", "4"),
      ("s", 4L, 3L, 2L, "a", "b")))
  }

  test("Profile.approx keeps the same shape with estimated distincts") {
    val df = Seq.tabulate(1000)(i => (i, s"v${i % 97}")).toDF("id", "s")
    val p = Profile.approx(df, Seq("s")).collect().head
    assert(p.getString(0) === "s" && p.getLong(1) === 1000L)
    val est = p.getLong(3)
    assert(est > 80 && est < 115) // HLL at 5% rsd around 97
  }

  test("Profile.approx estimate lands within ±3·rsd of the exact count") {
    // the driver-visible q_profile_approx drops the estimate column
    // (engine-specific); this is the accuracy gate for the sketch itself
    val rsd = 0.05
    val df = Seq.tabulate(5000)(i => (i, s"v${i % 997}")).toDF("id", "s")
    val exact = 997.0
    val est = Profile.approx(df, Seq("s"), rsd).collect().head.getLong(3)
    assert(math.abs(est - exact) / exact <= 3 * rsd,
      s"HLL estimate $est outside ±${3 * rsd} of $exact")
  }

  test("Profile.logIntegrity: duplicates and gaps counted per group, " +
    "healthy only when both zero; global scope collapses to one row") {
    import graft.ops.Profile
    val log = Seq(
      ("t1", 1L), ("t1", 2L), ("t1", 3L),             // healthy
      ("t2", 1L), ("t2", 2L), ("t2", 2L), ("t2", 5L)  // 1 dup, 2 gaps (3,4)
    ).toDF("tbl", "seq")
    val out = Profile.logIntegrity(log, "seq", Seq("tbl"))
      .select("tbl", "n_events", "n_duplicates", "n_gaps", "healthy")
      .as[(String, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out === Seq(("t1", 3L, 0L, 0L, true), ("t2", 4L, 1L, 2L, false)))
    val g = Profile.logIntegrity(log, "seq")
      .select("scope", "n_events", "n_duplicates", "n_gaps")
      .as[(String, Long, Long, Long)].collect().toSeq
    // global: seqs 1,2,3 + 1,2,2,5 -> 7 events, 4 distinct (1,2,3,5),
    // 3 duplicates, span 5 -> 1 gap (4)
    assert(g === Seq(("all", 7L, 3L, 1L)))
  }

  test("Profile.rankAuc matches the hand-computed Mann-Whitney AUC, " +
    "counting ties as half and null labels as negatives") {
    // pos scores {3, 2}, neg scores {1, 2, 0} (the null label is the
    // score-0 negative): pos=3 beats all 3 negs; pos=2 beats {1, 0}
    // and ties neg=2 -> U = 3 + 2.5 = 5.5, u2 = 11, AUC = 5.5/6
    val scored = Seq(
      (3L, Some(true)), (2L, Some(true)),
      (1L, Some(false)), (2L, Some(false)), (0L, None))
      .toDF("score", "label")
    val r = Profile.rankAuc(scored, col("score"), col("label"))
      .as[(Long, Long, Double, Double)].head()
    assert(r === ((2L, 3L, 11.0, 5.5 / 6.0)))
  }

  test("Profile.rankAuc == brute-force pairwise AUC on a deterministic " +
    "300-row set with heavy ties") {
    val rows = Seq.tabulate(300) { i =>
      // scores collide across labels on purpose (17 buckets)
      val score = (i * 31 + 7) % 17
      val pos = (i * 13 + 5) % 3 == 0
      (score.toLong, pos)
    }
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = u2.toDouble / (2.0 * pos.size * neg.size)
    val r = Profile.rankAuc(rows.toDF("score", "label"),
        col("score"), col("label"))
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 === pos.size.toLong && r._2 === neg.size.toLong)
    assert(r._3 === u2.toDouble && r._4 === expected)
  }

  test("Profile.rankAuc is well-formed when one class is empty") {
    val onlyNeg = Seq((1L, false), (2L, false)).toDF("score", "label")
    val r = Profile.rankAuc(onlyNeg, col("score"), col("label"))
      .as[(Long, Long, Double, Double)].head()
    assert(r === ((0L, 2L, 0.0, 0.0)))
  }

  test("Profile.benford: leading digits bucket with exact ppm shares; " +
    "sub-1, zero, negative-magnitude, and NULL values classify right") {
    val vals: Seq[Option[Double]] = (10 to 19).map(v => Some(v.toDouble)) ++
      Seq(Some(25.0), Some(-3.2), Some(0.5), Some(0.0), None)
    val out = Profile.benford(vals.toDF("v"), col("v"))
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // 12 counted: ten 1s, one 2, one 3 (|-3.2|); 0.5/0.0/null excluded
    assert(out.map(r => (r._1, r._2)) === Seq((1, 10L), (2, 1L), (3, 1L)))
    assert(out.head._3 === 10L * 1000000L / 12L)
    assert(out.head._4 === 301029L)
    assert(out.head._5 === out.head._3 - 301029L)
  }

  test("Profile.functionalDependencies: held and violated FDs classify " +
    "with exact violation counts; NULL is a determinant value") {
    val df = Seq(
      (1L, Some(10L), "x"),
      (2L, Some(10L), "x"),
      (3L, Some(20L), "y"),
      (4L, None, "y"),
      (5L, None, "z") // NULL group sees two deps -> violates b->c? no: a->..
    ).toDF("a", "b", "c")
    val out = Profile.functionalDependencies(df, Seq("a", "b", "c"))
      .as[(String, String, Long, Long, Long, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // a is a key: a->b, a->c hold with fan-out 1
    assert(out(("a", "b"))._6 && out(("a", "c"))._6)
    assert(out(("a", "b"))._3 === 5L && out(("a", "b"))._5 === 1L)
    // b->c: b=10 -> {x}, b=20 -> {y}, b=NULL -> {y,z} — the null group
    // violates (NULL is a value), exactly one violating determinant
    assert(!out(("b", "c"))._6)
    assert(out(("b", "c"))._3 === 3L)
    assert(out(("b", "c"))._4 === 1L)
    assert(out(("b", "c"))._5 === 2L)
    // c->a: every c value fans out to its doc count
    assert(!out(("c", "a"))._6)
    assert(out(("c", "a"))._5 === 2L)
  }

  test("Profile.hashChain: any row edit moves its segment chain AND the " +
    "group head while other segments stand; chains are partitioning-" +
    "invariant; reordering seqs within a segment does not matter (the " +
    "fold is seq-sorted) but changing a seq does") {
    def log(rows: Seq[(String, Long, String)]) =
      rows.toDF("tbl", "seq", "payload")
    val base = Seq(
      ("a", 0L, "p0"), ("a", 1L, "p1"), ("a", 2L, "p2"), // seg 0 (len 2 -> 0,1 | 2)
      ("a", 3L, "p3"), ("b", 0L, "q0"), ("b", 5L, "q5"))
    def chains(rows: Seq[(String, Long, String)], parts: Int = 1) =
      Profile.hashChain(log(rows).repartition(parts), "tbl", "seq",
          Seq("payload"), segmentLen = 2L)
        .as[(String, Long, Long, Long, Long, String, String)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val c0 = chains(base)
    assert(c0.map(r => (r._1, r._2)) ===
      Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 2L)))
    // partitioning-invariant
    assert(chains(base, 7) === c0)
    // input ORDER irrelevant: the fold sorts by seq
    assert(chains(base.reverse, 3) === c0)
    // edit one payload in a's segment 1: that segment + a's head move,
    // a's segment 0 and all of b stand
    val tampered = base.map { case ("a", 2L, _) => ("a", 2L, "EVIL")
                             case r => r }
    val c1 = chains(tampered)
    assert(c1.filter(_._1 == "b") === c0.filter(_._1 == "b"))
    val (s0a0, s1a0) = (c0.find(r => r._1 == "a" && r._2 == 0L).get,
      c0.find(r => r._1 == "a" && r._2 == 1L).get)
    val (s0a1, s1a1) = (c1.find(r => r._1 == "a" && r._2 == 0L).get,
      c1.find(r => r._1 == "a" && r._2 == 1L).get)
    assert(s0a0._6 === s0a1._6, "untouched segment chain stands")
    assert(s1a0._6 !== s1a1._6, "tampered segment chain moves")
    assert(s0a0._7 !== s0a1._7, "group head moves")
    // renumbering a seq (same payloads) also moves the chain
    val renum = base.map { case ("a", 3L, p) => ("a", 2L, p + "x")
                           case r => r }
    assert(chains(renum).find(_._1 == "a").get._7 !==
      c0.find(_._1 == "a").get._7)
  }

  test("madOutliers: median and MAD are exact element picks; the 3-sigma-" +
    "equivalent cut flags the planted spike; MAD=0 degeneracy flags any " +
    "motion; nulls excluded") {
    val d = Seq(
      ("a", 1L, Some(1.0)), ("a", 2L, Some(2.0)), ("a", 3L, Some(3.0)),
      ("a", 4L, Some(100.0)),
      ("b", 5L, Some(5.0)), ("b", 6L, Some(5.0)), ("b", 7L, Some(5.0)),
      ("b", 8L, Some(7.0)),
      ("c", 9L, Some(42.0)),
      ("d", 10L, None: Option[Double])
    ).toDF("grp0", "id", "v")
    val out = Profile.madOutliers(d, "v", "grp0", "id").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(out.keySet === Set("a", "b", "c"))
    val a = out("a")
    assert(a.getAs[Long]("med") === 2000L && a.getAs[Long]("mad") === 1000L)
    assert(a.getAs[Long]("n_outliers") === 1L &&
      a.getAs[Long]("outlier_ppm") === 250000L)
    val b = out("b")
    assert(b.getAs[Long]("mad") === 0L && b.getAs[Long]("n_outliers") === 1L)
    val c = out("c")
    assert(c.getAs[Long]("med") === 42000L && c.getAs[Long]("mad") === 0L &&
      c.getAs[Long]("n_outliers") === 0L)
  }

  test("kAnonymity: group size and sensitive diversity verdict " +
    "independently; the homogeneous big group is the classic leak") {
    val d = (1 to 12).map(i => ("g1", "s1", i % 4)) ++   // n=12, 4 values
      (1 to 10).map(_ => ("g2", "s1", 7)) ++             // n=10, 1 value
      Seq(("g3", "s1", 1), ("g3", "s1", 2))              // n=2
    val out = Profile.kAnonymity(d.toDF("q1", "q2", "sv"),
        Seq("q1", "q2"), col("sv"), k = 10L, l = 3L)
      .collect().map(r => r.getAs[String]("q1") -> r).toMap
    assert(out("g1").getAs[Boolean]("k_anonymous") &&
      out("g1").getAs[Boolean]("l_diverse"))
    assert(out("g2").getAs[Boolean]("k_anonymous") &&
      !out("g2").getAs[Boolean]("l_diverse"))
    assert(!out("g3").getAs[Boolean]("k_anonymous"))
    assert(out("g1").getAs[Long]("n_distinct_sensitive") === 4L)
  }

  test("tCloseness: hand-computed EMD and entropy; the homogeneous " +
    "group fails both gates; null sensitive rows drop") {
    // global: sv=1 ×8, sv=2 ×4 -> p = (666666, 333333) ppm, m=2
    // gA balanced (4,4): ent_e4 = 6932 (~ln 2), emd = 166667
    // gB homogeneous (4,0): ent_e4 = 0, emd = 333335
    val d = (1 to 4).map(_ => ("gA", "s", Option(1))) ++
      (1 to 4).map(_ => ("gA", "s", Option(2))) ++
      (1 to 4).map(_ => ("gB", "s", Option(1))) ++
      Seq(("gA", "s", Option.empty[Int]))   // dropped, not counted
    val out = Profile.tCloseness(d.toDF("q1", "q2", "sv"),
        Seq("q1", "q2"), col("sv"), tPpm = 200000L, lMin = 2L)
      .collect().map(r => r.getAs[String]("q1") -> r).toMap
    val a = out("gA")
    assert(a.getAs[Long]("n") === 8L)
    assert(a.getAs[Long]("ent_e4") === 6932L)
    assert(a.getAs[Boolean]("entropy_l_diverse")) // 6932 >= floor(ln2*1e4)
    assert(a.getAs[Long]("emd_ppm") === 166667L)
    assert(a.getAs[Boolean]("t_close"))
    val b = out("gB")
    assert(b.getAs[Long]("n") === 4L)
    assert(b.getAs[Long]("ent_e4") === 0L)
    assert(!b.getAs[Boolean]("entropy_l_diverse"))
    assert(b.getAs[Long]("emd_ppm") === 333335L)
    assert(!b.getAs[Boolean]("t_close"))
  }
}
