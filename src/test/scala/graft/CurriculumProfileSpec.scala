package graft

import graft.ops.{Profile, Sampling, TextStats}
import org.apache.spark.sql.functions._

/** Hand-computed cases for the round's corpus-profiling additions:
  * Gini concentration, the readability profile, and the curriculum
  * schedule (the oracle gate covers them end-to-end at sf0.01; these
  * pin the arithmetic on cases small enough to verify by hand).
  */
class CurriculumProfileSpec extends SparkSpec {
  import spark.implicits._

  test("giniConcentration: even split = 0 ppm; full concentration on " +
    "one key approaches 1e6; hand-checked mixed case") {
    // even: 2 keys x 3 rows each -> G = 0
    val even = Seq(("en", "a"), ("en", "a"), ("en", "a"),
      ("en", "b"), ("en", "b"), ("en", "b")).toDF("g", "k")
    val g0 = Profile.giniConcentration(even, "g", "k")
      .select("gini_ppm").as[Long].head()
    assert(g0 === 0L)

    // concentrated: counts (1, 9), sorted x=(1,9), n=2, tot=10
    // s = 1*1 + 2*9 = 19; G = (2*19 - 3*10) / (2*10) = 8/20 = 0.4
    val skew = (Seq.fill(1)(("de", "a")) ++ Seq.fill(9)(("de", "b")))
      .toDF("g", "k")
    val g1 = Profile.giniConcentration(skew, "g", "k")
      .select("gini_ppm").as[Long].head()
    assert(g1 === 400000L)

    // counts (1,2,3): s = 1+4+9 = 14; G = (28 - 4*6)/(3*6) = 4/18
    val mix = (Seq.fill(1)(("fr", "a")) ++ Seq.fill(2)(("fr", "b")) ++
      Seq.fill(3)(("fr", "c"))).toDF("g", "k")
    val g2 = Profile.giniConcentration(mix, "g", "k")
      .select("gini_ppm").as[Long].head()
    assert(g2 === (4L * 1000000L) / 18L)
  }

  test("readability: counts and milli-score on a hand-checked doc; " +
    "sentence floor guards punctuation-free text") {
    val docs = Seq(
      ("s1", "The cat sat. The dog ran!"),   // 6 words, 2 sentences
      ("s2", "no punctuation here")          // 3 words, floors to 1 sentence
    ).toDF("source", "text")
    val out = TextStats.readability(docs)
      .orderBy("source")
      .select("source", "words", "sentences", "vowel_groups",
        "wps_milli", "spw_milli", "flesch_milli")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    // s1: words=6 sentences=2; vowel groups: e,a,a,e,o,a = 6
    assert(out(0) === (("s1", 6L, 2L, 6L, 3000L, 1000L,
      206835L - (1015L * 3000L) / 1000L - (846L * 1000L) / 10L)))
    // s2: words=3 sentences=1(floored); vowel groups: o,u,a,io,e,e = 6
    assert(out(1)._2 === 3L && out(1)._3 === 1L && out(1)._4 === 6L)
  }

  test("erasureAudit: a row referencing deleted ids through BOTH " +
    "columns counts once; duplicate deletion-list entries don't inflate") {
    val del = Seq(1L, 1L, 3L).toDF("id") // duplicated on purpose
    val pairs = Seq(
      (1L, 3L),  // both columns hit -> one residual, not two
      (1L, 2L),  // one column hits
      (2L, 4L)   // clean
    ).toDF("a", "b")
    val out = Profile.erasureAudit(del, "id",
        Seq(("pairs", pairs, Seq("a", "b"))))
      .as[(String, Long, Long)].collect()
    assert(out.toSeq === Seq(("pairs", 3L, 2L)))
  }

  test("curriculumSchedule: stages partition each source by difficulty " +
    "order, every stage is source-balanced, schedule keys are dense") {
    val docs = (1 to 40).map { i =>
      (i.toLong, s"src${i % 2}", (100 - i).toLong) // difficulty descending in id
    }.toDF("doc_id", "source", "n_chars")
    val out = Sampling.curriculumSchedule(docs, stages = 4)
    // 20 docs per source / 4 stages = 5 per (source, stage)
    val sizes = out.groupBy("source", "stage").count()
      .select("count").as[Long].collect()
    assert(sizes.length === 8 && sizes.forall(_ === 5L))
    // within a source, every stage-1 difficulty <= every stage-2 difficulty
    val byStage = out.filter(col("source") === "src0")
      .groupBy("stage").agg(min("difficulty").as("lo"), max("difficulty").as("hi"))
      .orderBy("stage").as[(Int, Long, Long)].collect()
    byStage.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._2) }
    // rn_in_stage is dense 1..5 within each (source, stage)
    val rns = out.filter(col("source") === "src1" && col("stage") === 2)
      .select("rn_in_stage").as[Long].collect().sorted.toSeq
    assert(rns === (1L to 5L))
  }
}
