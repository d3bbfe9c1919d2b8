package graft

import graft.core.AuditSeq
import org.apache.spark.sql.functions._

/** Dense-pk assignment: both implementations, density, determinism,
  * offsets (SURVEY.md §7.4.1).
  */
class AuditSeqSpec extends SparkSpec {
  import spark.implicits._

  // k = 7i mod 1009 (1009 prime) — a distinct-key permutation, since
  // the order columns must be a unique key (ties are forbidden)
  private def df = (1 to 1000).map(i => (i * 7 % 1009, s"r$i"))
    .toDF("k", "x").repartition(7) // deliberately many partitions

  test("assign produces a dense 1..N sequence ordered by the order cols") {
    val out = AuditSeq.assign(df, Seq(col("k"))).cache()
    val pks = out.select("audit_pk").as[Long].collect().sorted
    assert(pks.toSeq === (1L to 1000L))
    // ordering respected: pk order == k order
    val byPk = out.orderBy("audit_pk").select("k").as[Int].collect()
    assert(byPk.toSeq === byPk.toSeq.sorted)
  }

  test("zipWithIndex path and window path agree bit-for-bit") {
    val a = AuditSeq.assign(df, Seq(col("k")))
      .select("k", "x", "audit_pk").as[(Int, String, Long)].collect().sortBy(_._3)
    val b = AuditSeq.assignWindowed(df, Seq(col("k")))
      .select("k", "x", "audit_pk").as[(Int, String, Long)].collect().sortBy(_._3)
    assert(a.toSeq === b.toSeq)
  }

  test("base offset shifts the sequence (watermark resume)") {
    val out = AuditSeq.assign(df.limit(5), Seq(col("k")), base = 42L)
    val pks = out.select("audit_pk").as[Long].collect().sorted
    assert(pks.toSeq === (43L to 47L))
  }

  test("deterministic across runs") {
    val a = AuditSeq.assign(df, Seq(col("k"))).select("k", "audit_pk")
      .as[(Int, Long)].collect().sortBy(_._2)
    val b = AuditSeq.assign(df, Seq(col("k"))).select("k", "audit_pk")
      .as[(Int, Long)].collect().sortBy(_._2)
    assert(a.toSeq === b.toSeq)
  }
}
