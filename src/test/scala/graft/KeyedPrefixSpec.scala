package graft

import graft.ops.KeyedPrefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed prefix sums without a per-key total sort: the two-pass
  * AuditSeq discipline generalized to running counts + sums
  * (SCALING.md "Sequential replay"). Oracle inside the suite is the
  * per-key ordered window — correct by definition, serial per key.
  */
class KeyedPrefixSpec extends SparkSpec {
  import spark.implicits._

  // few keys, many rows per key, scattered over many partitions —
  // exactly the shape where Window.partitionBy(key) is a straggler
  private def df = (1 to 2000)
    .map(i => (s"k${i % 3}", i.toLong, (i % 7).toLong))
    .toDF("k", "ord", "v").repartition(11)

  test("cumsum matches the per-key ordered-window oracle bit-for-bit") {
    val got = KeyedPrefix.cumsum(df, Seq("k"), Seq("ord"),
        Seq("v" -> "cumv"), countName = "n")
      .select("k", "ord", "n", "cumv")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val w = Window.partitionBy("k").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("cumv", sum(col("v")).over(w))
      .select("k", "ord", "n", "cumv")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === want.toSeq)
  }

  test("multiple sum columns and a multi-column key") {
    val d2 = (1 to 500)
      .map(i => (i % 2, s"g${i % 2}", i.toLong, 1L, i.toLong % 5))
      .toDF("ka", "kb", "ord", "one", "v").repartition(5)
    val got = KeyedPrefix.cumsum(d2, Seq("ka", "kb"), Seq("ord"),
        Seq("one" -> "c1", "v" -> "cv"))
      .select("ka", "kb", "ord", "n", "c1", "cv")
      .as[(Int, String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._3))
    got.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      var c = 0L; var cv = 0L
      sorted.foreach { r =>
        c += 1L; cv += r._3 % 5
        assert(r._4 === c); assert(r._5 === c); assert(r._6 === cv)
      }
    }
  }

  test("running maxes ride the same two passes: parity with the " +
    "ordered-window max oracle, mixed with sums") {
    val d = (1 to 1500)
      .map(i => (s"k${i % 2}", i.toLong, ((i * 37) % 101).toLong))
      .toDF("k", "ord", "v").repartition(9)
    val got = KeyedPrefix.cumsum(d, Seq("k"), Seq("ord"),
        Seq("v" -> "cv"), countName = "n", maxes = Seq("v" -> "mv"))
      .select("k", "ord", "n", "cv", "mv")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val w = Window.partitionBy("k").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = d
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("cv", sum(col("v")).over(w))
      .withColumn("mv", max(col("v")).over(w))
      .select("k", "ord", "n", "cv", "mv")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === want.toSeq)
  }

  test("deterministic across runs (unique (key, order) contract)") {
    def run() = KeyedPrefix.cumsum(df, Seq("k"), Seq("ord"), Seq("v" -> "cv"))
      .select("k", "ord", "n", "cv")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run() === run())
  }

  test("property: seeded random shapes (key counts, sizes, partition " +
    "counts, negative values) all match the window oracle") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val nKeys = 1 + rnd.nextInt(6)
      val n = 50 + rnd.nextInt(2000)
      val parts = 1 + rnd.nextInt(16)
      val d = (1 to n)
        .map(i => (s"k${rnd.nextInt(nKeys)}", i.toLong,
          (rnd.nextInt(201) - 100).toLong))
        .toDF("k", "ord", "v").repartition(parts)
      val got = KeyedPrefix.cumsum(d, Seq("k"), Seq("ord"),
          Seq("v" -> "cv"), countName = "n", maxes = Seq("v" -> "mv"))
        .select("k", "ord", "n", "cv", "mv")
        .as[(String, Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2))
      val w = Window.partitionBy("k").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, 0)
      val want = d
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("cv", sum(col("v")).over(w))
        .withColumn("mv", max(col("v")).over(w))
        .select("k", "ord", "n", "cv", "mv")
        .as[(String, Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2))
      assert(got.toSeq === want.toSeq,
        s"trial $trial: nKeys=$nKeys n=$n parts=$parts")
    }
  }

  test("null in a sum column fails loudly, not silently") {
    val bad = Seq(("a", 1L, Some(1L)), ("a", 2L, None))
      .toDF("k", "ord", "v")
    val ex = intercept[org.apache.spark.SparkException] {
      KeyedPrefix.cumsum(bad, Seq("k"), Seq("ord"), Seq("v" -> "cv")).collect()
    }
    assert(ex.getMessage.contains("cumsum") ||
      Option(ex.getCause).exists(_.getMessage.contains("cumsum")))
  }

  test("high-cardinality keys fail fast at the carry-tuple bound " +
    "(executor-side, before the driver collect) with a message naming " +
    "the Window.partitionBy alternative") {
    import spark.implicits._
    val wide = (1 to 200).map(i => (s"k$i", 1L, 1L)).toDF("k", "ord", "v")
    val ex = intercept[Exception] {
      KeyedPrefix.cumsum(wide, Seq("k"), Seq("ord"), Seq("v" -> "cv"),
        maxCarryTuples = 50).collect()
    }
    val msg = ex.getMessage +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("carry tuples") && msg.contains("Window.partitionBy"),
      msg)
    // under the bound the same frame passes (the guard is a bound,
    // not a behavior change)
    assert(KeyedPrefix.cumsum(wide, Seq("k"), Seq("ord"),
      Seq("v" -> "cv"), maxCarryTuples = 4096).count() === 200L)
  }

  test("output-name collision and non-Long sum column are rejected") {
    intercept[IllegalArgumentException] {
      KeyedPrefix.cumsum(df, Seq("k"), Seq("ord"), Seq("v" -> "ord"))
    }
    val dbl = Seq(("a", 1L, 1.5)).toDF("k", "ord", "v")
    intercept[IllegalArgumentException] {
      KeyedPrefix.cumsum(dbl, Seq("k"), Seq("ord"), Seq("v" -> "cv"))
    }
  }
}
