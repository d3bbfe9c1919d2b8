package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native as-of join ([[graft.plans.AsofJoinExec]]): result
  * equivalence against the composed union+window form on every
  * contract point, plus the physical-plan shape the operator exists
  * to deliver.
  */
class AsofJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val left = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 12:00:00")),
    (3L, "u2", ts("2024-01-01 09:00:00")),
    (4L, "u3", ts("2024-01-01 09:00:00"))
  ).toDF("id", "user", "t")

  private val right = Seq(
    ("u1", 10L, "a", ts("2024-01-01 09:30:00")),
    ("u1", 11L, "b", ts("2024-01-01 11:00:00")),
    ("u1", 12L, "c", ts("2024-01-01 12:00:00")),
    ("u2", 20L, "d", ts("2024-01-01 09:30:00"))
  ).toDF("user", "rid", "tag", "rt")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("native as-of matches the composed form on the basic contract") {
    val composed = TemporalJoins.asOfJoin(left, right, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"))
    val native = TemporalJoins.asOfJoinNative(left, right, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"))
    assert(native.columns.toSeq === composed.columns.toSeq)
    assert(rows(native) === rows(composed))
  }

  test("strict variant matches the composed strict form") {
    val composed = TemporalJoins.asOfJoin(left, right, Seq("user"), "t", "rt",
      Seq("rid"), rightTiebreak = Some("rid"), strict = true)
    val native = TemporalJoins.asOfJoinNative(left, right, Seq("user"), "t", "rt",
      Seq("rid"), rightTiebreak = Some("rid"), strict = true)
    assert(rows(native) === rows(composed))
  }

  test("equal-(key, time) right rows resolve to the highest tiebreak, " +
    "and carried columns come atomically from that one row") {
    val tied = Seq(
      ("u1", 1L, "low", ts("2024-01-01 09:00:00")),
      ("u1", 9L, "high", ts("2024-01-01 09:00:00"))
    ).toDF("user", "rid", "tag", "rt")
    val l = Seq((1L, "u1", ts("2024-01-01 10:00:00"))).toDF("id", "user", "t")
    val out = TemporalJoins.asOfJoinNative(l, tied, Seq("user"), "t", "rt",
        Seq("rid", "tag"), rightTiebreak = Some("rid"))
      .as[(Long, String, java.sql.Timestamp, Long, String)].collect()
    assert(out.head._4 === 9L && out.head._5 === "high")
  }

  test("null keys and null times: null-keyed/timed rights match nothing; " +
    "null-keyed/timed lefts keep their row with null right columns") {
    val l = Seq(
      (1L, Option("u1"), Option(ts("2024-01-01 10:00:00"))),
      (2L, None: Option[String], Option(ts("2024-01-01 10:00:00"))),
      (3L, Option("u1"), None: Option[java.sql.Timestamp])
    ).toDF("id", "user", "t")
    val r = Seq(
      (Option("u1"), 10L, Option(ts("2024-01-01 09:00:00"))),
      (None: Option[String], 99L, Option(ts("2024-01-01 09:00:00"))),
      (Option("u1"), 98L, None: Option[java.sql.Timestamp])
    ).toDF("user", "rid", "rt")
    val composed = TemporalJoins.asOfJoin(l, r, Seq("user"), "t", "rt",
      Seq("rid"), rightTiebreak = Some("rid"))
    val native = TemporalJoins.asOfJoinNative(l, r, Seq("user"), "t", "rt",
      Seq("rid"), rightTiebreak = Some("rid"))
    assert(rows(native) === rows(composed))
    val byId = native.as[(Long, Option[String], Option[java.sql.Timestamp], Option[Long])]
      .collect().map(t => t._1 -> t._4).toMap
    assert(byId === Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("empty right side leaves every left row null-extended") {
    val native = TemporalJoins.asOfJoinNative(left,
      right.filter(lit(false)), Seq("user"), "t", "rt", Seq("rid"))
    assert(native.count() === 4L)
    assert(native.filter(col("rid").isNotNull).count() === 0L)
  }

  test("no caller tiebreak: deterministic carried-struct ranking matches " +
    "the composed form") {
    val tied = Seq(
      ("u1", 1L, "aa", ts("2024-01-01 09:00:00")),
      ("u1", 1L, "zz", ts("2024-01-01 09:00:00"))
    ).toDF("user", "rid", "tag", "rt")
    val l = Seq((1L, "u1", ts("2024-01-01 10:00:00"))).toDF("id", "user", "t")
    val composed = TemporalJoins.asOfJoin(l, tied, Seq("user"), "t", "rt",
      Seq("rid", "tag"))
    val native = TemporalJoins.asOfJoinNative(l, tied, Seq("user"), "t", "rt",
      Seq("rid", "tag"))
    assert(rows(native) === rows(composed))
  }

  test("self-join (attribution shape): left and right derive from the " +
    "same frame without attribute-id collisions") {
    val ev = Seq(
      (1L, 7L, "view", ts("2024-01-01 09:00:00")),
      (2L, 7L, "purchase", ts("2024-01-01 10:00:00")),
      (3L, 7L, "click", ts("2024-01-01 09:30:00")),
      (4L, 8L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("ts_us"))
    val sources = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("src_id"),
        col("event_type").as("src_type"), col("ts").as("src_ts_us"))
    val out = TemporalJoins.asOfJoinNative(purchases, sources, Seq("user_id"),
        "ts_us", "src_ts_us", Seq("src_id", "src_type"),
        rightTiebreak = Some("src_id"))
      .as[(Long, Long, java.sql.Timestamp, Option[Long], Option[String])]
      .collect().map(t => t._1 -> (t._4, t._5)).toMap
    assert(out === Map(
      2L -> (Some(3L), Some("click")),
      4L -> (None, None)))
  }

  test("plan shape: AsofJoinExec present, one exchange per side, " +
    "no window and no union anywhere in the plan") {
    val native = TemporalJoins.asOfJoinNative(left, right, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"))
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Union"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }

  test("forward direction picks the EARLIEST right row at-or-after " +
    "each left time; strict excludes equal-time; ties take the lowest " +
    "tiebreak; unmatched lefts keep nulls") {
    val out = TemporalJoins.asOfJoinNative(left, right, Seq("user"), "t", "rt",
        Seq("rid", "tag"), rightTiebreak = Some("rid"), direction = "forward")
      .orderBy("id")
      .as[(Long, String, java.sql.Timestamp, Option[Long], Option[String])]
      .collect().map(r => (r._1, r._4)).toSeq
    // id=1 @10:00 -> first right >= is 11:00 (rid=11)
    // id=2 @12:00 -> equal-time 12:00 (rid=12) INCLUDED (non-strict)
    // id=3 @09:00 -> 09:30 (rid=20); id=4 (u3) -> none
    assert(out === Seq((1L, Some(11L)), (2L, Some(12L)),
      (3L, Some(20L)), (4L, None)))
    val strictOut = TemporalJoins.asOfJoinNative(left, right, Seq("user"),
        "t", "rt", Seq("rid"), rightTiebreak = Some("rid"),
        strict = true, direction = "forward")
      .orderBy("id").as[(Long, String, java.sql.Timestamp, Option[Long])]
      .collect().map(r => (r._1, r._4)).toSeq
    // id=2 @12:00 strict: no right strictly after 12:00 -> null
    assert(strictOut === Seq((1L, Some(11L)), (2L, None),
      (3L, Some(20L)), (4L, None)))
  }

  test("forward randomized case matches the theta-join + argmin reference " +
    "across partition boundaries") {
    val rnd = new scala.util.Random(11)
    val l = (1 to 400).map { i =>
      (i.toLong, s"k${rnd.nextInt(6)}", rnd.nextInt(500).toLong)
    }.toDF("id", "k", "t")
    val r = (1 to 700).map { i =>
      (s"k${rnd.nextInt(6)}", i.toLong, rnd.nextInt(500).toLong)
    }.toDF("k", "rid", "rt")
    val native = TemporalJoins.asOfJoinNative(l, r, Seq("k"), "t", "rt",
        Seq("rid"), rightTiebreak = Some("rid"), direction = "forward")
      .select("id", "rid")
    val ref = l.join(r, l("k") === r("k") && col("rt") >= col("t"))
      .groupBy("id").agg(min(struct(col("rt"), col("rid"))).as("m"))
      .select(col("id"), col("m.rid").as("rid"))
    val refFull = l.select("id").join(ref, Seq("id"), "left")
    assert(native.collect().map(_.toString).sorted.toSeq ===
      refFull.collect().map(_.toString).sorted.toSeq)
  }

  test("outputPartitioning passthrough: a per-key aggregation downstream " +
    "of the native as-of join adds NO extra exchange") {
    val joined = TemporalJoins.asOfJoinNative(left, right, Seq("user"), "t", "rt",
      Seq("rid"), rightTiebreak = Some("rid"))
    val agged = joined.groupBy("user").agg(count(lit(1)).as("n"),
      max(col("rid")).as("max_rid"))
    val plan = agged.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    // one per join side; the aggregation reuses the left child's
    // keys-clustered partitioning the exec advertises
    assert(exchanges === 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    assert(agged.count() === 3L)
  }

  test("multi-key join and larger randomized data match the composed form " +
    "across partition boundaries") {
    val rnd = new scala.util.Random(42)
    val l = (1 to 500).map { i =>
      (i.toLong, s"k${rnd.nextInt(8)}", s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong)
    }.toDF("id", "k1", "k2", "t")
    val r = (1 to 800).map { i =>
      (s"k${rnd.nextInt(8)}", s"g${rnd.nextInt(3)}", i.toLong, rnd.nextInt(1000).toLong)
    }.toDF("k1", "k2", "rid", "rt")
    val composed = TemporalJoins.asOfJoin(l, r, Seq("k1", "k2"), "t", "rt",
      Seq("rid"), rightTiebreak = Some("rid"))
    val native = TemporalJoins.asOfJoinNative(l, r, Seq("k1", "k2"), "t", "rt",
      Seq("rid"), rightTiebreak = Some("rid"))
    assert(rows(native) === rows(composed))
    val strictC = TemporalJoins.asOfJoin(l, r, Seq("k1", "k2"), "t", "rt",
      Seq("rid"), rightTiebreak = Some("rid"), strict = true)
    val strictN = TemporalJoins.asOfJoinNative(l, r, Seq("k1", "k2"), "t", "rt",
      Seq("rid"), rightTiebreak = Some("rid"), strict = true)
    assert(rows(strictN) === rows(strictC))
  }

  test("SKEW: on a hot-key fixture (one key = 90% of both sides) the " +
    "time-split fallback matches the native result exactly — strict " +
    "and non-strict — and spreads the hot key over its time buckets") {
    val rnd = new scala.util.Random(11)
    val n = 6000
    // 90% of rows on key "hot", the rest over 50 cold keys; times
    // interleave so carry-in is exercised at every bucket boundary
    def key(i: Int) = if (i % 10 != 0) "hot" else s"cold${i % 50}"
    val l = (1 to n).map { i =>
      (i.toLong, key(i), rnd.nextInt(1000000).toLong)
    }.toDF("id", "user", "t")
    val r = (1 to n).map { i =>
      (key(i + 3), i.toLong + 1000000L, s"tag$i", rnd.nextInt(1000000).toLong)
    }.toDF("user", "rid", "tag", "rt")
    val native = TemporalJoins.asOfJoinNative(l, r, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"))
    // bucket width 1/64 of the span: the hot key splits into ~64
    // independently-joinable slices
    val split = TemporalJoins.asOfJoinTimeSplit(l, r, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"),
      bucketWidth = 1000000L / 64)
    def timed(df: DataFrame): (Seq[String], Double) = {
      val t0 = System.nanoTime()
      val out = rows(df)
      (out, (System.nanoTime() - t0) / 1e9)
    }
    val (nRows, nSec) = timed(native)
    val (sRows, sSec) = timed(split)
    assert(sRows === nRows)
    info(f"hot-key 90%%: native $nSec%.2fs vs time-split $sSec%.2fs " +
      f"(local[*] hides the skew win; at scale the split bounds the " +
      f"max task at span/bucketWidth of the hot key)")
    // strict variant too — boundary rows must not leak across buckets
    val nStrict = TemporalJoins.asOfJoinNative(l, r, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"), strict = true)
    val sStrict = TemporalJoins.asOfJoinTimeSplit(l, r, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"), strict = true,
      bucketWidth = 1000000L / 64)
    assert(rows(sStrict) === rows(nStrict))
    // the salted grouping really splits the hot key: distinct
    // (user, bucket) groups for "hot" >> 1
    val hotBuckets = l.filter(col("user") === "hot")
      .select(floor(col("t") / (1000000L / 64)).cast("long").as("b"))
      .distinct().count()
    assert(hotBuckets > 32, s"expected the hot key spread over buckets, got $hotBuckets")
  }

  test("SKEW forward: the same 90%-hot-key fixture through the " +
    "carry-forward mirror matches the native forward result exactly — " +
    "strict and non-strict") {
    val rnd = new scala.util.Random(13)
    val n = 6000
    def key(i: Int) = if (i % 10 != 0) "hot" else s"cold${i % 50}"
    val l = (1 to n).map { i =>
      (i.toLong, key(i), rnd.nextInt(1000000).toLong)
    }.toDF("id", "user", "t")
    val r = (1 to n).map { i =>
      (key(i + 3), i.toLong + 1000000L, s"tag$i", rnd.nextInt(1000000).toLong)
    }.toDF("user", "rid", "tag", "rt")
    val native = TemporalJoins.asOfJoinNative(l, r, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"), direction = "forward")
    val split = TemporalJoins.asOfJoinTimeSplit(l, r, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"),
      bucketWidth = 1000000L / 64, direction = "forward")
    assert(rows(split) === rows(native))
    val nStrict = TemporalJoins.asOfJoinNative(l, r, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"), strict = true,
      direction = "forward")
    val sStrict = TemporalJoins.asOfJoinTimeSplit(l, r, Seq("user"), "t", "rt",
      Seq("rid", "tag"), rightTiebreak = Some("rid"), strict = true,
      bucketWidth = 1000000L / 64, direction = "forward")
    assert(rows(sStrict) === rows(nStrict))
  }

  test("time-split forward: carried time column and no-tiebreak " +
    "structs mirror the native forward pick") {
    val r2 = right.withColumn("rt_us", unix_micros(col("rt")))
      .drop("rt").withColumnRenamed("rt_us", "rt")
    val l3 = left.withColumn("t_us", unix_micros(col("t"))).drop("t")
      .withColumnRenamed("t_us", "t")
    val native = TemporalJoins.asOfJoinNative(l3, r2, Seq("user"), "t", "rt",
      Seq("rid", "tag", "rt"), rightTiebreak = Some("rid"),
      direction = "forward")
    val split = TemporalJoins.asOfJoinTimeSplit(l3, r2, Seq("user"), "t", "rt",
      Seq("rid", "tag", "rt"), rightTiebreak = Some("rid"),
      bucketWidth = 3600000000L, direction = "forward")
    assert(rows(split) === rows(native))
    val nativeNoTb = TemporalJoins.asOfJoinNative(l3, r2, Seq("user"), "t",
      "rt", Seq("rid", "tag"), direction = "forward")
    val splitNoTb = TemporalJoins.asOfJoinTimeSplit(l3, r2, Seq("user"), "t",
      "rt", Seq("rid", "tag"), bucketWidth = 3600000000L,
      direction = "forward")
    assert(rows(splitNoTb) === rows(nativeNoTb))
  }

  test("time-split fallback: carried column containing the time column " +
    "itself (the attribution shape) and no-tiebreak structs both work") {
    val l2 = left
    val r2 = right.withColumn("rt_us", unix_micros(col("rt")))
      .drop("rt").withColumnRenamed("rt_us", "rt")
    val l3 = l2.withColumn("t_us", unix_micros(col("t"))).drop("t")
      .withColumnRenamed("t_us", "t")
    val composed = TemporalJoins.asOfJoin(l3, r2, Seq("user"), "t", "rt",
      Seq("rid", "tag", "rt"), rightTiebreak = Some("rid"))
    val split = TemporalJoins.asOfJoinTimeSplit(l3, r2, Seq("user"), "t", "rt",
      Seq("rid", "tag", "rt"), rightTiebreak = Some("rid"),
      bucketWidth = 3600000000L)
    assert(rows(split) === rows(composed))
    val composedNoTb = TemporalJoins.asOfJoin(l3, r2, Seq("user"), "t", "rt",
      Seq("rid", "tag"))
    val splitNoTb = TemporalJoins.asOfJoinTimeSplit(l3, r2, Seq("user"), "t", "rt",
      Seq("rid", "tag"), bucketWidth = 3600000000L)
    assert(rows(splitNoTb) === rows(composedNoTb))
  }
}
