package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val left = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 12:00:00")),
    (3L, "u2", ts("2024-01-01 09:00:00")), // before any right row
    (4L, "u3", ts("2024-01-01 09:00:00"))  // key with no right rows
  ).toDF("id", "user", "t")

  private val right = Seq(
    ("u1", 10L, "a", ts("2024-01-01 09:30:00")),
    ("u1", 11L, "b", ts("2024-01-01 11:00:00")),
    ("u1", 12L, "c", ts("2024-01-01 12:00:00")), // equal to left id=2
    ("u2", 20L, "d", ts("2024-01-01 09:30:00"))
  ).toDF("user", "rid", "tag", "rt")

  test("asOfJoin picks the latest right row at-or-before each left time; " +
    "unmatched lefts keep nulls") {
    val out = TemporalJoins.asOfJoin(left, right, Seq("user"), "t", "rt",
        Seq("rid", "tag"), rightTiebreak = Some("rid"))
      .orderBy("id")
      .as[(Long, String, java.sql.Timestamp, Option[Long], Option[String])]
      .collect()
    assert(out.map(r => (r._1, r._4, r._5)).toSeq === Seq(
      (1L, Some(10L), Some("a")),   // 09:30 is latest <= 10:00
      (2L, Some(12L), Some("c")),   // equal time INCLUDED (non-strict)
      (3L, None, None),             // left precedes all rights
      (4L, None, None)))            // no right rows for u3
  }

  test("strict = true excludes equal-time right rows") {
    val out = TemporalJoins.asOfJoin(left, right, Seq("user"), "t", "rt",
        Seq("rid"), rightTiebreak = Some("rid"), strict = true)
      .orderBy("id").as[(Long, String, java.sql.Timestamp, Option[Long])]
      .collect()
    // left id=2 at 12:00 now sees 11:00 (rid=11), not the equal-time 12
    assert(out.map(r => (r._1, r._4)).toSeq === Seq(
      (1L, Some(10L)), (2L, Some(11L)), (3L, None), (4L, None)))
  }

  test("ties on right time break on the HIGHEST tiebreak value, " +
    "and carried columns are atomically from one right row") {
    val tied = Seq(
      ("u1", 1L, "low", ts("2024-01-01 09:00:00")),
      ("u1", 9L, "high", ts("2024-01-01 09:00:00"))
    ).toDF("user", "rid", "tag", "rt")
    val l = Seq((1L, "u1", ts("2024-01-01 10:00:00"))).toDF("id", "user", "t")
    val out = TemporalJoins.asOfJoin(l, tied, Seq("user"), "t", "rt",
        Seq("rid", "tag"), rightTiebreak = Some("rid"))
      .as[(Long, String, java.sql.Timestamp, Long, String)].collect()
    assert(out.head._4 === 9L && out.head._5 === "high")
  }

  test("right rows with null time never match; null-safe on empty right") {
    val r = Seq(("u1", 5L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("user", "rid", "rt")
    val l = Seq((1L, "u1", ts("2024-01-01 10:00:00"))).toDF("id", "user", "t")
    val out = TemporalJoins.asOfJoin(l, r, Seq("user"), "t", "rt", Seq("rid"))
      .as[(Long, String, java.sql.Timestamp, Option[Long])].collect()
    assert(out.head._4 === None)
    val empty = r.filter(lit(false))
    val out2 = TemporalJoins.asOfJoin(l, empty, Seq("user"), "t", "rt", Seq("rid"))
      .as[(Long, String, java.sql.Timestamp, Option[Long])].collect()
    assert(out2.head._4 === None)
  }

  test("composite keys partition independently") {
    val l = Seq((1L, "u1", "x", ts("2024-01-01 10:00:00")),
                (2L, "u1", "y", ts("2024-01-01 10:00:00")))
      .toDF("id", "user", "region", "t")
    val r = Seq(("u1", "x", 100L, ts("2024-01-01 09:00:00")),
                ("u1", "y", 200L, ts("2024-01-01 09:00:00")))
      .toDF("user", "region", "rid", "rt")
    val out = TemporalJoins.asOfJoin(l, r, Seq("user", "region"), "t", "rt",
        Seq("rid"))
      .orderBy("id")
      .as[(Long, String, String, java.sql.Timestamp, Long)].collect()
    assert(out.map(x => (x._1, x._5)).toSeq === Seq((1L, 100L), (2L, 200L)))
  }

  test("NULL keys match nothing (SQL equi-join semantics): a null-key " +
    "right row attributes no one; a null-key left row keeps nulls") {
    val l = Seq((1L, null.asInstanceOf[String], ts("2024-01-01 10:00:00")),
                (2L, "u1", ts("2024-01-01 10:00:00")))
      .toDF("id", "user", "t")
    val r = Seq((null.asInstanceOf[String], 50L, ts("2024-01-01 09:00:00")),
                ("u1", 60L, ts("2024-01-01 09:00:00")))
      .toDF("user", "rid", "rt")
    val out = TemporalJoins.asOfJoin(l, r, Seq("user"), "t", "rt", Seq("rid"))
      .orderBy("id").as[(Long, Option[String], java.sql.Timestamp, Option[Long])]
      .collect()
    assert(out.map(x => (x._1, x._4)).toSeq === Seq(
      (1L, None),        // null-key left: no match, row kept
      (2L, Some(60L))))  // normal key unaffected
  }

  test("rightCols colliding with left names are rejected") {
    intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(left, right.withColumnRenamed("rid", "id"),
        Seq("user"), "t", "rt", Seq("id"))
    }
  }

  test("epochUs dispatches on the events ts dtype: nanos-long and " +
    "TimestampType frames of the same instants yield identical micros") {
    // the driver's generator has produced events.ts both as
    // TIMESTAMP(NANOS) (read as a raw nanos long under nanosAsLong)
    // and as TIMESTAMP(MICROS) (read as a real TimestampType); the
    // as-of queries must land on the same epoch-µs integers either way
    val instantsUs = Seq(1704103200000000L, 1704110400000001L, 0L)
    val asLong = instantsUs.map(us => Tuple1(us * 1000L)).toDF("ts")
    val asTimestamp = instantsUs.map(us => Tuple1(
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        us / 1000000L, (us % 1000000L) * 1000L)))).toDF("ts")
    val fromLong = asLong
      .select(graft.queries.AnalyticsQueries.epochUs(asLong, "ts").as("us"))
      .as[Long].collect().toSeq
    val fromTs = asTimestamp
      .select(graft.queries.AnalyticsQueries.epochUs(asTimestamp, "ts").as("us"))
      .as[Long].collect().toSeq
    val asNtz = asTimestamp.selectExpr("cast(ts as timestamp_ntz) as ts")
    val fromNtz = asNtz
      .select(graft.queries.AnalyticsQueries.epochUs(asNtz, "ts").as("us"))
      .as[Long].collect().toSeq
    assert(fromLong === instantsUs)
    assert(fromTs === instantsUs)
    assert(fromNtz === instantsUs)
    // any other dtype is a loud error, not a silent wrong answer
    val bad = Seq(Tuple1("2024-01-01")).toDF("ts")
    intercept[IllegalArgumentException] {
      graft.queries.AnalyticsQueries.epochUs(bad, "ts")
    }
  }

  test("rightTiebreak = None breaks equal-(key, time) ties by the carried " +
    "struct itself — deterministic run-to-run") {
    // two right rows at the SAME (key, time): without an explicit
    // tiebreak the winner must still be stable — the struct-max row
    // ((30L, "z") > (29L, "y") field-wise)
    val dupRight = Seq(
      ("u1", 29L, "y", ts("2024-01-01 09:30:00")),
      ("u1", 30L, "z", ts("2024-01-01 09:30:00"))
    ).toDF("user", "rid", "tag", "rt")
    (1 to 5).foreach { _ =>
      val out = TemporalJoins.asOfJoin(
          left.filter($"id" === 1L), dupRight.repartition(7),
          Seq("user"), "t", "rt", Seq("rid", "tag"))
        .select("rid", "tag").as[(Long, String)].collect()
      assert(out.toSeq === Seq((30L, "z")))
    }
  }

  test("gapFillDaily: silent days appear with n=0 and carry the forward-" +
    "filled reading; day-last picks the (ts,id)-latest non-null; leading " +
    "gaps stay null") {
    val day = 86400000000L
    // user 1: day 0 (two events, last value 2.5), day 2 (null value),
    //         day 3 (value 7.25); day 1 is silent
    // user 2: single day, null value only
    val ev = Seq(
      (1L, 10L, 0 * day + 100L, Some(1.0)),
      (1L, 11L, 0 * day + 200L, Some(2.5)),   // later ts wins day 0
      (1L, 12L, 2 * day + 50L, None),         // null reading: counts, no fill
      (1L, 13L, 3 * day + 10L, Some(7.25)),
      (2L, 20L, 5 * day + 1L, None)
    ).toDF("user_id", "event_id", "tus", "value")
    val out = TemporalJoins.gapFillDaily(ev, "user_id", col("tus"),
        "event_id", "value")
      .as[(Long, Long, Long, Option[Long], Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq(
      (1L, 0L, 2L, Some(2500L), Some(2500L), false),
      (1L, 1L, 0L, None, Some(2500L), true),  // gap: carried forward
      (1L, 2L, 1L, None, Some(2500L), false), // null reading still carries
      (1L, 3L, 1L, Some(7250L), Some(7250L), false),
      (2L, 5L, 1L, None, None, false)))       // nothing to fill: stays null
    // same-ts tie on one day: higher event_id wins
    val tie = Seq(
      (3L, 30L, 100L, Some(1.0)),
      (3L, 31L, 100L, Some(9.0))
    ).toDF("user_id", "event_id", "tus", "value")
    val t = TemporalJoins.gapFillDaily(tie, "user_id", col("tus"),
        "event_id", "value")
      .as[(Long, Long, Long, Option[Long], Option[Long], Boolean)].head()
    assert(t._4 === Some(9000L))
  }

  test("asOfJoinTolerance: within-window match kept, staler match " +
    "nulled while the left row survives, forward mirror, and the " +
    "reserved-name guard") {
    val l = Seq((1L, "u1", 100L), (2L, "u1", 500L), (3L, "u2", 100L))
      .toDF("id", "user", "t")
    val r = Seq(("u1", 10L, 90L, "a"), ("u2", 11L, 10L, "b"))
      .toDF("user", "rid", "rt", "tag")
    val out = TemporalJoins.asOfJoinTolerance(l, r, Seq("user"), "t", "rt",
        Seq("rid", "tag"), toleranceUs = 50L, rightTiebreak = Some("rid"))
      .select("id", "rid", "tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1)
    // id 1: match at 90, gap 10 <= 50 -> kept; id 2: same match, gap
    // 410 > 50 -> nulled but row survives; id 3: gap 90 > 50 -> nulled
    assert(out.toSeq === Seq((1L, Some(10L), Some("a")),
      (2L, None, None), (3L, None, None)))
    val fwd = TemporalJoins.asOfJoinTolerance(l, r, Seq("user"), "t", "rt",
        Seq("rid", "tag"), toleranceUs = 50L, rightTiebreak = Some("rid"),
        direction = "forward")
      .select("id", "rid").as[(Long, Option[Long])].collect().sortBy(_._1)
    // forward: no right row at/after t within 50 for any left
    assert(fwd.toSeq === Seq((1L, None), (2L, None), (3L, None)))
    intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoinTolerance(
        l.withColumn("__graft_tol_rt", lit(1L)), r, Seq("user"), "t", "rt",
        Seq("rid"), toleranceUs = 50L)
    }
  }

  test("intervalCoverage: overlap, containment, and gaps hand-checked; " +
    "sum(hi-lo) would double-count") {
    val iv = Seq(
      ("k1", 0L, 10L),   // |0..10)
      ("k1", 5L, 15L),   // overlaps -> extends to 15
      ("k1", 6L, 9L),    // contained -> adds nothing
      ("k1", 20L, 25L),  // gap of 5 before it
      ("k2", 3L, 4L)
    ).toDF("key", "lo", "hi")
    val out = TemporalJoins.intervalCoverage(iv, "key", "lo", "hi")
      .select("key", "n_intervals", "covered", "span", "gap")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      ("k1", 4L, 20L, 25L, 5L), // covered 15 + 5, span 25, gap 5
      ("k2", 1L, 1L, 1L, 0L)))
  }
}
