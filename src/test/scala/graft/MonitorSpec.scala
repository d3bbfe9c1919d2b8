package graft

import graft.ops.Monitor
import org.apache.spark.sql.functions._

/** Control-chart operators ([[graft.ops.Monitor]]) plus the
  * allocation/skyline queries of the same round: hand-checked
  * recurrences, zero-fill behavior, alarm semantics, and the
  * algorithmic invariants the oracles alone cannot state
  * (allocations sum to budget; nothing on the frontier is dominated).
  */
class MonitorSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  test("out-of-order replay property: any delivery respecting the " +
    "append-only day contract (arbitrary in-batch order, any per-key " +
    "monotone batch split) replays the CUSUM / Page-Hinkley / " +
    "Holt-Winters twins bit-identically; a day arriving after a LATER " +
    "day was already applied is dropped, never re-opened") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps
    import graft.streaming.EventStreamOps.CcEv
    import org.apache.spark.sql.{Dataset, Encoder}
    implicit val sc = spark.sqlContext
    var qn = 0
    // run one twin over a delivery schedule; normalized emitted rows
    def run[O: Encoder](mk: Dataset[CcEv] => Dataset[O],
                        batches: Seq[Seq[CcEv]]): Seq[String] = {
      qn += 1
      val name = s"oooprop$qn"
      val mem = MemoryStream[CcEv]
      val q = mk(mem.toDS()).writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        batches.foreach { b =>
          if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
        }
        spark.table(name).collect().map(_.toString).sorted.toSeq
      } finally q.stop()
    }
    for (seed <- Seq(7, 41); twin <- 0 until 3) {
      val rnd = new scala.util.Random(seed * 10 + twin)
      // random per-key day series with gaps (the zero-fill path stays
      // exercised); days delivered at most once per key
      val series: Map[String, Seq[CcEv]] = Seq("a", "b").map { k =>
        k -> (0 to 8).flatMap { d =>
          if (rnd.nextInt(4) == 0) None
          else Some(CcEv(k, d.toLong, rnd.nextInt(10).toLong))
        }
      }.toMap
      val inOrder = Seq(series.values.flatten.toSeq.sortBy(e => (e.key, e.day)))
      // per-key contiguous chunks in day order -> chunk i lands in
      // batch i (monotone per key); batches internally shuffled
      val chunked: Map[String, Seq[Seq[CcEv]]] = series.map { case (k, es) =>
        k -> {
          val cuts = es.indices.drop(1).filter(_ => rnd.nextBoolean())
          val bounds = (0 +: cuts) :+ es.length
          bounds.sliding(2).map { case Seq(a, b) => es.slice(a, b) }.toSeq
        }
      }
      val nB = chunked.values.map(_.length).max
      val shuffled = (0 until nB).map { i =>
        rnd.shuffle(chunked.values.flatMap(c =>
          if (i < c.length) c(i) else Nil).toSeq)
      }
      def exec(i: Int, sched: Seq[Seq[CcEv]]): Seq[String] = i match {
        case 0 => run(ds => EventStreamOps.streamingCusum(ds,
          targetMilli = 5000L, slackMilli = 1000L, hMilli = 8000L), sched)
        case 1 => run(ds => EventStreamOps.streamingPageHinkley(ds,
          deltaMilli = 500L, lambdaMilli = 6000L), sched)
        case _ => run(ds => EventStreamOps.streamingHoltWinters(ds), sched)
      }
      assert(exec(twin, inOrder) === exec(twin, shuffled),
        s"seed=$seed twin=$twin series=$series shuffled=$shuffled")
    }
    // past the watermark: once day 5 is APPLIED (zero-filling 3..4),
    // a real day-3 row arriving later emits nothing and leaves the
    // zero-filled trajectory in place — the documented append-only
    // drop, NOT a re-open
    def exec2(sched: Seq[Seq[CcEv]]): Seq[String] =
      run(ds => EventStreamOps.streamingCusum(ds, targetMilli = 5000L,
        slackMilli = 1000L, hMilli = 8000L), sched)
    val early = Seq(Seq(CcEv("m", 0L, 4L), CcEv("m", 5L, 4L)))
    val late = early :+ Seq(CcEv("m", 3L, 9L))
    assert(exec2(early) === exec2(late))
  }

  test("ewmaDaily: hand-checked recurrence with a silent-day zero fill " +
    "and a spike flag judged against the PRIOR baseline") {
    // key a: day 0 -> 2 events, day 1 silent, day 2 -> 12 events
    val ev = Seq(
      ("a", 5L), ("a", 10L),                     // day 0: n=2
      ("a", 2 * day + 1), ("a", 2 * day + 2), ("a", 2 * day + 3),
      ("a", 2 * day + 4), ("a", 2 * day + 5), ("a", 2 * day + 6),
      ("a", 2 * day + 7), ("a", 2 * day + 8), ("a", 2 * day + 9),
      ("a", 2 * day + 10), ("a", 2 * day + 11), ("a", 2 * day + 12)
    ).toDF("k", "tus")
    val out = Monitor.ewmaDaily(ev, "k", col("tus"), alphaMilli = 300)
      .orderBy("day")
      .select("day", "n", "ewma_milli", "dev_ppm", "flagged")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // day0: seed 2000; day1: (300*0 + 700*2000) div 1000 = 1400,
    //   dev = (0 - 2000)*1e6 div 2000 = -1000000 -> flagged
    // day2: (300*12000 + 700*1400) div 1000 = 4580,
    //   dev = (12000-1400)*1e6 div 1400 = 7571428 -> flagged
    assert(out === Seq(
      (0L, 2L, 2000L, 0L, false),
      (1L, 0L, 1400L, -1000000L, true),
      (2L, 12L, 4580L, 7571428L, true)))
  }

  test("holtDaily: hand-checked level+trend recurrence — flat days " +
    "keep trend 0, a jump moves level AND opens a trend, forecast " +
    "= level + trend") {
    // 10, 10, 22 on consecutive days
    val ev = ((1 to 10).map(i => ("a", i.toLong)) ++
      (1 to 10).map(i => ("a", day + i)) ++
      (1 to 22).map(i => ("a", 2 * day + i))).toDF("k", "tus")
    val out = Monitor.holtDaily(ev, "k", col("tus"))
      .orderBy("day")
      .select("day", "n", "level_milli", "trend_milli", "forecast_milli")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // d0: seed (10000, 0); d1: l=(300*10000+700*10000)/1000=10000, b=0
    // d2: l=(300*22000+700*10000)/1000=13600,
    //     b=(100*(13600-10000)+900*0)/1000=360 -> forecast 13960
    assert(out === Seq(
      (0L, 10L, 10000L, 0L, 10000L),
      (1L, 10L, 10000L, 0L, 10000L),
      (2L, 22L, 13600L, 360L, 13960L)))
  }

  test("cusumDaily: a sustained level shift accumulates to an alarm " +
    "that a single spike never reaches") {
    // key s: 20 quiet days of 2, then 6 shifted days of 50
    //   mean = (40+300)/26 = 13.08 -> target 13076 milli, slack 6538,
    //   h = 52304; each shifted day adds 50000-13076-6538 = 30386 —
    //   the alarm fires on the 2nd shifted day and stays
    val rows = (0 until 20).flatMap(d => (1 to 2).map(i => ("s", d * day + i))) ++
      (20 until 26).flatMap(d => (1 to 50).map(i => ("s", d * day + i)))
    val ev = rows.map { case (k, t) => (k, t.toLong) }.toDF("k", "tus")
    val out = Monitor.cusumDaily(ev, "k", col("tus"))
      .orderBy("day")
      .select("day", "n", "pos_milli", "neg_milli", "alarm_up", "alarm_down")
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out.length === 26)
    // quiet days never alarm up; the shift accumulates until alarm
    assert(out.take(20).forall(r => !r._5))
    assert(out.last._5, s"expected an UP alarm by the last shifted day: $out")
    // evidence is cumulative: pos_milli strictly increases over the
    // shifted run
    val shifted = out.drop(20).map(_._3)
    assert(shifted === shifted.sorted && shifted.distinct === shifted)
    // a single spike on an otherwise-quiet key stays silent
    val spike = ((0 until 10).flatMap(d => (1 to 4).map(i => ("p", d * day + i))) ++
      (1 to 12).map(i => ("p", 10 * day + i)))
      .map { case (k, t) => (k, t.toLong) }.toDF("k", "tus")
    val sp = Monitor.cusumDaily(spike, "k", col("tus"))
      .select("alarm_up").as[Boolean].collect()
    assert(sp.forall(!_), "one spike must not trip the cumulative alarm")
  }

  test("pageHinkleyDaily: hand-checked running-mean recurrence — the " +
    "historical minimum anchors the gap, a jump opens ph_up only") {
    // 10, 10, 22 on consecutive days: target = 42000/3 = 14000,
    // delta = 700, lambda = 56000
    val ev = ((1 to 10).map(i => ("a", i.toLong)) ++
      (1 to 10).map(i => ("a", day + i)) ++
      (1 to 22).map(i => ("a", 2 * day + i))).toDF("k", "tus")
    val out = Monitor.pageHinkleyDaily(ev, "k", col("tus"))
      .orderBy("day")
      .select("day", "n", "ph_up_milli", "ph_down_milli",
        "alarm_up", "alarm_down")
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    // d0: mu = md = -700, both mins -700 -> ph 0/0
    // d1: mean = 20000/2 = 10000; mu = -700 + 10000-10000-700 = -1400
    //     (new min) -> ph_up 0; md symmetric -> ph_down 0
    // d2: mean = 42000/3 = 14000; mu = -1400 + 22000-14000-700 = 5900,
    //     min stays -1400 -> ph_up 7300; md = -1400 + 14000-22000-700
    //     = -10100 (new min) -> ph_down 0
    assert(out === Seq(
      (0L, 10L, 0L, 0L, false, false),
      (1L, 10L, 0L, 0L, false, false),
      (2L, 22L, 7300L, 0L, false, false)))
  }

  test("pageHinkleyDaily: a sustained level shift trips ph_up; a " +
    "sustained drop trips ph_down, never ph_up") {
    // 20 quiet days of 2, then 6 shifted days of 50 (the cusum fixture)
    val rows = (0 until 20).flatMap(d => (1 to 2).map(i => ("s", d * day + i))) ++
      (20 until 26).flatMap(d => (1 to 50).map(i => ("s", d * day + i)))
    val ev = rows.map { case (k, t) => (k, t.toLong) }.toDF("k", "tus")
    val out = Monitor.pageHinkleyDaily(ev, "k", col("tus"))
      .orderBy("day")
      .select("day", "alarm_up", "alarm_down")
      .as[(Long, Boolean, Boolean)].collect().toSeq
    assert(out.take(20).forall(r => !r._2), "quiet prefix must not alarm")
    assert(out.last._2, s"expected an UP alarm by the last shifted day: $out")
    // the mirror: 10 days of 40 then 6 silent days — a feed death
    val drop = (0 until 10)
      .flatMap(d => (1 to 40).map(i => ("p", d * day + i)))
      .map { case (k, t) => (k, t.toLong) } :+ (("p", 15 * day + 1L))
    val dv = drop.toDF("k", "tus")
    val o2 = Monitor.pageHinkleyDaily(dv, "k", col("tus"))
      .orderBy("day")
      .select("day", "alarm_up", "alarm_down")
      .as[(Long, Boolean, Boolean)].collect().toSeq
    assert(o2.forall(r => !r._2), "a drop must never trip the UP side")
    assert(o2.exists(_._3), s"the silent run must trip ph_down: $o2")
  }

  test("streamingPageHinkley == batch pageHinkleyDaily trajectory over " +
    "the same prefix, across batches, with silent days zero-filled live") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps
    implicit val sc = spark.sqlContext
    val ns = Seq(4L, 4L, 0L, 9L, 9L, 9L) // silent day 2 inside the span
    val ev = ns.zipWithIndex.flatMap { case (n, d) =>
      (1 to n.toInt).map(i => ("m", d * day + i.toLong))
    }.toDF("k", "tus")
    val ref = Monitor.pageHinkleyDaily(ev, "k", col("tus"))
      .orderBy("day")
      .select("day", "n", "ph_up_milli", "ph_down_milli",
        "alarm_up", "alarm_down")
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    // offline calibration: target = lambda/4 (the batch chart's own),
    // delta = target/20 — exactly the batch constants
    val lambda = Monitor.pageHinkleyDaily(ev, "k", col("tus"))
      .select("lambda_milli").as[Long].head()
    val mem = MemoryStream[EventStreamOps.CcEv]
    val q = EventStreamOps.streamingPageHinkley(mem.toDS(),
        deltaMilli = lambda / 4 / 20, lambdaMilli = lambda)
      .writeStream.format("memory").queryName("phlive")
      .outputMode(OutputMode.Update()).start()
    try {
      import EventStreamOps.CcEv
      mem.addData(CcEv("m", 0L, 4L), CcEv("m", 1L, 4L))
      q.processAllAvailable()
      mem.addData(CcEv("m", 3L, 9L), CcEv("m", 4L, 9L))
      mem.addData(CcEv("m", 5L, 9L), CcEv("m", 4L, 9L)) // dup day ignored
      q.processAllAvailable()
      val live = spark.table("phlive")
        .as[EventStreamOps.PhOut].collect().toSeq
        .groupBy(_.day).map { case (_, v) => v.last }.toSeq.sortBy(_.day)
        .map(o => (o.day, o.n, o.phUpMilli, o.phDownMilli,
          o.alarmUp, o.alarmDown))
      assert(live === ref)
    } finally q.stop()
  }

  test("streamingCusum == batch cusumDaily trajectory over the same " +
    "prefix, across batches, with silent days zero-filled live") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps
    implicit val sc = spark.sqlContext
    // batch reference on the full series: key m, days 0..5
    val ns = Seq(4L, 4L, 0L, 9L, 9L, 9L) // silent day 2 inside the span
    val ev = ns.zipWithIndex.flatMap { case (n, d) =>
      (1 to n.toInt).map(i => ("m", d * day + i.toLong))
    }.toDF("k", "tus")
    val ref = Monitor.cusumDaily(ev, "k", col("tus"))
      .orderBy("day")
      .select("day", "n", "pos_milli", "neg_milli", "alarm_up", "alarm_down")
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    // offline calibration: the batch chart's own target/slack/h
    val cal = Monitor.cusumDaily(ev, "k", col("tus"))
      .select("target_milli").as[Long].head()
    val mem = MemoryStream[EventStreamOps.CcEv]
    val q = EventStreamOps.streamingCusum(mem.toDS(),
        targetMilli = cal, slackMilli = cal / 2, hMilli = cal * 4)
      .writeStream.format("memory").queryName("cusumlive")
      .outputMode(OutputMode.Update()).start()
    try {
      import EventStreamOps.CcEv
      // the daily rollup feed, split mid-series; the silent day 2 is
      // NOT in the feed — the op must synthesize it
      mem.addData(CcEv("m", 0L, 4L), CcEv("m", 1L, 4L))
      q.processAllAvailable()
      mem.addData(CcEv("m", 3L, 9L), CcEv("m", 4L, 9L))
      mem.addData(CcEv("m", 5L, 9L), CcEv("m", 4L, 9L)) // dup day ignored
      q.processAllAvailable()
      val live = spark.table("cusumlive")
        .as[EventStreamOps.CcOut].collect().toSeq
        .groupBy(_.day).map { case (_, v) => v.last }.toSeq.sortBy(_.day)
        .map(o => (o.day, o.n, o.posMilli, o.negMilli, o.alarmUp, o.alarmDown))
      assert(live === ref)
    } finally q.stop()
  }

  test("streamingGapFill == batch gapFillDaily grid over the same " +
    "prefix: silent days synthesized live with the carried reading, " +
    "null-reading days carry through") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps
    implicit val sc = spark.sqlContext
    // raw events: day 0 two readings (last 2.25), days 1 and 3 silent,
    // day 2 one NULL reading, day 4 reading 7.0
    val ev = Seq(
      ("g", 5L, 1L, Option(1.5)), ("g", 9L, 2L, Option(2.25)),
      ("g", 2 * day + 1, 3L, None: Option[Double]),
      ("g", 4 * day + 2, 4L, Option(7.0))
    ).toDF("k", "tus", "id", "v")
    val ref = graft.ops.TemporalJoins
      .gapFillDaily(ev, "k", col("tus"), "id", "v")
      .select("key", "day", "n", "filled_q", "is_gap")
      .as[(String, Long, Long, Option[Long], Boolean)]
      .collect().sortBy(_._2).toSeq
    val mem = MemoryStream[EventStreamOps.GfEv]
    val q = EventStreamOps.streamingGapFill(mem.toDS())
      .writeStream.format("memory").queryName("gapfilllive")
      .outputMode(OutputMode.Update()).start()
    try {
      import EventStreamOps.GfEv
      // the rollup feed the batch day-agg would emit, split mid-series
      mem.addData(GfEv("g", 0L, 2L, Some(2250L)))
      q.processAllAvailable()
      mem.addData(GfEv("g", 2L, 1L, None), GfEv("g", 4L, 1L, Some(7000L)),
        GfEv("g", 2L, 1L, None)) // dup ignored
      q.processAllAvailable()
      val live = spark.table("gapfilllive")
        .as[EventStreamOps.GfOut].collect().toSeq
        .groupBy(_.day).map { case (_, v) => v.last }.toSeq.sortBy(_.day)
        .map(o => (o.key, o.day, o.n, o.filledQ, o.isGap))
      assert(live === ref)
    } finally q.stop()
  }

  test("streamingEwma == batch ewmaDaily trajectory across batches " +
    "with a synthesized silent day") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps
    implicit val sc = spark.sqlContext
    val ns = Seq(3L, 3L, 0L, 12L, 5L)
    val ev = ns.zipWithIndex.flatMap { case (n, d) =>
      (1 to n.toInt).map(i => ("w", d * day + i.toLong))
    }.toDF("k", "tus")
    val ref = Monitor.ewmaDaily(ev, "k", col("tus"))
      .orderBy("day")
      .select("day", "n", "ewma_milli", "dev_ppm", "flagged")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    val mem = MemoryStream[EventStreamOps.CcEv]
    val q = EventStreamOps.streamingEwma(mem.toDS())
      .writeStream.format("memory").queryName("ewmalive")
      .outputMode(OutputMode.Update()).start()
    try {
      import EventStreamOps.CcEv
      mem.addData(CcEv("w", 0L, 3L), CcEv("w", 1L, 3L))
      q.processAllAvailable()
      mem.addData(CcEv("w", 3L, 12L), CcEv("w", 4L, 5L))
      q.processAllAvailable()
      val live = spark.table("ewmalive")
        .as[EventStreamOps.EwOut].collect().toSeq
        .groupBy(_.day).map { case (_, v) => v.last }.toSeq.sortBy(_.day)
        .map(o => (o.day, o.n, o.ewmaMilli, o.devPpm, o.flagged))
      assert(live === ref)
    } finally q.stop()
  }

  test("streamingHolt == batch holtDaily trajectory across batches " +
    "with a synthesized silent day") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps
    implicit val sc = spark.sqlContext
    val ns = Seq(10L, 10L, 0L, 22L, 7L)
    val ev = ns.zipWithIndex.flatMap { case (n, d) =>
      (1 to n.toInt).map(i => ("h", d * day + i.toLong))
    }.toDF("k", "tus")
    val ref = Monitor.holtDaily(ev, "k", col("tus"))
      .orderBy("day")
      .select("day", "n", "level_milli", "trend_milli", "forecast_milli")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val mem = MemoryStream[EventStreamOps.CcEv]
    val q = EventStreamOps.streamingHolt(mem.toDS())
      .writeStream.format("memory").queryName("holtlive")
      .outputMode(OutputMode.Update()).start()
    try {
      import EventStreamOps.CcEv
      mem.addData(CcEv("h", 0L, 10L), CcEv("h", 1L, 10L))
      q.processAllAvailable()
      mem.addData(CcEv("h", 3L, 22L), CcEv("h", 4L, 7L))
      q.processAllAvailable()
      val live = spark.table("holtlive")
        .as[EventStreamOps.HoltOut].collect().toSeq
        .groupBy(_.day).map { case (_, v) => v.last }.toSeq.sortBy(_.day)
        .map(o => (o.day, o.n, o.levelMilli, o.trendMilli, o.forecastMilli))
      assert(live === ref)
    } finally q.stop()
  }

  test("streamingBacklog == batch backlogDaily trajectory across " +
    "batches (quiet days drain the queue live)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps
    implicit val sc = spark.sqlContext
    val ns = Seq(9L, 9L, 0L, 0L, 6L)
    val ev = ns.zipWithIndex.flatMap { case (n, d) =>
      (1 to n.toInt).map(i => ("b", d * day + i.toLong))
    }.toDF("k", "tus")
    val ref = Monitor.backlogDaily(ev, "k", col("tus"))
      .orderBy("day").select("day", "n", "backlog_milli", "drained")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val cap = Monitor.backlogDaily(ev, "k", col("tus"))
      .select("cap_milli").as[Long].head()
    val mem = MemoryStream[EventStreamOps.CcEv]
    val q = EventStreamOps.streamingBacklog(mem.toDS(), capMilli = cap)
      .writeStream.format("memory").queryName("backlive")
      .outputMode(OutputMode.Update()).start()
    try {
      import EventStreamOps.CcEv
      mem.addData(CcEv("b", 0L, 9L))
      q.processAllAvailable()
      mem.addData(CcEv("b", 1L, 9L), CcEv("b", 4L, 6L))
      q.processAllAvailable()
      val live = spark.table("backlive")
        .as[EventStreamOps.BkOut].collect().toSeq
        .groupBy(_.day).map { case (_, v) => v.last }.toSeq.sortBy(_.day)
        .map(o => (o.day, o.n, o.backlogMilli, o.drained))
      assert(live === ref)
    } finally q.stop()
  }

  test("q_waterfill invariants: allocations sum to the budget exactly, " +
    "the capped set is a capacity-prefix, nothing exceeds its " +
    "capacity, and uncapped shares differ by at most one") {
    val d = "/root/testdata/sf0.001"
    val out = graft.queries.ExtensionQueries.queries("q_waterfill")(spark, d)
      .select("source", "cap", "budget", "capped", "alloc")
      .as[(String, Long, Long, Boolean, Long)].collect().toSeq
    assert(out.nonEmpty)
    val budget = out.head._3
    assert(out.map(_._5).sum === budget, "water-filling must spend exactly B")
    assert(out.forall(r => r._5 <= r._2), "no source exceeds its capacity")
    // capped-ness is monotone in capacity: every capped source has
    // capacity <= every uncapped source's
    val cappedMax = out.filter(_._4).map(_._2).maxOption.getOrElse(Long.MinValue)
    val uncappedMin = out.filterNot(_._4).map(_._2).minOption.getOrElse(Long.MaxValue)
    assert(cappedMax <= uncappedMin)
    val shares = out.filterNot(_._4).map(_._5)
    if (shares.nonEmpty)
      assert(shares.max - shares.min <= 1L, s"max-min fairness: $shares")
  }

  test("prefixBatch: planted long shared prefixes — savings counted " +
    "once per extra doc, bounded by the group's SHORTEST member") {
    // 3 docs share an 8-token prefix; one "short twin" IS the prefix
    // of a 4th doc (guaranteed-shared length = the short one's 2)
    val p8 = "a b c d e f g h"
    val docs = Seq(
      ("s1", s"$p8 one two"), ("s1", s"$p8 three"), ("s1", s"$p8 four five six"),
      ("s2", "x y"), ("s2", "x y tail tail tail"),
      ("s3", "lone doc")
    ).toDF("source", "text")
    val out = graft.queries.ExtensionQueries.prefixBatch(docs, prefixTokens = 8)
      .select("source", "shared_groups", "saved_tokens", "total_tokens")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // s1: one group of 3 -> (3-1)*8 = 16 saved of 10+9+11=30 tokens
    // s2: "x y" and "x y tail tail tail" share prefix "x y" (plen 2
    //     vs 5-token doc's first 8 = whole doc "x y tail tail tail"
    //     != "x y") -> NOT the same prefix string, no sharing
    // s3: nothing shared
    assert(out === Seq(("s1", 1L, 16L, 30L), ("s2", 0L, 0L, 7L),
      ("s3", 0L, 0L, 2L)))
    // at prefixTokens=2 the s2 pair DOES share, and min_plen = 2
    val out2 = graft.queries.ExtensionQueries.prefixBatch(docs, prefixTokens = 2)
      .select("source", "shared_groups", "saved_tokens")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out2 === Seq(("s1", 1L, 2L * 2L), ("s2", 1L, 2L), ("s3", 0L, 0L)))
  }

  test("piiCensus: planted residue — each class counted on the text " +
    "AFTER earlier classes redact (a digit run inside an email is an " +
    "email, not an id); clean docs count as clean") {
    val docs = Seq(
      ("s1", "write to john.doe123456789@mail.example.com today"),
      ("s1", "call 555-123-4567 or 555-987-6543 now"),
      ("s1", "account 1234567890 flagged"),
      ("s1", "all clean here"),
      ("s2", "mixed a@b.co 111-222-3333 999999999 end")
    ).toDF("source", "text")
    val out = graft.queries.ExtensionQueries.piiCensus(docs)
      .select("source", "n_docs", "n_email", "n_phone", "n_id", "docs_clean")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // the 9-digit run inside the first email never double-counts as id
    assert(out === Seq(("s1", 4L, 1L, 2L, 1L, 1L),
      ("s2", 1L, 1L, 1L, 1L, 0L)))
  }

  test("chisq: a planted real effect (50% vs 10% on 500/500) fires the " +
    "exact-integer significance verdict; a perfectly balanced split " +
    "stays silent; z2 agrees with the textbook statistic") {
    // group A = even user ids. value > 200 is the hit predicate.
    def ev(n: Int, hitsA: Int, hitsB: Int) =
      ((0 until n).map(i => ("t", 2L * i, if (i < hitsA) 500.0 else 1.0)) ++
       (0 until n).map(i => ("t", 2L * i + 1, if (i < hitsB) 500.0 else 1.0)))
        .toDF("event_type", "user_id", "value")
    val strong = graft.queries.ExtensionQueries.chisq(ev(500, 250, 50))
      .select("z2_milli", "significant").as[(Long, Boolean)].head()
    // textbook: p1=.5, p2=.1, pooled=.3, z2 = .4^2*250/(.3*.7) ≈ 190.5
    assert(strong._2, s"50% vs 10% must be significant, got $strong")
    assert(strong._1 > 180000L && strong._1 < 200000L,
      s"z2_milli should sit near the textbook 190476, got ${strong._1}")
    val none = graft.queries.ExtensionQueries.chisq(ev(500, 100, 100))
      .select("z2_milli", "significant").as[(Long, Boolean)].head()
    assert(none._1 === 0L && !none._2)
  }

  test("survival: hand-checked Kaplan-Meier with censoring — censored " +
    "users leave the risk set without counting as deaths, and the " +
    "product-limit steps match the textbook table") {
    // 10 users; horizon day = 9. Lifetimes (d0=0 for all):
    //   3 die at life 2, 2 die at life 5, 1 censored at life 7
    //   (left mid-study), 4 censored at life 9 (active at horizon).
    // Wait — censoring here = d1 == hmax; the life-7 user must NOT
    // be at the horizon, so they count as a DEATH by this estimator's
    // observation model (last activity strictly inside the window).
    val rows =
      (1 to 3).flatMap(u => Seq((u.toLong, 0L), (u.toLong, 2L))) ++
      (4 to 5).flatMap(u => Seq((u.toLong, 0L), (u.toLong, 5L))) ++
      Seq((6L, 0L), (6L, 7L)) ++
      (7 to 10).flatMap(u => Seq((u.toLong, 0L), (u.toLong, 9L)))
    val out = graft.queries.ExtensionQueries.survival(
        rows.toDF("user_id", "day"))
      .select("life_days", "at_risk", "deaths", "censors", "survival_milli")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // life 2: risk 10, d 3 -> S = 1000*7 div 10 = 700
    // life 5: risk 7,  d 2 -> S = 700*5 div 7  = 500
    // life 7: risk 5,  d 1 -> S = 500*4 div 5  = 400
    // life 9: risk 4,  d 0, censored 4 -> S stays 400
    assert(out === Seq(
      (2L, 10L, 3L, 0L, 700L),
      (5L, 7L, 2L, 0L, 500L),
      (7L, 5L, 1L, 0L, 400L),
      (9L, 4L, 0L, 4L, 400L)))
  }

  test("edge cases: single-day series fold to their seed row; a " +
    "zero-capacity source allocates zero; all-censored survival " +
    "stays at 1000; empty-text docs chunk to one empty chunk") {
    // single-day key: trajectory = the seed row only, dev 0, no flag
    val one = Seq(("z", 7L)).toDF("k", "tus")
    val e1 = Monitor.ewmaDaily(one, "k", col("tus"))
      .select("day", "n", "ewma_milli", "dev_ppm", "flagged")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(e1 === Seq((0L, 1L, 1000L, 0L, false)))
    val c1 = Monitor.cusumDaily(one, "k", col("tus"))
      .select("alarm_up", "alarm_down").as[(Boolean, Boolean)].collect().toSeq
    assert(c1 === Seq((false, false)))
    // all-censored survival: no deaths ever, the curve never drops
    val cens = Seq((1L, 0L), (1L, 5L), (2L, 0L), (2L, 5L))
      .toDF("user_id", "day")
    val sv = graft.queries.ExtensionQueries.survival(cens)
      .select("life_days", "deaths", "censors", "survival_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(sv === Seq((5L, 0L, 2L, 1000L)))
    // empty text: one chunk of the single empty token
    val empt = Seq((1L, "")).toDF("doc_id", "text")
    val ch = graft.ops.TextStats.cdcChunks(empt)
      .select("n_tokens").as[Long].collect().toSeq
    assert(ch === Seq(1L))
  }

  test("abBootstrap: the planted 50%-vs-10% effect's CI excludes zero " +
    "and brackets the point estimate; the null split's CI straddles " +
    "zero — the resampling read agrees with the chi-square verdict") {
    def ev(n: Int, hitsA: Int, hitsB: Int) =
      ((0 until n).map(i => ("t", 2L * i, if (i < hitsA) 500.0 else 1.0)) ++
       (0 until n).map(i => ("t", 2L * i + 1, if (i < hitsB) 500.0 else 1.0)))
        .toDF("event_type", "user_id", "value")
    val strong = graft.queries.ExtensionQueries.abBootstrap(ev(500, 250, 50))
      .select("diff_ppm", "ci_lo_ppm", "ci_hi_ppm", "ci_excludes_zero")
      .as[(Long, Long, Long, Boolean)].head()
    assert(strong._4, s"planted effect must exclude zero: $strong")
    assert(strong._2 <= strong._1 && strong._1 <= strong._3,
      s"CI must bracket the point estimate: $strong")
    val none = graft.queries.ExtensionQueries.abBootstrap(ev(500, 100, 100))
      .select("ci_excludes_zero").as[Boolean].head()
    assert(!none)
  }

  test("streamingSprt: a 3%-rate stream accepts H1, a 2%-rate stream " +
    "accepts H0, decisions FREEZE once crossed, and the trajectory " +
    "matches a hand fold across batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps
    import graft.streaming.EventStreamOps.SprtEv
    implicit val sc = spark.sqlContext
    // deterministic streams: "h1" hits every 33rd obs (~3%), "h0"
    // every 50th (2%) — exactly the two hypotheses
    def mk(k: String, every: Int, n: Int, from: Int = 0) =
      (from until from + n).map(i => SprtEv(k, i.toLong, (i + 1) % every == 0))
    val mem = MemoryStream[SprtEv]
    val q = EventStreamOps.streamingSprt(mem.toDS())
      .writeStream.format("memory").queryName("sprtlive")
      .outputMode(OutputMode.Update()).start()
    try {
      def latest(k: String) = spark.table("sprtlive")
        .as[EventStreamOps.SprtOut].collect().filter(_.key == k).last
      mem.addData(mk("h1", 33, 400) ++ mk("h0", 50, 400): _*)
      q.processAllAvailable()
      mem.addData(mk("h1", 33, 1200, 400) ++ mk("h0", 50, 1200, 400): _*)
      q.processAllAvailable()
      val d1 = latest("h1"); val d0 = latest("h0")
      assert(d1.decision === "accept_h1", d1)
      assert(d0.decision === "accept_h0", d0)
      // freeze: decisions and llr must not move after the boundary
      val n1Frozen = d1.nObs; val llr1Frozen = d1.llrMicro
      mem.addData(mk("h1", 2, 500, 1600): _*) // wildly different tail
      q.processAllAvailable()
      val d1b = latest("h1")
      assert(d1b.decision === "accept_h1" && d1b.nObs === n1Frozen &&
        d1b.llrMicro === llr1Frozen, d1b)
      // hand fold replicates the stopping point exactly
      var llr = 0L; var n = 0L; var dec = "continue"
      mk("h1", 33, 1600).foreach { e =>
        if (dec == "continue") {
          llr += (if (e.hit) 405465L else -10257L)
          n += 1
          if (llr >= 2944439L) dec = "accept_h1"
          else if (llr <= -2944439L) dec = "accept_h0"
        }
      }
      assert((dec, n, llr) === (d1.decision, d1.nObs, d1.llrMicro))
    } finally q.stop()
  }

  test("q_pareto is exactly the non-dominated set (brute-force check " +
    "per source at sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val frontier = graft.queries.ExtensionQueries.queries("q_pareto")(spark, d)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    // recompute every doc's (len, ttr) and brute-force dominance
    val all = graft.Tables.documents(spark, d)
      .select(col("source"), col("doc_id"),
        size(graft.ops.TextStats.tokens(col("text"))).cast("long").as("n"),
        size(array_distinct(graft.ops.TextStats.tokens(col("text"))))
          .cast("long").as("nd"))
      .withColumn("ttr", expr("nd * 1000 div greatest(n, 1)"))
      .select("source", "doc_id", "n", "ttr")
      .as[(String, Long, Long, Long)].collect().toSeq
    val bySource = all.groupBy(_._1)
    val expected = bySource.flatMap { case (_, docs) =>
      docs.filterNot { a =>
        docs.exists(b => b._2 != a._2 && b._3 <= a._3 && b._4 >= a._4 &&
          (b._3 < a._3 || b._4 > a._4))
      }
    }.map(r => (r._1, r._2)).toSet
    assert(frontier === expected)
  }

  test("changepoint: hand-checked best split on a 2,2,10,10 grid — " +
    "the level break wins over both off-center splits; a single-day " +
    "key has no split and is absent") {
    val g = Seq(("a", 0L, 2L), ("a", 1L, 2L), ("a", 2L, 10L),
      ("a", 3L, 10L), ("b", 0L, 7L)).toDF("key", "day", "n")
    val out = graft.queries.ExtensionQueries.changepoint(g)
      .select("event_type", "n_days", "split_day", "gain_milli",
        "mean_left_milli", "mean_right_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // s=24, nd=4, baseline 576000/4 = 144000; splits after day 0/1/2:
    //   i=1: 4000 + 484000 div 3 - 144000 = 21333
    //   i=2: 8000 + 200000   - 144000     = 64000   <- the break
    //   i=3: 196000 div 3 + 100000 - 144000 = 21333
    assert(out === Seq(("a", 4L, 1L, 64000L, 2000L, 10000L)))
  }

  test("theilSen: a clean ramp reads its exact slope and one wild " +
    "outlier day cannot drag the median pairwise slope") {
    val ramp = (0L to 4L).map(d => ("a", d, d * 10L))
    val dirty = Seq(("o", 0L, 0L), ("o", 1L, 10L), ("o", 2L, 20L),
      ("o", 3L, 30L), ("o", 4L, 1000L))
    val out = graft.queries.ExtensionQueries
      .theilSen((ramp ++ dirty).toDF("key", "day", "n"))
      .select("event_type", "n_days", "n_pairs", "sen_slope_milli")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // 10 pairwise slopes each; the dirty key's four outlier-touching
    // slopes (250000..970000) sit above the lower median (rank 5)
    assert(out === Seq(("a", 5L, 10L, 10000L), ("o", 5L, 10L, 10000L)))
  }

  test("holtWintersDaily: a perfectly periodic week is a fixed point — " +
    "every forecast exact, level flat, trend zero; a 7-day key emits " +
    "nothing; a declining series matches the integer hand fold") {
    val pattern = Seq(2, 2, 2, 2, 2, 2, 9)
    val ev = (0 until 21).flatMap { dd =>
      (1 to pattern(dd % 7)).map(i => ("w", dd * day + i.toLong))
    } ++ (0 until 7).flatMap { dd =>
      (1 to 3).map(i => ("short", dd * day + i.toLong))
    }
    val out = Monitor.holtWintersDaily(ev.toDF("k", "tus"), "k", col("tus"))
      .orderBy("key", "day")
      .select("key", "day", "n", "forecast_milli", "level_milli",
        "trend_milli", "seas_milli")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.forall(_._1 == "w"), "a 7-day key must emit nothing")
    assert(out.size === 14)
    // l0 = 21000 div 7 = 3000; s0 = six -1000s then 6000: on periodic
    // data the recurrence reproduces itself and forecast == n*1000
    assert(out.forall(r => r._4 === r._3 * 1000), s"forecasts: $out")
    assert(out.forall(r => r._5 === 3000L && r._6 === 0L))
    // a steady decline: week one 10/day, week two 8/day -> the hand
    // fold with truncating integer division, trend goes negative
    val dec = (0 until 14).flatMap { dd =>
      (1 to (if (dd < 7) 10 else 8)).map(i => ("d", dd * day + i.toLong))
    }
    val got = Monitor.holtWintersDaily(dec.toDF("k", "tus"), "k", col("tus"))
      .orderBy("day")
      .select("forecast_milli", "level_milli", "trend_milli", "seas_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq
    var lvl = 10000L; var tr = 0L
    var s = Seq.fill(7)(0L)
    val exp = (0 until 7).map { _ =>
      val x = 8000L
      val nl = (300L * (x - s.head) + 700L * (lvl + tr)) / 1000L
      val nt = (100L * (nl - lvl) + 900L * tr) / 1000L
      val nsv = (200L * (x - nl) + 800L * s.head) / 1000L
      val fc = lvl + tr + s.head
      lvl = nl; tr = nt; s = s.tail :+ nsv
      (fc, nl, nt, nsv)
    }
    assert(got === exp)
    assert(got.last._3 < 0L, "a sustained decline must read a negative trend")
  }

  test("streamingPsi: a day matching the calibrated reference reads 0, " +
    "a migrated day reads the batch fixture's 20793, a silent day " +
    "reads maximal drift — days close only when a later day arrives, " +
    "even split across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps
    import graft.streaming.EventStreamOps.{PbEv, PsOut}
    implicit val sc = spark.sqlContext
    // reference = 4 docs all in bucket 0, smoothed exactly as the
    // batch formula: b0 -> 1e6, others greatest(0,1)*1e6 div 4
    val ref = 1000000L +: Seq.fill(9)(250000L)
    val mem = MemoryStream[PbEv]
    val q = EventStreamOps.streamingPsi(mem.toDS(), ref)
      .writeStream.format("memory").queryName("psilive")
      .outputMode(OutputMode.Update()).start()
    try {
      def rows = spark.table("psilive").as[PsOut].collect().toSeq
        .groupBy(_.day).map { case (_, v) => v.last }.toSeq.sortBy(_.day)
      // day 0 mirrors the reference; its bucket rows arrive across
      // TWO batches and must not close until day 1 shows up
      mem.addData(PbEv("m", 0L, 0L, 3L))
      q.processAllAvailable()
      assert(rows.isEmpty, "an open day must not emit")
      mem.addData(PbEv("m", 0L, 0L, 1L), PbEv("m", 1L, 9L, 4L))
      q.processAllAvailable()
      assert(rows.map(o => (o.day, o.nDay, o.psiE4, o.verdict)) ===
        Seq((0L, 4L, 0L, "stable")))
      // day 2 closes day 1 (the total b0 -> b9 migration = the batch
      // ExperimentSpec fixture's 20793); day 4 closes day 2 and
      // synthesizes silent day 3 = all-zero histogram, q = 1e6 apiece
      mem.addData(PbEv("m", 2L, 0L, 4L), PbEv("m", 4L, 0L, 1L))
      q.processAllAvailable()
      val got = rows.map(o => (o.day, o.nDay, o.psiE4, o.verdict))
      // silent day: 9 buckets at (250000-1e6)*floor(ln(.25)*1e4)
      //   = 9 * 750000 * 13863 div 1e6 = 93575
      assert(got === Seq((0L, 4L, 0L, "stable"),
        (1L, 4L, 20793L, "shifted"), (2L, 4L, 0L, "stable"),
        (3L, 0L, 93575L, "shifted")))
    } finally q.stop()
  }

  test("streamingHoltWinters == batch holtWintersDaily trajectory over " +
    "the same prefix, across batches, warm-up silent, in-span silent " +
    "day zero-filled live") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps
    import graft.streaming.EventStreamOps.{CcEv, HwOut}
    implicit val sc = spark.sqlContext
    // 12 days, weekly-ish pattern with a silent day 9 inside the span
    val ns = Seq(5L, 2L, 3L, 2L, 2L, 2L, 8L, 5L, 2L, 0L, 2L, 2L)
    val ev = ns.zipWithIndex.flatMap { case (n, dd) =>
      (1 to n.toInt).map(i => ("w", dd * day + i.toLong))
    }.toDF("k", "tus")
    val ref = Monitor.holtWintersDaily(ev, "k", col("tus"))
      .orderBy("day")
      .select("day", "n", "forecast_milli", "level_milli", "trend_milli",
        "seas_milli")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val mem = MemoryStream[CcEv]
    val q = EventStreamOps.streamingHoltWinters(mem.toDS())
      .writeStream.format("memory").queryName("hwlive")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1 ends mid-warm-up; batch 2 crosses the init boundary;
      // batch 3 jumps over the silent day 9
      mem.addData((0 to 4).map(dd => CcEv("w", dd.toLong, ns(dd))): _*)
      q.processAllAvailable()
      assert(spark.table("hwlive").isEmpty, "warm-up must emit nothing")
      mem.addData((5 to 8).map(dd => CcEv("w", dd.toLong, ns(dd))): _*)
      mem.addData(CcEv("w", 10L, ns(10)), CcEv("w", 11L, ns(11)))
      q.processAllAvailable()
      val live = spark.table("hwlive").as[HwOut].collect().toSeq
        .groupBy(_.day).map { case (_, v) => v.last }.toSeq.sortBy(_.day)
        .map(o => (o.day, o.n, o.forecastMilli, o.levelMilli,
          o.trendMilli, o.seasMilli))
      assert(live === ref)
    } finally q.stop()
  }
}
