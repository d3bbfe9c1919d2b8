package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over the change/event stream —
  * the Structured Streaming extension surface (SURVEY.md §2.8: windows
  * and stateful ops are "built-in for extensions"; this is that
  * extension, exercised by StreamingOpsSpec with MemoryStream).
  *
  * Scale notes: all operators are keyed by user/table so state
  * partitions horizontally; watermarks bound state size (late events
  * beyond the watermark are dropped, which the CORE pipeline never
  * needs — audit_pk ordering makes late data impossible by
  * construction — but generic event analytics does).
  */
object EventStreamOps {

  /** Tumbling-window per-event-type counts with a watermark: the
    * standard streaming aggregation. Emits (window, event_type, n).
    */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
                     window_ : String = "10 minutes",
                     lateness: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Sliding-window trending terms over a DOCUMENT stream — the live
    * twin of [[graft.ops.TextStats.tokenDrift]]: per (sliding window,
    * token) counts of an incoming text feed, the monitor that catches
    * a spam flood or scraper regression within one slide instead of at
    * the next snapshot diff. Explode happens before the aggregation,
    * so state is per (window, token) and the watermark retires windows
    * wholesale; ranking stays downstream (streaming aggs cannot window
    * -rank in append mode — the consumer tops-k the closed windows).
    */
  def streamingTrendingTerms(docs: DataFrame, tsCol: String = "ts",
                             textCol: String = "text",
                             window_ : String = "10 minutes",
                             slide: String = "5 minutes",
                             lateness: String = "5 minutes"): DataFrame =
    docs
      .withWatermark(tsCol, lateness)
      // the ONE tokenization definition (TextStats.tokens) — the live
      // and snapshot monitors must never diverge on segmentation
      .select(col(tsCol),
        explode(graft.ops.TextStats.tokens(col(textCol))).as("token"))
      .groupBy(window(col(tsCol), window_, slide), col("token"))
      .agg(count(lit(1)).as("n"))

  /** Streaming twin of [[graft.ops.Sketch.cmsCells]] — the count–min
    * sketch maintained LIVE: arriving documents' tokens hash into the
    * same md5-derived d×w cells as the batch build, through ONE
    * stateful Update-mode aggregation whose state is bounded at
    * depth×width rows — the whole point of the sketch: the
    * heavy-hitter monitor's memory does not grow with the stream.
    * Cells are additive, so the stream's running sketch equals the
    * batch sketch over the same prefix (spec-pinned) and can be
    * cell-wise ADDED to any lake-side sketch. Estimation (min over a
    * key's cells) stays a consumer-side probe of the latest cell
    * snapshot, exactly as in batch.
    */
  def streamingCmsCells(docs: DataFrame, textCol: String = "text",
                        depth: Int = 4, width: Int = 1024): DataFrame =
    docs
      .select(explode(graft.ops.TextStats.tokens(col(textCol))).as("term"))
      .select(explode(
        graft.ops.Sketch.bucketStructs(col("term"), depth, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Live HyperLogLog registers ([[graft.ops.Sketch.hllRegisters]]):
    * the running distinct-shingle cardinality sketch of a document
    * stream — ONE Update-mode stateful max-aggregation whose state is
    * bounded at `2^b` cells regardless of stream length. Duplicates
    * are absorbed by the max itself, so unlike `dropDuplicates` (state
    * grows with the key space) the live distinct tracker never grows.
    * Register max is associative, commutative, and idempotent, so
    * live == batch over any prefix (spec-pinned) and the latest
    * snapshot max-merges with any lake-side register table
    * ([[graft.ops.Sketch.hllMerge]]) — replays and overlapping
    * re-deliveries cannot corrupt it.
    */
  def streamingHllRegisters(docs: DataFrame, textCol: String = "text",
                            b: Int = 6): DataFrame =
    docs
      .select(explode(graft.functions.WordNgrams(
        graft.ops.TextStats.tokens(col(textCol)), 5)).as("g"))
      .select(graft.ops.Sketch.hllBucket(col("g"), 1 << b).as("bucket"),
        graft.ops.Sketch.hllRho(col("g")).as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("m_reg"))

  /** One user's live session state. */
  case class SessionState(nEvents: Long, lastEventId: Long)
  /** Emitted when a session closes (gap exceeded) or times out. */
  case class SessionOut(userId: Long, nEvents: Long, lastEventId: Long)
  /** Minimal event shape for the stateful pipeline. */
  case class Ev(userId: Long, eventId: Long)

  case class SeqEv(tbl: String, seq: Long)
  case class SeqState(nEvents: Long, maxSeq: Long, nNonMonotonic: Long)
  case class SeqAudit(tbl: String, nEvents: Long, maxSeq: Long,
                      nNonMonotonic: Long)

  /** Streaming twin of [[graft.ops.Profile.logIntegrity]] — what a
    * STREAM can honestly know: per table, the running event count, max
    * sequence, and the count of NON-MONOTONIC arrivals (a seq at or
    * below the running max = a duplicate or out-of-order delivery, the
    * live alarm for a capture pipeline whose contract is monotone
    * `audit_pk` growth). Exact gap/duplicate accounting needs the
    * batch audit's distinct set, which no bounded stream state can
    * hold — state here is THREE numbers per table. Within a batch,
    * events process in seq order (the cross-batch contract matches
    * [[sessionizeStream]]'s: capture assigns pks in order). One
    * emission per touched table per micro-batch, Update mode.
    */
  def streamingSeqAudit(events: Dataset[SeqEv]): Dataset[SeqAudit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.tbl)
      .mapGroupsWithState[SeqState, SeqAudit](GroupStateTimeout.NoTimeout()) {
        (tbl: String, evs: Iterator[SeqEv], state: GroupState[SeqState]) =>
          var s = state.getOption.getOrElse(SeqState(0L, Long.MinValue, 0L))
          evs.toSeq.sortBy(_.seq).foreach { e =>
            val bad = if (s.nEvents > 0 && e.seq <= s.maxSeq) 1L else 0L
            s = SeqState(s.nEvents + 1, math.max(s.maxSeq, e.seq),
              s.nNonMonotonic + bad)
          }
          state.update(s)
          SeqAudit(tbl, s.nEvents, s.maxSeq, s.nNonMonotonic)
      }
  }

  case class FunnelEv(userId: Long, eventType: String, t: Long)
  case class FunnelState(step: Int, stepT: Long)
  case class FunnelPos(userId: Long, step: Int, stepT: Long)

  /** LIVE funnel position — the streaming twin of
    * [[graft.queries.AnalyticsQueries.funnel]]: per user, how far
    * through the ordered step sequence they have progressed, updated
    * in the arriving micro-batch (the conversion monitor that says a
    * release broke checkout within minutes, not at the next batch
    * roll-up). State is TWO numbers per user (step index reached +
    * that step's event time); each batch advances greedily through
    * the user's events in time order — greedy-earliest is exactly the
    * batch funnel's first-occurrence-after-previous-step semantics,
    * so the stream position over any prefix equals the batch
    * computation over the same prefix (spec-pinned). One emission per
    * touched user per batch, Update mode; downstream counts users per
    * step for the live funnel table.
    */
  def streamingFunnel(events: Dataset[FunnelEv],
                      steps: Seq[String] =
                        Seq("signup", "view", "click", "purchase")): Dataset[FunnelPos] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelPos](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[FunnelEv], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          evs.toSeq.sortBy(e => (e.t, e.eventType)).foreach { e =>
            if (st.step < steps.length && e.eventType == steps(st.step) &&
              e.t > st.stepT)
              st = FunnelState(st.step + 1, e.t)
          }
          state.update(st)
          Iterator.single(FunnelPos(userId, st.step, st.stepT))
      }
  }

  /** Live payload-schema drift detector: each event's JSON `props`
    * keys check against the FROZEN (event_type, key) allowlist the
    * batch profile produced; a key outside it surfaces ONCE — its
    * first occurrence row — per watermark window (in-watermark
    * re-deliveries dedup; after state expiry a still-arriving rogue
    * key re-notifies, which an unacknowledged alarm should).
    * Stateless extraction (`json_object_keys` + a literal-array
    * membership test), then ONE dropDuplicates whose state the
    * watermark bounds — the producer-contract tripwire that catches a
    * deploy quietly adding fields before the lake schema does.
    * Unparseable/NULL props carry no keys (the malformed-payload
    * alarm is [[streamingSeqAudit]]'s neighbor, not this one's job).
    */
  def streamingSchemaDrift(events: DataFrame, allowed: Seq[(String, String)],
                           lateness: String = "10 minutes"): DataFrame = {
    val allowLit = array(allowed.map { case (t, k) => lit(s"$t|$k") }: _*)
    events
      .select(col("ts"), col("event_type"),
        explode(json_object_keys(col("props"))).as("key"))
      .filter(!array_contains(allowLit,
        concat(col("event_type"), lit("|"), col("key"))))
      .withWatermark("ts", lateness)
      .dropDuplicates("event_type", "key")
      .select("ts", "event_type", "key")
  }

  /** Live boilerplate-line removal — the batch cleanup
    * ([[graft.ops.TextStats.removeBoilerplateLines]]) on the INGEST
    * stream: the frozen common-line table
    * ([[graft.ops.TextStats.commonLineHashes]], refreshed offline)
    * rides the plan as a literal array, so the scrub is a STATELESS
    * pure projection — streaming-capable where the batch op's
    * corpus-global count is not, and bit-identical to it whenever the
    * frozen set matches (spec-pinned). Same output contract:
    * `n_lines` / `n_dropped` / `clean_text`, NULL when the input is
    * NULL or every line was boilerplate.
    */
  def streamingBoilerplateScrub(docs: DataFrame, commonHashes: Seq[String],
                                textCol: String = "text"): DataFrame = {
    val hs = array(commonHashes.map(lit): _*)
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => !array_contains(hs, md5(l)))
    val nLines = when(col(textCol).isNull, lit(0L))
      .otherwise(size(lines).cast("long"))
    val nDropped = nLines - when(col(textCol).isNull, lit(0L))
      .otherwise(size(kept).cast("long"))
    docs
      .withColumn("n_lines", nLines)
      .withColumn("n_dropped", nDropped)
      .withColumn("clean_text",
        when(col(textCol).isNull ||
          (nDropped === nLines && nLines > 0), lit(null))
          .otherwise(array_join(kept, "\n")))
  }

  /** Live KMV bottom-k sketch per group ([[graft.ops.Sketch.kmvSketch]]
    * on a STREAM): ONE Update-mode stateful aggregation whose state is
    * the bounded [[graft.functions.BottomK]] buffer — at most k longs
    * per group regardless of stream length. The buffer merge is
    * value-level idempotent (duplicates drop at the distinct test), so
    * re-deliveries cannot corrupt it, live == batch over any prefix
    * (spec-pinned), and the latest snapshot feeds
    * [[graft.ops.Sketch.kmvPairOverlap]] directly — the LIVE
    * cross-source contamination estimator.
    */
  def streamingKmvSketch(docs: DataFrame, k: Int,
                         keyCol: String = "g",
                         groupCol: String = "source"): DataFrame = {
    val bk = udaf(graft.functions.BottomK(k),
      org.apache.spark.sql.Encoders.scalaLong)
    docs.select(col(groupCol), graft.ops.Sketch.kmvHash(col(keyCol)).as("h"))
      .groupBy(groupCol)
      .agg(bk(col("h")).as("hs"))
  }

  /** A producer heartbeat observation. */
  case class HbEv(key: String, ts: java.sql.Timestamp)
  private[streaming] case class HbState(lastSeenMs: Long)
  /** Fired when a key has been silent past the threshold. */
  case class HbAlarm(key: String, lastSeenMs: Long, watermarkMs: Long)

  /** Dead-producer / absence alarm — the monitor that fires when a
    * source, table, or shard STOPS emitting (the failure mode
    * count-based monitors cannot see: no rows means no rows to
    * aggregate). Event-time-timeout state machine: each key's state is
    * ONE number (last seen event time); every arrival re-arms a timer
    * at `lastSeen + silenceMs`, and when the WATERMARK passes the
    * timer without a new arrival the alarm fires and the state clears
    * — a later arrival re-creates the key, so recover-then-vanish
    * alarms again. Event-time, not wall-clock: replaying history
    * raises the same alarms at the same stream positions
    * (deterministic, spec-pinned), and a stalled pipeline does not
    * false-alarm every key.
    *
    * The timer is clamped one past the current watermark when a key
    * was ALREADY silence-overdue at registration (Structured
    * Streaming rejects timers at or behind the watermark) — the alarm
    * then fires at the next trigger, which is the earliest honest
    * "it is late" moment.
    */
  def streamingHeartbeat(events: Dataset[HbEv],
                         silenceMs: Long = 10000L,
                         lateness: String = "0 seconds"): Dataset[HbAlarm] = {
    require(silenceMs >= 1, "silenceMs must be >= 1")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState[HbState, HbAlarm](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, evs: Iterator[HbEv], state: GroupState[HbState]) =>
          if (state.hasTimedOut) {
            val last = state.get.lastSeenMs
            state.remove()
            Iterator.single(HbAlarm(key, last, state.getCurrentWatermarkMs()))
          } else {
            val seen = evs.map(_.ts.getTime).max
            val last = math.max(
              state.getOption.map(_.lastSeenMs).getOrElse(Long.MinValue), seen)
            state.update(HbState(last))
            state.setTimeoutTimestamp(
              math.max(last + silenceMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** One day of a key's rollup feed entering the live control chart. */
  case class CcEv(key: String, day: Long, n: Long)
  case class CcState(lastDay: Long, posMilli: Long, negMilli: Long)
  case class CcOut(key: String, day: Long, n: Long,
                   posMilli: Long, negMilli: Long,
                   alarmUp: Boolean, alarmDown: Boolean)

  /** Live two-sided CUSUM — the streaming twin of
    * [[graft.ops.Monitor.cusumDaily]], fed by the per-(key, day)
    * rollup a daily aggregation job emits. Control-chart practice
    * calibrates limits OFFLINE and applies them online, so target /
    * slack / h arrive as parameters (the batch chart's last
    * self-calibration), not from stream state — a stream cannot know
    * its own future mean. State per key is THREE numbers (last day,
    * pos, neg); silent days zero-fill exactly as in the batch fold
    * (the recurrence applies with n = 0 for every skipped day, so a
    * source going quiet RAISES the lower cusum — the failure the
    * chart exists to catch). Within a batch days process in order;
    * across batches the feed contract is the rollup job's: days
    * arrive append-only per key (a duplicate or late day is ignored,
    * never double-counted). Update mode, one row per applied day —
    * after any batch the emitted trajectory equals the batch
    * operator's over the same prefix (spec-pinned).
    */
  def streamingCusum(days: Dataset[CcEv], targetMilli: Long,
                     slackMilli: Long, hMilli: Long): Dataset[CcOut] = {
    import days.sparkSession.implicits._
    days
      .groupByKey(_.key)
      .flatMapGroupsWithState[CcState, CcOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[CcEv], state: GroupState[CcState]) =>
          var st = state.getOption.getOrElse(
            CcState(Long.MinValue, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[CcOut]
          def step(day: Long, n: Long): Unit = {
            val pos = math.max(0L, st.posMilli + n * 1000L - targetMilli - slackMilli)
            val neg = math.max(0L, st.negMilli + targetMilli - n * 1000L - slackMilli)
            st = CcState(day, pos, neg)
            out += CcOut(key, day, n, pos, neg, pos > hMilli, neg > hMilli)
          }
          evs.toSeq.sortBy(_.day).foreach { e =>
            if (st.lastDay == Long.MinValue) step(e.day, e.n)
            else if (e.day > st.lastDay) {
              var d = st.lastDay + 1
              while (d < e.day) { step(d, 0L); d += 1 }
              step(e.day, e.n)
            } // e.day <= lastDay: duplicate/late — append-only contract
          }
          state.update(st)
          out.iterator
      }
  }

  case class PhState(lastDay: Long, i: Long, cum: Long,
                     mu: Long, minu: Long, md: Long, mind: Long)
  case class PhOut(key: String, day: Long, n: Long,
                   phUpMilli: Long, phDownMilli: Long,
                   alarmUp: Boolean, alarmDown: Boolean)

  /** Live two-sided Page–Hinkley — the streaming twin of
    * [[graft.ops.Monitor.pageHinkleyDaily]], same rollup-feed
    * contract as [[streamingCusum]] (per-(key, day) counts,
    * append-only days, silent days synthesized with n = 0). Where the
    * live CUSUM accumulates against a FIXED calibrated target, this
    * one anchors on the RUNNING mean it carries in state (i, cum) —
    * so after a permanent level change it alarms once and re-calms as
    * the anchor absorbs the new level. δ/λ arrive as parameters (the
    * batch chart's self-calibration, applied online — control-chart
    * practice); state per key is SEVEN longs; after any batch the
    * emitted trajectory equals the batch fold's over the same prefix
    * (spec-pinned). The running-mean division is Long arithmetic over
    * non-negative operands — identical to the batch `div`.
    */
  def streamingPageHinkley(days: Dataset[CcEv], deltaMilli: Long,
                           lambdaMilli: Long): Dataset[PhOut] = {
    import days.sparkSession.implicits._
    days
      .groupByKey(_.key)
      .flatMapGroupsWithState[PhState, PhOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[CcEv], state: GroupState[PhState]) =>
          var st = state.getOption.getOrElse(
            PhState(Long.MinValue, 0L, 0L, 0L, 0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[PhOut]
          def step(day: Long, n: Long): Unit = {
            st = if (st.lastDay == Long.MinValue) {
              val m0 = 0L - deltaMilli
              PhState(day, 1L, n, m0, math.min(0L, m0), m0, math.min(0L, m0))
            } else {
              val i = st.i + 1L
              val cum = st.cum + n
              val mean = cum * 1000L / i
              val mu = st.mu + n * 1000L - mean - deltaMilli
              val md = st.md + mean - n * 1000L - deltaMilli
              PhState(day, i, cum, mu, math.min(st.minu, mu),
                md, math.min(st.mind, md))
            }
            val phu = st.mu - st.minu
            val phd = st.md - st.mind
            out += PhOut(key, day, n, phu, phd,
              phu > lambdaMilli, phd > lambdaMilli)
          }
          evs.toSeq.sortBy(_.day).foreach { e =>
            if (st.lastDay == Long.MinValue) step(e.day, e.n)
            else if (e.day > st.lastDay) {
              var d = st.lastDay + 1
              while (d < e.day) { step(d, 0L); d += 1 }
              step(e.day, e.n)
            } // e.day <= lastDay: duplicate/late — append-only contract
          }
          state.update(st)
          out.iterator
      }
  }

  case class EwState(lastDay: Long, ewmaMilli: Long)
  case class EwOut(key: String, day: Long, n: Long, ewmaMilli: Long,
                   devPpm: Long, flagged: Boolean)

  /** Live EWMA — the streaming twin of
    * [[graft.ops.Monitor.ewmaDaily]], same rollup-feed contract as
    * [[streamingCusum]] (per-(key, day) counts, append-only days,
    * silent days synthesized with n = 0). State per key is TWO
    * numbers; the deviation judges each day against the baseline
    * BEFORE it, exactly the batch fold — after any batch the emitted
    * trajectory equals the batch chart's over the same prefix
    * (spec-pinned). alphaMilli/limitPpm arrive as parameters (the
    * offline calibration, control-chart practice). Known Long bound:
    * devPpm's ×1e6 cross-multiplication is Long arithmetic, exact to
    * ~9.2e9 events/day per key (the batch twin routes the same
    * product through DECIMAL(38,0); here the per-key day count is a
    * rollup cell, far under the bound).
    */
  def streamingEwma(days: Dataset[CcEv], alphaMilli: Int = 300,
                    limitPpm: Long = 500000L): Dataset[EwOut] = {
    require(alphaMilli > 0 && alphaMilli <= 1000,
      s"alphaMilli must be in (0, 1000], got $alphaMilli")
    import days.sparkSession.implicits._
    val a = alphaMilli
    days
      .groupByKey(_.key)
      .flatMapGroupsWithState[EwState, EwOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[CcEv], state: GroupState[EwState]) =>
          var st = state.getOption.getOrElse(EwState(Long.MinValue, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[EwOut]
          def step(day: Long, n: Long): Unit = {
            if (st.lastDay == Long.MinValue) {
              // seed: first day at its own value, deviation zero
              st = EwState(day, n * 1000L)
              out += EwOut(key, day, n, st.ewmaMilli, 0L, flagged = false)
            } else {
              val prev = st.ewmaMilli
              val next = (a * n * 1000L + (1000L - a) * prev) / 1000L
              val dev = (n * 1000L - prev) * 1000000L / math.max(prev, 1L)
              st = EwState(day, next)
              out += EwOut(key, day, n, next, dev, math.abs(dev) > limitPpm)
            }
          }
          evs.toSeq.sortBy(_.day).foreach { e =>
            if (st.lastDay == Long.MinValue) step(e.day, e.n)
            else if (e.day > st.lastDay) {
              var d = st.lastDay + 1
              while (d < e.day) { step(d, 0L); d += 1 }
              step(e.day, e.n)
            } // duplicate/late day: append-only contract
          }
          state.update(st)
          out.iterator
      }
  }

  case class HoltState(lastDay: Long, levelMilli: Long, trendMilli: Long)
  case class HoltOut(key: String, day: Long, n: Long, levelMilli: Long,
                     trendMilli: Long, forecastMilli: Long)

  /** Live Holt linear-trend smoother — the streaming twin of
    * [[graft.ops.Monitor.holtDaily]], same rollup-feed contract as
    * [[streamingEwma]]: state = (last day, level, trend) per key,
    * silent days zero-filled in-stream exactly as the batch fold, the
    * one-step-ahead forecast emitted per day. The trend term is what
    * lets the live monitor see a sustained ramp EARLY instead of
    * lagging it — the live capacity-planning feed next to the live
    * EWMA's anomaly feed.
    */
  def streamingHolt(days: Dataset[CcEv], alphaMilli: Int = 300,
                    betaMilli: Int = 100): Dataset[HoltOut] = {
    require(alphaMilli > 0 && alphaMilli <= 1000,
      s"alphaMilli must be in (0, 1000], got $alphaMilli")
    require(betaMilli > 0 && betaMilli <= 1000,
      s"betaMilli must be in (0, 1000], got $betaMilli")
    import days.sparkSession.implicits._
    val a = alphaMilli; val b = betaMilli
    days
      .groupByKey(_.key)
      .flatMapGroupsWithState[HoltState, HoltOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[CcEv], state: GroupState[HoltState]) =>
          var st = state.getOption.getOrElse(HoltState(Long.MinValue, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[HoltOut]
          def step(day: Long, n: Long): Unit = {
            if (st.lastDay == Long.MinValue) {
              st = HoltState(day, n * 1000L, 0L)
            } else {
              val l = (a * n * 1000L +
                (1000L - a) * (st.levelMilli + st.trendMilli)) / 1000L
              val t = (b * (l - st.levelMilli) +
                (1000L - b) * st.trendMilli) / 1000L
              st = HoltState(day, l, t)
            }
            out += HoltOut(key, day, n, st.levelMilli, st.trendMilli,
              st.levelMilli + st.trendMilli)
          }
          evs.toSeq.sortBy(_.day).foreach { e =>
            if (st.lastDay == Long.MinValue) step(e.day, e.n)
            else if (e.day > st.lastDay) {
              var d = st.lastDay + 1
              while (d < e.day) { step(d, 0L); d += 1 }
              step(e.day, e.n)
            } // duplicate/late day: append-only contract
          }
          state.update(st)
          out.iterator
      }
  }

  case class HwState(lastDay: Long, warm: Seq[Long], lvl: Long,
                     trend: Long, s: Seq[Long])
  case class HwOut(key: String, day: Long, n: Long, forecastMilli: Long,
                   levelMilli: Long, trendMilli: Long, seasMilli: Long)

  /** Live Holt–Winters — the streaming twin of
    * [[graft.ops.Monitor.holtWintersDaily]], same rollup feed and
    * zero-fill contract as [[streamingHolt]]. The batch operator's
    * week-1 simple initialization becomes an explicit WARM-UP phase:
    * the first seven applied days (zero-filled like any other)
    * accumulate in state; the seventh completes the textbook init
    * (week-mean level, zero trend, deviation seasonal) and emission
    * starts with day 8 — so after any batch the emitted trajectory
    * equals the batch fold's over the same prefix, including the
    * silent-emission warm-up (spec-pinned). State per key: last day,
    * ≤7 warm-up counts, level, trend, and the 7-slot seasonal FIFO —
    * ten longs once warm.
    */
  def streamingHoltWinters(days: Dataset[CcEv], alphaMilli: Int = 300,
                           betaMilli: Int = 100,
                           gammaMilli: Int = 200): Dataset[HwOut] = {
    require(alphaMilli > 0 && alphaMilli <= 1000,
      s"alphaMilli must be in (0, 1000], got $alphaMilli")
    require(betaMilli > 0 && betaMilli <= 1000,
      s"betaMilli must be in (0, 1000], got $betaMilli")
    require(gammaMilli > 0 && gammaMilli <= 1000,
      s"gammaMilli must be in (0, 1000], got $gammaMilli")
    import days.sparkSession.implicits._
    val a = alphaMilli; val b = betaMilli; val g = gammaMilli
    days
      .groupByKey(_.key)
      .flatMapGroupsWithState[HwState, HwOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[CcEv], state: GroupState[HwState]) =>
          var st = state.getOption.getOrElse(
            HwState(Long.MinValue, Seq.empty, 0L, 0L, Seq.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[HwOut]
          def step(day: Long, n: Long): Unit = {
            if (st.warm.size < 7) {
              val w = st.warm :+ n
              if (w.size == 7) {
                val l0 = w.sum * 1000L / 7L
                st = HwState(day, w, l0, 0L, w.map(_ * 1000L - l0))
              } else st = st.copy(lastDay = day, warm = w)
            } else {
              val sHead = st.s.head
              val fc = st.lvl + st.trend + sHead
              val nl = (a * (n * 1000L - sHead) +
                (1000L - a) * (st.lvl + st.trend)) / 1000L
              val nt = (b * (nl - st.lvl) + (1000L - b) * st.trend) / 1000L
              val nsv = (g * (n * 1000L - nl) + (1000L - g) * sHead) / 1000L
              st = HwState(day, st.warm, nl, nt, st.s.tail :+ nsv)
              out += HwOut(key, day, n, fc, nl, nt, nsv)
            }
          }
          evs.toSeq.sortBy(_.day).foreach { e =>
            if (st.lastDay == Long.MinValue) step(e.day, e.n)
            else if (e.day > st.lastDay) {
              var d = st.lastDay + 1
              while (d < e.day) { step(d, 0L); d += 1 }
              step(e.day, e.n)
            } // duplicate/late day: append-only contract
          }
          state.update(st)
          out.iterator
      }
  }

  /** One observation entering the live experiment monitor. */
  case class SprtEv(key: String, seq: Long, hit: Boolean)
  case class SprtState(llrMicro: Long, nObs: Long, decided: String)
  case class SprtOut(key: String, nObs: Long, llrMicro: Long,
                     decision: String)

  /** Live sequential probability ratio test (Wald 1945) — the
    * early-stopping experiment monitor: per key, the running
    * log-likelihood ratio of H1 (rate p1) against H0 (rate p0) in
    * EXACT micro-nats, using per-observation increments and
    * acceptance thresholds pinned as integer constants at
    * construction (ln(p1/p0), ln((1−p1)/(1−p0)), ln((1−β)/α),
    * ln(β/(1−α)) — the caller derives them once from its
    * hypotheses; the defaults encode p0 = 2%, p1 = 3%,
    * α = β = 0.05). State per key is two numbers + the sticky
    * decision; once a boundary is crossed the verdict FREEZES (the
    * test's validity depends on stopping, not sampling on), and
    * later observations no longer move it. Within a batch,
    * observations apply in `seq` order so replays are deterministic.
    * Update mode: one row per touched key per batch.
    */
  def streamingSprt(obs: Dataset[SprtEv],
                    hitMicro: Long = 405465L,
                    missMicro: Long = -10257L,
                    upperMicro: Long = 2944439L,
                    lowerMicro: Long = -2944439L): Dataset[SprtOut] = {
    require(upperMicro > 0 && lowerMicro < 0,
      "SPRT thresholds must straddle zero")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState[SprtState, SprtOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[SprtEv], state: GroupState[SprtState]) =>
          var st = state.getOption.getOrElse(SprtState(0L, 0L, "continue"))
          evs.toSeq.sortBy(_.seq).foreach { e =>
            if (st.decided == "continue") {
              val llr = st.llrMicro + (if (e.hit) hitMicro else missMicro)
              val dec =
                if (llr >= upperMicro) "accept_h1"
                else if (llr <= lowerMicro) "accept_h0"
                else "continue"
              st = SprtState(llr, st.nObs + 1, dec)
            }
          }
          state.update(st)
          Iterator.single(SprtOut(key, st.nObs, st.llrMicro, st.decided))
      }
  }

  case class GsEv(key: String, day: Long, da: Long, dha: Long,
                  db: Long, dhb: Long)
  case class GsState(d0: Long, ca: Long, cha: Long, cb: Long, chb: Long,
                     nextLook: Int, stopped: Boolean)
  case class GsOut(key: String, look: Long, nA: Long, hitsA: Long,
                   nB: Long, hitsB: Long, z2Milli: Long, boundMilli: Long,
                   crossed: Boolean)

  /** Live group-sequential monitor — the streaming twin of the batch
    * OBF replay ([[graft.queries.ExtensionQueries.groupSeq]]): the
    * batch form derives its five looks from the OBSERVED span
    * post-hoc; a live experiment has a PLANNED horizon, so
    * `horizonDays` arrives as a parameter (the design document's
    * number) and look k completes when the per-(key, day) rollup
    * reaches day `d0 + horizon·k/K − 1`. State per key is four
    * cumulative counts + the next-look cursor + the sticky stop;
    * each completed look emits its z² against the `z*²·K/k` boundary
    * (4.162 milli pinned at K = 5, matching the batch constants
    * exactly — BigInt intermediates mirror the batch DECIMAL(38,0)
    * path). Once a look crosses, later looks stop emitting — a live
    * monitor that kept testing after stopping would forfeit the
    * spending function's guarantee. Rollup-feed contract as with the
    * other twins: days per key arrive in nondecreasing order.
    */
  def streamingGroupSeq(obs: Dataset[GsEv], horizonDays: Long,
                        looks: Int = 5,
                        finalZ2Milli: Long = 4162L): Dataset[GsOut] = {
    require(horizonDays >= looks, "horizonDays must cover the looks")
    require(looks >= 1, "need at least one look")
    import obs.sparkSession.implicits._
    def z2(na: Long, ha: Long, nb: Long, hb: Long): Long = {
      val pa = ha * 1000000L / math.max(na, 1L)
      val pb = hb * 1000000L / math.max(nb, 1L)
      val pool = (ha + hb) * 1000000L / math.max(na + nb, 1L)
      val diff = BigInt(pa - pb)
      val harm = BigInt(na) * nb / math.max(na + nb, 1L)
      val den = BigInt(math.max(pool * (1000000L - pool), 1L))
      (diff * diff * harm * 1000 / den).toLong
    }
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState[GsState, GsOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[GsEv], state: GroupState[GsState]) =>
          var st = state.getOption.getOrElse(
            GsState(Long.MinValue, 0L, 0L, 0L, 0L, 1, stopped = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[GsOut]
          def emitLook(k: Int): Unit = {
            val z = z2(st.ca, st.cha, st.cb, st.chb)
            val bound = finalZ2Milli * looks / k
            val crossed = z >= bound
            out += GsOut(key, k.toLong, st.ca, st.cha, st.cb, st.chb,
              z, bound, crossed)
            if (crossed) st = st.copy(stopped = true)
          }
          evs.toSeq.sortBy(_.day).foreach { e =>
            if (st.d0 == Long.MinValue) st = st.copy(d0 = e.day)
            def cutoff(k: Int) = st.d0 + horizonDays * k / looks - 1
            // looks whose cutoff fell in a DAY GAP strictly before this
            // day close on the pre-day cumulative — this day's counts
            // belong to the next look
            var k = st.nextLook
            while (!st.stopped && k <= looks && cutoff(k) < e.day) {
              emitLook(k); k += 1
            }
            st = st.copy(nextLook = k,
              ca = st.ca + e.da, cha = st.cha + e.dha,
              cb = st.cb + e.db, chb = st.chb + e.dhb)
            while (!st.stopped && k <= looks && cutoff(k) <= e.day) {
              emitLook(k); k += 1
            }
            st = st.copy(nextLook = k)
          }
          state.update(st)
          out.iterator
      }
  }

  case class DdEv(key: String, seq: Long, v: Long)
  case class DdState(nObs: Long, peak: Long, maxDdPpm: Long,
                     firstAlarmN: Long)
  case class DdOut(key: String, nObs: Long, peak: Long, maxDdPpm: Long,
                   firstAlarmN: Long)

  /** Live running-peak drawdown — the streaming twin of
    * [[graft.queries.ExtensionQueries.drawdown]]: per key, the
    * running peak of the metric, the worst slump against it in ppm,
    * and the observation index of the FIRST crossing of `alarmPpm`
    * (0 while none; sticky once set, exactly the batch replay's
    * struct-min pick). State is four numbers per key; within a batch
    * observations apply in `seq` order so replays are deterministic.
    * Update mode: one row per touched key per batch — after any
    * prefix of the stream the emitted row equals the batch replay's
    * summary over the same prefix (spec-pinned).
    */
  def streamingDrawdown(obs: Dataset[DdEv],
                        alarmPpm: Long = 500000L): Dataset[DdOut] = {
    require(alarmPpm > 0, "alarmPpm must be positive")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState[DdState, DdOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[DdEv], state: GroupState[DdState]) =>
          var st = state.getOption.getOrElse(DdState(0L, Long.MinValue, 0L, 0L))
          evs.toSeq.sortBy(_.seq).foreach { e =>
            val peak = math.max(st.peak, e.v)
            val dd = (peak - e.v) * 1000000L / math.max(peak, 1L)
            val n = st.nObs + 1
            st = DdState(n, peak, math.max(st.maxDdPpm, dd),
              if (st.firstAlarmN == 0L && dd >= alarmPpm) n else st.firstAlarmN)
          }
          state.update(st)
          Iterator.single(DdOut(key, st.nObs, st.peak, st.maxDdPpm,
            st.firstAlarmN))
      }
  }

  case class BkState(lastDay: Long, backlogMilli: Long)
  case class BkOut(key: String, day: Long, n: Long, backlogMilli: Long,
                   drained: Boolean)

  /** Live ingest backlog — the streaming twin of
    * [[graft.ops.Monitor.backlogDaily]] (Lindley recursion), same
    * rollup-feed contract as [[streamingCusum]]: capacity arrives as
    * a parameter (the offline 120%-of-mean calibration), state per
    * key is TWO numbers, silent days apply the recursion with n = 0
    * (a quiet day DRAINS the queue — skipping it would freeze the
    * backlog). After any batch the trajectory equals the batch fold's
    * over the same prefix (spec-pinned).
    */
  def streamingBacklog(days: Dataset[CcEv],
                       capMilli: Long): Dataset[BkOut] = {
    require(capMilli >= 0, s"capMilli must be >= 0, got $capMilli")
    import days.sparkSession.implicits._
    days
      .groupByKey(_.key)
      .flatMapGroupsWithState[BkState, BkOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[CcEv], state: GroupState[BkState]) =>
          var st = state.getOption.getOrElse(BkState(Long.MinValue, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[BkOut]
          def step(day: Long, n: Long): Unit = {
            val b = math.max(0L, st.backlogMilli + n * 1000L - capMilli)
            st = BkState(day, b)
            out += BkOut(key, day, n, b, b == 0L)
          }
          evs.toSeq.sortBy(_.day).foreach { e =>
            if (st.lastDay == Long.MinValue) step(e.day, e.n)
            else if (e.day > st.lastDay) {
              var d = st.lastDay + 1
              while (d < e.day) { step(d, 0L); d += 1 }
              step(e.day, e.n)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** One day of a key's rollup feed entering the live gap-fill. */
  case class GfEv(key: String, day: Long, n: Long, dayLastQ: Option[Long])
  case class GfState(lastDay: Long, lastQ: Option[Long])
  case class GfOut(key: String, day: Long, n: Long,
                   filledQ: Option[Long], isGap: Boolean)

  /** Live per-key daily gap-fill — the streaming twin of
    * [[graft.ops.TemporalJoins.gapFillDaily]], fed by the per-(key,
    * day) rollup (count + the day's last milli reading). State per
    * key is (last day, last reading); silent days between arrivals
    * synthesize n = 0 / is_gap rows carrying the forward-filled
    * reading, exactly the batch grid's LOCF — so a dashboard reading
    * the live feed sees the same dense grid the batch repair would
    * emit over the same prefix (spec-pinned). Days arrive append-only
    * per key (the rollup job's contract); duplicates/late days are
    * ignored. Update mode, one row per emitted grid day.
    */
  def streamingGapFill(days: Dataset[GfEv]): Dataset[GfOut] = {
    import days.sparkSession.implicits._
    days
      .groupByKey(_.key)
      .flatMapGroupsWithState[GfState, GfOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[GfEv], state: GroupState[GfState]) =>
          var st = state.getOption.getOrElse(GfState(Long.MinValue, None))
          val out = scala.collection.mutable.ArrayBuffer.empty[GfOut]
          evs.toSeq.sortBy(_.day).foreach { e =>
            if (st.lastDay == Long.MinValue || e.day > st.lastDay) {
              if (st.lastDay != Long.MinValue) {
                var d = st.lastDay + 1
                while (d < e.day) {
                  out += GfOut(key, d, 0L, st.lastQ, isGap = true)
                  d += 1
                }
              }
              val q = e.dayLastQ.orElse(st.lastQ)
              out += GfOut(key, e.day, e.n, q, isGap = e.n == 0L)
              st = GfState(e.day, q)
            } // e.day <= lastDay: duplicate/late — append-only contract
          }
          state.update(st)
          out.iterator
      }
  }

  /** One scored stream row entering the reservoir. */
  case class ResIn(source: String, docId: Long, priority: String)
  /** A stratum's live reservoir: top-k (priority, docId), sorted. */
  case class ResState(top: Seq[(String, Long)])
  /** Snapshot row: a stratum's current rank-`rank` member. */
  case class ResOut(source: String, docId: Long, priority: String, rank: Int)

  /** Live EXACT-k weighted reservoir per stratum — the streaming twin
    * of [[graft.ops.Sampling.weightedTopK]] (Efraimidis–Spirakis top-k
    * by priority), and the textbook A-ES reservoir: keep the k
    * highest-priority rows seen so far. The priority is computed by
    * the SAME shared kernel ([[graft.ops.Sampling.esPriority]]) as a
    * stateless projection before the stateful op, so live and batch
    * cannot diverge; zero/null-weight rows drop at the gate (null
    * priority = zero tickets). State per stratum is EXACTLY k
    * (priority, id) pairs — bounded regardless of stream length — and
    * the top-k merge is associative with deterministic (priority desc,
    * id asc) tie-breaks, so after every micro-batch the emitted
    * snapshot equals the batch top-k over the whole prefix
    * (spec-pinned). One stateful op, Update mode: each touched stratum
    * re-emits its full current reservoir.
    */
  def streamingWeightedTopK(docs: DataFrame, k: Int,
                            weightCap: Int = 32,
                            idCol: String = "doc_id",
                            sourceCol: String = "source",
                            weightCol: String = "w"): Dataset[ResOut] = {
    require(k >= 1, "k must be >= 1")
    import docs.sparkSession.implicits._
    val scored = docs
      .withColumn("priority",
        graft.ops.Sampling.esPriority(col(idCol), col(weightCol), weightCap))
      .filter(col("priority").isNotNull)
      .select(col(sourceCol).cast("string").as("source"),
        col(idCol).cast("long").as("docId"), col("priority"))
      .as[ResIn]
    // priority desc, id asc — the batch op's exact ordering
    def lt(a: (String, Long), b: (String, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    scored
      .groupByKey(_.source)
      .flatMapGroupsWithState[ResState, ResOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[ResIn], state: GroupState[ResState]) =>
          val prev = state.getOption.map(_.top).getOrElse(Seq.empty)
          val merged = (prev ++ rows.map(r => (r.priority, r.docId)))
            .distinct.sortWith(lt).take(k)
          state.update(ResState(merged))
          merged.iterator.zipWithIndex.map { case ((p, id), i) =>
            ResOut(src, id, p, i + 1)
          }
      }
  }

  /** Custom stateful sessionization via flatMapGroupsWithState: a
    * session closes when the incoming event's id gap exceeds
    * `maxGap`. Matches the batch twin (AnalyticsQueries.sessionize)
    * when events arrive in id order ACROSS batches — the CDC
    * contract, since audit_pk is assigned at capture time and the log
    * is consumed in order. Events are sorted within each batch; an
    * id older than the live session's last id (cross-batch disorder)
    * extends that session rather than re-sorting history — a stream
    * that needs full disorder tolerance should buffer on event time
    * with a watermark instead.
    *
    * @param idleTimeout when Some(duration), idle users' sessions are
    *        flushed via ProcessingTimeTimeout (production setting;
    *        tests use None so micro-batches stay deterministic and the
    *        trigger loop stops when the source drains)
    */
  def sessionizeStream(events: Dataset[Ev], maxGap: Long = 100L,
                       idleTimeout: Option[String] = None): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOut(userId, s.nEvents, s.lastEventId)).toSeq
            state.remove()
            out.iterator
          } else {
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            evs.toSeq.sortBy(_.eventId).foreach { e =>
              cur match {
                case Some(s) if e.eventId - s.lastEventId <= maxGap =>
                  cur = Some(SessionState(s.nEvents + 1, e.eventId))
                case Some(s) =>
                  closed += SessionOut(userId, s.nEvents, s.lastEventId)
                  cur = Some(SessionState(1L, e.eventId))
                case None =>
                  cur = Some(SessionState(1L, e.eventId))
              }
            }
            cur.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drop re-deliveries of the same document id
    * (or content hash) as they stream in. State holds one entry per
    * seen key and is GARBAGE-COLLECTED by the event-time watermark —
    * `dropDuplicatesWithinWatermark` keeps a key only until the
    * watermark passes it, so state is bounded by the lateness window,
    * not corpus size; a plain `dropDuplicates` on an unbounded stream
    * would grow state forever. This is the ingestion-time twin of the
    * batch [[graft.ops.Dedup.exact]].
    */
  def streamingDedup(docs: DataFrame, keyCols: Seq[String],
                     tsCol: String = "ts",
                     lateness: String = "10 minutes"): DataFrame =
    docs
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming NEAR-dup suppression: fingerprint each arriving doc
    * with the native one-pass SimHash ([[graft.functions.SimHash32]])
    * and keep the first document per fingerprint within the watermark
    * window — near-identical re-posts (same distinct-token set) drop
    * in-stream. Same bounded-state argument as [[streamingDedup]]:
    * one entry per fingerprint until the watermark passes it.
    */
  def streamingNearDedup(docs: DataFrame, textCol: String = "text",
                         tsCol: String = "ts",
                         lateness: String = "10 minutes"): DataFrame =
    docs
      // SAME tokenization as the batch twin (Dedup.simhash) — shared
      // helper, not a re-implementation, so fingerprints cannot drift
      .withColumn("simhash",
        graft.functions.SimHash32(graft.ops.Dedup.tokenSet(col(textCol))))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(Seq("simhash"))

  /** Streaming ingestion gate against a STATIC base corpus: drop
    * arriving documents whose content hash already exists in the base
    * (stream-static left-anti join — Spark re-plans the static side
    * per micro-batch, so a lake-backed base picks up compactions
    * without restarting the query), then drop in-stream repeats within
    * the watermark ([[streamingDedup]]'s bounded state). The live twin
    * of [[graft.ops.Dedup.exactAgainst]]: batch gates a snapshot,
    * this gates the firehose.
    *
    * Scale: the stream side reduces to (row, md5) before the join; the
    * static side is hashes only (at 100 TB, the persisted hash index,
    * not the corpus — broadcast if it fits, shuffled-hash otherwise).
    * State for the in-stream stage is bounded by the lateness window.
    */
  def streamingDedupAgainstBase(docs: DataFrame, base: DataFrame,
                                textCol: String = "text",
                                tsCol: String = "ts",
                                lateness: String = "10 minutes"): DataFrame = {
    val baseHashes = base
      .select(md5(col(textCol)).as("text_hash")).distinct()
    docs
      .withColumn("text_hash", md5(col(textCol)))
      .join(baseHashes, Seq("text_hash"), "left_anti")
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(Seq("text_hash"))
  }

  /** Live record linkage against a STATIC master dimension — the
    * streaming half of [[graft.ops.Dedup.blockedLinkage]]: each
    * arriving record blocks on its key, joins ONLY its block's master
    * rows (stream-static equi-join, re-planned per micro-batch so a
    * refreshed master is picked up without a restart), and matches at
    * banded Levenshtein ≤ maxDist — the is-this-a-known-entity gate
    * an ingest pipeline runs before minting a new id. Stateless: no
    * watermark, no state store; per-batch cost is batch-rows ×
    * block-size, the same ER cost model as the batch pass, and the
    * master side reduces to (block, id, name) — broadcast if it fits.
    * Bit-identical to the batch linkage over the same rows
    * (spec-pinned) because both sides share the one match definition.
    */
  def streamingLinkage(records: DataFrame, master: DataFrame,
                       blockCol: String, idCol: String, nameCol: String,
                       maxDist: Int): DataFrame = {
    val m = master.select(col(blockCol).as("block"),
      col(idCol).as("master_id"), col(nameCol).as("master_name"))
    records
      .select(col(blockCol).as("block"), col(idCol).as("rec_id"),
        col(nameCol).as("rec_name"))
      .join(m, Seq("block"))
      .filter(col("rec_id") =!= col("master_id") &&
        abs(length(col("rec_name")) - length(col("master_name"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("rec_name"), col("master_name"), maxDist))
      .filter(col("dist") >= 0)
      .select("block", "rec_id", "rec_name", "master_id", "master_name",
        "dist")
  }

  /** STREAMING corpus diff, live half — the batch
    * [[graft.ops.Dedup.corpusDiff]] contract over a re-crawl STREAM of
    * the current corpus against a static base snapshot. Every arriving
    * document classifies immediately via a stream-static left join on
    * the base's (id, hash) index (re-planned per micro-batch, like
    * [[streamingDedupAgainstBase]]): absent id → `added`, present with
    * a different hash (null-safe `<=>`, matching the batch twin) →
    * `changed`; unchanged arrivals emit nothing. Crawler re-deliveries
    * of the same (id, content) drop within the watermark, so state is
    * bounded by the lateness window, never corpus size.
    *
    * The stream output is a change LOG, not a diff row-set: every
    * DISTINCT content version observed for an id classifies (an id
    * delivered with two different bodies in one scan emits two rows —
    * an append-mode stream cannot retract the first). A consumer
    * composing the batch-diff row-set therefore reduces to the LATEST
    * row per id at scan end; with at most one observed version per id
    * (the common crawl contract) the log IS the diff, which is the
    * case the spec's composition equality pins.
    *
    * `removed` is NOT live-decidable: a base id's absence is only
    * known once the scan completes — no micro-batch can prove a doc
    * will never arrive. That half is [[corpusDiffRemoved]], a batch
    * anti-join the pipeline runs at scan end against its visited-id
    * ledger (which the crawler keeps anyway; the spec shows the
    * composition reproducing the batch diff exactly).
    */
  def streamingCorpusDiff(docs: DataFrame, base: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          tsCol: String = "ts",
                          lateness: String = "10 minutes"): DataFrame = {
    val b = base.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("h_base"), lit(true).as("_in_base"))
    docs
      .select(col(tsCol), col(idCol).as("doc_id"),
        md5(col(textCol)).as("h_cur"))
      .withWatermark(tsCol, lateness)
      // keyed on (id, hash), NOT id alone: a genuine content change
      // re-fetched inside the lateness window of an earlier delivery
      // carries a new hash and MUST classify — id-only dedup would
      // silently drop it; only true re-deliveries (same id, same
      // bytes) drop. Consequence (see scaladoc): multiple DISTINCT
      // versions of one id each emit — the output is a change log,
      // latest-per-id reduces it to the diff row-set
      .dropDuplicatesWithinWatermark(Seq("doc_id", "h_cur"))
      .join(b, Seq("doc_id"), "left")
      .withColumn("status",
        when(col("_in_base").isNull, lit("added"))
          .when(!(col("h_base") <=> col("h_cur")), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select("doc_id", "status", "h_base", "h_cur")
  }

  /** Scan-end half of the streaming corpus diff: `removed` = base ids
    * the completed scan never visited. `seenIds` is the crawl's
    * visited-id ledger (every id the stream carried, unchanged ones
    * included). Output schema matches [[graft.ops.Dedup.corpusDiff]]'s
    * removed rows, so `stream output ∪ this` IS the batch diff.
    * Shape: anti-join of the skinny (id, hash) base index against the
    * skinny ledger — map-side partials, no corpus movement.
    */
  def corpusDiffRemoved(base: DataFrame, seenIds: DataFrame,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    base.select(col(idCol).as("doc_id"), md5(col(textCol)).as("h_base"))
      .join(seenIds.select(col(idCol).as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("removed").as("status"),
        col("h_base"), lit(null).cast("string").as("h_cur"))

  /** LIVE cross-source contamination monitor — the streaming twin of
    * the batch cross-source duplication matrix
    * ([[graft.queries.ExtensionQueries]]'s `q_source_overlap`): per
    * tumbling window, how many near-dup candidate pairs land on each
    * unordered source pair, the moment they arrive. The batch matrix
    * tells the curation owner which source INTERSECTIONS eat the dedup
    * budget at the last audit; this emits the same cells as new data
    * streams in, so source A republishing source B surfaces within a
    * window, not at the next audit.
    *
    * Shape (the [[graft.ops.Dedup.minhashLshIncremental]] probe made
    * streamable): each arriving doc hashes to its LSH band keys as a
    * PURE projection — the native [[graft.functions.MinHashHex]]
    * kernel with [[graft.ops.Dedup.bandKeyArray]], the same band hash
    * the batch index was built with, no vocab probe and no state —
    * then a stream-static equi-join on (b, band_key) pulls only the
    * postings matching an arriving key (per-batch cost O(arrivals +
    * matching postings), never O(corpus)). Matched pairs dedup within
    * the watermark — a pair colliding in several bands (or
    * re-delivered inside the lateness window) counts ONCE, matching
    * the batch matrix's distinct-pairs contract — then one windowed
    * aggregation counts per (window, src_lo, src_hi). Both stateful
    * ops (pair dedup, windowed count) hold watermark-bounded state.
    * `hot` flags a cell whose count exceeds `alertPpm` ppm of
    * `expectedPerWindow` (calibrated from the batch matrix), the same
    * threshold contract as
    * [[graft.streaming.VectorStreamOps.streamingListLoads]].
    *
    * HONEST semantics vs the batch matrix:
    *  - covers NEW x INDEXED pairs only. New x new pairs need a
    *    stream-stream self-join whose buffered-band state the monitor
    *    doesn't need — they surface when the periodic batch append
    *    refreshes the index and the next audit runs the exact matrix.
    *  - a pair re-discovered AFTER the watermark passed it recounts
    *    (state is bounded by `lateness`, not history). The sink-table
    *    batch matrix stays the exact dashboard; this is the tripwire.
    *  - cross-matrix totals (`share_ppm`) stay a batch concern — a
    *    second cross-cell aggregation would double the state for a
    *    number the budget decision reads off-line anyway (the
    *    [[graft.streaming.VectorStreamOps.streamingListLoads]]
    *    argument).
    */
  def streamingSourceOverlap(docs: DataFrame, indexedBands: DataFrame,
                             indexSources: DataFrame,
                             expectedPerWindow: Long,
                             alertPpm: Long = 200000L,
                             numHashes: Int = 16, bands: Int = 4,
                             window_ : String = "10 minutes",
                             lateness: String = "10 minutes",
                             idCol: String = "doc_id",
                             textCol: String = "text",
                             srcCol: String = "source",
                             tsCol: String = "ts"): DataFrame = {
    require(bands >= 1 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    require(expectedPerWindow > 0, "expectedPerWindow must be > 0")
    // static side: postings labeled with their source ONCE per plan —
    // a skinny (doc, b, key, source) index, re-read each micro-batch
    // (lake compactions/appends picked up without a restart)
    val idx = indexedBands
      .select(col(idCol).as("doc_o_"), col("b"), col("band_key"))
      .join(indexSources
        .select(col(idCol).as("doc_o_"), col(srcCol).as("source_o_")),
        Seq("doc_o_"))
    // stream side: signature -> band keys, stateless (empty vocab =
    // on-the-fly hashing, bit-identical to the batch signature).
    // The watermark is declared HERE, before the join: an arrival that
    // matches no posting still advances event time — declared after
    // the join, a quiet (no-collision) stretch would freeze the
    // watermark and no window would ever close
    val keyed = docs
      .withWatermark(tsCol, lateness)
      .select(col(tsCol), col(idCol).as("doc_id"), col(srcCol).as("source"),
        posexplode(graft.ops.Dedup.bandKeyArray(
          graft.functions.MinHashHex(
            graft.ops.Dedup.tokenSet(col(textCol)), numHashes,
            Array.empty[String]),
          numHashes, bands)).as(Seq("bp", "band_key")))
      .select(col(tsCol), col("doc_id"), col("source"),
        (col("bp") + 1).as("b"), col("band_key"))
    keyed.join(idx,
        keyed("band_key") === idx("band_key") && keyed("b") === idx("b") &&
          col("doc_id") =!= col("doc_o_"))
      .select(col(tsCol),
        least(col("doc_id"), col("doc_o_")).as("doc_a"),
        greatest(col("doc_id"), col("doc_o_")).as("doc_b"),
        least(col("source"), col("source_o_")).as("src_lo"),
        greatest(col("source"), col("source_o_")).as("src_hi"))
      .dropDuplicatesWithinWatermark(Seq("doc_a", "doc_b"))
      .groupBy(window(col(tsCol), window_), col("src_lo"), col("src_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("hot",
        col("n_pairs") * 1000000L > lit(alertPpm) * lit(expectedPerWindow))
  }

  /** LIVE DSIR scorer — the streaming twin of
    * [[graft.ops.TextStats.importanceWeights]]: every arriving
    * document gains (n_grams, sum_lrq, logw) against a FROZEN
    * log-ratio table ([[graft.ops.TextStats.importanceRatioTable]],
    * trained batch-side on raw vs target corpora). The score is a
    * PURE stateless projection — the B-entry table rides the plan as
    * a literal, so there is no join, no shuffle, and no state: the
    * ingest gate a pipeline puts in front of its lake ("is this crawl
    * batch drifting off-target?") at per-row cost. Scores are
    * bit-identical to the batch scorer for any doc the batch path
    * covers (shared gram/bucket/quantization definitions).
    */
  def streamingImportanceWeights(docs: DataFrame, ratioTable: Array[Long],
                                 textCol: String = "text"): DataFrame =
    docs.select(docs.columns.toIndexedSeq.map(col) ++
      graft.ops.TextStats.importanceScoreColumns(ratioTable, textCol): _*)

  /** Windowed importance-drift monitor over the live scores: per
    * (tumbling window, source), the doc count and mean log importance
    * weight, flagged `off_target` below a calibrated floor — the
    * tripwire that catches a source's content drifting away from the
    * target distribution within a window of it happening, rather than
    * at the next batch re-score. ONE stateful operator (the windowed
    * aggregation; scoring itself is stateless), state bounded by the
    * lateness window; the mean is exact-integer `sum_lrq` arithmetic
    * with one final division, the usual order-free discipline.
    * Gram-less docs are excluded (they carry no evidence either way).
    */
  def streamingImportanceDrift(docs: DataFrame, ratioTable: Array[Long],
                               minLogw: Double,
                               window_ : String = "10 minutes",
                               lateness: String = "10 minutes",
                               textCol: String = "text",
                               srcCol: String = "source",
                               tsCol: String = "ts"): DataFrame =
    streamingImportanceWeights(
        docs.withWatermark(tsCol, lateness), ratioTable, textCol)
      .filter(col("n_grams") > 0)
      .groupBy(window(col(tsCol), window_), col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("sum_lrq")).as("tot_lrq"))
      .withColumn("mean_logw",
        col("tot_lrq").cast("double") / col("n_docs") / 10000)
      .withColumn("off_target", col("mean_logw") < minLogw)

  /** Stream-stream interval attribution: join a purchase stream to a
    * click/view stream of the same user within a bounded look-back
    * window — the streaming counterpart of
    * [[graft.ops.TemporalJoins.asOfJoin]]. The time-range predicate
    * (`src_ts` in `[ts - lookback, ts]`) plus watermarks on BOTH sides
    * is what makes unbounded stream-stream joins feasible: each side's
    * buffered state is evicted once the other side's watermark passes
    * the interval, so state is bounded by lookback + lateness, never by
    * stream length. Left-outer keeps unattributed purchases (null
    * source columns) once the watermark proves no match can arrive.
    *
    * Emits one row per (purchase, qualifying source) — the exact
    * "latest only" pick needs a downstream per-purchase max, which the
    * bounded interval keeps small; at 100 TB/day the join itself is the
    * scale problem and this shape keeps it keyed, watermarked, and
    * state-bounded.
    */
  def streamingAttribution(purchases: DataFrame, sources: DataFrame,
                           lookback: String = "10 minutes",
                           lateness: String = "5 minutes"): DataFrame = {
    val p = purchases
      .withWatermark("ts", lateness)
      .select(col("user_id"), col("event_id"), col("ts"))
    val s = sources
      .withWatermark("src_ts", lateness)
      .select(col("user_id").as("src_user"), col("event_id").as("src_id"),
        col("src_ts"))
    p.join(s,
      col("user_id") === col("src_user") &&
        col("src_ts") >= col("ts") - expr(s"INTERVAL $lookback") &&
        col("src_ts") <= col("ts"),
      "leftOuter")
      .select("user_id", "event_id", "ts", "src_id", "src_ts")
  }

  /** Streaming twin of [[graft.core.Ivm.viewDelta]]: the change-event
    * stream folds into a RUNNING net view delta per key — one stateful
    * aggregation in Update mode, each emission the key's latest
    * cumulative (d_sum, d_n) for the sink's MERGE to apply over the
    * stored base view. Unlike the batch form, net-zero rows are NOT
    * suppressed: in a stream, a delta returning to zero must still
    * reach the merger so it can restore the base row (the previous
    * nonzero emission is already applied downstream). State per key is
    * two numbers — bounded by live key cardinality, not stream length.
    */
  def streamingViewDelta(events: DataFrame, groupKey: String,
                         valueCol: String,
                         valueType: String = "decimal(12,2)"): DataFrame =
    graft.core.Ivm.signedDeltas(events, groupKey, valueCol, valueType)
      .groupBy(col("k").as(groupKey))
      .agg(sum(col("dv")).as("d_sum"), sum(col("dn")).as("d_n"))

  /** Streaming per-key latest-state view (the CDC "current state"
    * materialization as a stream): groupBy key + max_by(audit_pk),
    * output mode Update/Complete. One stateful aggregation, partition
    * by key.
    */
  def latestStateStream(audit: DataFrame, keys: Seq[String],
                        pkCol: String = "audit_pk"): DataFrame = {
    val others = audit.schema.fieldNames.filterNot(keys.contains)
    audit.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.toIndexedSeq.map(col): _*), col(pkCol)).as("__row"))
      .select(keys.map(col) ++ others.map(c => col(s"__row.$c")): _*)
  }

  /** Tombstone ingest gate — the PREVENTION half of the erasure story
    * ([[graft.ops.Profile.erasureAudit]] is the detection half): once
    * an id is on the deletion list, a late crawl re-fetch, an
    * upstream replay, or a stale shard must not quietly re-introduce
    * it. Every arriving doc checks the STATIC tombstone list; matches
    * flow to a quarantine sink with `tombstoned = true` instead of
    * vanishing, because a re-appearing deleted id is itself a
    * compliance signal someone needs to see (who is still serving
    * data that was ordered deleted?).
    *
    * Stateless stream-static join (no watermark, no state store), the
    * tombstone side reduced to distinct ids — broadcast when it fits,
    * Bloom pre-screen at extreme list sizes. A plain file-backed
    * DataFrame snapshots its file LISTING at query start, so a grown
    * list needs either a transactional table format on the static
    * side (which re-lists per batch) or the `foreachBatch` form that
    * re-reads the path each batch — the gate itself is stateless, so
    * both compose with it unchanged; the spec pins the foreachBatch
    * growth path. Live == batch is structural: the same anti-join defines
    * the audit's scrubbed artifacts.
    */
  case class PbEv(key: String, day: Long, bucket: Long, n: Long)
  case class PsState(lastDay: Long, counts: Seq[Long])
  case class PsOut(key: String, day: Long, nDay: Long, psiE4: Long,
                   verdict: String)

  /** Live PSI drift monitor — the streaming companion of
    * [[graft.queries.ExtensionQueries.psi]] with the production
    * contract the batch form cannot have: the batch score compares
    * the two HALVES of a recorded span, the live monitor scores each
    * CLOSED day against an OFFLINE-CALIBRATED reference histogram
    * (`refPpm`, the 10 smoothed per-bucket ppm the batch job's
    * reference half emits) — the same calibrate-offline/apply-online
    * split as the live CUSUM's fixed target. Feed: per-(key, day,
    * bucket) rollup counts, each cell at most once, bucket rows of
    * one day free to arrive across batches; a day EMITS when a
    * strictly later day first arrives for the key (the day-close
    * contract), so partially-arrived histograms are never scored.
    * Silent days synthesize the all-zero histogram, whose smoothed
    * q reads 1e6 per bucket — a dead feed scores as maximal drift,
    * loudly, exactly like the batch formula would. State per key:
    * last day + ten counts. The per-bucket contribution mirrors the
    * batch expression bit-for-bit: `(p − q)·floor(ln(p/q)·1e4)`,
    * every term ≥ 0, integer sum, `div 1e6` rescale, same
    * 0.1/0.2 verdict bands.
    */
  def streamingPsi(rows: Dataset[PbEv], refPpm: Seq[Long]): Dataset[PsOut] = {
    require(refPpm.size == 10 && refPpm.forall(_ > 0),
      s"refPpm must be 10 positive smoothed ppm values, got $refPpm")
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[PsState, PsOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[PbEv], state: GroupState[PsState]) =>
          var st = state.getOption.getOrElse(
            PsState(Long.MinValue, Seq.fill(10)(0L)))
          val out = scala.collection.mutable.ArrayBuffer.empty[PsOut]
          def close(day: Long, counts: Seq[Long]): Unit = {
            val nCur = counts.sum
            val tot = (0 until 10).map { b =>
              val p = refPpm(b)
              val q = math.max(counts(b), 1L) * 1000000L /
                math.max(nCur, 1L)
              (p - q) *
                math.floor(math.log(p.toDouble / q) * 10000d).toLong
            }.sum
            val psi = tot / 1000000L
            val verdict = if (psi < 1000L) "stable"
              else if (psi < 2000L) "minor_shift" else "shifted"
            out += PsOut(key, day, nCur, psi, verdict)
          }
          def add(counts: Seq[Long], bucket: Long, n: Long): Seq[Long] = {
            val b = math.min(math.max(bucket, 0L), 9L).toInt
            counts.updated(b, counts(b) + n)
          }
          evs.toSeq.sortBy(e => (e.day, e.bucket)).foreach { e =>
            if (st.lastDay == Long.MinValue)
              st = PsState(e.day, add(Seq.fill(10)(0L), e.bucket, e.n))
            else if (e.day == st.lastDay)
              st = st.copy(counts = add(st.counts, e.bucket, e.n))
            else if (e.day > st.lastDay) {
              close(st.lastDay, st.counts)
              var d = st.lastDay + 1
              while (d < e.day) { close(d, Seq.fill(10)(0L)); d += 1 }
              st = PsState(e.day, add(Seq.fill(10)(0L), e.bucket, e.n))
            } // e.day < lastDay: late day — append-only contract
          }
          state.update(st)
          out.iterator
      }
  }

  case class CaEv(key: String, day: Long, n: Long, h: Long)
  case class CaState(dmin: Long, lastDay: Long, nn: Long, hh: Long,
                     swh: Long, swn: Long, snw2: Long)
  case class CaOut(key: String, day: Long, nTotal: Long, hits: Long,
                   z2Milli: Long, direction: String, significant: Boolean)

  /** Live Cochran–Armitage rate-trend monitor — the streaming twin of
    * [[graft.queries.ExtensionQueries.cochranArmitage]], fed by the
    * per-(key, day) rollup (events and hits). Every CA sufficient
    * statistic is a running sum over day scores anchored at the
    * key's FIRST day, so state is SEVEN longs and silent days are a
    * genuine no-op (n = 0 contributes zero to every sum — the one
    * chart in the family where zero-fill synthesizes nothing).
    * After any batch the emitted verdict equals the batch operator's
    * over the same prefix (spec-pinned). Long envelope: `swh/snw2`
    * grow as day-span²·volume — the same documented bound class as
    * the batch form's DECIMAL narration, hit only past ~9e18.
    */
  def streamingCochranArmitage(days: Dataset[CaEv]): Dataset[CaOut] = {
    import days.sparkSession.implicits._
    days
      .groupByKey(_.key)
      .flatMapGroupsWithState[CaState, CaOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[CaEv], state: GroupState[CaState]) =>
          var st = state.getOption.getOrElse(
            CaState(Long.MinValue, Long.MinValue, 0L, 0L, 0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[CaOut]
          def emit(day: Long): Unit = {
            val tnum = BigInt(st.nn) * st.swh - BigInt(st.hh) * st.swn
            val den = BigInt(st.hh) * (st.nn - st.hh) *
              (BigInt(st.nn) * st.snw2 - BigInt(st.swn) * st.swn)
            val z2 =
              if (den <= 0) 0L
              else (tnum * tnum * st.nn * 1000 / den).toLong
            val dir = if (tnum > 0) "up"
              else if (tnum < 0) "down" else "flat"
            out += CaOut(key, day, st.nn, st.hh, z2, dir, z2 > 3841L)
          }
          evs.toSeq.sortBy(_.day).foreach { e =>
            if (st.lastDay == Long.MinValue) {
              st = CaState(e.day, e.day, e.n, e.h, 0L, 0L, 0L)
              emit(e.day)
            } else if (e.day > st.lastDay) {
              val w = e.day - st.dmin
              st = CaState(st.dmin, e.day, st.nn + e.n, st.hh + e.h,
                st.swh + w * e.h, st.swn + w * e.n,
                st.snw2 + w * w * e.n)
              emit(e.day)
            } // duplicate/late day: append-only contract
          }
          state.update(st)
          out.iterator
      }
  }

  case class MhEv(key: String, day: Long, ga: Long, n: Long, h: Long)
  case class MhState(lastDay: Long, ca: Long, cbm: Long, cc: Long,
                     cdm: Long, nStrata: Long, numE6: Long, denE6: Long,
                     ha: Long, ma: Long, hb: Long, mb: Long)
  case class MhOut(key: String, day: Long, nStrata: Long,
                   crudeOrMilli: Long, mhOrMilli: Long,
                   confounded: Boolean)

  /** Live Mantel–Haenszel — the streaming Simpson's-paradox guard,
    * twin of [[graft.queries.ExtensionQueries.mantelHaenszel]] with
    * days as strata. A stratum's e-6 term needs its COMPLETE 2×2
    * table, so the feed contract is [[streamingPsi]]'s day-close: per
    * (key, day, arm) rollup cells accumulate in state (four longs),
    * the day folds into the running `Σaᵢdᵢ·1e6/nᵢ / Σbᵢcᵢ·1e6/nᵢ`
    * when a strictly later day first arrives, and each close emits
    * the updated crude vs MH verdict. Empty strata cannot exist by
    * construction (a day closes only because SOME row arrived in a
    * later day; a day with no rows at all is simply not a stratum —
    * exactly the batch grouping's semantics). State: twelve longs.
    */
  def streamingMantelHaenszel(rows: Dataset[MhEv]): Dataset[MhOut] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[MhState, MhOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[MhEv], state: GroupState[MhState]) =>
          var st = state.getOption.getOrElse(
            MhState(Long.MinValue, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
              0L, 0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[MhOut]
          def closeDay(day: Long): Unit = {
            val n = st.ca + st.cbm + st.cc + st.cdm
            if (n > 0) {
              val num = st.numE6 +
                (BigInt(st.ca) * st.cdm * 1000000 / n).toLong
              val den = st.denE6 +
                (BigInt(st.cbm) * st.cc * 1000000 / n).toLong
              st = st.copy(ca = 0L, cbm = 0L, cc = 0L, cdm = 0L,
                nStrata = st.nStrata + 1, numE6 = num, denE6 = den)
              val crude = (BigInt(st.ha) * st.mb * 1000 /
                (BigInt(st.ma) * st.hb).max(BigInt(1))).toLong
              val mh = st.numE6 * 1000 / math.max(st.denE6, 1L)
              val conf = math.abs(crude - mh) * 1000 /
                math.max(mh, 1L) > 100
              out += MhOut(key, day, st.nStrata, crude, mh, conf)
            }
          }
          evs.toSeq.sortBy(e => (e.day, e.ga)).foreach { e =>
            if (st.lastDay != Long.MinValue && e.day > st.lastDay)
              closeDay(st.lastDay)
            if (st.lastDay == Long.MinValue || e.day >= st.lastDay) {
              st = st.copy(lastDay = e.day,
                ca = st.ca + (if (e.ga == 1L) e.h else 0L),
                cbm = st.cbm + (if (e.ga == 1L) e.n - e.h else 0L),
                cc = st.cc + (if (e.ga == 0L) e.h else 0L),
                cdm = st.cdm + (if (e.ga == 0L) e.n - e.h else 0L),
                ha = st.ha + (if (e.ga == 1L) e.h else 0L),
                ma = st.ma + (if (e.ga == 1L) e.n - e.h else 0L),
                hb = st.hb + (if (e.ga == 0L) e.h else 0L),
                mb = st.mb + (if (e.ga == 0L) e.n - e.h else 0L))
            } // e.day < lastDay: late stratum row — append-only contract
          }
          state.update(st)
          out.iterator
      }
  }

  def tombstoneGate(docs: DataFrame, tombstones: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    require(!docs.columns.contains("__tomb") &&
      !docs.columns.contains("tombstoned"),
      "column names __tomb/tombstoned are reserved by tombstoneGate — rename first")
    val del = tombstones.select(col(idCol)).distinct()
      .withColumn("__tomb", lit(1))
    docs.join(del, Seq(idCol), "left")
      .withColumn("tombstoned", col("__tomb").isNotNull)
      .drop("__tomb")
  }
}
