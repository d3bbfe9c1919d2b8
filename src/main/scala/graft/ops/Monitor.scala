package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential control-chart operators over per-key daily series —
  * the monitoring layer a data platform runs over its ingest volumes
  * (is a source drifting? did a crawl break on Tuesday?). Spark has
  * no recursive window, so the classic recurrences (EWMA, CUSUM)
  * are computed as an ARRAY FOLD per key: the daily series is gap-
  * filled to the key's [first, last] span (zero-filled silent days —
  * a control chart that skips silent days misses exactly the
  * failures it exists to catch), collected day-ordered (bounded by
  * span length, not event count), and one `aggregate` higher-order
  * function carries the recurrence — exact integer milli arithmetic,
  * so a recursive-CTE SQL mirror lands on identical values and the
  * hash gate holds.
  *
  * At 100 TB: the heavy lift is the partial-agged daily count; the
  * per-key array is days-of-span entries (≤ a few thousand for years
  * of data) and keys parallelize horizontally. No global window, no
  * driver loop.
  */
object Monitor {

  private val DayUs = 86400000000L

  /** Per-key daily counts on the key's dense [first, last] day grid,
    * silent days zero-filled. One key-partitioned exchange feeds the
    * day agg, span agg, and grid join.
    */
  private[graft] def dailyGrid(events: DataFrame, keyCol: String,
                               tsUs: Column): DataFrame = {
    val byDay = events
      .select(col(keyCol).as("key"),
        floor(tsUs / lit(DayUs)).cast("long").as("day"))
      .groupBy("key", "day").agg(count(lit(1)).as("n"))
    val spans = byDay.groupBy("key")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    spans
      .select(col("key"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(byDay, Seq("key", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** EWMA control chart (Roberts, Technometrics 1959): per key and
    * day, the exponentially weighted moving average of daily volume
    * in exact milli-units — `ewma_t = (α·x_t·1000 + (1−α)·ewma_{t−1})
    * div 1000`, seeded at the first day's value — plus the signed
    * deviation of the day from the PRIOR day's baseline in ppm
    * (`(x·1000 − ewma_{t−1}) · 1e6 div max(ewma_{t−1}, 1)`: a spike
    * is judged against what the chart expected BEFORE seeing it) and
    * the classic ±limit flag. `alphaMilli` is α·1000 (300 = the
    * textbook 0.3); `limitPpm` flags |deviation| above it.
    */
  def ewmaDaily(events: DataFrame, keyCol: String, tsUs: Column,
                alphaMilli: Int = 300,
                limitPpm: Long = 500000L): DataFrame = {
    require(alphaMilli > 0 && alphaMilli <= 1000,
      s"alphaMilli must be in (0, 1000], got $alphaMilli")
    val a = alphaMilli
    val grid = dailyGrid(events, keyCol, tsUs)
    val series = grid.groupBy("key")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("dn"))
    // fold: acc is the trajectory built so far; each step reads the
    // previous element's ewma. Seed = first day at its own value.
    val fold = series.withColumn("traj", expr(
      s"""aggregate(
         |  slice(dn, 2, greatest(size(dn) - 1, 0)),
         |  array(named_struct(
         |    'day', dn[0].day, 'n', dn[0].n,
         |    'prev_milli', dn[0].n * 1000L,
         |    'ewma_milli', dn[0].n * 1000L)),
         |  (acc, x) -> acc || array(named_struct(
         |    'day', x.day, 'n', x.n,
         |    'prev_milli', element_at(acc, size(acc)).ewma_milli,
         |    'ewma_milli', ($a * x.n * 1000L +
         |      ${1000 - a} * element_at(acc, size(acc)).ewma_milli)
         |      div 1000)))""".stripMargin))
    fold.select(col("key"), explode(col("traj")).as("t"))
      .select(col("key"), col("t.day").as("day"), col("t.n").as("n"),
        col("t.ewma_milli").as("ewma_milli"),
        // ppm cross-multiplication through DECIMAL(38,0) — the ×1e6
        // in BIGINT would wrap past ~9.2e9 events/day per key
        expr("CAST(CAST(t.n * 1000L - t.prev_milli AS DECIMAL(38,0))" +
          " * 1000000 div greatest(t.prev_milli, 1L) AS BIGINT)")
          .as("dev_ppm"))
      .withColumn("flagged", abs(col("dev_ppm")) > lit(limitPpm))
  }

  /** Holt linear-trend smoothing (Holt 1957 / Winters 1960 without
    * the seasonal term): per key and day, exact-milli level and trend
    * —
    *   `l_t = (α·x_t·1000 + (1−α)·(l_{t−1} + b_{t−1})) div 1000`
    *   `b_t = (β·(l_t − l_{t−1}) + (1−β)·b_{t−1}) div 1000`
    * — seeded at (first day's value, 0), plus the one-step-ahead
    * forecast `l + b` a capacity planner actually consumes (the
    * EWMA tracks level only and lags any sustained ramp by
    * construction; the trend term is what removes that lag). Whether
    * this beats seasonal-naive is exactly what the MASE readout
    * measures. Same span-bounded array fold + recursive-CTE oracle
    * pairing as the rest of the sequential family; same documented
    * Long bound (~9.2e9 events/day/key) as the EWMA.
    */
  def holtDaily(events: DataFrame, keyCol: String, tsUs: Column,
                alphaMilli: Int = 300, betaMilli: Int = 100): DataFrame = {
    require(alphaMilli > 0 && alphaMilli <= 1000,
      s"alphaMilli must be in (0, 1000], got $alphaMilli")
    require(betaMilli > 0 && betaMilli <= 1000,
      s"betaMilli must be in (0, 1000], got $betaMilli")
    val a = alphaMilli; val b = betaMilli
    val grid = dailyGrid(events, keyCol, tsUs)
    val series = grid.groupBy("key")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("dn"))
    // the lambda has no let-binding, so the new level expression is
    // inlined twice (level, then inside trend) — identical integer
    // expression, identical value, exactly what the CTE oracle steps
    val newLevel =
      s"""(($a * x.n * 1000L +
         |  ${1000 - a} * (element_at(acc, size(acc)).level_milli +
         |    element_at(acc, size(acc)).trend_milli)) div 1000)""".stripMargin
    val fold = series.withColumn("traj", expr(
      s"""aggregate(
         |  slice(dn, 2, greatest(size(dn) - 1, 0)),
         |  array(named_struct(
         |    'day', dn[0].day, 'n', dn[0].n,
         |    'level_milli', dn[0].n * 1000L,
         |    'trend_milli', 0L)),
         |  (acc, x) -> acc || array(named_struct(
         |    'day', x.day, 'n', x.n,
         |    'level_milli', $newLevel,
         |    'trend_milli', ($b * ($newLevel -
         |        element_at(acc, size(acc)).level_milli) +
         |      ${1000 - b} * element_at(acc, size(acc)).trend_milli)
         |      div 1000)))""".stripMargin))
    fold.select(col("key"), explode(col("traj")).as("t"))
      .select(col("key"), col("t.day").as("day"), col("t.n").as("n"),
        col("t.level_milli").as("level_milli"),
        col("t.trend_milli").as("trend_milli"))
      .withColumn("forecast_milli", col("level_milli") + col("trend_milli"))
  }

  /** Holt–Winters additive seasonal smoothing (Winters, Mgmt. Sci.
    * 1960; the full triple of which [[holtDaily]] is the de-seasoned
    * half): per key and day, exact-milli level + trend + a 7-slot
    * weekly seasonal, with the one-step-ahead forecast
    * `l + b + s_{t−7}` — the smoother that stops flagging every
    * weekend as an anomaly. The seasonal state is carried as a FIFO
    * list (head = the component about to be consumed, 7 days old),
    * so NO index arithmetic exists to drift between engines: read
    * `s[1]`, emit, push the refreshed value at the tail —
    *   `l_t = (α·(x_t·1000 − s_head) + (1−α)·(l+b)) div 1000`
    *   `b_t = (β·(l_t − l_{t−1}) + (1−β)·b) div 1000`
    *   `s'  = (γ·(x_t·1000 − l_t) + (1−γ)·s_head) div 1000`
    * Initialization is the textbook simple start: week 1's mean is
    * the level, zero trend, week 1's deviations the seasonal; output
    * starts at day 8 (keys with ≤ 7 observed days emit nothing, on
    * both engines by construction). Same span-bounded array fold +
    * recursive-CTE oracle pairing and the same documented Long bound
    * as the rest of the sequential family.
    */
  def holtWintersDaily(events: DataFrame, keyCol: String, tsUs: Column,
                       alphaMilli: Int = 300, betaMilli: Int = 100,
                       gammaMilli: Int = 200): DataFrame = {
    require(alphaMilli > 0 && alphaMilli <= 1000,
      s"alphaMilli must be in (0, 1000], got $alphaMilli")
    require(betaMilli > 0 && betaMilli <= 1000,
      s"betaMilli must be in (0, 1000], got $betaMilli")
    require(gammaMilli > 0 && gammaMilli <= 1000,
      s"gammaMilli must be in (0, 1000], got $gammaMilli")
    val a = alphaMilli; val b = betaMilli; val g = gammaMilli
    val grid = dailyGrid(events, keyCol, tsUs)
    val series = grid.groupBy("key")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("dn"))
      .withColumn("l0",
        expr("aggregate(slice(dn, 1, 7), 0L, (p, x) -> p + x.n)" +
          " * 1000 div 7"))
      .withColumn("s0", expr("transform(slice(dn, 1, 7)," +
        " x -> x.n * 1000L - l0)"))
    // no let-binding in the lambda: the new level (and inside the
    // seasonal, again) is inlined — identical integer expression,
    // identical value, the holtDaily/CTE-oracle discipline
    val newLvl =
      s"""(($a * (x.n * 1000L - element_at(acc.s, 1)) +
         |  ${1000 - a} * (acc.lvl + acc.b)) div 1000)""".stripMargin
    val newTrend =
      s"""(($b * ($newLvl - acc.lvl) + ${1000 - b} * acc.b) div 1000)"""
    val newSeas =
      s"""(($g * (x.n * 1000L - $newLvl) +
         |  ${1000 - g} * element_at(acc.s, 1)) div 1000)""".stripMargin
    val fold = series.withColumn("emit", expr(
      s"""aggregate(
         |  slice(dn, 8, greatest(size(dn) - 7, 0)),
         |  named_struct('lvl', l0, 'b', 0L, 's', s0,
         |    'emit', CAST(array() AS ARRAY<STRUCT<day: BIGINT,
         |      n: BIGINT, forecast_milli: BIGINT, level_milli: BIGINT,
         |      trend_milli: BIGINT, seas_milli: BIGINT>>)),
         |  (acc, x) -> named_struct(
         |    'lvl', $newLvl,
         |    'b', $newTrend,
         |    's', slice(acc.s, 2, 6) || array($newSeas),
         |    'emit', acc.emit || array(named_struct(
         |      'day', x.day, 'n', x.n,
         |      'forecast_milli', acc.lvl + acc.b + element_at(acc.s, 1),
         |      'level_milli', $newLvl,
         |      'trend_milli', $newTrend,
         |      'seas_milli', $newSeas)))).emit""".stripMargin))
    fold.select(col("key"), explode(col("emit")).as("t"))
      .select(col("key"), col("t.day").as("day"), col("t.n").as("n"),
        col("t.forecast_milli").as("forecast_milli"),
        col("t.level_milli").as("level_milli"),
        col("t.trend_milli").as("trend_milli"),
        col("t.seas_milli").as("seas_milli"))
  }

  /** Ingest backlog under finite capacity — Lindley's recursion
    * (Lindley 1952): `backlog_t = max(0, backlog_{t−1} + arrivals_t −
    * capacity)` with capacity provisioned at `capPctOfMean`% of the
    * key's own mean daily volume. The drain-or-diverge answer to the
    * question the control charts raise; same span-bounded fold.
    */
  def backlogDaily(events: DataFrame, keyCol: String, tsUs: Column,
                   capPctOfMean: Int = 120): DataFrame = {
    require(capPctOfMean >= 1, s"capPctOfMean must be >= 1, got $capPctOfMean")
    val grid = dailyGrid(events, keyCol, tsUs)
    val series = grid.groupBy("key")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("dn"),
        expr(s"sum(n) * ${capPctOfMean * 10} div count(1)").as("cap_milli"))
    val fold = series.withColumn("traj", expr(
      """aggregate(
        |  slice(dn, 2, greatest(size(dn) - 1, 0)),
        |  array(named_struct(
        |    'day', dn[0].day, 'n', dn[0].n,
        |    'backlog_milli', greatest(0L, dn[0].n * 1000L - cap_milli))),
        |  (acc, x) -> acc || array(named_struct(
        |    'day', x.day, 'n', x.n,
        |    'backlog_milli', greatest(0L,
        |      element_at(acc, size(acc)).backlog_milli
        |        + x.n * 1000L - cap_milli))))""".stripMargin))
    fold.select(col("key"), col("cap_milli"), explode(col("traj")).as("t"))
      .select(col("key"), col("t.day").as("day"), col("t.n").as("n"),
        col("cap_milli"),
        col("t.backlog_milli").as("backlog_milli"),
        (col("t.backlog_milli") === 0L).as("drained"))
  }

  /** Two-sided Page–Hinkley drift detector (Page, Biometrika 1954;
    * Hinkley, Biometrika 1971 — the sequential test Gama et al.'s
    * stream-mining survey made the standard concept-drift detector):
    * per key and day, the cumulated deviation of daily volume from
    * the RUNNING mean,
    * `m_t = m_{t−1} + x_t·1000 − mean_t − δ` (increase side, with
    * `mean_t = cum_t·1000 div t` the running mean INCLUDING x_t) and
    * its mirror for the decrease side, each tested against its own
    * historical minimum: `PH_t = m_t − min_{0≤s≤t} m_s`, alarm when
    * `PH > λ`. Where CUSUM accumulates deviation from a FIXED target
    * (and so re-alarms forever after a permanent level change), the
    * running-mean anchor here ADAPTS — the detector flags the
    * transition and then re-calms as the mean absorbs the new level,
    * which is exactly the behavior wanted for "the crawl changed,
    * acknowledge once". Slack δ = target/20 and alarm λ =
    * `hTargets`·target are self-calibrated off the key's full-span
    * mean like [[cusumDaily]]'s target. Exact longs throughout: the
    * only division is the running mean (non-negative over a positive
    * count), so a recursive-CTE oracle lands on identical values.
    * Same span-bounded fold + Long bound (~9.2e9 events/day/key) as
    * the rest of the family.
    */
  def pageHinkleyDaily(events: DataFrame, keyCol: String, tsUs: Column,
                       hTargets: Int = 4): DataFrame = {
    require(hTargets >= 1, s"hTargets must be >= 1, got $hTargets")
    val grid = dailyGrid(events, keyCol, tsUs)
    val series = grid.groupBy("key")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("dn"),
        expr("sum(n) * 1000 div count(1)").as("target_milli"))
      .withColumn("delta_milli", expr("target_milli div 20"))
      .withColumn("lambda_milli", expr(s"target_milli * $hTargets"))
    // the lambda has no let-binding, so the step's running mean
    // (cum'·1000 div i') is inlined wherever needed — identical
    // integer expression, identical value, the Holt precedent
    val mean =
      "((element_at(acc, size(acc)).cum + x.n) * 1000L" +
        " div (element_at(acc, size(acc)).i + 1L))"
    val mu = s"(element_at(acc, size(acc)).mu + x.n * 1000L - $mean" +
      " - delta_milli)"
    val md = s"(element_at(acc, size(acc)).md + $mean - x.n * 1000L" +
      " - delta_milli)"
    val fold = series.withColumn("traj", expr(
      s"""aggregate(
         |  slice(dn, 2, greatest(size(dn) - 1, 0)),
         |  array(named_struct(
         |    'day', dn[0].day, 'n', dn[0].n, 'i', 1L, 'cum', dn[0].n,
         |    'mu', 0L - delta_milli,
         |    'minu', least(0L, 0L - delta_milli),
         |    'md', 0L - delta_milli,
         |    'mind', least(0L, 0L - delta_milli))),
         |  (acc, x) -> acc || array(named_struct(
         |    'day', x.day, 'n', x.n,
         |    'i', element_at(acc, size(acc)).i + 1L,
         |    'cum', element_at(acc, size(acc)).cum + x.n,
         |    'mu', $mu,
         |    'minu', least(element_at(acc, size(acc)).minu, $mu),
         |    'md', $md,
         |    'mind', least(element_at(acc, size(acc)).mind, $md))))"""
        .stripMargin))
    fold.select(col("key"), col("target_milli"), col("lambda_milli"),
        explode(col("traj")).as("t"))
      .select(col("key"), col("t.day").as("day"), col("t.n").as("n"),
        (col("t.mu") - col("t.minu")).as("ph_up_milli"),
        (col("t.md") - col("t.mind")).as("ph_down_milli"),
        col("lambda_milli"))
      .withColumn("alarm_up", col("ph_up_milli") > col("lambda_milli"))
      .withColumn("alarm_down", col("ph_down_milli") > col("lambda_milli"))
  }

  /** Two-sided CUSUM change-point chart (Page, Biometrika 1954): per
    * key and day the upper/lower cumulative sums of milli-deviations
    * from the key's own mean daily volume,
    * `pos_t = max(0, pos_{t−1} + x_t·1000 − target − slack)` /
    * `neg_t = max(0, neg_{t−1} + target − x_t·1000 − slack)`, with
    * the standard k = target/2 slack and h = `hTargets`·target alarm
    * threshold — the detector that catches a sustained level SHIFT a
    * spike flag misses (each day adds a little evidence; the alarm
    * fires when it accumulates). Target is the key's exact mean in
    * milli (`total·1000 div n_days`), so the chart is self-calibrated
    * per source.
    */
  def cusumDaily(events: DataFrame, keyCol: String, tsUs: Column,
                 hTargets: Int = 4): DataFrame = {
    require(hTargets >= 1, s"hTargets must be >= 1, got $hTargets")
    val grid = dailyGrid(events, keyCol, tsUs)
    val series = grid.groupBy("key")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("dn"),
        expr("sum(n) * 1000 div count(1)").as("target_milli"))
      .withColumn("slack_milli", expr("target_milli div 2"))
      .withColumn("h_milli", expr(s"target_milli * $hTargets"))
    val fold = series.withColumn("traj", expr(
      """aggregate(
        |  slice(dn, 2, greatest(size(dn) - 1, 0)),
        |  array(named_struct(
        |    'day', dn[0].day, 'n', dn[0].n,
        |    'pos_milli', greatest(0L,
        |      dn[0].n * 1000L - target_milli - slack_milli),
        |    'neg_milli', greatest(0L,
        |      target_milli - dn[0].n * 1000L - slack_milli))),
        |  (acc, x) -> acc || array(named_struct(
        |    'day', x.day, 'n', x.n,
        |    'pos_milli', greatest(0L, element_at(acc, size(acc)).pos_milli
        |      + x.n * 1000L - target_milli - slack_milli),
        |    'neg_milli', greatest(0L, element_at(acc, size(acc)).neg_milli
        |      + target_milli - x.n * 1000L - slack_milli))))""".stripMargin))
    fold.select(col("key"), col("target_milli"), col("h_milli"),
        explode(col("traj")).as("t"))
      .select(col("key"), col("t.day").as("day"), col("t.n").as("n"),
        col("target_milli"),
        col("t.pos_milli").as("pos_milli"), col("t.neg_milli").as("neg_milli"),
        (col("t.pos_milli") > col("h_milli")).as("alarm_up"),
        (col("t.neg_milli") > col("h_milli")).as("alarm_down"))
  }
}
