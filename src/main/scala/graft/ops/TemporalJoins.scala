package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Temporal join operators missing from Spark's built-in surface. */
object TemporalJoins {

  /** Per-key daily gap-fill — the time-series repair that turns an
    * irregular event feed into the dense daily grid a trainer or
    * dashboard consumes: for every key, every day of its [first, last]
    * activity span gets a row; silent days carry `n = 0`, `is_gap =
    * true`, and the FORWARD-FILLED last observed reading (classic
    * sensor/metric gap repair — last-observation-carried-forward).
    *
    * Inputs are pre-projected (key, day, value) rows; `dayStats`
    * aggregates to one row per (key, day) — n events plus the day's
    * LAST reading by (ts, id) order, deterministically tie-broken —
    * then the grid is a per-key `sequence(min_day, max_day)` explode
    * (span-bounded, no calendar table), a LEFT join back, and ONE
    * ordered window per key for the carry-forward
    * (`last(ignoreNulls)` over rows-unbounded-preceding). Everything
    * shuffles ONCE on the key: the day aggregation, the span
    * aggregation, the grid join, and the fill window all share that
    * partitioning. Readings quantize to milli-units before any
    * comparison (the integer-exactness discipline); days are
    * epoch-µs floor-divided — exact for µs < 2^53.
    *
    * At 100 TB: state per key is its day span, the explode is bounded
    * by span length not event count, and no global window exists —
    * keys partition horizontally.
    */
  def gapFillDaily(events: DataFrame, keyCol: String, tsUs: Column,
                   idCol: String, valueCol: String): DataFrame = {
    val dayUs = 86400000000L
    // µs fit in 2^53: the double floor-divide equals integer // on the
    // nonnegative epoch
    val base = events.select(col(keyCol).as("key"),
      floor(tsUs / lit(dayUs)).cast("long").as("day"),
      tsUs.as("_ts"), col(idCol).as("_id"),
      floor(col(valueCol) * 1000).cast("long").as("_q"))
    val dayStats = base.groupBy("key", "day")
      .agg(count(lit(1)).as("n"),
        // the day's last non-null reading, (ts, id)-ordered: struct max
        // compares lexicographically, so the reading rides atomically
        max(when(col("_q").isNotNull,
          struct(col("_ts"), col("_id"), col("_q")))).getField("_q")
          .as("day_last_q"))
    val spans = dayStats.groupBy("key")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = spans
      .select(col("key"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("key").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(dayStats, Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("day_last_q"),
        last(col("day_last_q"), ignoreNulls = true).over(w).as("filled_q"),
        (coalesce(col("n"), lit(0L)) === 0L).as("is_gap"))
  }

  /** As-of join: every left row picks the LATEST right row of the same
    * key whose time is `<=` the left time (or strictly `<` with
    * `strict = true`); left rows with no qualifying right row keep
    * nulls. The classic event-to-state / attribution join.
    *
    * Dataflow, chosen for scale: UNION both sides onto a common time
    * axis, then ONE window pass per key carries the most recent right
    * row forward (`last(struct, ignoreNulls)` — a struct, so the
    * carried columns are atomically from the SAME right row even when
    * some of them are null). That is a single shuffle on the key plus a
    * per-partition sort — cost O((|L|+|R|) log) regardless of how many
    * right rows precede each left row. The naive alternative (theta
    * join on key + time-range, then argmax per left row) materializes
    * every (left, earlier-right) pairing first — quadratic per key and
    * a skew hazard the union form simply does not have.
    *
    * Ordering contract: right rows at the same (key, time) are ranked
    * by `rightTiebreak` ASC, so the LAST one — the carried one — is the
    * tiebreak maximum, matching the oracle's
    * `ORDER BY t DESC, tiebreak DESC LIMIT 1`. Right rows with a null
    * time never match anything and are dropped. With
    * `rightTiebreak = None`, ties rank by the carried `rightCols`
    * struct itself (field-wise, left to right) so the result stays
    * deterministic run-to-run; if any carried column's type is
    * unorderable (contains a map), ties among identical (key, time)
    * right rows are broken arbitrarily — pass an explicit tiebreak
    * there.
    *
    * `keys` must name columns present in BOTH frames; `rightCols` are
    * appended to the left schema and must not collide with left names
    * (rename on the way in).
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               rightTiebreak: Option[String] = None,
               strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asOfJoin needs at least one key column")
    val collisions = rightCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightCols collide with left columns: ${collisions.mkString(",")} — rename first")
    val reserved = Set("_t", "_side", "_tb", "_rv", "_carried")
    val reservedHits = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(reservedHits.isEmpty,
      s"column names ${reservedHits.mkString(",")} are reserved by asOfJoin — rename first")

    // non-strict: rights sort BEFORE lefts at an equal timestamp, so an
    // equal-time right row is visible to the left row; strict flips it
    val (sideRight, sideLeft) = if (strict) (1, 0) else (0, 1)

    val rvType = StructType(rightCols.map(c => right.schema(c)))
    // No caller tiebreak: rank equal-(key, time) right rows by the
    // carried struct itself so which row wins no longer depends on the
    // partition sort's arrival order. Only possible when the struct is
    // orderable (maps are not sortable in Spark).
    // Catalyst's own orderability judgment (AtomicType/struct/array
    // recursion, NullType) — a hand-rolled "not a map" check wrongly
    // admits CalendarIntervalType and friends, turning the previously-
    // running no-tiebreak path into an AnalysisException
    val structTb = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(rvType)
    val tbCol = rightTiebreak
      .map(c => col(c).as("_tb"))
      .getOrElse(
        if (structTb) struct(rightCols.map(col): _*).as("_tb")
        else lit(null).cast("long").as("_tb"))
    val tbNull = rightTiebreak
      .map(c => lit(null).cast(right.schema(c).dataType).as("_tb"))
      .getOrElse(
        if (structTb) lit(null).cast(rvType).as("_tb")
        else lit(null).cast("long").as("_tb"))

    val leftU = left.select(
      left.columns.map(col).toSeq ++ Seq(
        col(leftTime).as("_t"),
        lit(sideLeft).as("_side"),
        tbNull,
        lit(null).cast(rvType).as("_rv")): _*)
    // SQL equi-join semantics: a NULL key matches nothing — without
    // this filter the window's partitionBy would group all null-key
    // rows together and attribute left rows to null-key right rows
    // (diverging from the lateral-join oracle). Null-key LEFT rows
    // keep their row with null matched columns, like a left-outer join.
    val rightU = right
      .filter(col(rightTime).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        left.columns.toSeq.map { c =>
          if (keys.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)
        } ++ Seq(
          col(rightTime).as("_t"),
          lit(sideRight).as("_side"),
          tbCol,
          struct(rightCols.map(col): _*).as("_rv")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftU.unionByName(rightU)
      .withColumn("_carried", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === sideLeft)
      .select(left.columns.map(col).toSeq ++
        rightCols.map(c => col(s"_carried.$c").as(c)): _*)
  }

  /** Hot-key (skew) fallback for the as-of join (both directions):
    * pre-split
    * every key's timeline into fixed-width time buckets and as-of join
    * per (key, bucket) — the "salting" recipe for the one bound the
    * native operator honestly has ([[graft.plans.AsofJoinExec]]
    * clusters on the key, and custom execs are invisible to AQE's
    * OptimizeSkewedJoin, so one key holding 30% of both sides lands
    * 30% of the merge on one task; see SCALING.md "As-of join skew").
    *
    * The salted key is `(key, floor(time / bucketWidth))`, so a hot
    * key's rows spread over its time span. What makes this CORRECT
    * and not just fast is the carry-in: a left row's predecessor may
    * sit in an EARLIER bucket, so for every (key, bucket) the latest
    * right row of any prior bucket is computed — one per-(key, bucket)
    * aggregate (struct-max led by (time, tiebreak): the operator's
    * winner order whenever that pair ranks right rows uniquely — see
    * the inline note on ties) followed by a LOCF window over the per-key BUCKET
    * LIST (rows = buckets touched, not events) — and re-emitted into
    * the bucket as one synthetic right row carrying its original
    * timestamp. Each bucket then sees: its own right rows, plus the
    * one predecessor that can still win — as-of semantics are local to
    * the bucket and the composed [[asOfJoin]] runs on the salted key.
    *
    * Carry-in rows have `t < bucketStart <= leftT`, so both strict
    * and non-strict modes accept them and the boundary cannot double-
    * count (a right row AT the bucket start belongs to the bucket,
    * not the carry). Right-row duplication is bounded at one synthetic
    * row per (key, bucket) — `|R| + keys·buckets` total, the classic
    * salt trade.
    *
    * `direction = "forward"` is the exact mirror: the carry-FORWARD
    * is the earliest right row of any LATER bucket (per-(key, bucket)
    * struct-MIN, then the nearest following non-null over the bucket
    * list), re-emitted into the bucket — its `t >= nextBucketStart >
    * leftT` qualifies under both strictness modes and cannot collide
    * in time with an in-bucket right row (a row AT the next bucket
    * start lives in the next bucket). The local per-bucket join runs
    * through [[asOfJoinNative]] with `direction = "forward"` on the
    * salted key (the salt itself removes the hot-key bound the native
    * exec has, so composing it back is sound); equal-(key, time) ties
    * resolve to the LOWEST tiebreak, the native forward order.
    *
    * `bucketWidth` is in the time column's own units and is workload
    * knowledge, like every salt factor: pick `span / (wanted parallel
    * splits per hot key)`.
    */
  def asOfJoinTimeSplit(left: DataFrame, right: DataFrame,
                        keys: Seq[String],
                        leftTime: String, rightTime: String,
                        rightCols: Seq[String],
                        rightTiebreak: Option[String] = None,
                        strict: Boolean = false,
                        bucketWidth: Long = 86400000000L,
                        direction: String = "backward"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(keys.nonEmpty, "asOfJoinTimeSplit needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    val fwd = direction == "forward"
    val reserved = Set("_bkt", "_last", "_carry")
    val hits = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(hits.isEmpty,
      s"column names ${hits.mkString(",")} are reserved by asOfJoinTimeSplit")

    val bkt = (c: Column) => floor(c / lit(bucketWidth)).cast("long")
    val lb = left.withColumn("_bkt", bkt(col(leftTime)))
    val rb = right
      .filter(col(rightTime).isNotNull && keys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("_bkt", bkt(col(rightTime)))

    // winner order inside a bucket = (time, tiebreak, carried values)
    // ascending max — the operator's ORDER BY t DESC, tiebreak DESC
    // LIMIT 1 pick whenever (time, tiebreak) ranks right rows
    // uniquely (the documented determinism contract). With DUPLICATE
    // (key, time, tiebreak) right rows the operator's pick among the
    // tied rows is arbitrary while this struct-max breaks the tie by
    // carried values — both are valid as-of answers, but they can
    // differ; rely on a unique (time, tiebreak) for bit-parity with
    // the native path. Struct fields get positional aliases because
    // rightCols may legitimately CONTAIN the time or tiebreak column
    // (carrying the source timestamp is the norm).
    val lastStruct = struct(
      Seq(col(rightTime).as("__t")) ++
        rightTiebreak.map(t => col(t).as("__tb")).toSeq ++
        rightCols.zipWithIndex.map { case (c, i) => col(c).as(s"__v$i") }: _*)
    // backward: latest prior candidate (struct-max); forward: earliest
    // following candidate (struct-min) — each the mirror of the
    // operator's own winner order at that direction
    val rLast = rb.groupBy((keys.map(col) :+ col("_bkt")): _*)
      .agg((if (fwd) min(lastStruct) else max(lastStruct)).as("_last"))

    // bucket list per key = buckets either side touches; backward:
    // LOCF over the STRICTLY previous buckets; forward: nearest
    // non-null over the STRICTLY following buckets
    val allBuckets = lb.select((keys.map(col) :+ col("_bkt")): _*).distinct()
      .join(rLast, keys :+ "_bkt", "full_outer")
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(col("_bkt"))
    val carryCol =
      if (fwd) first(col("_last"), ignoreNulls = true)
        .over(wBase.rowsBetween(1, Window.unboundedFollowing))
      else last(col("_last"), ignoreNulls = true)
        .over(wBase.rowsBetween(Window.unboundedPreceding, -1))
    val carry = allBuckets
      .withColumn("_carry", carryCol)
      .filter(col("_carry").isNotNull)

    // synthetic carry-in rows rejoin the real rows under the SAME
    // (name-distinct) column set; original timestamps keep the as-of
    // order exact
    val needed =
      (keys ++ Seq("_bkt", rightTime) ++ rightTiebreak.toSeq ++ rightCols)
        .distinct
    def fromStruct(n: String): Column =
      if (n == rightTime) col("_carry").getField("__t").as(n)
      else if (rightTiebreak.contains(n)) col("_carry").getField("__tb").as(n)
      else col("_carry").getField(s"__v${rightCols.indexOf(n)}").as(n)
    val carryRows = carry.select(
      keys.map(col) ++ Seq(col("_bkt")) ++
        needed.filterNot(n => keys.contains(n) || n == "_bkt")
          .map(fromStruct): _*)
    val realRows = rb.select(needed.map(col): _*)
    val rightAug = realRows.unionByName(carryRows)

    val joined =
      if (fwd) asOfJoinNative(lb, rightAug, keys :+ "_bkt", leftTime,
        rightTime, rightCols, rightTiebreak, strict, direction = "forward")
      else asOfJoin(lb, rightAug, keys :+ "_bkt", leftTime, rightTime,
        rightCols, rightTiebreak, strict)
    joined.drop("_bkt")
  }

  /** [[asOfJoin]] through the native whole-operator path
    * ([[graft.plans.AsofJoinExec]]): same contract, same result,
    * different physics — each side shuffles at its OWN row width
    * (the union form pads both sides to the combined schema) and the
    * per-key carry is a one-candidate merge cursor instead of a
    * `last(struct) ignoreNulls` window frame. See the exec's scaladoc
    * for the plan contract; `AsofJoinNativeSpec` pins result-equivalence
    * against the composed form and the plan shape.
    *
    * Every right-side column the operator consumes is re-aliased to a
    * fresh `__asof_*` attribute before the join node is built, so the
    * two subtrees share no attribute ids even when left and right
    * derive from the SAME source frame (the attribution self-join) —
    * the binary node then binds each side's expressions unambiguously.
    */
  /** Per-key interval UNION coverage (the classic sweep): total
    * length covered by the union of a key's `[lo, hi)` intervals,
    * the span, and the uncovered gap — the dedup answer to "how much
    * time was this user/machine/supplier actually engaged" that a
    * plain `sum(hi − lo)` double-counts whenever intervals overlap.
    * One per-key window over intervals sorted by `(lo, hi)`: each
    * row contributes `max(0, hi − max(lo, prevRunningMaxHi))`; the
    * SUM is order-independent under ties (a set property), so the
    * aggregate is deterministic even though per-row contributions
    * are not. The window buffers one key's INTERVALS (bounded by
    * per-key interval count, not raw event volume — callers with
    * few-huge keys should pre-aggregate or time-split first, the
    * same discipline as every per-key fold here).
    */
  def intervalCoverage(df: DataFrame, keyCol: String,
                       loCol: String, hiCol: String): DataFrame = {
    val W = Window.partitionBy(keyCol).orderBy(col(loCol), col(hiCol))
    df.select(col(keyCol), col(loCol), col(hiCol))
      .withColumn("_prev_hi",
        max(col(hiCol)).over(W.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_cov", greatest(
        col(hiCol) - greatest(col(loCol),
          coalesce(col("_prev_hi"), col(loCol))), lit(0L)))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("_cov")).as("covered"),
        (max(col(hiCol)) - min(col(loCol))).as("span"))
      .withColumn("gap", col("span") - col("covered"))
  }

  /** [[asOfJoinNative]] with a match-window bound — pandas
    * `merge_asof(tolerance=...)` semantics: a left row only keeps its
    * as-of match when the matched right time lies within
    * `toleranceUs` of the left time (backward: `leftT − rightT ≤
    * tol`; forward: `rightT − leftT ≤ tol`); a staler/farther match
    * nulls the carried columns while the left row survives, exactly
    * the left-outer contract. Implemented as a post-projection over
    * the native exec — sound because the as-of winner is the NEAREST
    * candidate in the direction of travel, so if IT violates the
    * window every other candidate does too; costs one codegen'd
    * conditional, no second join.
    */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame,
                        keys: Seq[String],
                        leftTime: String, rightTime: String,
                        rightCols: Seq[String],
                        toleranceUs: Long,
                        rightTiebreak: Option[String] = None,
                        strict: Boolean = false,
                        direction: String = "backward"): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    val tolCol = "__graft_tol_rt"
    require(!(left.columns ++ right.columns).contains(tolCol),
      s"$tolCol is reserved by asOfJoinTolerance — rename first")
    // carry the matched right time internally so the window check
    // needs no assumption about what the caller carries
    val r2 = right.withColumn(tolCol, col(rightTime))
    val j = asOfJoinNative(left, r2, keys, leftTime, rightTime,
      rightCols :+ tolCol, rightTiebreak, strict, direction)
    val gap =
      if (direction == "forward") col(tolCol) - col(leftTime)
      else col(leftTime) - col(tolCol)
    val within = col(tolCol).isNotNull && gap <= lit(toleranceUs)
    rightCols.foldLeft(j) { (df, c) =>
      df.withColumn(c, when(within, col(c)))
    }.drop(tolCol)
  }

  def asOfJoinNative(left: DataFrame, right: DataFrame,
                     keys: Seq[String],
                     leftTime: String, rightTime: String,
                     rightCols: Seq[String],
                     rightTiebreak: Option[String] = None,
                     strict: Boolean = false,
                     direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asOfJoinNative needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    val collisions = rightCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightCols collide with left columns: ${collisions.mkString(",")} — rename first")
    require(!left.columns.exists(_.startsWith("__asof_")) &&
      !rightCols.exists(_.startsWith("__asof_")),
      "__asof_* column names are reserved by asOfJoinNative — rename first")

    val spark = left.sparkSession
    graft.GraftExtensions.register(spark)

    // null-keyed / null-time right rows match nothing (SQL equi-join
    // semantics); the exec skips them anyway, but dropping them BEFORE
    // the exchange is free shuffle reduction
    val rvType = StructType(rightCols.map(c => right.schema(c)))
    val structTb = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(rvType)
    // no caller tiebreak: rank equal-(key, time) rights by the carried
    // values themselves when orderable — deterministic, same contract
    // as asOfJoin. Unorderable carried types (maps) fall back to
    // arrival order within the (key, time) sort.
    val tbExpr: Option[Column] = rightTiebreak.map(col)
      .orElse(if (structTb) Some(struct(rightCols.map(col): _*)) else None)
    val rightPruned = right
      .filter(col(rightTime).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.zipWithIndex.map { case (k, i) => col(k).as(s"__asof_k$i") } ++
        Seq(col(rightTime).as("__asof_t")) ++
        tbExpr.map(_.as("__asof_tb")).toSeq ++
        rightCols.zipWithIndex.map { case (c, i) => col(c).as(s"__asof_v$i") }: _*)

    val lPlan = left.queryExecution.analyzed
    val rPlan = rightPruned.queryExecution.analyzed
    def ref(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
            n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val node = graft.plans.AsofJoin(
      keys.map(ref(lPlan, _)),
      keys.indices.map(i => ref(rPlan, s"__asof_k$i")),
      ref(lPlan, leftTime), ref(rPlan, "__asof_t"),
      tbExpr.map(_ => ref(rPlan, "__asof_tb")),
      strict, direction == "forward", lPlan, rPlan)
    org.apache.spark.sql.GraftSqlShim.ofRows(spark, node)
      .select(left.columns.map(col).toSeq ++
        rightCols.zipWithIndex.map { case (c, i) => col(s"__asof_v$i").as(c) }: _*)
  }
}
