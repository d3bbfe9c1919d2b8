package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** General analytics capability of the engine — scan/filter/aggregate/
  * join/window/set-op coverage over the TPC-H-ish tables (SURVEY.md §2.2-
  * §2.6). These double as the bench headliners: each is shaped so the
  * optimized plan is the one we'd want at 100 TB (filters at the scan,
  * small dims broadcast, partial aggregation before shuffle).
  *
  * Double-precision policy for oracle parity: money math goes through
  * exact DECIMAL casts (cents/hundredths are exact), sums stay decimal,
  * the final value is cast back to DOUBLE — deterministic in both Spark
  * and DuckDB regardless of accumulation order.
  */
object AnalyticsQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** TPC-H Q1-shaped pricing summary: the canonical partial-agg
    * pipeline — one scan, map-side combine, tiny shuffle (6 groups).
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= cutoff)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-shaped top-k revenue: dim filter -> join -> agg -> top-10.
    * customer is the small side -> broadcast; lineitem never shuffles
    * until the (already reduced) aggregate.
    */
  def topRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .as("rev"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped multi-join: region -> nation -> supplier dims all
    * broadcast, lineitem aggregated by nation.
    */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(s, dir)
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val li = Tables.lineitem(s, dir)
      .select(col("l_suppkey"),
        (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .as("rev"))
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy("n_name")
  }

  /** Window/top-N: each user's 3 highest-value events (rank + running
    * tie-break on event_id keeps it deterministic).
    */
  def topEventsPerUser(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy("user_id", "rnk")
  }

  /** Set-op / anti-join: customers with no high-value order. The anti
    * side is filtered before the join so the build set stays small
    * enough to broadcast at scale.
    */
  def noHighValueOrder(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("c_custkey"))
    Tables.customer(s, dir).select("c_custkey")
      .join(bigOrders, Seq("c_custkey"), "left_anti")
      .orderBy("c_custkey")
  }

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q5_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_window_top_events" ->
      """SELECT user_id, event_id, value, rnk FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
        |  FROM events) t
        |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"    -> (pricingSummary _),
    "q3_top_revenue"        -> (topRevenue _),
    "q5_revenue_by_nation"  -> (revenueByNation _),
    "q_window_top_events"   -> (topEventsPerUser _),
    "q_anti_join"           -> (noHighValueOrder _)
  )
}
