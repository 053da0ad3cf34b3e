package graft.operators

import graft.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Relational query family over the TPC-H-ish corpus.
  *
  * The reference delegates all relational work to BigQuery SQL
  * (`/root/reference/.../bigquery/TypedBigQuery.scala:13-19`); here the same
  * capability is Catalyst-native. These queries double as the benchmark
  * headliners, so each is written to produce the plan we'd want at 100 TB:
  * filters/projections adjacent to the scan (pushdown + pruning), aggregates
  * in the column DSL (partial aggregation + whole-stage codegen).
  *
  * Broadcast policy: explicit `broadcast()` hints only on cardinality-BOUNDED
  * dimensions (nation = 25 rows, region = 5 — constants at any scale factor).
  * SF-scaling tables (customer, supplier, part) get no hint: AQE still picks
  * a broadcast join at today's sizes from runtime stats, but at 100× the
  * same code degrades gracefully to a shuffle join instead of hitting a
  * driver OOM / broadcast timeout — a hint would override
  * `autoBroadcastJoinThreshold` unconditionally.
  *
  * Determinism-for-oracle rule: every double aggregate goes through an exact
  * DECIMAL sum and is only then cast back to DOUBLE, so the value is
  * identical regardless of partitioning / summation order, in Spark and in
  * DuckDB alike. Plain double `sum()` would differ in the last ulps between
  * engines and fail the driver's hash compare.
  */
object Relational {

  /** Exact, order-insensitive sum of a double expression: cast each term to
    * DECIMAL(18,4), sum (exact), cast the total back to DOUBLE. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  private val sqlRevenue = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"

  /** TPC-H Q1-style pricing summary: scan-heavy, 4-way aggregate. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Corpus.lineitem(s, dir)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(revenue).as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
  }

  val q1PricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       |  CAST(SUM($sqlRevenue) AS DOUBLE) AS sum_disc_price,
       |  COUNT(*) AS count_order,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: top-10 open orders by discounted revenue.
    * customer is the small side — AQE broadcasts it from runtime stats (no
    * hint: it scales with SF); lineitem⋈orders shuffles on the join key
    * with partial aggregation before the final top-k. */
  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = Corpus.customer(s, dir)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Corpus.orders(s, dir)
      .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Corpus.lineitem(s, dir)
      .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val q3TopOrdersSql: String =
    s"""SELECT l_orderkey, o_orderdate, CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey ASC
       |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue per nation; 5-way join. nation (25 rows,
    * bounded) is hint-broadcast; customer/supplier scale with SF so AQE
    * decides for them — only the lineitem⋈orders fact join must shuffle. */
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val nat = Corpus.nation(s, dir).select("n_nationkey", "n_name")
    val cust = Corpus.customer(s, dir).select("c_custkey", "c_nationkey")
    val sup = Corpus.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val ord = Corpus.orders(s, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
             col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Corpus.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup,
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  val q5NationRevenueSql: String =
    s"""SELECT n_name, CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name""".stripMargin

  /** Analytic window function: top-3 parts per brand by total revenue.
    *
    * lineitem is aggregated by l_partkey BEFORE the part join (partkey
    * determines brand, so the values are identical): map-side partial
    * aggregation collapses the fact table to one row per part ahead of any
    * join, the join input shrinks from |lineitem| to |part|, and the brand
    * window then shuffles only the aggregated frame — the
    * aggregate-below-join rewrite Catalyst doesn't apply on its own. */
  def topPartsPerBrand(s: SparkSession, dir: String): DataFrame = {
    val pt = Corpus.part(s, dir).select("p_partkey", "p_brand")
    val rev = Corpus.lineitem(s, dir)
      .select("l_partkey", "l_extendedprice", "l_discount")
      .groupBy(col("l_partkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .join(pt, col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey").asc)
    rev.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("p_brand", "p_partkey", "revenue", "rank")
  }

  val topPartsPerBrandSql: String =
    s"""WITH rev AS (
       |  SELECT p_brand, p_partkey, CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY p_brand, p_partkey)
       |SELECT p_brand, p_partkey, revenue,
       |  ROW_NUMBER() OVER (PARTITION BY p_brand
       |                     ORDER BY revenue DESC, p_partkey ASC) AS rank
       |FROM rev
       |QUALIFY rank <= 3""".stripMargin

  /** Semi-join (EXISTS) + anti-join (NOT EXISTS) in one result: order
    * priority counts split by whether any lineitem shipped late.
    *
    * Single pass: ONE left-outer join against the distinct late orderkeys,
    * then conditional counts — instead of separate semi + anti joins over
    * the same inputs glued with a full outer join (which scanned both
    * tables twice and joined three times). */
  def orderPriorityShipped(s: SparkSession, dir: String): DataFrame = {
    val ord = Corpus.orders(s, dir).select("o_orderkey", "o_orderpriority")
    val late = Corpus.lineitem(s, dir)
      .where(col("l_shipdate") > lit("2000-01-01").cast("timestamp"))
      .select("l_orderkey").distinct()
      .withColumn("is_late", lit(true))
    ord.join(late, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("is_late"), 1)).as("late_orders"),
        count(when(col("is_late").isNull, 1)).as("ontime_orders"))
  }

  val orderPriorityShippedSql: String =
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN EXISTS (
      |    SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > TIMESTAMP '2000-01-01') THEN 1 END) AS late_orders,
      |  COUNT(CASE WHEN NOT EXISTS (
      |    SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > TIMESTAMP '2000-01-01') THEN 1 END) AS ontime_orders
      |FROM orders
      |GROUP BY o_orderpriority""".stripMargin

  /** Per-user event rollup over the stream table (batch view): count,
    * distinct event types, exact purchase revenue. */
  def eventsUserStats(s: SparkSession, dir: String): DataFrame =
    Corpus.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)))
          .as("purchase_value"))

  val eventsUserStatsSql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
      |    AS DECIMAL(18,4))) AS DOUBLE) AS purchase_value
      |FROM events
      |GROUP BY user_id""".stripMargin

  /** Inter-event gap statistics per user — the lag() analytic-window shape
    * (ordered per-partition access to the PREVIOUS row, the one window
    * flavor the ranking/top-k queries don't exercise). Gaps are exact
    * microsecond integers (`unix_micros` / `epoch_us`), so min/max/avg are
    * engine-identical; ordering ties on ts break by event_id so lag() is
    * total-ordered. One shuffle on user_id; the window sort and the
    * aggregate ride the same exchange. */
  def eventGaps(s: SparkSession, dir: String): DataFrame = {
    // order by the microsecond value itself (== ts order, and still in
    // scope after the projection), tie-broken by event_id
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    Corpus.events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("gap_us")).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        (sum(col("gap_us")).cast("double") / count(col("gap_us")).cast("double"))
          .as("avg_gap_us"))
      .where(col("n_gaps") > 0)
  }

  val eventGapsSql: String =
    // ORDER BY epoch_us(ts), not raw ts: DuckDB reads the parquet at nano
    // resolution while Spark's Corpus reader truncates to micros, so a
    // raw-ts sort could pair lag() rows differently on intra-microsecond
    // collisions — ordering both engines by the same microsecond value
    // (+ event_id) keeps the pairing identical
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS gap_us
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_events,
      |  COUNT(gap_us) AS n_gaps,
      |  MIN(gap_us) AS min_gap_us,
      |  MAX(gap_us) AS max_gap_us,
      |  CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS avg_gap_us
      |FROM g
      |GROUP BY user_id
      |HAVING COUNT(gap_us) > 0""".stripMargin

  /** User sessionization over the event stream: fixed-gap session windows
    * per user (a user-behavior roll-up, distinct from the ad-CTR session
    * window which keys on (screen, ad) with a dynamic gap). One shuffle on
    * user_id; Spark's session_window merges in the aggregate — the oracle
    * rebuilds the same half-open sessions with the running-max-of-window-
    * ends islands technique pinned by `ctr_session_window`. */
  def userSessions(s: SparkSession, dir: String): DataFrame =
    Corpus.events(s, dir)
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        dsum(col("value")).as("total_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("n_types"), col("total_value"))

  val userSessionsSql: String =
    """WITH g AS (
      |  SELECT user_id, event_type, value, ts,
      |    ts + INTERVAL '10 minutes' AS w_end
      |  FROM events),
      |m AS (
      |  SELECT *, MAX(w_end) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |  FROM g),
      |sess AS (
      |  SELECT *, SUM(CASE WHEN prev_max IS NULL OR ts >= prev_max THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts
      |          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT MIN(ts) AS session_start, MAX(w_end) AS session_end,
      |  user_id, COUNT(*) AS n_events,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM sess
      |GROUP BY user_id, sid""".stripMargin

  /** Conversion funnel over the event stream: per user, the first-touch
    * timestamp of each stage, then strictly-ordered progression counts
    * (first view → later first click → later first purchase). One shuffle
    * on user_id for the pivot; the funnel itself is a single-row
    * aggregate. First-touch ordering makes the result deterministic —
    * no per-path session heuristics. */
  def conversionFunnel(s: SparkSession, dir: String): DataFrame = {
    val firstTouch = Corpus.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "click", col("ts"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
    firstTouch.agg(
      count(lit(1)).as("users_total"),
      count(col("first_view")).as("viewed"),
      count(when(col("first_click") > col("first_view"), 1)).as("clicked_after_view"),
      count(when(col("first_click") > col("first_view") &&
        col("first_purchase") > col("first_click"), 1)).as("purchased_after_click"))
  }

  val conversionFunnelSql: String =
    """WITH ft AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
      |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      |  FROM events GROUP BY user_id)
      |SELECT COUNT(*) AS users_total,
      |  COUNT(first_view) AS viewed,
      |  COUNT(CASE WHEN first_click > first_view THEN 1 END) AS clicked_after_view,
      |  COUNT(CASE WHEN first_click > first_view
      |    AND first_purchase > first_click THEN 1 END) AS purchased_after_click
      |FROM ft""".stripMargin

  /** TPC-H Q6-style forecast revenue change: pure scan + filter + agg —
    * the pushdown showcase (every predicate reaches the parquet scan, no
    * join, no shuffle beyond the single partial/final agg). */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    Corpus.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q6ForecastRevenueSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Q12-flavored shipping-priority audit (corpus lacks l_shipmode/
    * commitdate): per order priority, how many lineitems shipped more than
    * 60 days after the order date. lineitem⋈orders shuffles on orderkey;
    * the aggregate is partial+final on the tiny priority domain. */
  def q12LateShipments(s: SparkSession, dir: String): DataFrame = {
    val li = Corpus.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    val ord = Corpus.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1))
          .as("late_items"),
        count(lit(1)).as("total_items"))
  }

  val q12LateShipmentsSql: String =
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 END) AS late_items,
      |  COUNT(*) AS total_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q10-style returned-item report: top-20 customers by revenue on
    * returned lineitems. Returned-lineitem revenue is pre-aggregated by
    * orderkey BELOW the joins (every lineitem has an order, so the join
    * filters nothing): map-side partials collapse ~4-6 lineitems/order
    * before the orderkey shuffle, and the per-customer re-aggregation sums
    * exact DECIMALs so the value is identical to the single-level sum.
    * nation is hint-broadcast (bounded), customer is AQE's call
    * (SF-scaling); the top-k is a partial-agg'd sort-limit. */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val liAgg = Corpus.lineitem(s, dir)
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).as("rev_order"))
    val ord = Corpus.orders(s, dir).select("o_orderkey", "o_custkey")
    val cust = Corpus.customer(s, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val nat = Corpus.nation(s, dir).select("n_nationkey", "n_name")
    liAgg.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(col("rev_order")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  val q10ReturnedItemsSql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey ASC
       |LIMIT 20""".stripMargin

  /** TPC-H Q13-style customer order-count distribution: how many customers
    * placed exactly N orders, INCLUDING the zero-order customers the inner
    * join would drop.
    *
    * Scale shape: orders (the big side) is pre-aggregated to one row per
    * customer key BEFORE the join, so the left-outer join moves
    * |customers| + |distinct custkeys| rows instead of |orders| — the
    * classic aggregate-below-outer-join rewrite Catalyst cannot do itself
    * (it would change the join's null semantics). The final distribution
    * groupBy runs on a tiny domain (max orders per customer) and
    * partial-aggregates to almost nothing. */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    val perCust = Corpus.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    Corpus.customer(s, dir).select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
  }

  val q13CustomerDistributionSql: String =
    """WITH per_cust AS (
      |  SELECT c_custkey, COUNT(o_custkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist
      |FROM per_cust GROUP BY c_count""".stripMargin

  /** TPC-H Q14-style promo revenue share: conditional aggregation over the
    * lineitem ⋈ part join, one month of shipments.
    *
    * Scale shape: the shipdate range predicate reaches the scan (pushed +
    * partition-prunable on a date-partitioned layout), so the join input is
    * one month of the fact table, not all of it. `part` is an SF-scaling
    * dimension — no broadcast hint; AQE broadcasts it today and degrades to
    * shuffle join at 100× (see the file-head broadcast policy). Both
    * conditional sums ride the same partial aggregate. */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Corpus.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val pt = Corpus.part(s, dir).select("p_partkey", "p_type")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,4)")
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(rev).cast("double")).as("promo_revenue_pct"),
        sum(rev).cast("double").as("total_revenue"))
  }

  val q14PromoRevenueSql: String =
    s"""SELECT
       |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $sqlRevenue
       |                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       |    / CAST(SUM($sqlRevenue) AS DOUBLE) AS promo_revenue_pct,
       |  CAST(SUM($sqlRevenue) AS DOUBLE) AS total_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |  AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin

  /** TPC-H Q15-style top supplier: revenue per supplier over a quarter,
    * then the supplier(s) whose revenue equals the global max — the
    * aggregate → scalar-max → join-back shape (distinct from
    * [[topPartsPerBrand]]'s window top-k: the max is a 1-row broadcast, so
    * no per-group window state and ties surface naturally).
    *
    * Revenue equality across engines is safe because both totals are exact
    * DECIMAL sums cast to double only at the end ([[dsum]] rule). */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Corpus.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
      // |suppliers| rows read twice (scalar max + join-back): checkpoint so
      // the lineitem scan+aggregate runs once, not per consumer — the same
      // double-scan shape bm25_topk/annRecall fixed in r5. localCheckpoint,
      // not cache() (CacheManager cross-talk corrupts sibling bench runs).
      .graftCheckpoint()
    val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
    val sup = Corpus.supplier(s, dir).select("s_suppkey", "s_name")
    rev.join(broadcast(mx), col("total_revenue") === col("max_revenue"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  val q15TopSupplierSql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, CAST(SUM($sqlRevenue) AS DOUBLE) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""".stripMargin

  /** TPC-H Q18-style large-volume orders: orders whose total quantity
    * exceeds a threshold, joined back to order/customer detail — the
    * HAVING-on-aggregate semi-join shape.
    *
    * Scale shape: the heavy lifting is one partial-aggregated groupBy on
    * the fact table's own key (map-side combine collapses each order's
    * lines before the exchange); the surviving keys are a tiny fraction
    * (~1% at threshold 300), so the two detail joins move almost nothing.
    * Deterministic top-k: o_totalprice DESC then o_orderkey ASC. */
  def q18BigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Corpus.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .where(col("sum_qty") > 300.0)
    val ord = Corpus.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Corpus.customer(s, dir).select("c_custkey", "c_name")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  val q18BigOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 300.0)
      |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 20""".stripMargin

  /** TPC-H Q22-style lapsed high-balance customers: above-average
    * balance, no orders since 2000 — the ANTI-join shape (Catalyst
    * `LeftAnti`), the one join flavor the suite didn't yet exercise, plus
    * a 1-row scalar broadcast for the average.
    *
    * Scale shape: the scalar average is one bounded aggregate; the
    * anti-join probes the distinct recent-order custkeys (date predicate
    * pushed to the orders scan, keys pre-aggregated to one row before the
    * join, like q13's rewrite); both sides shuffle on custkey once. The
    * exact-decimal average makes the `>` cut engine-identical. */
  def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    val cust = Corpus.customer(s, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val avgBal = cust.where(col("c_acctbal") > 0.0)
      .agg((dsum(col("c_acctbal")) / count(lit(1))).as("ab"))
    val active = Corpus.orders(s, dir)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    cust.crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("ab"))
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
  }

  val q22IdleCustomersSql: String =
    """WITH avg_bal AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS ab
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      |FROM customer CROSS JOIN avg_bal
      |WHERE c_acctbal > ab
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c_mktsegment""".stripMargin

  /** Revenue ROLLUP over (returnflag, linestatus): subtotals per flag and
    * a grand total in one pass — Spark's `rollup` grouping-sets surface
    * (partial aggregation expands each row into its grouping sets before
    * the exchange; one shuffle, no re-scan per level). NULL group keys
    * mark the subtotal rows, identically in both engines. */
  def salesRollup(s: SparkSession, dir: String): DataFrame = {
    val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    // rollup from PARTIALS, not Expand: `.rollup` triples every lineitem
    // row through the aggregate (one copy per grouping set); the (flag,
    // status) base aggregate is a handful of groups, so the two coarser
    // levels re-aggregate THOSE. Decimal sums are exact (order- and
    // regrouping-insensitive) and counts sum, so each level is
    // bit-identical to the Expand plan's — the corpus crosses one
    // aggregate exactly once. Regrouping is safe precisely because the
    // grouping columns are NOT NULL here (a real NULL group would be
    // ambiguous against the subtotal row in ANY rollup rendering).
    val base = Corpus.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(revenue.cast("decimal(18,4)")).as("rev"),
        count(lit(1)).as("n_items"))
      .graftCheckpoint() // three level consumers, one ~6-row frame
    val lvl1 = base.groupBy(col("l_returnflag"))
      .agg(sum(col("rev")).as("rev"), sum(col("n_items")).as("n_items"))
      .select(col("l_returnflag"), lit(null).cast("string").as("l_linestatus"),
        col("rev"), col("n_items"))
    val lvl0 = base
      .agg(sum(col("rev")).as("rev"), sum(col("n_items")).as("n_items"))
      .select(lit(null).cast("string").as("l_returnflag"),
        lit(null).cast("string").as("l_linestatus"), col("rev"), col("n_items"))
    base.select(col("l_returnflag"), col("l_linestatus"), col("rev"), col("n_items"))
      .unionByName(lvl1).unionByName(lvl0)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("rev").cast("double").as("revenue"), col("n_items"))
  }

  val salesRollupSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** TPC-H Q7-style nation-pair shipping volume: revenue between every
    * (supplier nation, customer nation) pair per ship year. Exercises the
    * multi-hop fact-to-two-dimensions shape Q5 covers from one side only:
    * lineitem joins orders (shuffle on orderkey), the result joins
    * customer (shuffle on custkey), supplier and nation broadcast — so
    * the two big-table hops each shuffle once on their own key and every
    * dimension hop is exchange-free. The nation dimension joins TWICE
    * under different roles (supplier's vs customer's), the part of Q7
    * that catches alias/attribute-resolution bugs. */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val n1 = Corpus.nation(s, dir).select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    val n2 = Corpus.nation(s, dir).select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"))
    val sup = Corpus.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val cust = Corpus.customer(s, dir).select("c_custkey", "c_nationkey")
    val ord = Corpus.orders(s, dir).select("o_orderkey", "o_custkey")
    Corpus.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  val q7NationVolumeSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |  CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q17-style small-quantity revenue: lineitems whose quantity is
    * under 20% of their part's average, rolled up per brand — the
    * correlated-scalar-subquery shape, de-correlated the way Catalyst
    * itself would: one per-part aggregate, re-joined to the fact on the
    * SAME key so the aggregate's exchange is reused for the join (no
    * second lineitem shuffle), then a broadcast hop to part.
    *
    * Exactness: the per-part average is an exact DECIMAL sum divided
    * once, and `0.2 * avg` is a single IEEE multiply — both engines
    * evaluate the identical tree, so the filter decision never straddles
    * an ulp. */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val li = Corpus.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val pavg = li.groupBy(col("l_partkey"))
      .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    val prt = Corpus.part(s, dir).select("p_partkey", "p_brand")
    li.join(pavg, Seq("l_partkey"))
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_extendedprice")).as("total_price"),
        count(lit(1)).as("n_items"))
  }

  val q17SmallQuantitySql: String =
    """WITH pa AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN pa USING (l_partkey)
      |JOIN part ON p_partkey = l_partkey
      |WHERE l_quantity < 0.2 * avg_qty
      |GROUP BY 1""".stripMargin

  /** TPC-H Q21-style sole-supplier orders: per supplier, how many orders
    * they supplied alone (no other supplier shipped a line in the order)
    * — Q21's self-semi/anti-join shape on the fact table, restated over
    * this corpus's columns (it has no commit/receipt dates). The anti
    * join and its probe side both key on l_orderkey, so the self-join
    * costs ONE co-partitioned shuffle; supplier broadcasts. */
  def q21SoleSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = Corpus.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val sole = li.as("l1")
      .join(li.as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l2.l_suppkey"),
        "left_anti")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val sup = Corpus.supplier(s, dir).select("s_suppkey", "s_name")
    sole.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_sole_orders"))
  }

  val q21SoleSupplierSql: String =
    """SELECT s_name, COUNT(*) AS n_sole_orders
      |FROM (
      |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      |  FROM lineitem l1
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)) sole
      |JOIN supplier ON s_suppkey = l_suppkey
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // TPC-H completion (r7): the 8 remaining query shapes. The corpus has no
  // partsupp table and no commit/receipt dates, so q2/q9/q11/q16/q20 are
  // restated over the columns that exist (the same policy q12/q21 follow) —
  // each keeps its namesake's OPTIMIZER shape, which is what the suite is
  // exercising: correlated-min join-back (q2), correlated EXISTS semi-join
  // (q4), two-level share-of-total aggregation (q8), multi-dimension profit
  // rollup (q9), HAVING against a global scalar (q11), null-aware NOT IN
  // anti-join + count-distinct (q16), disjunctive join predicates (q19), and
  // an aggregate-HAVING semi-join chain (q20).
  // --------------------------------------------------------------------------

  /** TPC-H Q2-style minimum-cost supplier (restated: unit price from
    * lineitem stands in for ps_supplycost): for mid-size STANDARD parts,
    * the EUROPE supplier(s) whose shipped unit price equals the part's
    * minimum — the correlated-scalar-min + join-back shape, de-correlated
    * like q17: one per-part min over the region-restricted offers frame,
    * re-joined on the SAME key so the min's exchange is reused.
    *
    * Scale shape: region∙nation (bounded) broadcast into supplier; the
    * offers frame is the part-filtered fraction of lineitem and is
    * `localCheckpoint`ed because min + join-back read it twice (the q15
    * discipline). Unit price is one IEEE divide of two parquet doubles, so
    * min and the equality join-back see bit-identical values on both
    * engines. */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val reg = Corpus.region(s, dir).where(col("r_name") === "EUROPE")
      .select("r_regionkey")
    val nat = Corpus.nation(s, dir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = Corpus.supplier(s, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val prt = Corpus.part(s, dir)
      .where(col("p_type") === "STANDARD" && col("p_size").between(10, 20))
      .select("p_partkey", "p_name")
    val offers = Corpus.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .graftCheckpoint()
    val minPrice = offers.groupBy(col("p_partkey").as("mp_key"))
      .agg(min(col("unit_price")).as("min_price"))
    offers
      .join(minPrice,
        col("p_partkey") === col("mp_key") && col("unit_price") === col("min_price"))
      .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_price")
      .distinct()
      .orderBy(col("s_acctbal").desc, col("s_name").asc, col("p_partkey").asc)
      .limit(100)
  }

  val q2MinCostSupplierSql: String =
    """WITH eu_sup AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |offers AS (
      |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
      |    l_extendedprice / l_quantity AS unit_price
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN eu_sup ON l_suppkey = s_suppkey
      |  WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20)
      |SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  unit_price AS min_price
      |FROM offers o
      |WHERE unit_price = (SELECT MIN(unit_price) FROM offers i
      |                    WHERE i.p_partkey = o.p_partkey)
      |ORDER BY s_acctbal DESC, s_name ASC, p_partkey ASC
      |LIMIT 100""".stripMargin

  /** TPC-H Q4-style order-priority check: orders placed in Q1-1997 with at
    * least one lineitem shipped 60+ days after ordering — the CORRELATED
    * EXISTS shape (the predicate references both sides), executed as a
    * left-SEMI hash join on orderkey with the date comparison as the join
    * residual. Distinct from [[orderPriorityShipped]], whose EXISTS
    * condition is uncorrelated (fixed date) and whose output needs the
    * anti side too.
    *
    * Scale shape: the order-date range is pushed to the orders scan; the
    * semi join shuffles each side once on orderkey and emits each order at
    * most once (no distinct needed — semi-join semantics dedup). */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val ord = Corpus.orders(s, dir)
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Corpus.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  val q4OrderPrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q8-style national market share: NATION_7 suppliers' share of
    * ECONOMY-part revenue delivered to ASIA-region customers, per order
    * year — the two-level aggregation shape (conditional share inside a
    * grouped total) over the widest join in the suite (6 tables).
    *
    * Scale shape: the only big-big joins are lineitem⋈orders (orderkey)
    * and ⋈customer (custkey), each one shuffle; part is AQE's call;
    * supplier + both nation hops broadcast (bounded/dimension). Share =
    * one double division of two exact DECIMAL sums — engine-identical. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val reg = Corpus.region(s, dir).where(col("r_name") === "ASIA")
      .select("r_regionkey")
    val custNat = Corpus.nation(s, dir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val cust = Corpus.customer(s, dir)
      .join(broadcast(custNat), col("c_nationkey") === col("cn_key"))
      .select("c_custkey")
    val supNat = Corpus.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val sup = Corpus.supplier(s, dir)
      .join(broadcast(supNat), col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val prt = Corpus.part(s, dir).where(col("p_type") === "ECONOMY")
      .select("p_partkey")
    val ord = Corpus.orders(s, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,4)")
    Corpus.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_7", rev)
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(rev).cast("double")).as("mkt_share"),
        sum(rev).cast("double").as("total_revenue"))
  }

  val q8MarketShareSql: String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_7' THEN $sqlRevenue
       |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       |    / CAST(SUM($sqlRevenue) AS DOUBLE) AS mkt_share,
       |  CAST(SUM($sqlRevenue) AS DOUBLE) AS total_revenue
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |JOIN region ON n1.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1""".stripMargin

  /** TPC-H Q9-style product-type profit (restated: with no ps_supplycost
    * in the corpus, cost is proxied as half the part's retail price per
    * unit): per supplier nation per order year, the profit on parts named
    * like widgets. Keeps Q9's shape — a LIKE-filtered dimension driving a
    * multi-join rollup on (nation, year).
    *
    * Exactness: profit = rev_decimal − cost_decimal where each side is one
    * IEEE multiply chain cast to DECIMAL(18,4); the difference and its sum
    * are exact, cast to double once at the end. */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val prt = Corpus.part(s, dir)
      .where(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val supNat = Corpus.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))
    val sup = Corpus.supplier(s, dir)
      .join(broadcast(supNat), col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "nation")
    val ord = Corpus.orders(s, dir).select("o_orderkey", "o_orderdate")
    val profit =
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)") -
      (lit(0.5) * col("p_retailprice") * col("l_quantity")).cast("decimal(18,4)")
    Corpus.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(profit).cast("double").as("sum_profit"),
        count(lit(1)).as("n_items"))
  }

  val q9ProductProfitSql: String =
    s"""SELECT n_name AS nation,
       |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  CAST(SUM($sqlRevenue
       |    - CAST(0.5 * p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
       |    AS sum_profit,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY 1, 2""".stripMargin

  /** TPC-H Q11-style important parts (restated: lineitem revenue stands in
    * for partsupp stock value): parts whose total revenue exceeds 1.5×
    * the average part's — the HAVING-against-a-global-scalar shape, with a
    * SCALE-FREE threshold (a mean-relative cut survives any SF; the
    * classic fixed fraction would silently empty out as |parts| grows;
    * 1.5 keeps the cut selective-but-nonempty on this corpus's
    * near-uniform parts: 2/29/252 rows at sf0.001/0.01/0.1).
    *
    * Scale shape: one partial-aggregated groupBy on l_partkey, kept as
    * exact DECIMAL and `localCheckpoint`ed because the scalar mean and the
    * filter both read it; the mean is a 1-row broadcast. */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val pv = Corpus.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).as("value_dec"))
      .graftCheckpoint()
    val mean = pv.agg(
      (sum(col("value_dec")).cast("double") / count(lit(1))).as("mean_value"))
    pv.crossJoin(broadcast(mean))
      .where(col("value_dec").cast("double") > lit(1.5) * col("mean_value"))
      .select(col("l_partkey"), col("value_dec").cast("double").as("part_value"))
  }

  val q11ImportantPartsSql: String =
    s"""WITH pv AS (
       |  SELECT l_partkey, SUM($sqlRevenue) AS value_dec
       |  FROM lineitem GROUP BY 1)
       |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
       |FROM pv
       |WHERE CAST(value_dec AS DOUBLE) >
       |  1.5 * (SELECT CAST(SUM(value_dec) AS DOUBLE) / COUNT(*) FROM pv)""".stripMargin

  /** TPC-H Q16-style supplier relationship count (restated: lineitem links
    * parts to suppliers in place of partsupp; negative account balance
    * stands in for the complaint list): per (brand, type, size) over
    * square-numbered sizes, how many distinct non-complaint suppliers
    * shipped the part — the NOT-IN subquery shape (null-aware anti join;
    * here keys are non-null so it lowers to a plain LeftAnti) plus a
    * count-distinct rollup.
    *
    * Scale shape: part predicates reach the scan; the anti join probes a
    * broadcast handful of bad suppliers; countDistinct expands to the
    * standard two-level exchange on the small filtered frame. */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val bad = Corpus.supplier(s, dir)
      .where(col("s_acctbal") < 0.0).select("s_suppkey")
    val prt = Corpus.part(s, dir)
      .where(col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Corpus.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16SupplierCntSql: String =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q19-style discounted revenue: three brand/size/quantity regimes
    * OR'd together — the disjunctive-predicate shape. Catalyst extracts
    * the common l_partkey equi-key for the hash join and keeps the OR as
    * the join residual; the quantity bounds (common to no disjunct) stay
    * as a scan-level filter only where implied.
    *
    * Scale shape: one hash join on partkey (part is AQE's call), the OR
    * evaluated inside whole-stage codegen — no union-of-three-scans
    * rewrite needed. */
  def q19DiscountedRevenue(s: SparkSession, dir: String): DataFrame = {
    val prt = Corpus.part(s, dir).select("p_partkey", "p_brand", "p_size")
    val regime =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(5, 30)) ||
      (col("p_brand") === "Brand#15" && col("p_size").between(1, 35) &&
        col("l_quantity").between(10, 50))
    Corpus.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(prt, col("l_partkey") === col("p_partkey") && regime)
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19DiscountedRevenueSql: String =
    s"""SELECT CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       |       AND l_quantity BETWEEN 1 AND 20)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       |       AND l_quantity BETWEEN 5 AND 30)
       |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
       |       AND l_quantity BETWEEN 10 AND 50)""".stripMargin

  /** TPC-H Q20-style promo suppliers (restated: shipped quantity of PROMO
    * parts stands in for excess availqty): suppliers whose total shipped
    * PROMO quantity beats 1.2× the average such supplier's — the
    * aggregate-HAVING feeding an IN semi-join into the dimension table,
    * Q20's nested-subquery chain. The threshold is scale-free (mean-
    * relative) for the same reason as [[q11ImportantParts]].
    *
    * Scale shape: one partial-aggregated groupBy on l_suppkey over the
    * part-filtered fact (checkpointed: mean + filter read it twice); the
    * surviving keys semi-join supplier; nation broadcasts. */
  def q20PromoSuppliers(s: SparkSession, dir: String): DataFrame = {
    val prt = Corpus.part(s, dir).where(col("p_type") === "PROMO")
      .select("p_partkey")
    val sq = Corpus.lineitem(s, dir).select("l_partkey", "l_suppkey", "l_quantity")
      .join(prt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("qty_dec"))
      .graftCheckpoint()
    val mean = sq.agg(
      (sum(col("qty_dec")).cast("double") / count(lit(1))).as("mean_qty"))
    val keys = sq.crossJoin(broadcast(mean))
      .where(col("qty_dec").cast("double") > lit(1.2) * col("mean_qty"))
      .select("l_suppkey")
    val nat = Corpus.nation(s, dir).select("n_nationkey", "n_name")
    Corpus.supplier(s, dir)
      .join(keys, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_name", "s_acctbal", "n_name")
  }

  val q20PromoSuppliersSql: String =
    """WITH sq AS (
      |  SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_dec
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'PROMO'
      |  GROUP BY 1)
      |SELECT s_name, s_acctbal, n_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM sq
      |  WHERE CAST(qty_dec AS DOUBLE) >
      |    1.2 * (SELECT CAST(SUM(qty_dec) AS DOUBLE) / COUNT(*) FROM sq))""".stripMargin

  /** TPC-H Q13-style: distribution of customers by order count. The defining
    * shape is the predicate ON the left-outer join, not in a WHERE —
    * customers whose orders all fail the predicate must survive with
    * c_count = 0. This corpus has no o_comment, so
    * `o_orderpriority <> '1-URGENT'` plays the comment-regex role. At scale
    * the first aggregate shuffles on c_custkey (same key as the join, so AQE
    * coalesces); the second groups ~dozens of distinct counts — trivially
    * small. */
  def q13OrderDistribution(s: SparkSession, dir: String): DataFrame = {
    val cust = Corpus.customer(s, dir).select("c_custkey")
    val ord = Corpus.orders(s, dir)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13OrderDistributionSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count""".stripMargin

  /** Key-skew diagnostic over the event stream's partitioning key — the
    * profile a 100 TB deployment runs BEFORE choosing a shuffle/state key
    * or a salt count (BASELINE.md's salted-lookup crossover rule needs
    * exactly these numbers: hot-key share vs per-batch volume). Emits the
    * top-5 hottest keys with corpus-level context on every row: total
    * rows, distinct keys, the mean rows/key, each hot key's share, and
    * its skew ratio (share × n_keys — 1.0 means perfectly even).
    *
    * Shape: one map-side-combined shuffle on the key (the aggregate
    * Spark already needs for the counts), a 1-row global aggregate OF the
    * per-key frame (not a second corpus scan) broadcast back onto a
    * TakeOrdered top-5 — no global sort, nothing driver-side. */
  def keySkewProfile(s: SparkSession, dir: String): DataFrame = {
    val perKey = Corpus.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .graftCheckpoint() // read 2×: global stats + top-k
    val stats = perKey.agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"))
    val topk = perKey
      .orderBy(col("cnt").desc, col("user_id").asc).limit(5)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("user_id").asc)).cast("long"))
    topk.crossJoin(broadcast(stats))
      .select(col("rank"), col("user_id"), col("cnt"),
        col("n_rows"), col("n_keys"),
        round(col("cnt").cast("double") / col("n_rows").cast("double"), 6)
          .as("share"),
        round(col("cnt").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double"), 4).as("skew_ratio"))
  }

  val keySkewProfileSql: String =
    """WITH per_key AS (
      |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
      |stats AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys
      |  FROM per_key),
      |topk AS (
      |  SELECT user_id, cnt, CAST(ROW_NUMBER() OVER (
      |    ORDER BY cnt DESC, user_id ASC) AS BIGINT) AS rank
      |  FROM per_key ORDER BY cnt DESC, user_id ASC LIMIT 5)
      |SELECT rank, user_id, cnt, n_rows, n_keys,
      |  round(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS share,
      |  round(CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
      |    / CAST(n_rows AS DOUBLE), 4) AS skew_ratio
      |FROM topk CROSS JOIN stats""".stripMargin

  // ------------------------------------------------------------------
  // Ingest-volume anomaly detection: per (event_type, day) counts with a
  // z-score against that type's observed-day distribution — the
  // ops-monitoring query a 100 TB ingest pipeline runs to catch a
  // scraper dying (count collapse) or a feed loop (count explosion)
  // before the corpus skews. Days with zero events are absent from the
  // stats (observed-day convention, documented).
  //
  // 100 TB shape: ONE map-side-combinable (type, day) count aggregate;
  // the mean/variance windows run over the tiny (types × days) frame.
  // Mean and variance derive from exact BIGINT sums (Σc, Σc², n)
  // through an identical IEEE expression tree on both engines; z is
  // guarded against a zero-variance type (constant daily counts → NULL
  // z, false flag) so the degenerate case is engine-identical rather
  // than an Inf/NaN divergence.

  def ingestAnomaly(s: SparkSession, dir: String): DataFrame =
    ingestAnomalyFrom(Corpus.events(s, dir))

  private[graft] def ingestAnomalyFrom(ev: DataFrame): DataFrame = {
    // FLOOR division, exactly (pmod is non-negative, so subtracting it
    // makes the dividend an exact multiple): DuckDB's `//` floors, while
    // Spark's `div` truncates toward zero — a bare `div` silently shifts
    // the day bucket (and its z-scores) for pre-1970 timestamps.
    val daily = ev
      .select(expr(
        "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000")
        .as("day"), col("event_type"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type"))
    val n = count(lit(1)).over(w).cast("double")
    val sc = sum(col("n_events")).over(w).cast("double")
    val sc2 = sum(col("n_events") * col("n_events")).over(w).cast("double")
    val mean = sc / n
    val varr = (sc2 - sc * sc / n) / n
    val z = (col("n_events").cast("double") - mean) / sqrt(varr)
    daily.select(col("event_type"), col("day"), col("n_events"),
      when(varr > 0, round(z, 4)).as("z"),
      when(varr > 0, abs(z) > 3.0).otherwise(lit(false)).as("is_anomaly"))
  }

  val ingestAnomalySql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, day, n_events,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n,
      |    CAST(SUM(n_events) OVER (PARTITION BY event_type) AS DOUBLE) AS sc,
      |    CAST(SUM(n_events * n_events) OVER (PARTITION BY event_type) AS DOUBLE) AS sc2
      |  FROM daily)
      |SELECT event_type, CAST(day AS BIGINT) AS day, n_events,
      |  CASE WHEN (sc2 - sc * sc / n) / n > 0
      |    THEN round((CAST(n_events AS DOUBLE) - sc / n)
      |      / sqrt((sc2 - sc * sc / n) / n), 4) END AS z,
      |  CASE WHEN (sc2 - sc * sc / n) / n > 0
      |    THEN abs((CAST(n_events AS DOUBLE) - sc / n)
      |      / sqrt((sc2 - sc * sc / n) / n)) > 3.0
      |    ELSE FALSE END AS is_anomaly
      |FROM st""".stripMargin
}
