package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core (SURVEY.md §2B #1–#32): scans, filters,
  * projections, joins, aggregations, windows, sorts, set ops.
  *
  * Determinism rules (§2.5) applied throughout: DECIMAL before money
  * arithmetic, round(6) on float outputs, total ORDER BY on unique
  * keys, flat primitive output columns, explicit NULLS FIRST/LAST on
  * any nullable sort key (Spark asc defaults nulls-first, DuckDB
  * nulls-last — never rely on the defaults agreeing).
  *
  * Scale notes are inline per query: the fixtures are small, but each
  * plan is chosen so the same code is the right plan at 100 TB
  * (broadcast small dims, partial aggregation, filter-before-join).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Money column → exact decimal before any arithmetic (§2.5.1). */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Final output form for money columns: exact decimal → nearest
    * double. DECIMAL stays for internal arithmetic (§2.5.1), but the
    * OUTPUT schema must be double: the driver's hash stringifies
    * Decimal('44.00') and float 44.0 differently even when the parquet
    * bytes are identical (round-1 verdict, 18 hash failures). Both
    * engines cast the same exact decimal to the same nearest double.
    */
  private def money(c: Column): Column = dec(c).cast("double")

  /** Oracle-side prefix normalizing events.ts from ns to µs so both
    * engines see identical timestamps (§2.5.3): DuckDB's CAST(ts AS
    * TIMESTAMP) truncates ns→µs exactly like our Tables.events.
    */
  // ---- #1 q_scan_project -------------------------------------------------
  // Column pruning: the parquet reader materializes only these 4 cols.
  val qScanProject: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        money(col("l_quantity")).as("quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---- #2 q_scan_filter_pushdown ----------------------------------------
  // Predicates reach the parquet scan (PushedFilters) → at 100 TB this
  // is row-group min/max skipping, not a full read.
  val qScanFilterPushdown: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date"),
        money(col("l_discount")).as("discount"),
        money(col("l_quantity")).as("quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---- #3 q_filter_complex ----------------------------------------------
  val qFilterComplex: Q = (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_orderstatus").isin("F", "O") &&
        (col("o_orderpriority").like("3-%") || col("o_totalprice") > 100000) &&
        col("o_orderpriority").isNotNull)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        money(col("o_totalprice")).as("total"))
      .orderBy("o_orderkey")

  // ---- #4 q_project_expr -------------------------------------------------
  // decimal(18,6) keeps all 6 fractional digits of price*(1-d)*(1+t)
  // exactly — no cross-engine rounding at all.
  val qProjectExpr: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * (lit(1) + dec(col("l_tax")))).cast("decimal(18,6)")
          .cast("double").as("net_charge"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---- #5 q_join_inner_hash ----------------------------------------------
  // Equi-join on the natural key: shuffled hash / SMJ at scale, and the
  // shuffle is on the join key both sides — no extra exchange.
  val qJoinInnerHash: Q = (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        money(col("o_totalprice")).as("total"))
      .orderBy("o_orderkey")

  // ---- #6 q_join_broadcast -----------------------------------------------
  // part is a dimension: broadcast it so the 100 TB fact side never
  // shuffles. Plan shows BroadcastHashJoin.
  val qJoinBroadcast: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("l_partkey") === col("p_partkey"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("p_brand"),
        money(col("l_quantity")).as("quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---- #7 q_join_left ----------------------------------------------------
  val qJoinLeft: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("order_count"))
      .orderBy("c_custkey")

  // ---- #8 q_join_full ----------------------------------------------------
  // Partially-overlapping key sets: BUILDING-segment customers vs
  // customers having 'F' orders.
  val qJoinFull: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("f_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), coalesce(col("f_orders"), lit(0L)).as("f_orders"))
      .orderBy("custkey")
  }

  // ---- #9 q_join_semi ----------------------------------------------------
  val qJoinSemi: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  // ---- #10 q_join_anti ---------------------------------------------------
  val qJoinAnti: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  // ---- #11 q_join_cross --------------------------------------------------
  // Tiny×tiny only — a cross join is never the scale path.
  val qJoinCross: Q = (s, dir) =>
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")

  // ---- #12 q_join_theta_range --------------------------------------------
  // Equi key (user=cust) + range predicate: Spark executes the equi
  // part as a hash join and post-filters the range — linear, not a
  // nested loop. Filter events first to keep the probe side small.
  val qJoinThetaRange: Q = (s, dir) => {
    val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    ev.join(o, col("user_id") === col("o_custkey") &&
        col("o_orderdate") <= col("ts"), "inner")
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_prior_orders"))
      .orderBy("event_id")
  }

  val qJoinThetaRangeSql: String = EV +
    """SELECT event_id, COUNT(*) AS n_prior_orders
      |FROM e JOIN orders ON user_id = o_custkey AND o_orderdate <= ts
      |WHERE event_type = 'purchase'
      |GROUP BY event_id
      |ORDER BY event_id""".stripMargin

  // ---- #13 q_join_asof ---------------------------------------------------
  // As-of join: latest order ≤ ts per event. No native asof in Spark —
  // equi-join + range filter + row_number()=1. At 100 TB the same
  // shape works because the join is keyed (per-user), so candidates
  // per event stay bounded; the window partitions by event_id.
  val qJoinAsof: Q = (s, dir) => {
    val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val joined = ev.join(o, col("user_id") === col("o_custkey") &&
      col("o_orderdate") <= col("ts"), "left")
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc_nulls_last, col("o_orderkey").desc_nulls_last)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("asof_orderkey"),
        col("o_orderdate").cast("date").as("asof_orderdate"))
      .orderBy("event_id")
  }

  val qJoinAsofSql: String = EV +
    """SELECT event_id, user_id, asof_orderkey, asof_orderdate FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey,
      |         CAST(o.o_orderdate AS DATE) AS asof_orderdate,
      |         ROW_NUMBER() OVER (PARTITION BY e.event_id
      |           ORDER BY o.o_orderdate DESC NULLS LAST,
      |                    o.o_orderkey DESC NULLS LAST) AS rn
      |  FROM e LEFT JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
      |  WHERE e.event_type = 'purchase')
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  // ---- #14 q_agg_group_sum (TPC-H Q1 shape) ------------------------------
  // Two-phase HashAggregate (partial map-side + final): the shuffle
  // carries |groups| × state, not rows — the shape that scales.
  // Decimal determinism notes (r13, found by the sf1 oracle sweep —
  // both effects invisible at driver sfs, real at 10×):
  //  1. The DuckDB factors (1 - discount)/(1 + tax) must be cast
  //     NARROW (DECIMAL(3,2) → factor DECIMAL(4,2)): DuckDB decimal
  //     multiply widths ADD, so (18,2)×(19,2)×(19,2) exceeds 38
  //     digits and silently degrades to DOUBLE — a merge-order-
  //     dependent float sum. With (18,2)×(4,2)×(4,2) = 26 digits both
  //     engines sum the EXACT products.
  //  2. The FINAL decimal→double cast is engine-identical only while
  //     the UNSCALED value fits 2^53: DuckDB converts as
  //     (double)unscaled / 10^scale (two roundings), Spark as a
  //     correctly-rounded BigDecimal.doubleValue — at scale 6 the sf1
  //     sum_charge (unscaled 5.2e16 > 2^53) landed 1 ulp apart. Final
  //     scale is therefore 2 (currency cents): unscaled ≤ ~5e12 at
  //     sf1, leaving 3 orders of magnitude of headroom; the interior
  //     arithmetic stays exact at full product scale in both engines.
  //  3. DuckDB's decimal→lower-scale CAST TRUNCATES (1.675 → 1.67)
  //     while Spark's decimal cast rounds HALF_UP — so the oracle
  //     reduces scale via ROUND(…, 2) (half-away-from-zero, = HALF_UP
  //     for the positive sums) before a then-lossless narrow cast.
  val qAggGroupSum: Q = (s, dir) => {
    val price = dec(col("l_extendedprice"))
    val disc  = dec(col("l_discount"))
    val tax   = dec(col("l_tax"))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("decimal(38,2)").cast("double").as("sum_qty"),
        sum(price).cast("decimal(38,2)").cast("double").as("sum_base_price"),
        sum(price * (lit(1) - disc)).cast("decimal(38,2)").cast("double").as("sum_disc_price"),
        sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("decimal(38,2)").cast("double").as("sum_charge"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ---- #15 q_agg_distinct ------------------------------------------------
  val qAggDistinct: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("c_mktsegment")

  // ---- #16 q_agg_having --------------------------------------------------
  val qAggHaving: Q = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_count"))
      .filter(col("order_count") > 5)
      .orderBy("o_custkey")

  // ---- #17 q_agg_rollup --------------------------------------------------
  val qAggRollup: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
           grouping(col("l_linestatus")).cast("int").as("g_status"),
           sum(dec(col("l_extendedprice"))).cast("decimal(38,2)").cast("double").as("sum_price"),
           count(lit(1)).as("n"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val qAggRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
      |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_price,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---- #18 q_agg_cube ----------------------------------------------------
  val qAggCube: Q = (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
           grouping(col("o_orderpriority")).cast("int").as("g_prio"),
           count(lit(1)).as("n"))
      .orderBy(col("g_status"), col("g_prio"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val qAggCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
      |       COUNT(*) AS n
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_prio, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---- #19 q_agg_grouping_sets -------------------------------------------
  val qAggGroupingSets: Q = (s, dir) => {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  val qAggGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
      |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---- #20 q_agg_stats ---------------------------------------------------
  // Exact percentile (interpolated) — both engines use linear
  // interpolation; floats rounded to 6 dp (§2.5.2).
  val qAggStats: Q = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        money(min(col("o_totalprice"))).as("min_total"),
        money(max(col("o_totalprice"))).as("max_total"),
        round(avg(col("o_totalprice")), 6).as("avg_total"),
        round(stddev_samp(col("o_totalprice")), 6).as("std_total"),
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("median_total"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  val qAggStatsSql: String =
    """SELECT o_orderstatus,
      |       CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS min_total,
      |       CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS max_total,
      |       ROUND(AVG(o_totalprice), 6) AS avg_total,
      |       ROUND(STDDEV_SAMP(o_totalprice), 6) AS std_total,
      |       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 6) AS median_total,
      |       COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---- #22 q_win_rank ----------------------------------------------------
  // rank/dense_rank values are tie-stable (equal inputs → equal rank),
  // so ordering output rows by (status, orderkey) is fully
  // deterministic even with duplicate prices.
  val qWinRank: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice").desc)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        rank().over(w).as("price_rank"),
        dense_rank().over(w).as("price_dense_rank"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  val qWinRankSql: String =
    """SELECT o_orderkey, o_orderstatus,
      |       RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS price_rank,
      |       DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS price_dense_rank
      |FROM orders
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  // ---- #23 q_win_topk_per_group ------------------------------------------
  val qWinTopkPerGroup: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        money(col("o_totalprice")).as("total"))
      .orderBy("o_custkey", "rn")
  }

  val qWinTopkPerGroupSql: String =
    """SELECT o_custkey, rn, o_orderkey,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---- #24 q_win_lag_lead ------------------------------------------------
  // Gap in whole seconds between consecutive events per user; ts
  // second-truncated before arithmetic (§2.5.3).
  val qWinLagLead: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("ts_sec", date_trunc("second", col("ts")).cast("long"))
      .select(col("event_id"), col("user_id"),
        (col("ts_sec") - lag(col("ts_sec"), 1).over(w)).as("gap_s"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy("event_id")
  }

  val qWinLagLeadSql: String = EV +
    """SELECT event_id, user_id,
      |       EPOCH(DATE_TRUNC('second', ts))::BIGINT
      |         - LAG(EPOCH(DATE_TRUNC('second', ts))::BIGINT, 1)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s,
      |       LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM e
      |ORDER BY event_id""".stripMargin

  // ---- #25 q_win_running -------------------------------------------------
  val qWinRunning: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("decimal(38,2)")
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val qWinRunningSql: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE) AS running_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- #26 q_win_sliding_rows --------------------------------------------
  // Moving avg computed as exact-decimal SUM / COUNT, divided as
  // doubles: one IEEE division from identical inputs in both engines →
  // bit-identical before rounding.
  val qWinSlidingRows: Q = (s, dir) => {
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(dec(col("o_totalprice"))).cast("decimal(38,2)").as("daily_total"))
    // global-window OK: input is one row per DAY (post-aggregation,
    // planning-scale cardinality at any corpus size), and a ±3-row
    // frame over a global order is inherently sequential
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    // NO round on the quotient (r15, caught by the sf10 sweep): the
    // window sum is exact decimal on both engines and its unscaled
    // value stays < 2^53 cents, so the decimal→double cast and the
    // IEEE division produce BIT-IDENTICAL doubles in Spark and
    // DuckDB — but ROUND(double, 6) at ~1.5e9 magnitude (16
    // significant digits, the precision edge) is where the engines'
    // rounding implementations legitimately disagree (Spark rounds
    // the double's exact binary value via BigDecimal; DuckDB's
    // scaled-trick error flips the last digit on /7-fraction
    // boundary values — 356 of 2405 rows at sf10). Emitting the raw
    // quotient removes the only divergent step.
    daily.select(col("day"),
        (sum(col("daily_total")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("moving_avg"))
      .orderBy("day")
  }

  val qWinSlidingRowsSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS daily_total
      |  FROM orders GROUP BY 1)
      |SELECT day,
      |       CAST(SUM(daily_total) OVER w AS DOUBLE)
      |       / CAST(COUNT(*) OVER w AS DOUBLE) AS moving_avg
      |FROM daily
      |WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      |ORDER BY day""".stripMargin

  // ---- #27 q_win_ntile ---------------------------------------------------
  // NTILE over a GLOBAL order, without the naive plan's scale trap: a
  // partition-less Window funnels the whole table through ONE task.
  // Instead: (1) approx-percentile cut points of the sort column
  // (tiny driver fetch, planning-scale — boundary quality affects only
  // balance, never the answer); (2) value-deterministic range buckets
  // from those cut points; (3) exact per-bucket counts, their prefix-sum
  // offsets, and the grand total as a 32-row aggregate broadcast back
  // onto the buckets → global rank = bucket offset + partition-LOCAL
  // row_number (Window.partitionBy bucket — parallel); (4) NTILE's
  // exact first-(N mod k)-buckets-get-one-extra formula with N as a
  // column. Identical output to ntile(4) OVER (ORDER BY ...) for any
  // total order (tiebreak is unique), parallel at any scale.
  // r12 re-pin: the WHOLE thing is now ONE action / one DAG — buckets
  // come from uniform ranges over the in-DAG (min, max) 1-row
  // aggregate (broadcast), not from a collected percentile pass, and
  // counts/offsets/total are a 32-row aggregate cumsum broadcast back
  // on _b instead of a second collect()+cache round trip. Isolated
  // runs showed the old shape was driver-round-trip-bound: three
  // sequential tiny DAGs cost ~3× one 600k-row window. Uniform ranges
  // are order-respecting for ANY data, so the answer is identical;
  // only bucket BALANCE is distribution-dependent (a skewed column
  // concentrates buckets — the percentile-cut variant this replaced
  // remains the right pick there; on this column both are balanced).
  val qWinNtile: Q = (s, dir) => {
    val k = 4
    val cust = Tables.customer(s, dir)
    val nBuckets = 32
    val mm = cust.agg(min(col("c_acctbal")).as("_mn"), max(col("c_acctbal")).as("_mx"))
    // bucket 0 = highest acctbal range (sort is acctbal DESC);
    // degenerate all-equal column → single bucket 0
    val bucketExpr = when(col("_mx") === col("_mn"), 0)
      .otherwise(least(lit(nBuckets - 1), greatest(lit(0),
        floor((col("_mx") - col("c_acctbal")) /
          ((col("_mx") - col("_mn")) / nBuckets)).cast("int"))))
    val bucketed = cust.crossJoin(broadcast(mm))
      .withColumn("_b", bucketExpr)
      .select(col("c_custkey"), col("c_acctbal"), col("_b"))
    // global-window OK: the cumsum window runs over at most nBuckets
    // (= 32) aggregate rows, bounded by construction.
    val wCum = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // global-window OK: same 32-row aggregate, full frame for total.
    val wTot = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val stats = bucketed.groupBy(col("_b")).agg(count(lit(1)).as("_c"))
      .select(col("_b"),
        coalesce(sum(col("_c")).over(wCum), lit(0L)).as("_off"),
        sum(col("_c")).over(wTot).as("_total"))
    val wLocal = Window.partitionBy(col("_b"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val withRn = bucketed.join(broadcast(stats), "_b")
      .select(col("c_custkey"), col("_total"),
        (col("_off") + row_number().over(wLocal)).as("_rn"))
    // NTILE's exact first-(N mod k)-buckets-get-one-extra formula,
    // with N as a COLUMN (same value on every row) instead of a
    // driver-collected literal
    val quartile = expr(
      s"""CASE WHEN _total div $k = 0 THEN _rn
         |     WHEN _rn <= (_total % $k) * (_total div $k + 1)
         |       THEN (_rn - 1) div (_total div $k + 1) + 1
         |     ELSE (_total % $k) +
         |          (_rn - (_total % $k) * (_total div $k + 1) - 1) div (_total div $k) + 1
         |END""".stripMargin)
    withRn.select(col("c_custkey"), quartile.cast("int").as("quartile"))
      .orderBy("c_custkey")
  }

  val qWinNtileSql: String =
    """SELECT c_custkey,
      |       NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ---- #28 q_sort_multi --------------------------------------------------
  val qSortMulti: Q = (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"),
        money(col("p_retailprice")).as("retail"))
      .orderBy(col("p_brand"), col("retail").desc, col("p_partkey"))

  val qSortMultiSql: String =
    """SELECT p_partkey, p_brand,
      |       CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS retail
      |FROM part
      |ORDER BY p_brand, retail DESC, p_partkey""".stripMargin

  // ---- #29 q_topk_global -------------------------------------------------
  // orderBy.limit → TakeOrderedAndProject: per-partition top-k then a
  // k-row merge on the driver; no global sort even at 100 TB.
  val qTopkGlobal: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"), money(col("o_totalprice")).as("total"))
      .orderBy(col("total").desc, col("o_orderkey"))
      .limit(10)

  val qTopkGlobalSql: String =
    """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM orders
      |ORDER BY total DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---- #30–32 set ops ----------------------------------------------------
  private def custNations(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"))

  private def suppNations(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"))

  val qSetUnion: Q = (s, dir) =>
    custNations(s, dir).union(suppNations(s, dir)).distinct().orderBy("n_name")

  val qSetIntersect: Q = (s, dir) =>
    custNations(s, dir).intersect(suppNations(s, dir)).orderBy("n_name")

  val qSetExcept: Q = (s, dir) =>
    custNations(s, dir).except(suppNations(s, dir)).orderBy("n_name")

  private val custNationsSql =
    "SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey"
  private val suppNationsSql =
    "SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey"

  // ------------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "q_scan_project" -> qScanProject,
    "q_scan_filter_pushdown" -> qScanFilterPushdown,
    "q_filter_complex" -> qFilterComplex,
    "q_project_expr" -> qProjectExpr,
    "q_join_inner_hash" -> qJoinInnerHash,
    "q_join_broadcast" -> qJoinBroadcast,
    "q_join_left" -> qJoinLeft,
    "q_join_full" -> qJoinFull,
    "q_join_semi" -> qJoinSemi,
    "q_join_anti" -> qJoinAnti,
    "q_join_cross" -> qJoinCross,
    "q_join_theta_range" -> qJoinThetaRange,
    "q_join_asof" -> qJoinAsof,
    "q_agg_group_sum" -> qAggGroupSum,
    "q_agg_distinct" -> qAggDistinct,
    "q_agg_having" -> qAggHaving,
    "q_agg_rollup" -> qAggRollup,
    "q_agg_cube" -> qAggCube,
    "q_agg_grouping_sets" -> qAggGroupingSets,
    "q_agg_stats" -> qAggStats,
    "q_win_rank" -> qWinRank,
    "q_win_topk_per_group" -> qWinTopkPerGroup,
    "q_win_lag_lead" -> qWinLagLead,
    "q_win_running" -> qWinRunning,
    "q_win_sliding_rows" -> qWinSlidingRows,
    "q_win_ntile" -> qWinNtile,
    "q_sort_multi" -> qSortMulti,
    "q_topk_global" -> qTopkGlobal,
    "q_set_union" -> qSetUnion,
    "q_set_intersect" -> qSetIntersect,
    "q_set_except" -> qSetExcept,
  )

  val oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |       CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS quantity
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
        |       CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS discount,
        |       CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_complex" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderstatus IN ('F','O')
        |  AND (o_orderpriority LIKE '3-%' OR o_totalprice > 100000)
        |  AND o_orderpriority IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "q_project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |            * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |            * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6)) AS DOUBLE) AS net_charge
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_inner_hash" ->
      """SELECT o_orderkey, c_custkey, c_name,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_brand,
        |       CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS quantity
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q_join_full" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     o AS (SELECT o_custkey, COUNT(*) AS f_orders FROM orders
        |           WHERE o_orderstatus = 'F' GROUP BY o_custkey)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name,
        |       COALESCE(f_orders, 0) AS f_orders
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_theta_range" -> qJoinThetaRangeSql,
    "q_join_asof" -> qJoinAsofSql,
    "q_agg_group_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
        |       CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS sum_disc_price,
        |       CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * (1 + CAST(l_tax AS DECIMAL(3,2)))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS sum_charge,
        |       ROUND(AVG(l_discount), 6) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT c_mktsegment,
        |       COUNT(DISTINCT o_custkey) AS n_customers,
        |       COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_agg_having" ->
      """SELECT o_custkey, COUNT(*) AS order_count
        |FROM orders
        |GROUP BY o_custkey
        |HAVING COUNT(*) > 5
        |ORDER BY o_custkey""".stripMargin,
    "q_agg_rollup" -> qAggRollupSql,
    "q_agg_cube" -> qAggCubeSql,
    "q_agg_grouping_sets" -> qAggGroupingSetsSql,
    "q_agg_stats" -> qAggStatsSql,
    "q_win_rank" -> qWinRankSql,
    "q_win_topk_per_group" -> qWinTopkPerGroupSql,
    "q_win_lag_lead" -> qWinLagLeadSql,
    "q_win_running" -> qWinRunningSql,
    "q_win_sliding_rows" -> qWinSlidingRowsSql,
    "q_win_ntile" -> qWinNtileSql,
    "q_sort_multi" -> qSortMultiSql,
    "q_topk_global" -> qTopkGlobalSql,
    "q_set_union" ->
      s"""SELECT n_name FROM ($custNationsSql UNION $suppNationsSql)
         |ORDER BY n_name""".stripMargin,
    "q_set_intersect" ->
      s"""SELECT n_name FROM ($custNationsSql INTERSECT $suppNationsSql)
         |ORDER BY n_name""".stripMargin,
    "q_set_except" ->
      s"""SELECT n_name FROM ($custNationsSql EXCEPT $suppNationsSql)
         |ORDER BY n_name""".stripMargin,
  )
}
