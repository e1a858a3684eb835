package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational surface, wave 2 (added r1; SURVEY.md §2B rows 77–81):
  * subqueries (Catalyst decorrelates them — §4.2), pivot/unpivot,
  * UNION ALL. All oracle-checked.
  */
object Relational2 {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---- #77 q_subquery_scalar ---------------------------------------------
  // Correlated scalar subquery → RewriteCorrelatedScalarSubquery turns
  // it into an aggregate + join; no per-row re-execution.
  // Output money as decimal→double (driver-hash repr symmetry; the
  // exact-decimal intermediate keeps §2.5.1 determinism).
  val qSubqueryScalar: Q = (s, dir) => {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM orders o
        |WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val qSubqueryScalarSql: String =
    """SELECT o_orderkey, o_custkey,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM orders o
      |WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---- #78 q_subquery_in -------------------------------------------------
  val qSubqueryIn: Q = (s, dir) => {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority LIKE '1-%')
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)
  }

  val qSubqueryInSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_orderpriority LIKE '1-%')
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  // ---- #79 q_pivot -------------------------------------------------------
  // Explicit value list: at scale this skips the extra distinct-values
  // job pivot otherwise runs, and pins the output schema.
  private val EVENT_TYPES = Seq("click", "error", "purchase", "signup", "view")

  val qPivot: Q = (s, dir) => {
    val p = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", EVENT_TYPES)
      .count()
    p.select(col("user_id") +:
        EVENT_TYPES.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy("user_id")
  }

  val qPivotSql: String = {
    val counts = EVENT_TYPES.map(t =>
      s"COUNT(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(",\n       ")
    s"""SELECT user_id,
       |       $counts
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  // ---- #80 q_unpivot -----------------------------------------------------
  val qUnpivot: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr(
          """stack(3, 'quantity', CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE),
            |         'discount', CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE),
            |         'tax',      CAST(CAST(l_tax      AS DECIMAL(18,2)) AS DOUBLE)) AS (metric, value)""".stripMargin))
      .orderBy("l_orderkey", "l_linenumber", "metric")

  val qUnpivotSql: String =
    """SELECT l_orderkey, l_linenumber, metric, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
      |         CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'discount',
      |         CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'tax',
      |         CAST(CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) FROM lineitem)
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  // ---- #81 q_set_union_all -----------------------------------------------
  val qSetUnionAll: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"))
    val su = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"))
    c.unionAll(su)
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_members"))
      .orderBy("n_name")
  }

  val qSetUnionAllSql: String =
    """SELECT n_name, COUNT(*) AS n_members FROM (
      |  SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  UNION ALL
      |  SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---- #89 q_agg_percentiles -----------------------------------------------
  // EXACT distribution summary per group: Spark's `percentile` (not
  // percentile_approx) interpolates linearly on the sorted values —
  // the same type-7 quantile DuckDB's quantile_cont computes, so the
  // oracle is a hash match, not a tolerance check. Exactness costs a
  // per-group sort; the documented 100 TB route for interactive use is
  // approx_percentile's fixed-size sketch (mergeable, one pass), with
  // this exact form for the final/audit pass where answers must be
  // reproducible. Rounded to 4dp against last-ulp interpolation skew.
  val qAggPercentiles: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))
      .orderBy("l_returnflag")

  val qAggPercentilesSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |       ROUND(quantile_cont(l_extendedprice, 0.5),  4) AS p50,
      |       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      |       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---- #90 q_join_skew_salted ------------------------------------------------
  // The explicit skew regime (SURVEY §4.3): when one join key is so hot
  // a single task would own it AND the dim side is too big to
  // broadcast, SkewUtils.saltedJoin scatters the hot key over nSalts
  // sub-keys and replicates the dim side nSalts×. The oracle is the
  // PLAIN join aggregated — salting must be invisible in the result.
  val qJoinSkewSalted: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.api.SkewUtils.saltedJoin(ev, cust,
        col("user_id"), col("c_custkey"), col("event_id"), nSalts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)")
          .cast("double").as("sum_value"))
      .orderBy("c_mktsegment")
  }

  val qJoinSkewSaltedSql: String = graft.queries.EV +
    """SELECT c_mktsegment, COUNT(*) AS n_events,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      |FROM e JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---- #91 q_win_range_frame -------------------------------------------------
  // RANGE frame over event time: each order's trailing-30-day spend for
  // its customer. Physically distinct from the ROWS frames (#25/#26):
  // the frame bound is a VALUE offset on the ordering column, and peers
  // (equal dates) are all in-frame — which also makes the result
  // deterministic under ties with no tiebreaker column needed. The
  // rolling-retention / trailing-window shape every event pipeline
  // needs; at scale it partitions by customer like any keyed window.
  val qWinRangeFrame: Q = (s, dir) => {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS day,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |         PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
        |       ) AS DECIMAL(38,2)) AS DOUBLE) AS trailing_30d
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin)
  }

  val qWinRangeFrameSql: String =
    """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS day,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |         PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
      |         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
      |       ) AS DECIMAL(38,2)) AS DOUBLE) AS trailing_30d
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---- #93 q_star_join_flagship ----------------------------------------------
  // The composite the per-operator rows never exercise TOGETHER: a
  // TPC-H-Q3/Q5-shaped star — two dimension hops (region→nation), two
  // fact hops (customer→orders→lineitem), a selective dim predicate +
  // date range, and an exact-decimal revenue agg. What the plan must
  // do at 100 TB (PlanSuite-pinned): broadcast both dims, push the
  // date filter into the orders scan, keep revenue partial+final.
  // Declared as one spark.sql text — Catalyst picks the join order.
  val qStarJoinFlagship: Q = (s, dir) => {
    Seq("region", "nation", "customer", "orders", "lineitem").foreach { t =>
      s.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    s.sql(
      """SELECT n_name,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  val qStarJoinFlagshipSql: String =
    """SELECT n_name,
      |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ------------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "q_agg_percentiles" -> qAggPercentiles,
    "q_win_range_frame" -> qWinRangeFrame,
    "q_star_join_flagship" -> qStarJoinFlagship,
    "q_join_skew_salted" -> qJoinSkewSalted,
    "q_subquery_scalar" -> qSubqueryScalar,
    "q_subquery_in" -> qSubqueryIn,
    "q_pivot" -> qPivot,
    "q_unpivot" -> qUnpivot,
    "q_set_union_all" -> qSetUnionAll,
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_percentiles" -> qAggPercentilesSql,
    "q_win_range_frame" -> qWinRangeFrameSql,
    "q_star_join_flagship" -> qStarJoinFlagshipSql,
    "q_join_skew_salted" -> qJoinSkewSaltedSql,
    "q_subquery_scalar" -> qSubqueryScalarSql,
    "q_subquery_in" -> qSubqueryInSql,
    "q_pivot" -> qPivotSql,
    "q_unpivot" -> qUnpivotSql,
    "q_set_union_all" -> qSetUnionAllSql,
  )
}
