package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Second wave of standard-SQL surface (added r1; SURVEY.md §2B rows
  * 72–76): value window functions, rank statistics, extended string
  * functions, conditional expressions, bitwise ops. All oracle-checked.
  */
object Scalars2 {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---- #72 q_win_value_funcs ---------------------------------------------
  // first/last/nth over an explicit full frame (default frames for
  // last_value stop at CURRENT ROW — a classic correctness trap, so
  // the frame is spelled out identically in both engines).
  val qWinValueFuncs: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val qWinValueFuncsSql: String =
    """SELECT o_custkey, o_orderkey,
      |       FIRST_VALUE(o_orderkey) OVER w AS first_ok,
      |       LAST_VALUE(o_orderkey) OVER w AS last_ok,
      |       NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- #73 q_win_rank_stats ----------------------------------------------
  val qWinRankStats: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  val qWinRankStatsSql: String =
    """SELECT o_orderkey, o_orderstatus,
      |       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      |       ROUND(CUME_DIST() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  // ---- #74 q_str_funcs2 --------------------------------------------------
  val qStrFuncs2: Q = (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"),
        expr("split_part(p_name, ' ', 1)").as("first_word"),
        reverse(col("p_brand")).as("brand_rev"),
        expr("repeat('ab', p_size % 3)").as("ab_rep"),
        expr("left(p_name, 4)").as("name_left4"),
        expr("right(p_name, 3)").as("name_right3"),
        instr(col("p_name"), "a").as("a_pos"),
        (instr(col("p_name"), "steel") > 0).cast("int").as("has_steel"))
      .orderBy("p_partkey")

  val qStrFuncs2Sql: String =
    """SELECT p_partkey,
      |       split_part(p_name, ' ', 1) AS first_word,
      |       REVERSE(p_brand) AS brand_rev,
      |       REPEAT('ab', p_size % 3) AS ab_rep,
      |       LEFT(p_name, 4) AS name_left4,
      |       RIGHT(p_name, 3) AS name_right3,
      |       CAST(STRPOS(p_name, 'a') AS INT) AS a_pos,
      |       CAST(STRPOS(p_name, 'steel') > 0 AS INT) AS has_steel
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---- #75 q_cond_funcs --------------------------------------------------
  val qCondFuncs: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        when(dec(col("o_totalprice")) > 200000, "high")
          .when(dec(col("o_totalprice")) > 100000, "mid")
          .otherwise("low").as("tier"),
        expr("nullif(o_orderstatus, 'O')").as("status_or_null"),
        coalesce(expr("nullif(o_orderstatus, 'O')"), lit("OPEN")).as("status_label"),
        greatest(dec(col("o_totalprice")), lit(100000).cast("decimal(18,2)"))
          .cast("decimal(18,2)").cast("double").as("at_least_100k"),
        least(dec(col("o_totalprice")), lit(100000).cast("decimal(18,2)"))
          .cast("decimal(18,2)").cast("double").as("at_most_100k"))
      .orderBy("o_orderkey")

  val qCondFuncsSql: String =
    """SELECT o_orderkey,
      |       CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) > 200000 THEN 'high'
      |            WHEN CAST(o_totalprice AS DECIMAL(18,2)) > 100000 THEN 'mid'
      |            ELSE 'low' END AS tier,
      |       NULLIF(o_orderstatus, 'O') AS status_or_null,
      |       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
      |       CAST(CAST(GREATEST(CAST(o_totalprice AS DECIMAL(18,2)), CAST(100000 AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS at_least_100k,
      |       CAST(CAST(LEAST(CAST(o_totalprice AS DECIMAL(18,2)), CAST(100000 AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS at_most_100k
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---- #76 q_bitwise -----------------------------------------------------
  val qBitwise: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr("o_orderkey & 255").as("and255"),
        expr("o_orderkey | 16").as("or16"),
        expr("o_orderkey ^ 85").as("xor85"),
        expr("shiftleft(o_orderkey % 128, 2)").as("shl2"),
        expr("shiftright(o_orderkey, 3)").as("shr3"),
        bit_count(col("o_orderkey")).as("bits"))
      .orderBy("o_orderkey")

  val qBitwiseSql: String =
    """SELECT o_orderkey,
      |       o_orderkey & 255 AS and255,
      |       o_orderkey | 16 AS or16,
      |       XOR(o_orderkey, 85) AS xor85,
      |       (o_orderkey % 128) << 2 AS shl2,
      |       o_orderkey >> 3 AS shr3,
      |       CAST(BIT_COUNT(o_orderkey) AS INT) AS bits
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---- #110 q_agg_quantile_sketch ----------------------------------------
  // Mergeable KLL quantile sketches (functions/KllQuantile): per-flag
  // sketches of l_extendedprice, plus a GLOBAL row re-merged from the
  // per-flag partials via kll_union_agg — the sketch-persistence move
  // that makes 100 TB percentiles one linear pass + a KB-sized merge
  // instead of a full-domain sort (#89 stays the exact oracled row).
  // ORACLED since r12 (was no_oracle) via the tolerance-encoding
  // trick #119 established: raw sketch estimates are engine-specific,
  // so the row emits (a) EXACT hash-checked fields — group key, row
  // count, rounded min/max (pure data values, no interpolation, so
  // bit-identical cross-engine; interpolated quantiles are NOT
  // emitted — the two engines' linear interpolation differs in the
  // last ulp, which flips a 2 dp rounding at the .005 boundary) — and
  // (b) booleans asserting the SKETCH estimate lies inside the exact
  // value bracket of its ±3%-RANK guarantee (p50 ∈ [q47, q53],
  // p95 ∈ [q92, q98], p99 ∈ [q96, max]; brackets computed per-engine
  // and kept internal). DuckDB mirrors with its own approx_quantile
  // inside the same brackets — both engines' sketches meet the band,
  // so every column hash-matches while the KLL estimate (and the
  // union-merge path, via the ALL row) stays genuinely live.
  // ExtrasSuite still pins the tighter ≤3% rank-error bound directly.
  val qAggQuantileSketch: Q = (s, dir) => {
    graft.functions.KllQuantile.register(s)
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(
      """WITH g AS (
        |  SELECT l_returnflag,
        |         kll_sketch_agg(CAST(l_extendedprice AS DOUBLE)) AS sk,
        |         COUNT(*) AS n_items,
        |         MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
        |         percentile(l_extendedprice,
        |           array(0.47D, 0.5D, 0.53D, 0.92D, 0.95D, 0.98D, 0.96D, 0.99D, 1.0D)) AS ex
        |  FROM lineitem GROUP BY l_returnflag),
        |a AS (
        |  SELECT COUNT(*) AS n_items,
        |         MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
        |         percentile(l_extendedprice,
        |           array(0.47D, 0.5D, 0.53D, 0.92D, 0.95D, 0.98D, 0.96D, 0.99D, 1.0D)) AS ex
        |  FROM lineitem),
        |rows_ AS (
        |  SELECT l_returnflag, n_items, mn, mx, ex,
        |         kll_quantiles(sk, array(0.5D, 0.95D, 0.99D)) AS kq FROM g
        |  UNION ALL
        |  SELECT 'ALL' AS l_returnflag, a.n_items, a.mn, a.mx, a.ex,
        |         kll_quantiles(u.sk, array(0.5D, 0.95D, 0.99D)) AS kq
        |  FROM (SELECT kll_union_agg(sk) AS sk FROM g) u CROSS JOIN a)
        |SELECT l_returnflag, n_items,
        |       round(mn, 2) AS min_v, round(mx, 2) AS max_v,
        |       (kq[0] >= ex[0] AND kq[0] <= ex[2]) AS p50_ok,
        |       (kq[1] >= ex[3] AND kq[1] <= ex[5]) AS p95_ok,
        |       (kq[2] >= ex[6] AND kq[2] <= ex[8]) AS p99_ok
        |FROM rows_
        |ORDER BY l_returnflag""".stripMargin)
  }

  // DuckDB lists are 1-based; quantile_cont brackets are internal
  // (never emitted), approx_quantile (t-digest) plays the sketch's
  // role inside the identical brackets.
  val qAggQuantileSketchSql: String =
    """WITH g AS (
      |  SELECT l_returnflag, COUNT(*) AS n_items,
      |         MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
      |         quantile_cont(l_extendedprice,
      |           [0.47, 0.5, 0.53, 0.92, 0.95, 0.98, 0.96, 0.99, 1.0]) AS ex,
      |         approx_quantile(l_extendedprice, [0.5, 0.95, 0.99]) AS kq
      |  FROM lineitem GROUP BY l_returnflag
      |  UNION ALL
      |  SELECT 'ALL', COUNT(*),
      |         MIN(l_extendedprice), MAX(l_extendedprice),
      |         quantile_cont(l_extendedprice,
      |           [0.47, 0.5, 0.53, 0.92, 0.95, 0.98, 0.96, 0.99, 1.0]),
      |         approx_quantile(l_extendedprice, [0.5, 0.95, 0.99])
      |  FROM lineitem)
      |SELECT l_returnflag, n_items,
      |       ROUND(mn, 2) AS min_v, ROUND(mx, 2) AS max_v,
      |       (kq[1] >= ex[1] AND kq[1] <= ex[3]) AS p50_ok,
      |       (kq[2] >= ex[4] AND kq[2] <= ex[6]) AS p95_ok,
      |       (kq[3] >= ex[7] AND kq[3] <= ex[9]) AS p99_ok
      |FROM g
      |ORDER BY l_returnflag""".stripMargin

  // ---- #126 q_agg_theta_sketch (added r12) -------------------------------
  // Mergeable distinct-count sketches WITH set algebra (DataSketches
  // Theta, functions/ThetaSketch): per-event-type user sketches, then
  // |A|, |A ∪ B|, |A ∩ B|, |A \ B| as pure sketch algebra — the
  // audience-overlap question HLL (#21) cannot answer without
  // re-scanning. 100 TB shape: ONE linear pass builds KB-sized
  // per-segment sketches; every overlap/exclusion after that is
  // driver-side. Oracled via the #110/#119 tolerance encoding: exact
  // cardinalities (one per-user aggregate, hash-checked) + booleans
  // asserting each theta estimate sits within ±5% of exact (band on
  // the UNION size for the set-op rows — the standard error model;
  // RSE at 4096 nominal entries is ~1.6%, and below 4096 distincts
  // theta is exact). DuckDB mirrors with approx_count_distinct +
  // inclusion–exclusion inside the same bands.
  val qAggThetaSketch: Q = (s, dir) => {
    graft.functions.ThetaSketch.register(s)
    Tables.events(s, dir).createOrReplaceTempView("events_theta")
    s.sql(
      """WITH pu AS (
        |  SELECT user_id,
        |         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
        |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
        |  FROM events_theta GROUP BY user_id),
        |ex AS (
        |  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b,
        |         CAST(SUM(CASE WHEN a = 1 OR b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_union,
        |         CAST(SUM(a * b) AS BIGINT) AS n_intersect,
        |         CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anotb
        |  FROM pu),
        |sk AS (
        |  SELECT theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END) AS ska,
        |         theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END) AS skb
        |  FROM events_theta)
        |SELECT n_a, n_b, n_union, n_intersect, n_anotb,
        |       (abs(theta_est(ska) - n_a) <= 0.05 * n_a) AS a_ok,
        |       (abs(theta_est(skb) - n_b) <= 0.05 * n_b) AS b_ok,
        |       (abs(theta_union_est(ska, skb) - n_union) <= 0.05 * n_union) AS union_ok,
        |       (abs(theta_intersect_est(ska, skb) - n_intersect) <= 0.05 * n_union) AS intersect_ok,
        |       (abs(theta_anotb_est(ska, skb) - n_anotb) <= 0.05 * n_union) AS anotb_ok
        |FROM ex CROSS JOIN sk""".stripMargin)
  }

  val qAggThetaSketchSql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
      |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
      |  FROM events GROUP BY user_id),
      |ex AS (
      |  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b,
      |         CAST(SUM(CASE WHEN a = 1 OR b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_union,
      |         CAST(SUM(a * b) AS BIGINT) AS n_intersect,
      |         CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anotb
      |  FROM pu),
      |ap AS (
      |  SELECT approx_count_distinct(CASE WHEN event_type = 'click' THEN user_id END) AS ea,
      |         approx_count_distinct(CASE WHEN event_type = 'purchase' THEN user_id END) AS eb,
      |         approx_count_distinct(CASE WHEN event_type IN ('click', 'purchase') THEN user_id END) AS eu
      |  FROM events)
      |SELECT n_a, n_b, n_union, n_intersect, n_anotb,
      |       (abs(ea - n_a) <= 0.05 * n_a) AS a_ok,
      |       (abs(eb - n_b) <= 0.05 * n_b) AS b_ok,
      |       (abs(eu - n_union) <= 0.05 * n_union) AS union_ok,
      |       (abs((ea + eb - eu) - n_intersect) <= 0.05 * n_union) AS intersect_ok,
      |       (abs((eu - eb) - n_anotb) <= 0.05 * n_union) AS anotb_ok
      |FROM ex CROSS JOIN ap""".stripMargin

  // ------------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "q_win_value_funcs" -> qWinValueFuncs,
    "q_win_rank_stats" -> qWinRankStats,
    "q_str_funcs2" -> qStrFuncs2,
    "q_cond_funcs" -> qCondFuncs,
    "q_bitwise" -> qBitwise,
    "q_agg_quantile_sketch" -> qAggQuantileSketch,
    "q_agg_theta_sketch" -> qAggThetaSketch,
  )

  val oracleSql: Map[String, String] = Map(
    "q_win_value_funcs" -> qWinValueFuncsSql,
    "q_win_rank_stats" -> qWinRankStatsSql,
    "q_str_funcs2" -> qStrFuncs2Sql,
    "q_cond_funcs" -> qCondFuncsSql,
    "q_bitwise" -> qBitwiseSql,
    "q_agg_quantile_sketch" -> qAggQuantileSketchSql,
    "q_agg_theta_sketch" -> qAggThetaSketchSql,
  )
}
