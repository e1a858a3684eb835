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
  // Engine-specific (sketch bytes / estimates differ across engines) —
  // declared no_oracle like #21b; ExtrasSuite pins the ≤3% rank-error
  // bound and partial-vs-direct merge equivalence.
  val qAggQuantileSketch: Q = (s, dir) => {
    graft.functions.KllQuantile.register(s)
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(
      """WITH parts AS (
        |  SELECT l_returnflag,
        |         kll_sketch_agg(CAST(l_extendedprice AS DOUBLE)) AS sk
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |       round(qs[0], 2) AS p50, round(qs[1], 2) AS p95, round(qs[2], 2) AS p99
        |FROM (SELECT l_returnflag, kll_quantiles(sk, array(0.5, 0.95, 0.99)) AS qs
        |      FROM parts)
        |UNION ALL
        |SELECT 'ALL' AS l_returnflag,
        |       round(qs[0], 2) AS p50, round(qs[1], 2) AS p95, round(qs[2], 2) AS p99
        |FROM (SELECT kll_quantiles(kll_union_agg(sk), array(0.5, 0.95, 0.99)) AS qs
        |      FROM parts)
        |ORDER BY l_returnflag""".stripMargin)
  }

  // ------------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "q_win_value_funcs" -> qWinValueFuncs,
    "q_win_rank_stats" -> qWinRankStats,
    "q_str_funcs2" -> qStrFuncs2,
    "q_cond_funcs" -> qCondFuncs,
    "q_bitwise" -> qBitwise,
    "q_agg_quantile_sketch" -> qAggQuantileSketch,
  )

  val oracleSql: Map[String, String] = Map(
    "q_win_value_funcs" -> qWinValueFuncsSql,
    "q_win_rank_stats" -> qWinRankStatsSql,
    "q_str_funcs2" -> qStrFuncs2Sql,
    "q_cond_funcs" -> qCondFuncsSql,
    "q_bitwise" -> qBitwiseSql,
  )
}
