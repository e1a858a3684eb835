package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core (SURVEY.md §2B #1–#32): scans, filters,
  * projections, joins, aggregations, windows, sorts, set ops.
  *
  * Determinism rules (§2.5) applied throughout: DECIMAL before money
  * arithmetic, round(6) on float outputs, total ORDER BY on unique
  * keys, flat primitive output columns.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Money column → exact decimal before any arithmetic (§2.5.1). */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---- #1 q_scan_project -------------------------------------------------
  // Flagship-grade scan: project 4 columns, total order. Column pruning
  // means the parquet reader materializes only these 4 columns.
  val qScanProject: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        dec(col("l_quantity")).as("quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  val qScanProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |       CAST(l_quantity AS DECIMAL(18,2)) AS quantity
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- #14 q_agg_group_sum (TPC-H Q1 shape) ------------------------------
  // Two-phase HashAggregate (partial map-side + final) — the shape that
  // scales: shuffle carries only |groups| × partial-state, not rows.
  val qAggGroupSum: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val price = dec(col("l_extendedprice"))
    val disc  = dec(col("l_discount"))
    val tax   = dec(col("l_tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("decimal(38,2)").as("sum_qty"),
        sum(price).cast("decimal(38,2)").as("sum_base_price"),
        sum(price * (lit(1) - disc)).cast("decimal(38,4)").as("sum_disc_price"),
        sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("decimal(38,6)").as("sum_charge"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val qAggGroupSumSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(38,6)) AS sum_charge,
      |       ROUND(AVG(l_discount), 6) AS avg_disc,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_scan_project" -> qScanProject,
    "q_agg_group_sum" -> qAggGroupSum,
  )

  val oracleSql: Map[String, String] = Map(
    "q_scan_project" -> qScanProjectSql,
    "q_agg_group_sum" -> qAggGroupSumSql,
  )
}
