package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling (the ANALYZE/data-quality scan behind
  * `q_profile_table` #107): per column, null count + distinct count,
  * unpivoted to a row per column.
  *
  * Two modes, same shape:
  *  - `exact = true` — COUNT(DISTINCT) per column via Catalyst's
  *    multi-distinct expand (the oracled #107 path). Exact, but the
  *    expand multiplies the scan by #columns and each distinct group
  *    shuffles its full domain — at 100 TB on a high-cardinality
  *    column that is a massive shuffle for a statistic nobody needs
  *    exactly.
  *  - `exact = false` — `approx_count_distinct` (HLL++, default rsd
  *    2%): ONE ordinary aggregate, no expand, partial-merged
  *    map-side like any sum; the 100 TB profiling path. Null counts
  *    stay exact in both modes (they're plain conditional sums).
  *
  * ProfilingSuite pins shape equality between the modes and the HLL
  * relative error ≤ 5% on every profiled column.
  */
object Profiling {

  /** Profile `columns` of `df` (default: every column): one output
    * row per column — (column_name, n_nulls, n_distinct), ordered by
    * column name.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil,
              exact: Boolean = true): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "nothing to profile")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"unknown columns: ${bad.mkString(", ")}")
    val aggs = cols.flatMap(c => Seq(
      sum(col(c).isNull.cast("long")).as(s"nn_$c"),
      (if (exact) countDistinct(col(c))
       else approx_count_distinct(col(c), 0.02)).as(s"nd_$c")))
    val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.length}, $stackArgs) " +
        "AS (column_name, n_nulls, n_distinct)")
      .orderBy("column_name")
  }
}
