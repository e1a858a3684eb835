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
    // positional aliases + escaped literals: raw column names go into
    // a generated SQL string below, so a name with spaces, dots,
    // quotes or backticks must not break the stack() parse — the
    // aliases are synthetic (nn_0/nd_0 …) and only the display
    // literal carries the original name, escaped
    def sqlLit(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    // backtick-quote on the Column side too: a bare col("a.b") would
    // resolve as struct-field access, not the column named "a.b"
    def qcol(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      sum(qcol(c).isNull.cast("long")).as(s"nn_$i"),
      (if (exact) countDistinct(qcol(c))
       else approx_count_distinct(qcol(c), 0.02)).as(s"nd_$i")) }
    val stackArgs = cols.indices.map(i =>
      s"${sqlLit(cols(i))}, nn_$i, nd_$i").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.length}, $stackArgs) " +
        "AS (column_name, n_nulls, n_distinct)")
      .orderBy("column_name")
  }
}
