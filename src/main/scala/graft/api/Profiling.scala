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
    def qname(c: String) = "`" + c.replace("`", "``") + "`"
    def qcol(c: String) = col(qname(c))
    if (!exact) graft.functions.ThetaSketch.register(df.sparkSession)
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      sum(qcol(c).isNull.cast("long")).as(s"nn_$i"),
      (if (exact) countDistinct(qcol(c))
       else expr(s"theta_sketch_agg(${qname(c)})")).as(s"nd_$i")) }
    // approx mode: theta_est runs on the single aggregated row only;
    // CAST(ROUND(..)) keeps n_distinct a LongType like the exact mode
    def ndExpr(i: Int) =
      if (exact) s"nd_$i" else s"CAST(ROUND(theta_est(nd_$i)) AS BIGINT)"
    val stackArgs = cols.indices.map(i =>
      s"${sqlLit(cols(i))}, nn_$i, ${ndExpr(i)}").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.length}, $stackArgs) " +
        "AS (column_name, n_nulls, n_distinct)")
      .orderBy("column_name")
  }

  /** Full ANALYZE for NUMERIC columns — [[profile]]'s counts plus
    * min/max/avg, still ONE aggregate pass over the table, one output
    * row per column.
    *
    * Same two modes:
    *  - `exact = true` — exact distincts (multi-distinct expand, the
    *    oracled `q_profile_stats` path); min/max are exact by nature;
    *    avg is `round(avg(double), 6)` — deterministic whenever the
    *    column's double sum is exact (integer-valued columns; money
    *    columns should be profiled on their decimal cast).
    *  - `exact = false` — `approx_count_distinct` AND mergeable KLL
    *    sketches (`kll_sketch_agg`, k=200 ⇒ rank error ≈ 1.65%)
    *    giving `p50`/`p95` per column in the SAME pass: no expand,
    *    every aggregate partial-merges map-side — the 100 TB ANALYZE.
    *    Sketch bytes are engine-specific, so this mode is suite-bound
    *    (ExtrasSuite: rank error ≤ 3% vs the exact sort), not oracled.
    */
  def profileStats(df: DataFrame, columns: Seq[String] = Nil,
                   exact: Boolean = true): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "nothing to profile")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"unknown columns: ${bad.mkString(", ")}")
    if (!exact) {
      graft.functions.KllQuantile.register(df.sparkSession)
      graft.functions.ThetaSketch.register(df.sparkSession)
    }
    def sqlLit(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def qname(c: String) = "`" + c.replace("`", "``") + "`"
    def qcol(c: String) = col(qname(c))
    // approx distincts via the engine's theta sketch (r18 optimization
    // round): exact below 4096 distincts, RSE ≈ 1.6% above — well
    // inside both the suite's 5% bound and q_profile_stats_fast's 25%
    // nd_sane envelope. Spark's HyperLogLogPlusPlus at rsd 0.02 was
    // measured 1.36 s for these 5 columns at sf0.1 vs 0.26 s for the
    // theta aggregate (its 2^12-register buffer dominates the whole
    // ObjectHashAggregate update loop); the estimate is extracted on
    // the single aggregated row, never in the per-row path.
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val d = qcol(c).cast("double")
      Seq(
        sum(qcol(c).isNull.cast("long")).as(s"nn_$i"),
        (if (exact) countDistinct(qcol(c))
         else expr(s"theta_sketch_agg(${qname(c)})")).as(s"nd_$i"),
        min(d).as(s"mn_$i"),
        max(d).as(s"mx_$i"),
        round(avg(d), 6).as(s"av_$i")) ++
        (if (exact) Nil
         else Seq(expr(s"kll_sketch_agg(CAST(${qname(c)} AS DOUBLE))").as(s"kll_$i")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    if (exact) {
      val stackArgs = cols.indices.map(i =>
        s"${sqlLit(cols(i))}, nn_$i, nd_$i, mn_$i, mx_$i, av_$i").mkString(", ")
      one.selectExpr(s"stack(${cols.length}, $stackArgs) " +
          "AS (column_name, n_nulls, n_distinct, min_v, max_v, avg_v)")
        .orderBy("column_name")
    } else {
      // extract p50/p95 (and the theta distinct estimate) on the
      // single aggregated row — the extractor UDFs are off the hot path
      val withQ = cols.indices.foldLeft(one) { (acc, i) =>
        acc.withColumn(s"q_$i", expr(s"kll_quantiles(kll_$i, array(0.5D, 0.95D))"))
      }
      val stackArgs = cols.indices.map(i =>
        s"${sqlLit(cols(i))}, nn_$i, CAST(ROUND(theta_est(nd_$i)) AS BIGINT), " +
          s"mn_$i, mx_$i, av_$i, q_$i[0], q_$i[1]").mkString(", ")
      withQ.selectExpr(s"stack(${cols.length}, $stackArgs) " +
          "AS (column_name, n_nulls, n_distinct, min_v, max_v, avg_v, p50, p95)")
        .orderBy("column_name")
    }
  }
}
