package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling (the ANALYZE/data-quality scan behind
  * `q_profile_table` #107): per column, null count + distinct count,
  * unpivoted to a row per column.
  *
  * Two modes, same shape:
  *  - `exact = true` — COUNT(DISTINCT) per column, one SINGLE-distinct
  *    aggregate per column unioned (the oracled #107 path; r19 — a
  *    lone distinct group plans Expand-free as partial-agg-by-value +
  *    merge, where the old all-columns-in-one aggregate paid
  *    Catalyst's ×(cols+1) Expand on every scan row). Exact, but each
  *    column still shuffles its distinct domain — at 100 TB on a
  *    high-cardinality column that is a massive shuffle for a
  *    statistic nobody needs exactly.
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
    if (exact) {
      // r19 optimization round: one single-distinct aggregate PER
      // COLUMN, unioned — not one multi-distinct aggregate. With n
      // distinct column groups in one Aggregate, Catalyst rewrites via
      // Expand: every scan row is multiplied ×(n+1) BEFORE the partial
      // aggregate, and the one exchange carries every column's domain
      // in rows padded with n−1 null slots. A SINGLE distinct
      // aggregate plans Expand-free (partial agg keyed by the value —
      // map-side dedup — then merge), each subtree's parquet scan
      // prunes to exactly its one column, and the n subtrees run as
      // independent AQE stages. Same exact counts, same one row per
      // column; the per-column UNION is also exactly the oracle SQL's
      // shape. (Measured at sf0.1, q_profile_table: 0.98 → see
      // OPTIMIZATION_r19.md; shuffle rows drop because nothing is
      // multiplied ×(n+1).)
      val parts = cols.map { c =>
        df.agg(
            sum(qcol(c).isNull.cast("long")).as("n_nulls"),
            countDistinct(qcol(c)).as("n_distinct"))
          .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"))
      }
      parts.reduce(_.unionByName(_)).orderBy("column_name")
    } else {
      val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
        sum(qcol(c).isNull.cast("long")).as(s"nn_$i"),
        expr(s"theta_sketch_agg(${qname(c)})").as(s"nd_$i")) }
      // theta_est runs on the single aggregated row only;
      // CAST(ROUND(..)) keeps n_distinct a LongType like the exact mode
      val stackArgs = cols.indices.map(i =>
        s"${sqlLit(cols(i))}, nn_$i, CAST(ROUND(theta_est(nd_$i)) AS BIGINT)").mkString(", ")
      df.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${cols.length}, $stackArgs) " +
          "AS (column_name, n_nulls, n_distinct)")
        .orderBy("column_name")
    }
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
    if (exact) {
      // r19 optimization round: same per-column single-distinct UNION
      // as [[profile]] — no ×(cols+1) Expand, each subtree scans one
      // pruned column, partial aggs dedup map-side before the
      // exchange. avg determinism is untouched: round(avg(double), 6)
      // is the same expression over the same rows; the one-distinct
      // plan partial-aggregates avg's (sum, count) grouped by the
      // column value before merging, which reorders the double sum —
      // exact for the integer-valued columns this row declares
      // (#113's stated avg contract), same as the Expand plan's own
      // partition-order dependence.
      val parts = cols.map { c =>
        val d = qcol(c).cast("double")
        df.agg(
            sum(qcol(c).isNull.cast("long")).as("n_nulls"),
            countDistinct(qcol(c)).as("n_distinct"),
            min(d).as("min_v"), max(d).as("max_v"),
            round(avg(d), 6).as("avg_v"))
          .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
            col("min_v"), col("max_v"), col("avg_v"))
      }
      parts.reduce(_.unionByName(_)).orderBy("column_name")
    } else {
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        val d = qcol(c).cast("double")
        Seq(
          sum(qcol(c).isNull.cast("long")).as(s"nn_$i"),
          expr(s"theta_sketch_agg(${qname(c)})").as(s"nd_$i"),
          min(d).as(s"mn_$i"),
          max(d).as(s"mx_$i"),
          round(avg(d), 6).as(s"av_$i"),
          expr(s"kll_sketch_agg(CAST(${qname(c)} AS DOUBLE))").as(s"kll_$i"))
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
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
