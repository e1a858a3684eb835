package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-build extension entry point:
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`).
  *
  * Injects what the runtime `Engine.init` seam structurally cannot:
  *  - [[plans.ResolveRangeBinHint]] into the ANALYZER, so
  *    `df.hint("range_bin", w)` survives analysis as a
  *    [[plans.RangeBinWidthHint]] marker (unrecognized hints are
  *    dropped before any optimizer rule runs — SURVEY §2B note on
  *    round-9 candidate 7);
  *  - [[plans.RangeBinJoinRule]] into the optimizer, so
  *    extension-built sessions get the range-join rewrite without
  *    calling `Engine.init` (which still installs the same rule via
  *    `extraOptimizations` for conf-only sessions; the rule is
  *    idempotent, so double installation is harmless).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => plans.ResolveRangeBinHint)
    ext.injectOptimizerRule(_ => plans.RangeBinJoinRule)
    // same marker pattern for pre-shuffle skew salting:
    // df.hint("skew_salt", n) on the skewed side of an inner join
    ext.injectResolutionRule(_ => plans.ResolveSkewSaltHint)
    ext.injectOptimizerRule(_ => plans.SkewSaltJoinRule)
    // SQL table functions for the analytics wave: graft_funnel /
    // graft_cohort_retention / graft_twap (Engine.init registers the
    // same ones at runtime for conf-only sessions)
    api.EventAnalytics.descriptions.foreach(ext.injectTableFunction)
  }
}
