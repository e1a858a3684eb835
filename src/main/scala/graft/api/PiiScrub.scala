package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the curation step every shareable training corpus
  * runs before tokenization: find personally-identifying spans
  * (emails, long digit runs / account ids, phone-shaped sequences)
  * and replace each with a typed placeholder token, keeping a
  * per-document count of what was masked (the audit signal quality
  * dashboards aggregate).
  *
  * Patterns are deliberately restricted to the regex intersection
  * both classical engines (Java util.regex) and RE2-family engines
  * (no backtracking) support — character classes + bounded
  * quantifiers only, no lookaround, no backreferences — so the same
  * pattern string produces identical spans everywhere (the same
  * §2.5 determinism rule the oracle depends on).
  *
  * Scale shape: pure per-row projection (codegen'd regexp_replace /
  * regexp_count) — embarrassingly parallel, NO shuffle, no state; at
  * 100 TB this runs at scan speed and pipelines into whatever
  * follows. Order of application matters and is fixed: emails first
  * (their local part may contain digits that the id pattern would
  * otherwise split), then digit runs.
  */
object PiiScrub {

  /** (pattern, replacement) in application order. */
  val DEFAULT_RULES: Seq[(String, String)] = Seq(
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "[0-9]{9,}" -> "<ID>")

  /** The scrubbed text column: `rules` applied in order. */
  def scrubCol(text: Column, rules: Seq[(String, String)] = DEFAULT_RULES): Column =
    rules.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Per-rule match-count columns (BIGINT), evaluated on the ORIGINAL
    * text — counts are an audit of what was found, so they must not
    * see earlier rules' replacements. */
  def countCols(text: Column, rules: Seq[(String, String)] = DEFAULT_RULES): Seq[Column] =
    rules.map { case (p, r) =>
      regexp_count(text, lit(p)).cast("bigint")
        .as("n" + r.toLowerCase.replaceAll("[^a-z]", ""))
    }

  /** Scrub `textCol` of `df`: adds the count columns and replaces the
    * text with its scrubbed form. */
  def scrub(df: DataFrame, textCol: String,
      rules: Seq[(String, String)] = DEFAULT_RULES): DataFrame = {
    val t = col(textCol)
    df.select((df.columns.filterNot(_ == textCol).map(col).toSeq ++
      countCols(t, rules) :+ scrubCol(t, rules).as(textCol)): _*)
  }
}
