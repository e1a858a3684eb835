package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the curation step every shareable training corpus
  * runs before tokenization: find personally-identifying spans and
  * replace each with a typed placeholder token, keeping per-document
  * counts of what was masked (the audit signal quality dashboards
  * aggregate).
  *
  * Pattern pack (applied IN ORDER — earlier rules consume their spans
  * before later rules see the text):
  *
  *  1. `email`    → `<EMAIL>`  — local@domain.tld
  *  2. `ipv6`     → `<IPV6>`   — full 8-group hex form
  *  3. `ipv4`     → `<IPV4>`   — dotted quad
  *  4. `card`     → `<CARD>`   — 16-digit card shapes (4×4 groups,
  *     optional space/dash separators), **Luhn-gated**: only
  *     candidates whose digits pass the Luhn mod-10 checksum are
  *     masked; a checksum-invalid lookalike is left for later rules
  *     (an unseparated one is still caught by the digit-run rule).
  *     The checksum is computed with higher-order Column functions
  *     (`transform`/`aggregate` over the digit string) — codegen'd,
  *     no UDF — and the gated replacement folds the valid candidates
  *     into literal `replace` calls, so the whole rule stays a pure
  *     projection both here and in the DuckDB oracle.
  *  5. `phone`    → `<PHONE>`  — E.164 (`+` then 7–15 digits)
  *  6. `phonesep` → `<PHONE>`  — NNN-NNN-NNNN separated form
  *  7. `id`       → `<ID>`     — any remaining run of ≥9 digits
  *     (account ids, SSN-shaped, checksum-invalid unseparated cards)
  *
  * Audit counts are evaluated on the text AS EACH RULE SEES IT (i.e.
  * after earlier rules' replacements), so `n<rule>` is the number of
  * replacements that rule actually made — a ≥9-digit run inside an
  * email address is counted by `email`, not double-counted by `id`
  * (ADVICE r11: counting every rule on the raw text overstated the
  * audit).
  *
  * Patterns are deliberately restricted to the regex intersection
  * both classical engines (Java util.regex) and RE2-family engines
  * (no backtracking) support — character classes + bounded
  * quantifiers only, no lookaround, no backreferences — so the same
  * pattern string produces identical spans everywhere (the same
  * §2.5 determinism rule the oracle depends on).
  *
  * Scale shape: pure per-row projection (codegen'd regexp_replace /
  * regexp_count / HOFs) — embarrassingly parallel, NO shuffle, no
  * state; at 100 TB this runs at scan speed and pipelines into
  * whatever follows.
  */
object PiiScrub {

  /** One scrub rule: count column is named `n<name>`. */
  sealed trait Rule { def name: String; def pattern: String; def repl: String }
  /** Plain regex mask. */
  final case class RegexRule(name: String, pattern: String, repl: String) extends Rule
  /** Regex candidates gated by the Luhn mod-10 checksum. */
  final case class LuhnRule(name: String, pattern: String, repl: String) extends Rule

  val DEFAULT_RULES: Seq[Rule] = Seq(
    RegexRule("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    RegexRule("ipv6", "[0-9a-f]{1,4}(:[0-9a-f]{1,4}){7}", "<IPV6>"),
    RegexRule("ipv4", "[0-9]{1,3}(\\.[0-9]{1,3}){3}", "<IPV4>"),
    LuhnRule("card", "[0-9]{4}([ -]?[0-9]{4}){3}", "<CARD>"),
    RegexRule("phone", "\\+[0-9]{7,15}", "<PHONE>"),
    RegexRule("phonesep", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    RegexRule("id", "[0-9]{9,}", "<ID>"))

  /** Luhn mod-10 validity of the digit string `x` (separators
    * stripped), as a SQL expression string — HOF arithmetic only, so
    * the identical formula runs in Spark codegen and in the DuckDB
    * oracle (modulo list_sum/aggregate spelling). */
  private def luhnValidSql(x: String): String = {
    val clean = s"regexp_replace($x, '[ -]', '')"
    val dig = s"(ascii(substring(reverse($clean), i, 1)) - 48)"
    s"aggregate(transform(sequence(1, length($clean)), i -> " +
      s"CASE WHEN i % 2 = 0 THEN (CASE WHEN $dig * 2 > 9 THEN $dig * 2 - 9 " +
      s"ELSE $dig * 2 END) ELSE $dig END), 0, (a, v) -> a + v) % 10 = 0"
  }

  /** Luhn-valid candidate matches of `pattern` in column `tcol`
    * (array<string>, possibly empty). `tcol` must be a plain column
    * NAME (the expression is built as SQL text). */
  private def luhnCandidatesSql(tcol: String, pattern: String): String =
    s"filter(regexp_extract_all($tcol, '$pattern', 0), x -> ${luhnValidSql("x")})"

  /** Scrub `textCol` of `df`: appends one `n<rule>` BIGINT count
    * column per rule (replacements that rule made) and replaces the
    * text with its fully-scrubbed form. Chained projections — one per
    * rule — that Catalyst collapses into a single codegen'd select. */
  def scrub(df: DataFrame, textCol: String,
      rules: Seq[Rule] = DEFAULT_RULES): DataFrame = {
    val keep = df.columns.filterNot(_ == textCol).map(col).toSeq
    rules.foldLeft(df) { (cur, rule) =>
      val prior = cur.columns.filterNot(_ == textCol).map(col).toSeq
      val (cnt, next) = rule match {
        case RegexRule(name, p, r) =>
          (regexp_count(col(textCol), lit(p)).cast("bigint").as("n" + name),
            regexp_replace(col(textCol), p, r))
        case LuhnRule(name, p, r) =>
          val cands = luhnCandidatesSql(textCol, p)
          (expr(s"size($cands)").cast("bigint").as("n" + name),
            expr(s"aggregate($cands, $textCol, (acc, x) -> replace(acc, x, '$r'))"))
      }
      cur.select((prior :+ cnt :+ next.as(textCol)): _*)
    }.select((keep ++ rules.map(r => col("n" + r.name)) :+ col(textCol)): _*)
  }
}
