package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and masking over a text column — the privacy pass every
  * public-web training corpus runs before anything else sees the data
  * (C4 strips pages on a blocklist; CCNet/Dolma/ROOTS-style pipelines mask
  * emails, phone numbers, and IP addresses with typed placeholder tokens).
  *
  * Design for 100 TB:
  *   - Entirely MAP-SIDE: `regexp_count` / `regexp_replace` are codegen'd
  *     built-ins, so detection and scrubbing ride the scan with zero
  *     shuffle; the only exchange in [[report]] is a partial-aggregated
  *     rollup with one group per rule.
  *   - Rules are ORDERED and applied sequentially (email → phone → IPv4 by
  *     default) so an earlier mask cannot manufacture a later match and a
  *     later rule cannot fire inside an earlier rule's span (an email's
  *     dotted domain never resurfaces as an IPv4 once `<EMAIL>` replaced
  *     it).
  *   - Patterns stay inside the regex subset whose match semantics agree
  *     across Java regex and RE2-family engines (character classes, bounded
  *     repetition, `\b`) — no backreferences, no lookaround — so the same
  *     rule set is portable to the SQL oracle and to sibling engines.
  *
  * The [[report]] output is self-certifying: `n_residual` re-counts every
  * rule's pattern over the SCRUBBED text and must be 0 — a masking
  * regression (wrong order, partial replace) breaks the zeros as well as
  * the hash.
  */
object Pii {

  /** One detection/masking rule: `name` keys the per-rule output columns,
    * `pattern` must be valid (and equivalent) in Java regex and RE2,
    * `mask` is the typed placeholder written over every match.
    */
  final case class Rule(name: String, pattern: String, mask: String) {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"pii rule name '$name' must be alphanumeric (it keys output columns)")
  }

  /** RFC-5322-ish practical email shape (the Dolma/CCNet operating point:
    * catch real addresses, not every grammar corner).
    */
  val Email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  /** International-prefix phone shape `+C[C] NNN-NNN-NNNN`. Deliberately
    * prefix-anchored on `+` so bare number runs in prose (ids, quantities)
    * never mask.
    */
  val Phone: Rule = Rule("phone",
    "\\+[0-9]{1,2} [0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>")

  /** Dotted-quad IPv4 with word boundaries; runs AFTER email so a dotted
    * mail domain can never match.
    */
  val Ipv4: Rule = Rule("ipv4",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")

  /** Default ordered rule set. Order is semantic — see class doc. */
  val Default: Seq[Rule] = Seq(Email, Phone, Ipv4)

  private def requireRules(rules: Seq[Rule]): Unit = {
    require(rules.nonEmpty, "pii: at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"pii: duplicate rule names in ${rules.map(_.name).mkString(",")}")
  }

  /** Per-row match counts: adds one `n_<rule>` INT column per rule,
    * counting matches of the rule's pattern in `textCol` (the ORIGINAL
    * text — counts are what detection saw, independent of masking order).
    */
  def withCounts(df: DataFrame, textCol: String,
                 rules: Seq[Rule] = Default): DataFrame = {
    requireRules(rules)
    rules.foldLeft(df)((d, r) =>
      d.withColumn(s"n_${r.name}", regexp_count(col(textCol), lit(r.pattern))))
  }

  /** The scrubbed text as a column expression: rules applied in order,
    * each replacing ALL of its matches with the rule's mask token.
    */
  def scrubCol(text: Column, rules: Seq[Rule] = Default): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, r.pattern, r.mask))

  /** Masks `textCol` in place (or into `out`), all rules in order. */
  def scrub(df: DataFrame, textCol: String, rules: Seq[Rule] = Default,
            out: String = ""): DataFrame = {
    requireRules(rules)
    val target = if (out.isEmpty) textCol else out
    df.withColumn(target, scrubCol(col(textCol), rules))
  }

  /** Corpus rollup, one row per rule:
    * `(pii_type, n_docs, n_matches, n_residual)` where `n_docs` counts
    * rows with ≥1 match, `n_matches` totals matches over the original
    * text, and `n_residual` totals matches REMAINING in the scrubbed text
    * — 0 by construction, kept in the output as the self-certifying
    * invariant.
    */
  def report(df: DataFrame, textCol: String,
             rules: Seq[Rule] = Default): DataFrame = {
    requireRules(rules)
    val counted = withCounts(df, textCol, rules)
      .withColumn("__scrubbed", scrubCol(col(textCol), rules))
    val residual = rules.foldLeft(counted)((d, r) =>
      d.withColumn(s"r_${r.name}",
        regexp_count(col("__scrubbed"), lit(r.pattern))))
    val stackArgs = rules.map(r => s"'${r.name}', n_${r.name}, r_${r.name}")
      .mkString(", ")
    residual
      .selectExpr(s"stack(${rules.size}, $stackArgs) AS (pii_type, n, r)")
      .groupBy("pii_type")
      .agg(count_if(col("n") > 0).as("n_docs"),
           sum(col("n")).as("n_matches"),
           sum(col("r")).as("n_residual"))
      .orderBy("pii_type")
  }
}
