package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the compliance gate every training-data
  * pipeline runs before text ships (reference has no text-safety surface;
  * this is part of the LLM-data extension alongside dedup/decontamination).
  *
  * Everything here is a NARROW codegen'd expression chain (regexp count +
  * regexp_replace): zero shuffles, runs inside the scan's WholeStageCodegen
  * span, and at 100 TB it is pure map-side work that composes with any
  * downstream gate (PiiSpec proves the exchange-free plan).
  *
  * Patterns deliberately stay in the Java-regex ∩ RE2 common subset
  * (character classes, bounded repetition, word boundaries, non-capturing
  * groups; no backreferences or lookaround) so external engines — the
  * DuckDB oracle, or a sibling pipeline in another runtime — reproduce
  * matches exactly.
  */
object Pii {

  /** One detection/redaction rule: `n_<name>` counts matches, redaction
    * replaces each match with `replacement`.
    */
  case class Rule(name: String, pattern: String, replacement: String)

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Order matters only when patterns could overlap; these three are
    * disjoint (emails need '@', IPs dots-only, phones dashes-only), so
    * redaction output is order-independent — but the chain applies in
    * this order deterministically anyway.
    */
  val DefaultRules: Seq[Rule] = Seq(
    Rule("email", EmailRe, "<EMAIL>"),
    Rule("ipv4", Ipv4Re, "<IP>"),
    Rule("phone", PhoneRe, "<PHONE>"))

  /** Adds one `n_<rule>` long column per rule counting its matches. */
  def annotate(docs: DataFrame, textCol: String,
      rules: Seq[Rule] = DefaultRules): DataFrame = {
    val clash = docs.columns.toSet.intersect(rules.map(r => s"n_${r.name}").toSet)
    require(clash.isEmpty, s"annotate would overwrite ${clash.mkString(", ")}")
    rules.foldLeft(docs) { (d, r) =>
      d.withColumn(s"n_${r.name}",
        size(regexp_extract_all(col(textCol), lit(r.pattern), lit(0))).cast("long"))
    }
  }

  /** The redacted text as a column expression (for use inside selects). */
  def redacted(text: Column, rules: Seq[Rule] = DefaultRules): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, lit(r.pattern), lit(r.replacement)))

  /** Adds `outCol` with every rule's matches replaced by its token. */
  def redact(docs: DataFrame, textCol: String, outCol: String,
      rules: Seq[Rule] = DefaultRules): DataFrame = {
    require(!docs.columns.contains(outCol), s"redact would overwrite $outCol")
    docs.withColumn(outCol, redacted(col(textCol), rules))
  }
}
