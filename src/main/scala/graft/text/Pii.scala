package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the compliance gate every training-data pipeline
  * runs before a corpus leaves curation (emails, phone numbers, IP
  * addresses masked in place, with a per-document redaction count for
  * downstream quality filters to threshold on).
  *
  * Everything is `regexp_replace`/`regexp_count` column expressions —
  * codegen'd, one narrow projection, no UDF, no shuffle. The patterns
  * stay inside the RE2-compatible subset (character classes,
  * non-capturing groups, bounded repetition; no lookaround, no
  * backreferences) so the same pattern text runs identically on other
  * engines — which is exactly how the DuckDB oracle re-derives the
  * masking.
  */
object Pii {

  /** ASCII email: local part, @, dotted domain with a 2+ letter TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone: 555-123-4567, optionally (555) or +1 prefixed. */
  val PhonePattern = "(?:\\+1[ -])?(?:\\(\\d{3}\\)[ -]?|\\d{3}-)\\d{3}-\\d{4}"

  /** Dotted-quad IPv4 (syntactic: each octet 1-3 digits). */
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)\\d{1,3}\\b"

  /** The masking order matters and is part of the contract: emails
    * first (their local parts may contain digit runs), then IPs, then
    * phones (an IP's dotted quads must not be half-eaten by the phone
    * pattern). Each stage rewrites the previous stage's output.
    */
  val Stages: Seq[(String, String)] = Seq(
    EmailPattern -> "[EMAIL]",
    Ipv4Pattern -> "[IP]",
    PhonePattern -> "[PHONE]")

  /** Mask PII in `textCol`, appending `<textCol>_redacted` (masked
    * text) and `n_pii` (total matches found, counted pre-mask). Null
    * text stays null with a null count.
    */
  def redact(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val masked = Stages.foldLeft(t) { case (c, (pat, mask)) =>
      regexp_replace(c, pat, mask)
    }
    // Count stage-by-stage on the progressively masked text, so a
    // match consumed by an earlier stage is never double-counted.
    val (_, totalCount) = Stages.foldLeft((t, lit(0L))) {
      case ((c, n), (pat, mask)) =>
        (regexp_replace(c, pat, mask),
          n + regexp_count(c, lit(pat)))
    }
    df.withColumn(s"${textCol}_redacted", masked)
      .withColumn("n_pii", when(t.isNull, lit(null)).otherwise(totalCount))
  }
}
