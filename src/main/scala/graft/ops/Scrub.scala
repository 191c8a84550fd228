package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII scrubbing for training-data curation: mask emails, IPv4 addresses,
 * and (Japanese-style hyphenated) phone numbers, and count what was
 * masked — the redact-and-audit stage every public-web corpus pipeline
 * runs before training (the counts feed the per-source audit table; the
 * masked text feeds the model).
 *
 * Pure `regexp_replace`/`regexp_extract_all` column functions — codegen'd,
 * zero shuffle, linear in the scan. The patterns are deliberately written
 * in the common subset of Java regex (Spark) and RE2 (DuckDB oracle, q51):
 * character classes, bounded quantifiers, word boundaries — no lookaround,
 * no backreferences, so one pattern string drives both engines and RE2's
 * linear-time guarantee holds at 100 TB (no catastrophic backtracking on
 * adversarial pages).
 */
object Scrub {

  /** Conservative email shape (local@domain.tld). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no range check — an audit regex, not a parser). */
  val Ipv4Re = "\\b(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)\\d{1,3}\\b"

  /** Japanese hyphenated phone: leading 0, area-local-subscriber. */
  val PhoneRe = "\\b0\\d{1,4}-\\d{1,4}-\\d{3,4}\\b"

  /** Masked text: emails → `<EMAIL>`, IPv4 → `<IP>`, phones → `<PHONE>`.
    * Email first — its local part may contain digits a later pattern
    * could otherwise nibble at. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-kind hit counts on the ORIGINAL text (the audit plane). */
  def emailCount(text: Column): Column = size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")
  def ipv4Count(text: Column): Column = size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long")
  def phoneCount(text: Column): Column = size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long")
}
