package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora — regex redaction of emails,
  * IPv4 addresses, and phone numbers (north-star training-pipeline
  * surface; no reference analog).
  *
  * Everything is `regexp_replace`/`regexp_extract_all` — codegen'd
  * expressions over the scan, zero shuffles, trivially 100 TB-safe.
  * The patterns deliberately use only the regex subset shared by
  * Java's engine and RE2 (no lookaround, no backreferences) so the
  * exact same patterns run in the DuckDB oracle.
  *
  * Redaction order matters and is fixed: emails first (an email's
  * domain contains dot-separated alnum runs an IP pattern could chew
  * on), then IPs, then phones.
  */
object Redact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"

  def redactEmails(c: Column): Column = regexp_replace(c, EmailPattern, "<EMAIL>")
  def redactIps(c: Column): Column = regexp_replace(c, Ipv4Pattern, "<IP>")
  def redactPhones(c: Column): Column = regexp_replace(c, PhonePattern, "<PHONE>")

  /** Full scrub in the fixed order email -> ip -> phone. */
  def redactPii(c: Column): Column = redactPhones(redactIps(redactEmails(c)))

  /** Per-category match counts (for audit columns / drop thresholds —
    * corpora with heavy PII density are usually dropped, not
    * scrubbed). Counted BEFORE redaction, on the raw column.
    */
  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailPattern), lit(0))).cast("long")
  def ipCount(c: Column): Column =
    size(regexp_extract_all(c, lit(Ipv4Pattern), lit(0))).cast("long")
  def phoneCount(c: Column): Column =
    size(regexp_extract_all(c, lit(PhonePattern), lit(0))).cast("long")
}
