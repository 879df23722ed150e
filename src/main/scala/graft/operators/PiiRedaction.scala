package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails,
  * NANP-style phone fragments, and IPv4 literals are replaced with
  * typed placeholder tags, with per-document match counts for audit.
  *
  * Pure `regexp_replace`/`regexp_count` column compositions — codegen'd
  * scan-speed passes with no UDFs and no shuffle: the operator is a
  * `select` over the corpus, so at 100 TB it runs embarrassingly
  * parallel at whatever the parquet scan sustains. Patterns use only
  * RE2-compatible syntax so the DuckDB oracle replays them verbatim.
  */
object PiiRedaction {

  /** user@host.tld (conservative: requires a dotted TLD). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 literal. */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style exchange-number fragment (555-0142). Applied AFTER the
    * IPv4 pass so digit runs inside already-redacted IPs cannot match. */
  val PhonePattern = "\\b\\d{3}-\\d{4}\\b"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  /** Text with all three PII classes replaced by their tags. Email runs
    * first (its local part may contain digits/dots that the narrower
    * patterns would otherwise nibble at), then IPv4, then phone. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailTag),
        Ipv4Pattern, IpTag),
      PhonePattern, PhoneTag)

  /** Per-class match counts over the ORIGINAL text (audit trail). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def ipCount(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))

  /** Redaction report: id, per-class counts, redacted length, and an
    * md5 digest of the redacted text (cheap cross-engine witness that
    * the replacement bytes match exactly). */
  def report(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      emailCount(col(textCol)).cast("long").as("nEmails"),
      ipCount(col(textCol)).cast("long").as("nIps"),
      phoneCount(col(textCol)).cast("long").as("nPhones"),
      length(redact(col(textCol))).cast("long").as("redactedLen"),
      md5(redact(col(textCol)).cast("binary")).as("redactedMd5"))
}
