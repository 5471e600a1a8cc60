package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails, phone
  * numbers, and IPv4 addresses are replaced with typed placeholder tokens
  * before text ever reaches a training corpus.
  *
  * Everything is `regexp_replace`/`regexp_count` over patterns restricted to
  * the Java∩RE2 common dialect (no lookaround, no backreferences), so the
  * DuckDB oracle evaluates the identical automaton and the operator stays a
  * codegen'd per-row projection — zero shuffle, runs at scan speed on
  * 100 TB.
  *
  * The redaction chain is staged (emails → IPv4 → phones) so each stage
  * counts exactly what it redacts: an address inside an email host is never
  * double-counted, and the placeholder tokens contain no digits or `@`, so
  * the chain is idempotent (`redactPii(redactPii(x)) == redactPii(x)`).
  */
object PiiFunctions {

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\d{3}[-.]\\d{3}[-.]\\d{4}"

  val emailToken = "<EMAIL>"
  val ipToken = "<IP>"
  val phoneToken = "<PHONE>"

  def redactEmails(c: Column): Column =
    regexp_replace(c, emailPattern, emailToken)

  def redactIpv4(c: Column): Column =
    regexp_replace(c, ipv4Pattern, ipToken)

  def redactPhones(c: Column): Column =
    regexp_replace(c, phonePattern, phoneToken)

  /** Full redaction chain: emails first (their hosts may contain dotted
    * digit runs), then IPv4, then phones.
    */
  def redactPii(c: Column): Column =
    redactPhones(redactIpv4(redactEmails(c)))

  /** Per-stage match counts — each counted on the text the stage actually
    * sees (after the previous stages redacted), matching what
    * [[redactPii]] replaces.
    */
  def emailCount(c: Column): Column =
    regexp_count(c, lit(emailPattern)).cast("int")

  def ipv4Count(c: Column): Column =
    regexp_count(redactEmails(c), lit(ipv4Pattern)).cast("int")

  def phoneCount(c: Column): Column =
    regexp_count(redactIpv4(redactEmails(c)), lit(phonePattern)).cast("int")

  /** DuckDB mirrors of the same chain. RE2 evaluates the identical pattern
    * strings (DuckDB standard SQL literals do not process backslash
    * escapes, so the Scala-level pattern embeds verbatim).
    */
  private def afterEmailSql(textExpr: String): String =
    s"regexp_replace($textExpr, '$emailPattern', '$emailToken', 'g')"

  private def afterIpSql(textExpr: String): String =
    s"regexp_replace(${afterEmailSql(textExpr)}, '$ipv4Pattern', '$ipToken', 'g')"

  def redactSql(textExpr: String): String =
    s"regexp_replace(${afterIpSql(textExpr)}, '$phonePattern', '$phoneToken', 'g')"

  def emailCountSql(textExpr: String): String =
    s"CAST(len(regexp_extract_all($textExpr, '$emailPattern')) AS INTEGER)"

  def ipv4CountSql(textExpr: String): String =
    s"CAST(len(regexp_extract_all(${afterEmailSql(textExpr)}, '$ipv4Pattern')) AS INTEGER)"

  def phoneCountSql(textExpr: String): String =
    s"CAST(len(regexp_extract_all(${afterIpSql(textExpr)}, '$phonePattern')) AS INTEGER)"
}
