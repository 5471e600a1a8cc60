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

  // ---- Payment-card detection (defensive PII scrubbing) ---------------
  // A bare \d{16} regex false-positives on ids/timestamps; the standard
  // practice is regex candidates + Luhn (ISO/IEC 7812) checksum
  // validation. The checksum folds inside the same per-row projection
  // (HOF aggregate over the 16 chars — codegen'd, zero shuffle).

  val cardPattern = "\\b\\d{16}\\b"
  val cardToken = "<CARD>"

  /** Luhn validity of a 16-digit string: from the right, every second
    * digit doubles (subtract 9 past 9); valid iff the total ≡ 0 mod 10.
    * With 1-based left index i on 16 chars, doubled ⟺ i odd.
    */
  def luhnValid16(s: Column): Column = {
    val chars = split(s, "")
    val total = aggregate(sequence(lit(1), lit(16)), lit(0), (acc, i) => {
      val d = element_at(chars, i).cast("int")
      val dd = d * 2
      acc + when(pmod(i, lit(2)) === 1,
        when(dd > 9, dd - 9).otherwise(dd)).otherwise(d)
    })
    pmod(total, lit(10)) === 0
  }

  def cardCandidateCount(c: Column): Column =
    size(regexp_extract_all(c, lit(cardPattern), lit(0))).cast("int")

  def cardValidCount(c: Column): Column =
    size(filter(regexp_extract_all(c, lit(cardPattern), lit(0)),
      luhnValid16(_))).cast("int")

  /** Redact ONLY Luhn-valid candidates (checksum-failing digit runs are
    * ids/timestamps, not cards): fold literal replaces of each valid
    * candidate over the text.
    */
  def redactValidCards(c: Column): Column =
    aggregate(filter(regexp_extract_all(c, lit(cardPattern), lit(0)),
      luhnValid16(_)), c, (acc, s) => replace(acc, s, lit(cardToken)))

  /** DuckDB mirror of the Luhn fold over a 16-char candidate expression. */
  def luhnValidSql(sExpr: String): String =
    s"""(list_sum(list_transform(range(1, 17), i ->
       |  CASE WHEN i % 2 = 1 THEN
       |    CASE WHEN 2 * CAST($sExpr[CAST(i AS INTEGER)] AS INTEGER) > 9
       |      THEN 2 * CAST($sExpr[CAST(i AS INTEGER)] AS INTEGER) - 9
       |      ELSE 2 * CAST($sExpr[CAST(i AS INTEGER)] AS INTEGER) END
       |  ELSE CAST($sExpr[CAST(i AS INTEGER)] AS INTEGER) END)) % 10 = 0)"""
      .stripMargin.replace("\n", " ")

  def cardCandidateCountSql(textExpr: String): String =
    s"CAST(len(regexp_extract_all($textExpr, '$cardPattern')) AS INTEGER)"

  def cardValidCountSql(textExpr: String): String =
    s"CAST(len(list_filter(regexp_extract_all($textExpr, '$cardPattern'), " +
      s"s -> ${luhnValidSql("s")})) AS INTEGER)"

  def emailCountSql(textExpr: String): String =
    s"CAST(len(regexp_extract_all($textExpr, '$emailPattern')) AS INTEGER)"

  def ipv4CountSql(textExpr: String): String =
    s"CAST(len(regexp_extract_all(${afterEmailSql(textExpr)}, '$ipv4Pattern')) AS INTEGER)"

  def phoneCountSql(textExpr: String): String =
    s"CAST(len(regexp_extract_all(${afterIpSql(textExpr)}, '$phonePattern')) AS INTEGER)"
}
