package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for web-text training corpora — the scrub pass every
  * large-scale pipeline runs between crawl and training (emails, IPv4
  * addresses, phone numbers → fixed placeholder tokens), cf. the
  * C4/RefinedWeb-style cleanup stages.
  *
  * Everything is `regexp_replace` / `regexp_count` over Catalyst
  * expressions — whole-stage codegen, no UDFs, pure projection: the
  * scrub never shuffles and scales linearly with the scan. Patterns
  * are written in the regex subset that means the same thing in Java
  * (Spark) and RE2 (DuckDB oracle): character classes + bounded
  * quantifiers only — no `\b`, no lookaround, no backreferences, no
  * `\s`/`\d` shorthands (Java and RE2 disagree on `\s`, see
  * [[TextOps.WsClass]]). Replacement ORDER is part of the contract
  * (email → ipv4 → phone) because a later pattern must not re-match
  * inside an earlier placeholder; the oracle replays the same order.
  */
object Pii {

  /** Email: local part then a dotted domain with a 2+-letter TLD.
    * Leftmost match is identical in Java and RE2 for this pattern
    * (greedy classes, no alternation ambiguity). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** IPv4: four 1-3 digit octets. (Deliberately permissive — scrub
    * passes favor recall; 999.0.0.1 redacts too, as in C4.) */
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** North-American-style phone: optional +CC, (XXX) XXX-XXXX. */
  val PhoneRe = "(\\+[0-9]{1,2} )?\\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"

  val EmailTag = "<EMAIL>"
  val IpTag    = "<IP>"
  val PhoneTag = "<PHONE>"

  /** Redacted text: email → ipv4 → phone, sequentially. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailTag),
        Ipv4Re, IpTag),
      PhoneRe, PhoneTag)

  /** Match counts on the ORIGINAL text (pre-redaction), so the three
    * counters are independent of each other's placeholders. */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def ipCount(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
}
