package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrub stage every
  * training-data pipeline runs before a corpus ships.
  *
  * Everything here is codegen'd Catalyst regex built-ins (no UDFs), so
  * the scrub is a single whole-stage-compiled pass over the corpus: at
  * 100 TB it is a map-only stage with zero shuffle — detection counts
  * fold into any downstream aggregate, redaction rewrites the column in
  * place.
  *
  * Pattern dialect: the patterns use only the regex subset with
  * IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB oracle) —
  * character classes, bounded repetition, `\b`, `\d` — no backreferences
  * or lookaround, so the oracle gate can run the same pattern text on
  * both engines (pinned by t27's hash match).
  *
  * Redaction order matters and is fixed: emails first (their local part
  * can embed a phone- or IP-shaped digit run the later patterns would
  * otherwise shred), then IPv4, then phone — so `555-123-4567@x.co`
  * redacts as one `[EMAIL]`, never `[PHONE]@x.co`.
  */
object Pii {
  /** RFC-lite email: local@domain.tld (2+ letter TLD). */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Dotted-quad IPv4 (syntactic: octet range not enforced — a scrub
    * stage over-redacts rather than leaking `999.1.1.1`-typo'd hosts). */
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style phone: 555-123-4567 / 555.123.4567. */
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Count of matches of `re` in `text` (0 for no match / null-safe 0
    * via size(extract_all) semantics on empty arrays). */
  def hits(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  def emailHits(text: Column): Column = hits(text, emailRe)
  def ipv4Hits(text: Column): Column = hits(text, ipv4Re)
  def phoneHits(text: Column): Column = hits(text, phoneRe)

  /** True iff the text contains any detectable PII. */
  def hasPii(text: Column): Column =
    (emailHits(text) + ipv4Hits(text) + phoneHits(text)) > 0

  /** Redact all detected PII, one pass per class, fixed order (see
    * object doc): `[EMAIL]` / `[IP]` / `[PHONE]` placeholders. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipv4Re, "[IP]"),
      phoneRe, "[PHONE]")
}
