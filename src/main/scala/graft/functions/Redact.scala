package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: redact well-known
  * identifier shapes from document text before it reaches a corpus.
  * All patterns are deliberately RE2-safe (no backreferences, no
  * lookaround) so the SAME pattern string runs identically on Spark's
  * Java regex and on RE2-based engines (DuckDB, ripgrep) — which is
  * what lets the q71 oracle replay the scrub cross-engine, and what a
  * mixed-tooling production pipeline needs anyway.
  *
  * Everything here is codegen'd built-ins (`regexp_replace` /
  * `regexp_count`) — one map pass over the text, no UDF, no shuffle.
  */
object Redact {

  /** Email addresses (practical form, not the full RFC 5322 grammar —
    * the curation trade-off every public pipeline makes). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International phone shape `+CC AA NNNNN-NNNN` (the pt-BR mobile
    * layout the reference's locale targets). */
  val PhoneRe = "\\+[0-9]{2} [0-9]{2} [0-9]{5}-[0-9]{4}"

  val EmailToken = "[EMAIL]"
  val PhoneToken = "[PHONE]"

  /** Replace every email/phone match with its redaction token.
    * Idempotent: the tokens themselves match neither pattern. */
  def scrub(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, EmailToken), PhoneRe, PhoneToken)

  /** Number of email matches in `text` (pre-scrub accounting). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))

  /** Number of phone matches in `text`. */
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
}
