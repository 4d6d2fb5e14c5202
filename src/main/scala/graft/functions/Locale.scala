package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Locale-aware parsing, mirroring the reference's pt-BR handling
  * (reference: src/extract.py:39-45, src/transform.py:89-100) with Spark
  * built-ins only — every function here stays inside whole-stage codegen.
  */
object Locale {

  /** Parse a pt-BR formatted decimal string: `"1.234,56"` → 1234.56.
    * Strips `.` thousands separators, swaps the `,` decimal comma, then
    * casts; unparseable input → null (reference `errors="coerce"`).
    * Reference: src/extract.py:39-45.
    */
  def ptBrToDouble(c: Column): Column =
    // translate maps ',' -> '.' and DELETES '.' (no counterpart in the
    // replacement string) — one char-map pass instead of two regex
    // passes; same output as replace(replace(...)) for every input.
    try_cast_double(translate(c, ",.", "."))

  /** Conditional locale parse: values containing a comma take the pt-BR
    * path; anything else parses as plain en (`"6.59"`). This reproduces
    * the reference's comma-presence heuristic EXACTLY — including its
    * ambiguity on `"1.234"` (parsed as en 1.234, not pt-BR 1234) — do not
    * "improve". Reference: src/transform.py:89-100.
    */
  def localeAwareDouble(c: Column): Column =
    when(c.contains(","), ptBrToDouble(c)).otherwise(try_cast_double(c))

  /** Null-on-failure double cast. A real `try_cast`, so the coerce
    * semantics hold regardless of the session's `spark.sql.ansi.enabled`
    * (Spark 4 defaults ANSI on; a plain cast would throw there). */
  private def try_cast_double(c: Column): Column = c.try_cast("double")

  /** Day-first date parse chain: accepts `dd/MM/yyyy` then ISO
    * `yyyy-MM-dd`, null on failure — the Spark shape of pandas
    * `to_datetime(errors="coerce", dayfirst=True)`.
    * Reference: src/transform.py:84.
    */
  def dayFirstTimestamp(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("dd/MM/yyyy")),
      try_to_timestamp(c, lit("yyyy-MM-dd")),
      try_to_timestamp(c))

  /** Fixed-format parse `dd/MM/yyyy`, null on failure.
    * Reference: src/extract.py:37. */
  def brDateTimestamp(c: Column): Column =
    try_to_timestamp(c, lit("dd/MM/yyyy"))

  /** Normalize a header name the way the reference's fuzzy column
    * resolver does: Unicode NFKD, strip combining marks, lowercase,
    * non-alphanumerics → single spaces, trim.
    * Driver-side metadata logic (runs over `df.columns`, not data).
    * Reference: src/transform.py:27-33.
    */
  def normalizeHeader(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}", "")
      .toLowerCase
      .replaceAll("[^a-z0-9]+", " ")
      .trim
}
