package graft

import org.apache.spark.sql.functions._

import graft.functions.Locale

class LocaleSpec extends SparkSpec {
  import spark.implicits._

  private def parse(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                    vs: String*): Seq[Option[Double]] =
    vs.toDF("s").select(f(col("s")).as("v")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  test("ptBrToDouble strips thousands dots and swaps the decimal comma") {
    assert(parse(Locale.ptBrToDouble, "1.234,56", "11,75", "garbage") ==
      Seq(Some(1234.56), Some(11.75), None))
  }

  test("localeAwareDouble reproduces the comma-presence heuristic exactly") {
    // "1.234" is AMBIGUOUS and must parse as en 1.234 (not pt-BR 1234) —
    // reference transform.py:89-100 resolves by comma presence only.
    assert(parse(Locale.localeAwareDouble, "6.59", "1.234", "1.234,56", "6", "abc") ==
      Seq(Some(6.59), Some(1.234), Some(1234.56), Some(6.0), None))
  }

  test("locale parse edge cases: negatives, empty, bare separators") {
    assert(parse(Locale.ptBrToDouble, "-1.234,56", "-11,75", "", ",") ==
      Seq(Some(-1234.56), Some(-11.75), None, None))
    assert(parse(Locale.localeAwareDouble, "-6.59", "0", "-0,5") ==
      Seq(Some(-6.59), Some(0.0), Some(-0.5)))
  }

  test("coerce-to-null survives an ANSI-enabled session (try_cast)") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try assert(parse(Locale.localeAwareDouble, "abc", "6.59") == Seq(None, Some(6.59)))
    finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("dayFirstTimestamp accepts dd/MM/yyyy then ISO, nulls the rest") {
    val got = Seq("15/01/2024", "2024-01-15", "nope").toDF("s")
      .select(Locale.dayFirstTimestamp(col("s")).cast("date").cast("string")).collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("2024-01-15"), Some("2024-01-15"), None))
  }

  test("normalizeHeader strips accents, case, and punctuation") {
    assert(Locale.normalizeHeader("Preço Médio Revenda") == "preco medio revenda")
    assert(Locale.normalizeHeader("Estado - Sigla") == "estado sigla")
    assert(Locale.normalizeHeader("  Data  da   Coleta ") == "data da coleta")
  }
}
