package graft

import org.apache.spark.sql.functions._

import graft.functions.Redact

/** Redact contracts: detection + replacement, idempotence (tokens
  * never re-match), and clean text passing through untouched. */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "write to ana.silva+news@mail.example.org today"),
    (2L, "call +55 11 91234-5678 after lunch"),
    (3L, "both a@b.co and +55 21 98765-4321 here"),
    (4L, "no pii at all, just text with an @ sign and 123 numbers"),
    (5L, "")).toDF("id", "text")

  test("scrub replaces every email/phone and counts match the redactions") {
    val out = rows.select(col("id"), Redact.scrub(col("text")).as("t"),
        Redact.emailCount(col("text")).as("e"),
        Redact.phoneCount(col("text")).as("p"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "write to [EMAIL] today")
    assert(out(1).getString(1) == "call [PHONE] after lunch")
    assert(out(2).getString(1) == "both [EMAIL] and [PHONE] here")
    assert(out(3).getString(1) == rows.collect()(3).getString(1), "clean text untouched")
    assert(out.map(r => (r.getInt(2), r.getInt(3))).toSeq ==
      Seq((1, 0), (0, 1), (1, 1), (0, 0), (0, 0)))
  }

  test("scrub is idempotent: tokens match neither pattern") {
    val once = rows.select(Redact.scrub(col("text")).as("t"))
    val twice = once.select(Redact.scrub(col("t")).as("t"))
    assert(once.collect().map(_.getString(0)).toSeq ==
      twice.collect().map(_.getString(0)).toSeq)
  }
}
