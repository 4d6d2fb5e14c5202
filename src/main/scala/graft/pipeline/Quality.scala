package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Data-quality validation — the gate a training-data pipeline runs
  * between tiers (generalizing the reference's inline quality filters,
  * transform.py:103-104, into declarative, reportable expectations).
  *
  * All expectations evaluate in ONE aggregate pass over the data
  * (conditional sums), so a 100 TB validation costs a single scan with
  * map-side partials — never one job per rule.
  */
object Quality {

  /** One named expectation: fraction of rows satisfying `pred` must be
    * >= `minFraction` (1.0 = every row). */
  final case class Expect(name: String, pred: Column, minFraction: Double = 1.0)

  final case class RuleResult(name: String, passed: Long, total: Long,
                              fraction: Double, ok: Boolean)

  /** Assert an exact schema contract (names + types in order; silver
    * tiers publish fixed contracts, SURVEY §1.3-3). */
  def assertSchema(df: DataFrame, ddl: String): Unit = {
    val want = StructType.fromDDL(ddl)
    val got = df.schema
    require(
      got.fields.map(f => (f.name, f.dataType)).sameElements(
        want.fields.map(f => (f.name, f.dataType))),
      s"schema contract violated:\n  want ${want.toDDL}\n  got  ${got.toDDL}")
  }

  /** Evaluate all expectations in one aggregate job. */
  def check(df: DataFrame, rules: Seq[Expect]): Seq[RuleResult] = {
    require(rules.nonEmpty, "no expectations given")
    val aggs = count(lit(1)).as("__total") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.pred, 1L).otherwise(0L)).as(s"__r$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val total = row.getAs[Long]("__total")
    rules.zipWithIndex.map { case (r, i) =>
      val passed = if (total == 0) 0L else row.getAs[Long](s"__r$i")
      val frac = if (total == 0) 1.0 else passed.toDouble / total
      RuleResult(r.name, passed, total, frac, frac >= r.minFraction)
    }
  }

  /** Check and throw listing every failed rule (the hard-gate form). */
  def enforce(df: DataFrame, rules: Seq[Expect]): Seq[RuleResult] = {
    val results = check(df, rules)
    val failed = results.filterNot(_.ok)
    if (failed.nonEmpty)
      throw new IllegalStateException("quality gate failed: " + failed.map(r =>
        f"${r.name} (${r.fraction * 100}%.2f%% < required)").mkString(", "))
    results
  }

  /** The reference's ANP silver expectations, declaratively. */
  val anpSilverRules: Seq[Expect] = Seq(
    Expect("price_positive", col("price") > 0),
    Expect("date_present", col("date_ref").isNotNull),
    Expect("uf_two_letter", length(col("uf_sigla")) === 2))
}
