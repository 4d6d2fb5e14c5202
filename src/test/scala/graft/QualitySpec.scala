package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Quality
import graft.pipeline.Quality.Expect

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(("SP", 5.0), ("RJ", -1.0), ("XXX", 3.0), ("MG", 2.0))
    .toDF("uf", "price")

  test("check evaluates all expectations in one pass with exact fractions") {
    val rs = Quality.check(df, Seq(
      Expect("positive", col("price") > 0, minFraction = 0.7),
      Expect("uf_two_letter", length(col("uf")) === 2)))
    assert(rs.map(r => (r.name, r.passed, r.ok)) == Seq(
      ("positive", 3L, true), ("uf_two_letter", 3L, false)))
    assert(rs.head.fraction == 0.75)
  }

  test("enforce throws listing every failed rule") {
    val e = intercept[IllegalStateException] {
      Quality.enforce(df, Seq(
        Expect("positive", col("price") > 0),
        Expect("uf_two_letter", length(col("uf")) === 2)))
    }
    assert(e.getMessage.contains("positive") && e.getMessage.contains("uf_two_letter"))
  }

  test("assertSchema rejects contract drift") {
    Quality.assertSchema(df, "uf STRING, price DOUBLE")
    val e = intercept[IllegalArgumentException] {
      Quality.assertSchema(df, "uf STRING, price DECIMAL(10,2)")
    }
    assert(e.getMessage.contains("schema contract violated"))
  }

  test("the reference ANP silver rules pass on pipeline output") {
    val silver = graft.silver.Silver.toSilverAnp(
      graft.sources.CsvDialect.read(spark, fixture("anp_semicolon.csv")))
    val rs = Quality.enforce(silver, Quality.anpSilverRules)
    assert(rs.forall(_.ok))
  }

  test("empty input passes vacuously") {
    val empty = df.filter(lit(false))
    assert(Quality.check(empty, Seq(Expect("positive", col("price") > 0))).head.ok)
  }
}
