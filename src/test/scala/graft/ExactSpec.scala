package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Exact

class ExactSpec extends SparkSpec {
  import spark.implicits._

  test("exactSum is independent of partitioning/merge order") {
    val vs = (1 to 1000).map(i => i * 0.01)
    val a = vs.toDF("v").repartition(1).agg(Exact.exactSum(col("v"))).first().getDouble(0)
    val b = vs.toDF("v").repartition(7).agg(Exact.exactSum(col("v"))).first().getDouble(0)
    assert(a == b && a == 5005.0)
  }

  test("decimal accumulator does not wrap past 2^63 cents") {
    // 200 rows of 9.3e16 cents sum to 1.86e19 > Long.MaxValue (9.22e18);
    // a BIGINT sum would wrap silently with ANSI off.
    val big = 9.3e14
    val got = Seq.fill(200)(big).toDF("v")
      .agg(Exact.exactSum(col("v"))).first().getDouble(0)
    assert(got == 200 * big)
  }

  test("property: exactIntSum equals the BigInt sum (negatives, large magnitudes)") {
    // |q| up to 2^39 stresses both split components (hi = q >> 20 is
    // signed; lo is the unsigned low 20 bits) across sign boundaries
    val bound = Long.MaxValue >> 24
    val prop = Prop.forAll(Gen.listOfN(30, Gen.choose(-bound, bound))) { qs =>
      qs.isEmpty || {
        val got = qs.toDF("q")
          .agg(Exact.exactIntSum(col("q")).cast("string")).first().getString(0)
        BigInt(got) == qs.map(BigInt(_)).sum
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: exactSum of cent-valued doubles equals the rational sum") {
    val prop = Prop.forAll(Gen.listOfN(50, Gen.choose(-1000000, 1000000))) { cents =>
      cents.isEmpty || {
        val vs = cents.map(_ / 100.0)
        val got = vs.toDF("v").agg(Exact.exactSum(col("v"))).first().getDouble(0)
        got == (BigDecimal(cents.sum) / 100).toDouble
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
