package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.{GraftExtensions, MisraGriesTerms}

/** Contracts of the Misra-Gries heavy-hitter candidate aggregate
  * (plans/MisraGriesTerms): the superset GUARANTEE (every term with
  * freq > N/(k+1) survives) under any partition layout and merge order,
  * the bounded buffer, the exact small-vocabulary branch, null handling,
  * and the SQL registration path.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def candidatesOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(ColumnBridge.column(
      MisraGriesTerms(ColumnBridge.expression(col("t")), k).toAggregateExpression())
      .as("mg")).first().getSeq[String](0)

  /** Zipf-ish skewed fixture: term i has frequency ~ N/i for hot heads
    * plus a long uniform tail — vocabulary far above k so the buffer
    * must compress, the case the guarantee is about. */
  private val skewed: Seq[String] = {
    val hot = (1 to 20).flatMap(i => Seq.fill(4000 / i)(s"hot$i"))
    val tail = (1 to 3000).flatMap(i => Seq.fill(3)(s"tail$i"))
    scala.util.Random.shuffle(hot ++ tail)
  }

  test("guarantee: freq > N/(k+1) terms survive any layout; buffer stays <= k") {
    val n = skewed.size
    val k = 64
    val exactHeavy = skewed.groupBy(identity).view.mapValues(_.size)
      .filter { case (_, c) => c.toLong * (k + 1) > n }.keySet
    assert(exactHeavy.nonEmpty && exactHeavy.size < 20, "fixture sanity")
    for (parts <- Seq(1, 4, 13)) {
      val cands = candidatesOf(skewed.toDF("t").repartition(parts), k).toSet
      assert(cands.size <= k, s"buffer bound violated at $parts partitions")
      assert(exactHeavy.subsetOf(cands),
        s"missing heavy terms at $parts partitions: ${exactHeavy -- cands}")
    }
  }

  test("vocabulary below k degrades to the exact sorted term set") {
    val df = (1 to 500).map(i => s"w${i % 9}").toDF("t")
    val cands = candidatesOf(df.repartition(7), 64)
    assert(cands == (0 until 9).map(i => s"w$i").sorted)
  }

  test("nulls are ignored; all-null input yields an empty candidate array") {
    val some = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("t").repartition(3)
    assert(candidatesOf(some, 4) == Seq("a", "b"))
    val allNull = Seq[Option[String]](None, None).toDF("t")
    assert(candidatesOf(allNull, 4).isEmpty)
  }

  test("grouped aggregation keeps per-group candidate independence") {
    val df = (1 to 2000).map(i => (if (i % 2 == 0) "g0" else "g1",
      if (i % 2 == 0) s"even${i % 3}" else s"odd${i % 401}")).toDF("g", "t")
    val rows = df.repartition(5)
      .groupBy(col("g"))
      .agg(ColumnBridge.column(
        MisraGriesTerms(ColumnBridge.expression(col("t")), 8).toAggregateExpression())
        .as("mg"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // g0 vocab = 3 < k: exact. g1 vocab = 401 > k: bounded.
    assert(rows("g0") == Seq("even0", "even1", "even2"))
    assert(rows("g1").size <= 8)
  }

  test("misra_gries_terms is callable from SQL; k must be an int literal") {
    GraftExtensions.register(spark)
    skewed.toDF("t").createOrReplaceTempView("mg_in")
    val cands = spark.sql("SELECT misra_gries_terms(t, 64) FROM mg_in")
      .first().getSeq[String](0)
    assert(cands.contains("hot1"))
    val err = intercept[Exception] {
      spark.sql("SELECT misra_gries_terms(t, 'x') FROM mg_in").collect()
    }
    assert(err.getMessage.contains("integer literal"),
      s"wanted the argument error, got: ${err.getMessage}")
  }

  test("type check rejects non-string input") {
    val err = intercept[Exception] {
      (1 to 5).toDF("t")
        .agg(ColumnBridge.column(
          MisraGriesTerms(ColumnBridge.expression(col("t")), 4).toAggregateExpression()))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
