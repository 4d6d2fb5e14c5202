package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Cms

/** Count-min sketch contracts: the one-sided guarantee holds for EVERY
  * token (never just the heavy ones), the sketch is additive (the
  * streaming/merge basis), bounded in size, and a pure function of the
  * input multiset. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish multiset: token t_i appears ~600/i times, plus a long
  // unique tail — heavy hitters AND collision fodder
  private val tokens: Seq[String] =
    (1 to 30).flatMap(i => Seq.fill(600 / i)(s"t$i")) ++
      (1 to 500).map(i => s"tail$i")

  private def df(ts: Seq[String]): DataFrame = ts.toDF("term")
  private val D = 4
  private val W = 256

  test("one-sided: est_n >= exact for EVERY distinct token; exact within 2n/w slack") {
    val cms = Cms.build(df(tokens), "term", D, W)
    val exact = df(tokens).groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val est = Cms.estimate(cms, exact, "term", D, W)
    val rows = est.select(col("term"), col("freq"), col("est_n")).collect()
    assert(rows.length == tokens.distinct.length)
    val under = rows.filter(r => r.getLong(2) < r.getLong(1))
    assert(under.isEmpty, s"CMS under-counted: ${under.take(5).mkString(", ")}")
    val slack = 2.0 * tokens.length / W
    val over = rows.filter(r => r.getLong(2) - r.getLong(1) > slack * 4)
    assert(over.length < rows.length / 10,
      s"too many estimates past 4x the 2n/w bound: ${over.take(5).mkString(", ")}")
  }

  test("additive: merge(build(A), build(B)) == build(A ++ B) — the stream basis") {
    val (a, b) = tokens.splitAt(tokens.length / 3)
    val merged = Cms.merge(Cms.build(df(a), "term", D, W), Cms.build(df(b), "term", D, W))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = Cms.build(df(tokens), "term", D, W)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == oneShot)
  }

  test("bounded and partition-invariant") {
    val cms = Cms.build(df(tokens).repartition(7), "term", D, W)
    assert(cms.count() <= D.toLong * W)
    val again = Cms.build(df(tokens).repartition(1), "term", D, W)
    assert(cms.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq ==
      again.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq)
  }

  test("guards: reserved-column collision and null tokens") {
    val cms = Cms.build(df(tokens), "term", D, W)
    val e = intercept[IllegalArgumentException] {
      Cms.estimate(cms, df(tokens.take(3)).withColumn("bucket", lit(1)), "term", D, W)
    }
    assert(e.getMessage.contains("bucket"))
    // null tokens never become phantom counters
    val withNulls = Seq(Some("a"), None, Some("a"), None).toDF("term")
    assert(Cms.build(withNulls, "term", D, W).agg(sum(col("n"))).first().getLong(0)
      == 2L * D)
  }

  test("unseen tokens estimate low, never negative") {
    val cms = Cms.build(df(tokens), "term", D, W)
    val unseen = df(Seq("never-seen-a", "never-seen-b"))
    val est = Cms.estimate(cms, unseen, "term", D, W).collect()
    assert(est.forall(_.getLong(1) >= 0L))
  }
}
