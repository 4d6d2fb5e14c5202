package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Kmv, QSketch}
import graft.plans.GraftExtensions

/** Contracts of the mergeable quantile sketch (plans/QuantilePairSketch
  * + operators/QSketch): partition-layout independence, the <=k exact
  * branch, the set-union merge homomorphism (the streamability claim),
  * sampling-error bounds at k, bounded buffer size, and the SQL
  * registration path with its literal-argument errors.
  */
class QSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  // (id, value) rows -> the sketch column, keyed on hash60(id)
  private def pre(df: DataFrame): DataFrame =
    df.select(Kmv.hash60(col("id").cast("string")).as("hv"),
      col("v").cast("double").as("v"))

  private def sketchOf(df: DataFrame, k: Int = K): Seq[(Long, Double)] =
    pre(df).agg(QSketch.pairSketch(col("hv"), col("v"), k).as("q"))
      .select(col("q"))
      .first().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))

  test("result is a pure function of the input set — any partitioning, any order") {
    val rows = (1 to 3000).map(i => (i.toLong, (i % 97).toDouble))
    val a = sketchOf(rows.toDF("id", "v").repartition(1))
    val b = sketchOf(rows.reverse.toDF("id", "v").repartition(13))
    val c = sketchOf(scala.util.Random.shuffle(rows).toDF("id", "v")
      .repartition(4, col("id")))
    assert(a == b && b == c)
    assert(a.size == K)
    assert(a == a.sortBy(p => (p._1, p._2)), "output sorted by (hv, v)")
  }

  test("group of <= k rows: quantiles are EXACT (rank ceil(p*m) of the sorted values)") {
    val rows = (1 to 40).map(i => (i.toLong, i.toDouble)) // 40 < K
    val q = pre(rows.toDF("id", "v"))
      .agg(QSketch.pairSketch(col("hv"), col("v"), K).as("q"))
      .select(QSketch.quantile(col("q"), 0.5).as("p50"),
        QSketch.quantile(col("q"), 0.9).as("p90"),
        QSketch.quantile(col("q"), 1.0).as("p100"))
      .first()
    assert(q.getDouble(0) == 20.0) // ceil(0.5*40) = 20
    assert(q.getDouble(1) == 36.0) // ceil(0.9*40) = 36
    assert(q.getDouble(2) == 40.0) // max
  }

  test("merge of two half-sketches equals the sketch of the whole (homomorphism)") {
    val rows = (1 to 2000).map(i => (i.toLong, (i % 41).toDouble))
    val (l, r) = rows.splitAt(700)
    val whole = sketchOf(rows.toDF("id", "v"))
    val halves = pre(l.toDF("id", "v"))
      .agg(QSketch.pairSketch(col("hv"), col("v"), K).as("qa"))
      .crossJoin(pre(r.toDF("id", "v"))
        .agg(QSketch.pairSketch(col("hv"), col("v"), K).as("qb")))
      .select(QSketch.mergePairs(col("qa"), col("qb"), K).as("q"))
      .first().getSeq[org.apache.spark.sql.Row](0)
      .map(row => (row.getLong(0), row.getDouble(1)))
    assert(halves == whole)
  }

  test("null hash or value rows are ignored; empty sketch reads as null quantile") {
    val df = Seq((Some(1L), None: Option[Double]), (None, Some(3.0)))
      .toDF("id", "v")
      .select(when(col("id").isNotNull,
        Kmv.hash60(col("id").cast("string"))).as("hv"),
        col("v").cast("double").as("v"))
    val out = df.agg(QSketch.pairSketch(col("hv"), col("v"), K).as("q"))
      .select(size(col("q")).as("m"), QSketch.quantile(col("q"), 0.5).as("p50"))
      .first()
    assert(out.getInt(0) == 0)
    assert(out.isNullAt(1))
  }

  test("sampled p50 lands within sampling error of the true median") {
    val n = 20000
    val rows = (1 to n).map(i => (i.toLong, i.toDouble))
    val p50 = pre(rows.toDF("id", "v"))
      .agg(QSketch.pairSketch(col("hv"), col("v"), 256).as("q"))
      .select(QSketch.quantile(col("q"), 0.5))
      .first().getDouble(0)
    // rank error ~ +-1/(2*sqrt(k)) per sigma ~ 3.1%; allow 4 sigma
    assert(math.abs(p50 - n / 2.0) / n < 0.125, s"p50 $p50 vs true ${n / 2}")
  }

  test("quantile_pair_sketch is callable from SQL; non-literal/non-integer k errors") {
    GraftExtensions.register(spark)
    (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
      .createOrReplaceTempView("qsk_in")
    val arr = spark.sql(
      """SELECT quantile_pair_sketch(
           CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT),
           v, 16) AS s
         FROM qsk_in""").first().getSeq[org.apache.spark.sql.Row](0)
    assert(arr.size == 16)
    val e = intercept[Exception] {
      spark.sql("SELECT quantile_pair_sketch(CAST(1 AS BIGINT), 1.0, 'x') FROM qsk_in")
    }
    assert(e.getMessage.contains("integer literal"),
      s"want the intended argument error, got: ${e.getMessage}")
  }
}
