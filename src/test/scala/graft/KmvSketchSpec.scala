package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.{GraftExtensions, KmvSketchLong}

/** Contracts of the KMV bottom-k distinct sketch (plans/KmvSketchLong):
  * partition-layout independence (the q58 determinism claim), the
  * fewer-than-k exact branch, estimator accuracy, bounded buffer, and
  * the SQL registration path.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int = K) = {
    val hv = conv(substring(md5(col("v")), 1, 15), 16, 10).cast("long")
    df.agg(ColumnBridge.column(
      KmvSketchLong(ColumnBridge.expression(hv), k).toAggregateExpression()).as("kmv"))
      .first().getSeq[Long](0)
  }

  test("result is a pure function of the input set — any partitioning, any order") {
    val vals = (1 to 5000).map(i => s"tok${i % 700}") // 700 distinct, heavy dups
    val a = sketchOf(vals.toDF("v").repartition(1))
    val b = sketchOf(vals.reverse.toDF("v").repartition(13))
    val c = sketchOf(scala.util.Random.shuffle(vals).toDF("v").repartition(4, col("v")))
    assert(a == b && b == c)
    assert(a.size == K)
    assert(a == a.sorted, "output array is sorted ascending")
    assert(a.distinct.size == a.size, "kept hashes are distinct")
  }

  test("fewer than k distinct values degrades to the exact set") {
    val s = sketchOf((1 to 300).map(i => s"x${i % 7}").toDF("v"))
    assert(s.size == 7, "all 7 distinct hashes kept when n < k")
  }

  test("estimate lands within a few sigma of the true distinct count") {
    val n = 20000
    val s = sketchOf((1 to n).map(i => s"item$i").toDF("v"), k = 256)
    val kth = s.last.toDouble / 1152921504606846976.0 // / 2^60
    val est = 255.0 / kth
    // ±1/√k ≈ 6.25% per sigma; allow 4 sigma
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs true $n")
  }

  test("kmv_sketch_long is callable from SQL and k must be a literal") {
    GraftExtensions.register(spark)
    (1 to 100).map(i => s"w$i").toDF("v").createOrReplaceTempView("kmv_in")
    val arr = spark.sql(
      """SELECT kmv_sketch_long(
           CAST(conv(substring(md5(v), 1, 15), 16, 10) AS BIGINT), 16) AS s
         FROM kmv_in""").first().getSeq[Long](0)
    assert(arr.size == 16)
    assert(arr == arr.sorted)
  }

  test("serialize/deserialize round-trips the buffer (shuffle path)") {
    val agg = KmvSketchLong(ColumnBridge.expression(lit(0L)), 8)
    val buf = agg.createAggregationBuffer()
    Seq(9L, 3L, 7L, 3L, 11L, 1L).foreach { v =>
      buf.add(v); if (buf.size > 8) buf.remove(buf.last)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }
}
