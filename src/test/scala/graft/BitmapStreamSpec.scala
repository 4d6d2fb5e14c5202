package graft

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.streaming.BitmapStream

/** Streaming bitmap contracts: stream == batch for any micro-batching
  * (OR is the set-union homomorphism), replay of an already-folded
  * batch is a no-op without any high-water guard, and the derived
  * daily counts equal an exact COUNT(DISTINCT). */
class BitmapStreamSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(Date, Long)] =
    (1L to 200L).map { i =>
      (Date.valueOf(f"2024-01-${(i % 5 + 1)}%02d"), (i * 37) % 90)
    }

  private def df(r: Seq[(Date, Long)]): DataFrame = r.toDF("day", "user_id")

  private def state(path: String): Map[(Date, Long), Long] =
    spark.read.parquet(path).collect()
      .map(r => (r.getDate(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("stream state equals one-shot batch words; daily counts are exact") {
    val root = java.nio.file.Files.createTempDirectory("graft-bm").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val batches = Seq(rows.slice(0, 50), rows.slice(50, 120), rows.slice(120, 200))
    df(batches.head).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema(StructType.fromDDL("day DATE, user_id BIGINT"))
      .parquet(in)
    val q = BitmapStream.start(stream, s"$root/state", s"$root/ckpt")
    try {
      q.processAllAvailable()
      batches.tail.foreach { b =>
        df(b).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
    } finally q.stop()
    val oneShot = BitmapStream.words(df(rows)).collect()
      .map(r => (r.getDate(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(state(s"$root/state") == oneShot)
    val daily = BitmapStream.currentDaily(spark, s"$root/state")
      .collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    val exact = df(rows).distinct().groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => r.getDate(0) -> r.getLong(1)).toMap
    assert(daily == exact, "bitmap daily counts drifted from COUNT(DISTINCT)")
  }

  test("replaying an already-folded batch is a no-op (idempotent OR)") {
    val root = java.nio.file.Files.createTempDirectory("graft-bm2").toString
    val st = s"$root/state"
    BitmapStream.processBatch(spark, df(rows.slice(0, 100)), st)
    val once = state(st)
    BitmapStream.processBatch(spark, df(rows.slice(0, 100)), st) // replay
    assert(state(st) == once, "replay changed the words")
    BitmapStream.processBatch(spark, df(rows.slice(100, 200)), st)
    val oneShot = BitmapStream.words(df(rows)).collect()
      .map(r => (r.getDate(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(state(st) == oneShot)
  }
}
