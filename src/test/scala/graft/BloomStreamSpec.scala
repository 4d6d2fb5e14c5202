package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Bloom
import graft.streaming.BloomStream

/** Streaming Bloom contracts: stream == batch for any micro-batching
  * (bit_or union law), replay absorption BY ALGEBRA (no ledger), loud
  * failure on width drift, and end-to-end probe behavior against the
  * maintained state. */
class BloomStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Words = 16

  private val corpus: Seq[(Long, String)] =
    (1L to 90L).map(i => (i, s"doc-text-$i"))

  private def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")

  private def words(path: String): Map[Long, Long] =
    spark.read.parquet(path).filter(col("word") >= 0)
      .select("word", "bits").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stream state equals the one-shot batch sketch for any micro-batching") {
    val root = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val batches = Seq(corpus.slice(0, 11), corpus.slice(11, 50), corpus.slice(50, 90))
    df(batches.head).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema(StructType.fromDDL("doc_id BIGINT, text STRING"))
      .parquet(in)
    val q = BloomStream.start(stream, "text", s"$root/state", s"$root/ckpt", Words)
    try {
      q.processAllAvailable()
      batches.tail.foreach { b =>
        df(b).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
    } finally q.stop()
    val oneShot = Bloom.build(df(corpus), "text", Words)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(words(s"$root/state") == oneShot)
  }

  test("replaying a batch is absorbed by the algebra — no ledger needed") {
    val root = java.nio.file.Files.createTempDirectory("graft-bloom-r").toString
    val st = s"$root/state"
    BloomStream.processBatch(spark, df(corpus.take(40)), "text", st, Words)
    val once = words(st)
    BloomStream.processBatch(spark, df(corpus.take(40)), "text", st, Words)
    assert(words(st) == once, "re-delivered batch must re-OR already-set bits")
  }

  test("width drift fails loudly instead of corrupting membership") {
    val root = java.nio.file.Files.createTempDirectory("graft-bloom-w").toString
    val st = s"$root/state"
    BloomStream.processBatch(spark, df(corpus.take(10)), "text", st, Words)
    val e = intercept[IllegalArgumentException] {
      BloomStream.processBatch(spark, df(corpus.take(10)), "text", st, Words * 2)
    }
    assert(e.getMessage.contains("words=16"))
  }

  test("probing the maintained state: members true, wide-miss strangers false") {
    val root = java.nio.file.Files.createTempDirectory("graft-bloom-p").toString
    val st = s"$root/state"
    // generous width so the stranger assertion is not at the mercy of FPs
    BloomStream.processBatch(spark, df(corpus), "text", st, words = 4096)
    val probes = (corpus.take(5).map(_._2) ++ Seq("nope-1", "nope-2"))
      .toDF("text")
    val got = BloomStream.currentProbe(spark, st, probes, "text", "maybe")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(corpus.take(5).forall(c => got(c._2)))
    assert(!got("nope-1") && !got("nope-2"))
  }

  test("an all-empty first batch still persists a usable state") {
    val root = java.nio.file.Files.createTempDirectory("graft-bloom-e").toString
    val st = s"$root/state"
    BloomStream.processBatch(spark, df(Nil), "text", st, Words)
    val probed = BloomStream.currentProbe(spark, st,
      Seq("anything").toDF("text"), "text", "maybe")
    assert(!probed.first().getBoolean(1))
    BloomStream.processBatch(spark, df(corpus.take(3)), "text", st, Words)
    val after = BloomStream.currentProbe(spark, st,
      Seq(corpus.head._2).toDF("text"), "text", "maybe")
    assert(after.first().getBoolean(1))
  }
}
