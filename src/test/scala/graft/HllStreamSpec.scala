package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.{Hll, TextOps}
import graft.streaming.HllStream

/** Streaming HLL contracts: stream == batch for any micro-batching
  * (max-merge is the set-union homomorphism), and replay of an
  * already-folded batch is a no-op WITHOUT any high-water guard (max
  * is idempotent — the algebraic advantage over CmsStream's additive
  * counters). */
class HllStreamSpec extends SparkSpec {
  import spark.implicits._

  private val corpus: Seq[(String, String)] =
    (1L to 60L).map { i =>
      (s"src${i % 3}",
        (1 to 40).map(j => s"tok${(i * 13 + j * 5) % 150}").mkString(" "))
    }

  private def df(rows: Seq[(String, String)]): DataFrame =
    rows.toDF("source", "text")

  private def registers(path: String): Map[(String, Long), Int] =
    spark.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap

  private def batchRegisters(rows: Seq[(String, String)]): Map[(String, Long), Int] = {
    val g = df(rows).select(col("source"),
      explode(TextOps.gramHashes(TextOps.tokens(col("text")), 5)).as("hv"))
    Hll.registers(g, "source", "hv").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
  }

  test("stream state equals the one-shot batch registers for any micro-batching") {
    val root = java.nio.file.Files.createTempDirectory("graft-hll").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val batches = Seq(corpus.slice(0, 7), corpus.slice(7, 30), corpus.slice(30, 60))
    df(batches.head).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema(StructType.fromDDL("source STRING, text STRING"))
      .parquet(in)
    val q = HllStream.start(stream, s"$root/state", s"$root/ckpt")
    try {
      q.processAllAvailable()
      batches.tail.foreach { b =>
        df(b).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(registers(s"$root/state") == batchRegisters(corpus))
    // and the estimates derived from the streamed state match the
    // batch estimator over the same registers
    val est = HllStream.currentEstimates(spark, s"$root/state")
      .orderBy("source").collect()
    assert(est.length == 3 && est.forall(!_.isNullAt(4)))
  }

  test("replaying an already-folded batch is a no-op (idempotent merge)") {
    val root = java.nio.file.Files.createTempDirectory("graft-hll2").toString
    val state = s"$root/state"
    HllStream.processBatch(spark, df(corpus.slice(0, 30)), state)
    val once = registers(state)
    HllStream.processBatch(spark, df(corpus.slice(0, 30)), state) // replay
    assert(registers(state) == once, "replay changed the registers")
    HllStream.processBatch(spark, df(corpus.slice(30, 60)), state)
    assert(registers(state) == batchRegisters(corpus))
  }
}
