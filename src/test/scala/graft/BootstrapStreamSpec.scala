package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Bootstrap
import graft.streaming.BootstrapStream

/** Streaming bootstrap contracts: replicate totals are LINEAR in the
  * input multiset, so the folded state equals the one-shot batch totals
  * for ANY micro-batching; replay is a guarded no-op; the CI read uses
  * the q171 ceil(p·R) order-statistic convention. */
class BootstrapStreamSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(String, Long)] =
    (1 to 300).map(i => (s"r$i", ((i * 37) % 997 + 3).toLong))

  private def df(r: Seq[(String, Long)]): DataFrame = r.toDF("key", "cents")

  private def totals(path: String): Map[Int, Long] =
    spark.read.parquet(path).filter(col("rep") >= 0)
      .select("rep", "total").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("folded state equals the one-shot batch replicate totals") {
    val root = java.nio.file.Files.createTempDirectory("graft-boot").toString
    val splits = Seq(rows.slice(0, 40), rows.slice(40, 170), rows.slice(170, 300))
    splits.zipWithIndex.foreach { case (b, i) =>
      BootstrapStream.processBatch(spark, df(b), i.toLong, s"$root/state")
    }
    val oneShot = Bootstrap.replicateTotals(df(rows), col("key"), col("cents"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(totals(s"$root/state") == oneShot,
      "streamed replicate totals must equal the one-shot batch kernel")
    val meta = spark.read.parquet(s"$root/state")
      .filter(col("rep") === -1).select("n_rows", "point").first()
    assert(meta.getLong(0) == rows.length.toLong)
    assert(meta.getLong(1) == rows.map(_._2).sum)
  }

  test("replayed batchId is a no-op (additive totals need the high-water guard)") {
    val root = java.nio.file.Files.createTempDirectory("graft-boot2").toString
    BootstrapStream.processBatch(spark, df(rows.take(100)), 0L, s"$root/state")
    BootstrapStream.processBatch(spark, df(rows.drop(100)), 1L, s"$root/state")
    val before = totals(s"$root/state")
    BootstrapStream.processBatch(spark, df(rows.drop(100)), 1L, s"$root/state")
    assert(totals(s"$root/state") == before, "replay must not double-count")
  }

  test("CI read: ordered band bracketing the point, q171 rank convention") {
    val root = java.nio.file.Files.createTempDirectory("graft-boot3").toString
    BootstrapStream.processBatch(spark, df(rows), 0L, s"$root/state")
    val ci = BootstrapStream.currentCi(spark, s"$root/state").first()
    val (lo, mid, hi) = (ci.getAs[Long]("boot_p05_cents"),
      ci.getAs[Long]("boot_p50_cents"), ci.getAs[Long]("boot_p95_cents"))
    assert(lo <= mid && mid <= hi)
    assert(ci.getAs[Long]("r") == Bootstrap.R.toLong)
    // the explicit convention: rank ceil(p*R) of the sorted totals
    val sorted = totals(s"$root/state").toSeq.sortBy(t => (t._2, t._1)).map(_._2)
    assert(lo == sorted(math.ceil(0.05 * Bootstrap.R).toInt - 1))
    assert(mid == sorted(math.ceil(0.50 * Bootstrap.R).toInt - 1))
    assert(hi == sorted(math.ceil(0.95 * Bootstrap.R).toInt - 1))
  }

  test("foreachBatch wiring folds a real file stream") {
    val root = java.nio.file.Files.createTempDirectory("graft-boot4").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    df(rows.take(150)).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema(StructType.fromDDL("key STRING, cents BIGINT"))
      .parquet(in)
    val q = BootstrapStream.start(stream, s"$root/state", s"$root/ckpt")
    try {
      q.processAllAvailable()
      df(rows.drop(150)).write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = Bootstrap.replicateTotals(df(rows), col("key"), col("cents"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(totals(s"$root/state") == oneShot)
  }
}
