package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

import graft.streaming.DecontamStream

/** The streaming decontamination index must equal the batch
  * contamination counts (Curation.contaminationCounts) over the
  * documents delivered so far, for ANY micro-batching — including the
  * hard order where the eval set arrives after the train docs it
  * contaminates. */
class DecontamStreamSpec extends SparkSpec {
  import spark.implicits._

  // eval ids are multiples of 10 (Curation.isEval). Planted overlaps:
  //  - train 13 == eval 20 verbatim  -> contamination 1.0 (dropped)
  //  - train 17 shares exactly its first 5 tokens with eval 30
  //    -> 1 hit of 10 grams (kept)
  //  - train 11, 12 unique           -> 0 hits
  private val eval20 = (1 to 10).map(i => s"shared$i").mkString(" ")
  private val eval30 = (1 to 12).map(i => s"e$i").mkString(" ")
  private val corpus: Seq[(Long, String)] = Seq(
    10L -> (1 to 8).map(i => s"u$i").mkString(" "),
    20L -> eval20,
    30L -> eval30,
    11L -> (1 to 9).map(i => s"a$i").mkString(" "),
    12L -> (1 to 9).map(i => s"b$i").mkString(" "),
    13L -> eval20,
    17L -> ((1 to 5).map(i => s"e$i") ++ (6 to 14).map(i => s"t$i")).mkString(" "))

  private def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")

  private def countsOf(d: DataFrame): Map[Long, (Long, Long)] =
    d.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hits"))).toMap

  test("eval arriving AFTER train flips the train doc's verdict") {
    val root = java.nio.file.Files.createTempDirectory("graft-decontam").toString
    val index = s"$root/index"; val counts = s"$root/counts"
    val trainOnly = corpus.filter(d => !Set(10L, 20L, 30L)(d._1))

    DecontamStream.processBatch(spark, df(trainOnly), index, counts)
    val before = countsOf(spark.read.parquet(counts))
    assert(before.keySet == Set(11L, 12L, 13L, 17L))
    assert(before.values.forall(_._2 == 0L), "no eval set seen -> zero hits")
    assert(DecontamStream.contaminatedIds(spark.read.parquet(counts)).count() == 0)

    DecontamStream.processBatch(spark, df(corpus.filter(d => Set(10L, 20L, 30L)(d._1))),
      index, counts)
    val after = countsOf(spark.read.parquet(counts))
    assert(after == countsOf(DecontamStream.batchCounts(df(corpus))))
    assert(after(13L)._1 == after(13L)._2, "verbatim dup: every gram hits")
    assert(after(17L) == (10L, 1L), "partial overlap: 1 of 10 grams")
    assert(DecontamStream.contaminatedIds(spark.read.parquet(counts))
      .collect().map(_.getLong(0)).toSet == Set(13L))
  }

  test("converges to the batch counts for any micro-batching") {
    val orders = Seq(
      corpus.grouped(3).toSeq,                      // mixed eval/train batches
      Seq(corpus.reverse),                          // one batch, reversed
      Seq(corpus.filter(_._1 % 10 == 0), corpus.filterNot(_._1 % 10 == 0)))
    orders.zipWithIndex.foreach { case (batches, i) =>
      val root = java.nio.file.Files.createTempDirectory(s"graft-dc-$i").toString
      batches.foreach(b => DecontamStream.processBatch(spark, df(b),
        s"$root/index", s"$root/counts"))
      assert(countsOf(spark.read.parquet(s"$root/counts")) ==
        countsOf(DecontamStream.batchCounts(df(corpus))),
        s"divergence under batching order $i")
    }
  }

  test("replayed micro-batch is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-dc-replay").toString
    val index = s"$root/index"; val counts = s"$root/counts"
    val (b1, b2) = corpus.splitAt(4)
    DecontamStream.processBatch(spark, df(b1), index, counts)
    DecontamStream.processBatch(spark, df(b2), index, counts)
    def snapshot() = (
      countsOf(spark.read.parquet(counts)),
      spark.read.parquet(s"$index/train_grams.parquet").count(),
      spark.read.parquet(s"$index/eval_grams.parquet").count())
    val before = snapshot()
    DecontamStream.processBatch(spark, df(b2), index, counts) // crash-replay
    assert(snapshot() == before)
  }

  test("re-delivered CHANGED train doc is rescored from its new text") {
    val root = java.nio.file.Files.createTempDirectory("graft-dc-update").toString
    val index = s"$root/index"; val counts = s"$root/counts"
    corpus.grouped(4).foreach(b => DecontamStream.processBatch(spark, df(b), index, counts))
    // doc 11 changes from a unique text to a verbatim copy of eval 20
    DecontamStream.processBatch(spark, df(Seq(11L -> eval20)), index, counts)
    val updated = corpus.map { case (id, t) => if (id == 11L) id -> eval20 else id -> t }
    assert(countsOf(spark.read.parquet(counts)) ==
      countsOf(DecontamStream.batchCounts(df(updated))))
    assert(DecontamStream.contaminatedIds(spark.read.parquet(counts))
      .collect().map(_.getLong(0)).toSet == Set(11L, 13L))
  }

  test("kill + restart from checkpoint: docs arriving while down are indexed once") {
    val root = java.nio.file.Files.createTempDirectory("graft-dc-restart").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def start() = DecontamStream.start(
      spark.readStream.schema(StructType.fromDDL("doc_id BIGINT, text STRING")).parquet(in),
      s"$root/index", s"$root/counts", s"$root/ckpt")

    df(corpus.filterNot(d => Set(10L, 20L, 30L)(d._1))).write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // the eval set arrives while the query is DOWN
    df(corpus.filter(d => Set(10L, 20L, 30L)(d._1))).write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    assert(countsOf(spark.read.parquet(s"$root/counts")) ==
      countsOf(DecontamStream.batchCounts(df(corpus))))
  }
}
