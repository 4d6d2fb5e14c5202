package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

import graft.streaming.NearDupStream

class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  // Synthetic corpus with PLANTED near-dups across token namespaces:
  //  1 ~ 2 ~ 5 (alpha family, 1-2 token edits on 40 tokens)
  //  3 ~ 7     (beta family)
  //  4, 6, 8 unrelated / too short to shingle-match anything
  private def alpha(edits: Map[Int, String]): String =
    (1 to 40).map(i => edits.getOrElse(i, s"alpha$i")).mkString(" ")
  private def beta(edits: Map[Int, String]): String =
    (1 to 30).map(i => edits.getOrElse(i, s"beta$i")).mkString(" ")

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> alpha(Map.empty),
    2L -> alpha(Map(40 -> "tail-changed")),
    3L -> beta(Map.empty),
    4L -> (1 to 35).map(i => s"gamma$i").mkString(" "),
    5L -> alpha(Map(1 -> "head-changed", 20 -> "mid-changed")),
    6L -> (1 to 25).map(i => s"delta$i").mkString(" "),
    7L -> beta(Map(15 -> "replaced")),
    8L -> "epsilon tiny doc")

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def pairsOf(d: DataFrame): Set[(Long, Long, Double)] =
    d.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
      r.getAs[Double]("jaccard"))).toSet

  test("batch reference finds exactly the planted near-dup pairs") {
    val got = pairsOf(NearDupStream.batchPairs(df(corpus)))
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 5L), (2L, 5L), (3L, 7L)))
    assert(got.forall(_._3 >= NearDupStream.JaccardThreshold))
  }

  test("incremental index converges to the batch pairs for any micro-batching") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndstream").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val batches = Seq(
      corpus.filter(d => Set(1L, 3L, 4L)(d._1)),
      corpus.filter(d => Set(2L, 7L, 8L)(d._1)), // cross-batch pairs 1-2, 3-7
      corpus.filter(d => Set(5L, 6L)(d._1)))     // 5 pairs into BOTH prior batches
    df(batches.head).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema(StructType.fromDDL("doc_id BIGINT, text STRING")).parquet(in)
    val q = NearDupStream.start(stream, s"$root/index", s"$root/pairs", s"$root/ckpt")
    try {
      q.processAllAvailable()
      batches.tail.foreach { b =>
        df(b).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = pairsOf(spark.read.parquet(s"$root/pairs"))
    val batch = pairsOf(NearDupStream.batchPairs(df(corpus)))
    assert(streamed == batch,
      s"stream/batch divergence: only-stream=${streamed -- batch} only-batch=${batch -- streamed}")
  }

  test("kill + restart from checkpoint: docs arriving while down are indexed exactly once") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndrestart").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def start() = NearDupStream.start(
      spark.readStream.schema(StructType.fromDDL("doc_id BIGINT, text STRING")).parquet(in),
      s"$root/index", s"$root/pairs", s"$root/ckpt")

    df(corpus.filter(d => Set(1L, 3L, 4L)(d._1))).write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // the rest of the corpus arrives while the query is DOWN
    df(corpus.filterNot(d => Set(1L, 3L, 4L)(d._1))).write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    assert(pairsOf(spark.read.parquet(s"$root/pairs")) ==
      pairsOf(NearDupStream.batchPairs(df(corpus))))
    // the index holds each doc exactly once (all 8 docs shingle: even
    // the 3-token doc 8 yields exactly one 3-gram)
    assert(spark.read.parquet(s"$root/index/shingles.parquet").count() == 8)
    assert(spark.read.parquet(s"$root/index/bands.parquet")
      .groupBy("doc_id").count().filter($"count" =!= NearDupStream.Bands).count() == 0)
  }

  test("re-delivered CHANGED document retracts its stale pairs and re-derives new ones") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndupdate").toString
    val index = s"$root/index"; val pairs = s"$root/pairs"
    NearDupStream.processBatch(spark, df(corpus.filter(d => Set(1L, 3L, 4L)(d._1))), index, pairs)
    NearDupStream.processBatch(spark, df(corpus.filterNot(d => Set(1L, 3L, 4L)(d._1))), index, pairs)
    assert(pairsOf(spark.read.parquet(pairs)).map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 5L), (2L, 5L), (3L, 7L)))

    // doc 2 changes family: alpha -> near-gamma. Its old pairs (1,2) and
    // (2,5) were verified against text that no longer exists and must be
    // retracted; its new text is a near-dup of doc 4, which must appear.
    val doc2v2 = (1 to 35).map(i => if (i == 35) "tail-changed" else s"gamma$i").mkString(" ")
    NearDupStream.processBatch(spark, df(Seq(2L -> doc2v2)), index, pairs)

    val updatedCorpus = corpus.map { case (id, t) => if (id == 2L) id -> doc2v2 else id -> t }
    val streamed = pairsOf(spark.read.parquet(pairs))
    assert(streamed.map(p => (p._1, p._2)) == Set((1L, 5L), (2L, 4L), (3L, 7L)))
    assert(streamed == pairsOf(NearDupStream.batchPairs(df(updatedCorpus))),
      "pairs store must equal batchPairs over the LATEST text of every doc")
    // the index holds the new version exactly once
    assert(spark.read.parquet(s"$index/shingles.parquet").count() == 8)
    assert(spark.read.parquet(s"$index/bands.parquet")
      .filter($"doc_id" === 2L).count() == NearDupStream.Bands)
  }

  test("replayed micro-batch is a no-op (idempotent merges)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndreplay").toString
    val index = s"$root/index"; val pairs = s"$root/pairs"
    val b1 = df(corpus.filter(d => Set(1L, 3L, 4L)(d._1)))
    val b2 = df(corpus.filterNot(d => Set(1L, 3L, 4L)(d._1)))
    NearDupStream.processBatch(spark, b1, index, pairs)
    NearDupStream.processBatch(spark, b2, index, pairs)
    def snapshot() = (
      pairsOf(spark.read.parquet(pairs)),
      spark.read.parquet(s"$root/index/bands.parquet").count(),
      spark.read.parquet(s"$root/index/shingles.parquet").count())
    val before = snapshot()
    NearDupStream.processBatch(spark, b2, index, pairs) // crash-replay of the last batch
    assert(snapshot() == before)
    assert(before._1 == pairsOf(NearDupStream.batchPairs(df(corpus))))
  }
}
