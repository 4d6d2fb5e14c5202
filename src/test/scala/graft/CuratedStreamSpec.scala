package graft

import org.apache.spark.sql.DataFrame

import graft.pipeline.CuratedCorpus
import graft.streaming.CuratedStream

/** The streaming curated corpus must equal the batch write path
  * (CuratedCorpus.write) over the documents delivered so far — for any
  * micro-batching, including eval-set arrivals that RETRACT a
  * previously-curated document. */
class CuratedStreamSpec extends SparkSpec {
  import spark.implicits._

  // 40 distinct tokens with two stopwords -> passes every funnel gate.
  private def doc(prefix: String, n: Int = 40, edits: Map[Int, String] = Map.empty): String =
    (1 to n).map { i =>
      edits.getOrElse(i,
        if (i == 1) "the" else if (i == 2) "of" else s"$prefix$i")
    }.mkString(" ")

  // Planted structure:
  //  - 1 ~ 2 near-dups (same source): survivor = doc 1 (ttr tie, lower id)
  //  - train 13 == eval 20 verbatim: contaminated once the eval set lands
  //  - 4 fails the funnel (3 tokens)
  //  - 11, 12 clean keepers in a second source
  private val corpus: Seq[(Long, String, String)] = Seq(
    (1L, doc("al"), "s0"),
    (2L, doc("al", edits = Map(40 -> "tail-changed")), "s0"),
    (4L, "tiny of doc", "s0"),
    (13L, doc("sh"), "s0"),
    (11L, doc("aa"), "s1"),
    (12L, doc("bb"), "s1"),
    (10L, doc("ev"), "s0"),
    (20L, doc("sh"), "s0"),
    (30L, doc("ez"), "s1"))

  private def df(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "source")

  private def ids(d: DataFrame): Set[Long] =
    d.select("doc_id").collect().map(_.getLong(0)).toSet
  private def manifestRows(d: DataFrame): Seq[Seq[Any]] =
    d.orderBy("source").collect().toSeq.map(_.toSeq)

  test("stream == batch write path, including eval-arrival retraction") {
    val root = java.nio.file.Files.createTempDirectory("graft-curstream").toString
    val evalIds = Set(10L, 20L, 30L)

    // batch 1: train docs only — 13 is (not yet) contaminated and is curated
    CuratedStream.processBatch(spark, df(corpus.filterNot(d => evalIds(d._1))), root)
    val curated1 = ids(spark.read.parquet(s"$root/curated/docs"))
    assert(curated1.contains(13L), "no eval set seen -> 13 must be curated")
    assert(curated1.contains(1L) && !curated1.contains(2L), "near-dup survivor = lower id on ttr tie")
    assert(!curated1.contains(4L), "funnel failure never curated")

    // batch 2: the eval set arrives — 13 must be RETRACTED
    CuratedStream.processBatch(spark, df(corpus.filter(d => evalIds(d._1))), root)
    val curated2 = ids(spark.read.parquet(s"$root/curated/docs"))
    assert(!curated2.contains(13L), "eval arrival must retract the contaminated doc")
    assert(curated2 == curated1 - 13L)

    // full equality with the batch write path over the same corpus
    val batchOut = java.nio.file.Files.createTempDirectory("graft-curbatch").toString
    val batchManifest = CuratedCorpus.write(spark,
      df(corpus).select($"doc_id", $"text", $"source"), batchOut)
    assert(curated2 == ids(spark.read.parquet(s"$batchOut/docs")))
    assert(manifestRows(spark.read.parquet(s"$root/curated/manifest")) ==
      manifestRows(batchManifest))
  }

  test("any micro-batching converges to the same curated table") {
    val batchings = Seq(corpus.grouped(2).toSeq, Seq(corpus.reverse))
    val expectedOut = java.nio.file.Files.createTempDirectory("graft-cur-exp").toString
    CuratedCorpus.write(spark, df(corpus).select($"doc_id", $"text", $"source"), expectedOut)
    val expected = ids(spark.read.parquet(s"$expectedOut/docs"))
    batchings.zipWithIndex.foreach { case (bs, i) =>
      val root = java.nio.file.Files.createTempDirectory(s"graft-cur-$i").toString
      bs.foreach(b => CuratedStream.processBatch(spark, df(b), root))
      assert(ids(spark.read.parquet(s"$root/curated/docs")) == expected,
        s"divergence under batching $i")
    }
  }

  test("replayed micro-batch is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-cur-replay").toString
    val (b1, b2) = corpus.splitAt(5)
    CuratedStream.processBatch(spark, df(b1), root)
    CuratedStream.processBatch(spark, df(b2), root)
    def snapshot() = (ids(spark.read.parquet(s"$root/curated/docs")),
      manifestRows(spark.read.parquet(s"$root/curated/manifest")))
    val before = snapshot()
    CuratedStream.processBatch(spark, df(b2), root)
    assert(snapshot() == before)
  }
}
