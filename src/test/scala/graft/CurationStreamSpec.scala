package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.operators.Curation
import graft.streaming.CurationStream

class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  // Documents engineered against each funnel stage. src0 has mixture
  // rate 1000 (always kept) so funnel behavior is isolated; src2 has
  // rate 250 so most ids are mixture-dropped.
  private def tokens(n: Int, word: Int => String): String =
    (1 to n).map(word).mkString(" ")
  private val passing = tokens(40, i => if (i % 10 == 0) "the" else s"w$i")
  private val corpus: Seq[(Long, String, String)] = Seq(
    (1L, passing, "src0"),                                   // passes all
    (2L, tokens(10, i => s"s$i"), "src0"),                   // too short
    (3L, tokens(120, i => if (i % 10 == 0) "of" else s"l$i"), "src0"), // too long
    (4L, tokens(40, i => if (i % 2 == 0) "rep" else "eat"), "src0"),   // repetitive
    (5L, tokens(40, i => s"nostop$i"), "src0"),              // no stopwords
    (6L, passing, "src0"),                                   // passes all
    (7L, passing, "src2"),                                   // funnel-pass, rate 250
    (8L, passing, "src2"))                                   // funnel-pass, rate 250

  private def df(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "source")

  private def keptIds(d: DataFrame): Set[Long] =
    d.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  test("funnel flags isolate each failure mode") {
    val flags = Curation.funnelFlags(df(corpus))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("p_len"), r.getAs[Boolean]("p_rep"),
          r.getAs[Boolean]("p_stop")))).toMap
    assert(flags(1L) == ((true, true, true)))
    assert(!flags(2L)._1, "10 tokens must fail the length floor")
    assert(!flags(3L)._1, "120 tokens must fail the length cap")
    assert(!flags(4L)._2, "rep/eat alternation must fail the repetition cap")
    assert(!flags(5L)._3, "stopword-free text must fail the stopword floor")
  }

  test("digitless source takes the default mixture rate without erroring") {
    val rates = Seq("web", "src0", "src2").toDF("source")
      .select(Curation.ratePermille(col("source")).as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(rates == Seq(750L, 1000L, 250L))
  }

  test("batch reference applies funnel AND mixture deterministically") {
    val kept = keptIds(CurationStream.batchKept(df(corpus)))
    // src0 funnel-passers always survive (rate 1000); funnel failures
    // never do; src2 survivors are exactly the bucket<250 subset
    assert(Set(1L, 6L).subsetOf(kept))
    assert(kept.intersect(Set(2L, 3L, 4L, 5L)).isEmpty)
    val srcTwoKept = df(corpus).filter(col("source") === "src2")
      .filter(Curation.mixtureKeep(col("doc_id"), col("source")))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept.intersect(Set(7L, 8L)) == srcTwoKept)
    // rerun is bit-identical
    assert(keptIds(CurationStream.batchKept(df(corpus))) == kept)
  }

  test("stream converges to the batch kept set for any micro-batching") {
    val root = java.nio.file.Files.createTempDirectory("graft-curstream").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val batches = Seq(
      corpus.filter(d => Set(1L, 2L, 7L)(d._1)),
      corpus.filter(d => Set(3L, 4L, 8L)(d._1)),
      corpus.filter(d => Set(5L, 6L)(d._1)))
    df(batches.head).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema(StructType.fromDDL("doc_id BIGINT, text STRING, source STRING"))
      .parquet(in)
    val q = CurationStream.start(stream, s"$root/verdicts", s"$root/ckpt")
    try {
      q.processAllAvailable()
      batches.tail.foreach { b =>
        df(b).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
    } finally q.stop()
    val verdicts = spark.read.parquet(s"$root/verdicts")
    val streamed = keptIds(verdicts.filter(col("kept")))
    val batch = keptIds(CurationStream.batchKept(df(corpus)))
    assert(streamed == batch,
      s"stream/batch divergence: only-stream=${streamed -- batch} only-batch=${batch -- streamed}")
    // every document has a verdict row, kept or not
    assert(verdicts.count() == corpus.size)
  }

  test("replayed micro-batch is a no-op (exactly-once accounting)") {
    val root = java.nio.file.Files.createTempDirectory("graft-curreplay").toString
    val verdicts = s"$root/verdicts"
    val b = df(corpus.take(6))
    CurationStream.processBatch(spark, b, verdicts)
    val first = spark.read.parquet(verdicts).collect().toSet
    CurationStream.processBatch(spark, b, verdicts) // crash-replay simulation
    assert(spark.read.parquet(verdicts).collect().toSet == first)
  }

  test("re-delivered doc flips its verdict; in-batch conflicts are deterministic") {
    val root = java.nio.file.Files.createTempDirectory("graft-curflip").toString
    val verdicts = s"$root/verdicts"
    // batch 1: doc 9 passes -> kept=true
    CurationStream.processBatch(spark, df(Seq((9L, passing, "src0"))), verdicts)
    assert(keptIds(spark.read.parquet(verdicts).filter(col("kept"))) == Set(9L))
    // batch 2: a NEW version of doc 9 fails the funnel -> verdict flips
    CurationStream.processBatch(spark,
      df(Seq((9L, "tiny now", "src0"))), verdicts)
    val after = spark.read.parquet(verdicts)
    assert(after.count() == 1)
    assert(keptIds(after.filter(col("kept"))).isEmpty)
    // in-batch conflict: both versions in ONE batch resolve to the
    // lexicographic max text ("tiny now" > passing's "w..."-prefixed
    // tokens? resolve via the rule itself, twice, for determinism)
    val conflict = df(Seq((9L, passing, "src0"), (9L, "tiny now", "src0")))
    val v1 = CurationStream.batchVerdicts(conflict).collect().toSet
    val v2 = CurationStream.batchVerdicts(
      df(Seq((9L, "tiny now", "src0"), (9L, passing, "src0")))).collect().toSet
    assert(v1 == v2)
    assert(v1.size == 1)
  }
}
