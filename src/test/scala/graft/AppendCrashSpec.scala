package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, IvfPqIndex, SigIndex, TextIndex, VectorOps}

/** Crash injection on the APPEND path of every persisted index
  * (VERDICT r9 wishlist #3). Appends are deliberately NOT
  * manifest-pinned: exactly one table changes, so Spark's job-commit
  * atomicity (task files stay under _temporary until commitJob) is the
  * whole story — but that story was asserted, never tested. These
  * tests abort an append job mid-write by poisoning one input row with
  * raise_error, then prove both halves of the contract:
  *
  *  1. a failed append is INVISIBLE — probe answers and row counts are
  *     bit-identical to the pre-append index (no partial task files
  *     leak into the live table/segment tree);
  *  2. the retry/replay LANDS — the aborted job leaves nothing behind
  *     that blocks a clean re-run (for the segmented indexes the retry
  *     IS the streaming redelivery path: same segId, per-segment
  *     overwrite).
  */
class AppendCrashSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def vectors = Tables.embeddings(spark, dir)
    .select(col("vec_id"), VectorOps.quantized(col("embedding")).as("q"))
    .withColumn("n2", VectorOps.qnorm2(col("q")))

  private def queries = vectors.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))

  private def corpus = vectors
    .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2"))

  private def halves =
    (vectors.filter(pmod(col("vec_id"), lit(2)) === 0),
      vectors.filter(pmod(col("vec_id"), lit(2)) === 1))

  /** vec_id 1 (odd — always in the delta half) evaluates its n2 to
    * raise_error, so the append job fails after other tasks may have
    * already staged their task files. */
  private def poisonN2(df: DataFrame): DataFrame =
    df.withColumn("n2",
      when(col("vec_id") === 1L,
        expr("raise_error('injected append crash')").cast("long"))
        .otherwise(col("n2")))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("IvfIndex: failed append invisible, retry lands") {
    val d = tmp("graft-crash-ivf")
    val (h1, h2) = halves
    IvfIndex.build(spark, h1, "ivf_crash", d)
    try {
      val probe0 = IvfIndex.probe(spark, "ivf_crash", d, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      val rows0 = spark.table("ivf_crash_cells").count()
      intercept[Exception] {
        IvfIndex.append(spark, poisonN2(h2), "ivf_crash", d)
      }
      assert(spark.table("ivf_crash_cells").count() == rows0,
        "partial task files leaked into the cells table")
      val probe1 = IvfIndex.probe(spark, "ivf_crash", d, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      assert(probe1 == probe0 && probe0.nonEmpty)
      IvfIndex.append(spark, h2, "ivf_crash", d) // the retry
      assert(spark.table("ivf_crash_cells").count() == vectors.count())
    } finally spark.sql("DROP TABLE IF EXISTS ivf_crash_cells")
  }

  test("IvfPqIndex: failed append invisible, retry lands") {
    val d = tmp("graft-crash-ivfpq")
    val (h1, h2) = halves
    IvfPqIndex.build(spark, h1, "ivfpq_crash", d,
      m = 4, subDim = 16, ksub = 16, iters = 2)
    try {
      val rows0 = spark.table("ivfpq_crash_codes").count()
      val probe0 = IvfPqIndex.probe(spark, "ivfpq_crash", d, queries,
          corpus, cand = 20, topk = 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      intercept[Exception] {
        IvfPqIndex.append(spark, poisonN2(h2), "ivfpq_crash", d)
      }
      assert(spark.table("ivfpq_crash_codes").count() == rows0,
        "partial task files leaked into the codes table")
      // count parity alone would pass a partial write that preserved
      // row counts but corrupted codes (ADVICE r10) — the probe answers
      // must be bit-identical to the pre-append index too
      val probe1 = IvfPqIndex.probe(spark, "ivfpq_crash", d, queries,
          corpus, cand = 20, topk = 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      assert(probe1 == probe0 && probe0.nonEmpty)
      IvfPqIndex.append(spark, h2, "ivfpq_crash", d) // the retry
      // every appended vector carries meta.m sub-codes
      val m = IvfPqIndex.readMeta(spark, "ivfpq_crash", d).m
      assert(spark.table("ivfpq_crash_codes").count() == vectors.count() * m)
      // and the healed index answers change only because the corpus
      // grew: the full-corpus probe returns non-empty, well-formed rows
      // (a fresh full build is NOT bit-comparable here — PQ codebooks
      // are trained on h1 at build time and frozen across appends,
      // while a fresh build would train on the full corpus)
      val probe2 = IvfPqIndex.probe(spark, "ivfpq_crash", d, queries,
          corpus, cand = 20, topk = 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      assert(probe2.nonEmpty && probe2.size >= probe0.size)
    } finally spark.sql("DROP TABLE IF EXISTS ivfpq_crash_codes")
  }

  test("SigIndex: failed delta invisible, same-segId replay heals") {
    val d = tmp("graft-crash-sig")
    val (h1, h2) = halves
    SigIndex.build(spark, h1, "sig_crash", d)
    val meta = SigIndex.readMeta(spark, "sig_crash", d)
    val probe0 = SigIndex.probe(spark, "sig_crash", d, queries, 3)
      .orderBy(col("qid"), col("cid")).collect().toSeq
    intercept[Exception] {
      SigIndex.writeDelta(spark, poisonN2(h2), "sig_crash", d, meta, 1L)
    }
    assert(spark.read.parquet(s"$d/sig_crash/sigs").count() == h1.count(),
      "partial task files leaked into the segment tree")
    val probe1 = SigIndex.probe(spark, "sig_crash", d, queries, 3)
      .orderBy(col("qid"), col("cid")).collect().toSeq
    assert(probe1 == probe0 && probe0.nonEmpty)
    // the replay IS the recovery: the redelivered batch rewrites its
    // own segment (per-segment overwrite), and the healed index equals
    // a fresh full build bit for bit
    SigIndex.writeDelta(spark, h2, "sig_crash", d, meta, 1L)
    val d2 = tmp("graft-crash-sig-ref")
    SigIndex.build(spark, vectors, "sig_crash_ref", d2)
    val got = SigIndex.probe(spark, "sig_crash", d, queries, 3)
      .orderBy(col("qid"), col("cid")).collect().toSeq
    val want = SigIndex.probe(spark, "sig_crash_ref", d2, queries, 3)
      .orderBy(col("qid"), col("cid")).collect().toSeq
    assert(got == want && want.nonEmpty)
  }

  test("TextIndex: failed delta invisible, same-segId replay heals") {
    val d = tmp("graft-crash-bm25")
    val terms = Seq("spark", "table", "hash")
    val documents = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val dh1 = documents.filter(pmod(col("doc_id"), lit(2)) === 0)
    val dh2 = documents.filter(pmod(col("doc_id"), lit(2)) === 1)
    val meta = TextIndex.build(spark, dh1, "bm25_crash", d)
    val probe0 = TextIndex.probe(spark, "bm25_crash", d, terms, 25)
      .orderBy(col("doc_id")).collect().toSeq
    val poisoned = dh2.withColumn("text",
      when(col("doc_id") === 1L,
        expr("raise_error('injected append crash')").cast("string"))
        .otherwise(col("text")))
    intercept[Exception] {
      TextIndex.writeDelta(spark, poisoned, "bm25_crash", d, meta, 1L)
    }
    val probe1 = TextIndex.probe(spark, "bm25_crash", d, terms, 25)
      .orderBy(col("doc_id")).collect().toSeq
    assert(probe1 == probe0 && probe0.nonEmpty)
    // replay with the same segId, then match a fresh full build
    TextIndex.writeDelta(spark, dh2, "bm25_crash", d, meta, 1L)
    val d2 = tmp("graft-crash-bm25-ref")
    TextIndex.build(spark, documents, "bm25_crash_ref", d2)
    val got = TextIndex.probe(spark, "bm25_crash", d, terms, 25)
      .orderBy(col("doc_id")).collect().toSeq
    val want = TextIndex.probe(spark, "bm25_crash_ref", d2, terms, 25)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got == want && want.nonEmpty)
  }
}
