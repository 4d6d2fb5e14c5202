package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextIndex, TextOps}

/** Plan + parity proof for the persisted BM25 postings index: the
  * probe must READ the index — statically directory-pruned postings
  * scan (term-hash hive partitions), no corpus/documents scan anywhere
  * in the plan — and score exactly what q91's in-plan full-scan scorer
  * scores for every matched doc.
  */
class TextIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "table", "hash")

  private def documents = Tables.documents(spark, dir)
    .select(col("doc_id"), col("source"), col("text"))

  /** Independent full-scan recomputation (q91's flow restricted to
    * matched docs) — the expected answer the index must reproduce. */
  private def expected = {
    val ts = TextOps.tokens(col("text"))
    def tf(t: String) = size(filter(ts, x => x === lit(t))).cast("long")
    val base = documents.select(
      (Seq(col("doc_id"), col("source"), size(ts).cast("long").as("dl")) ++
        terms.map(t => tf(t).as(s"tf_$t"))): _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("total_tokens") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))): _*)
    val score = terms.map(TextIndex.bm25Term).reduce(_ + _).as("score")
    base.crossJoin(broadcast(stats))
      .filter(terms.map(t => col(s"tf_$t") > 0).reduce(_ || _))
      .select(col("doc_id"), col("source"), col("dl"), score)
      .orderBy(col("score").desc_nulls_last, col("doc_id"))
      .limit(25)
  }

  test("probe plan reads the index: pruned postings scan, no corpus scan") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val meta = TextIndex.build(spark, documents, "bm25_spec", idxDir)

    val probe = TextIndex.probe(spark, "bm25_spec", idxDir, terms,
      topk = 25)
    val plan = probe.queryExecution.executedPlan

    // 1. the postings scan is statically partition-pruned to the
    //    queried terms' hash buckets — at most |terms| of the written
    //    bucket directories are listed, the rest are never touched
    //    (AdaptiveSparkPlanExec hides its inner plan from collect —
    //    unwrap it first)
    val inner = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = inner.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("postings")) => f
    }
    assert(scans.nonEmpty, s"no postings scan in probe plan:\n$plan")
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        s"postings scan not partition-pruned:\n$plan")
      val selected = f.selectedPartitions.partitionCount
      assert(selected <= terms.size && selected > 0,
        s"expected <= ${terms.size} pruned partitions, read $selected")
    }

    // 2. no corpus scan: the probe must read postings + stats only —
    //    neither the documents table nor a tokenize (split) appears
    val planStr = plan.toString
    assert(!planStr.contains("documents"),
      s"probe plan scans the corpus:\n$planStr")
    assert(!planStr.contains("split("),
      s"probe plan re-tokenizes:\n$planStr")

    // 3. and the probe's answers are the full-scan scorer's answers
    //    for matched docs, bit for bit (same BM25 arithmetic)
    val gotRows = probe.collect().toSeq
    val want = expected.collect().toSeq
    assert(gotRows == want && want.nonEmpty)
  }

  test("delta append: probe(base + delta) == probe(fresh full rebuild)") {
    val dSeg = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val dFull = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    // split the corpus in two disjoint halves: base indexes one,
    // the other arrives later as a delta segment
    val half1 = documents.filter(pmod(col("doc_id"), lit(2)) === 0)
    val half2 = documents.filter(pmod(col("doc_id"), lit(2)) === 1)
    val m = TextIndex.build(spark, half1, "bm25_seg", dSeg)
    TextIndex.appendDelta(spark, half2, "bm25_seg", dSeg)
    assert(TextIndex.segmentIds(spark, "bm25_seg", dSeg) == Seq(0L, 1L))
    val mFull = TextIndex.build(spark, documents, "bm25_full", dFull)
    val got = TextIndex.probe(spark, "bm25_seg", dSeg, terms, 25)
      .collect().toSeq
    val want = TextIndex.probe(spark, "bm25_full", dFull, terms, 25)
      .collect().toSeq
    // segment structure is unobservable: global stats are per-segment
    // sums, df counts the unioned pruned lists — answers are the
    // rebuilt index's answers, bit for bit (and the full-scan
    // scorer's, via the first test's parity)
    assert(got == want && want.nonEmpty)
    assert(got == expected.collect().toSeq)
  }

  test("rewrite compaction: one segment afterwards, identical answers") {
    val d = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val half1 = documents.filter(pmod(col("doc_id"), lit(2)) === 0)
    val half2 = documents.filter(pmod(col("doc_id"), lit(2)) === 1)
    val m = TextIndex.build(spark, half1, "bm25_lsm", d)
    TextIndex.appendDelta(spark, half2, "bm25_lsm", d)
    val before = TextIndex.probe(spark, "bm25_lsm", d, terms, 25)
      .collect().toSeq
    val mc = TextIndex.compactTo(spark, "bm25_lsm", d, "bm25_lsm_c")
    assert(mc == m, "compaction must carry the geometry over")
    assert(TextIndex.segmentIds(spark, "bm25_lsm_c", d) == Seq(0L))
    val after = TextIndex.probe(spark, "bm25_lsm_c", d, terms, 25)
      .collect().toSeq
    assert(after == before && before.nonEmpty)
  }

  test("streaming ingestion: foreachBatch writeDelta == batch build; replay no-op") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val dRef = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val m = TextIndex.Meta(buckets = 16)
    val docsLocal = documents
      .select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val (b1, rest) = docsLocal.splitAt(docsLocal.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)

    // the delta path IS the streaming ingestion path: each micro-batch
    // becomes segment <batchId>; per-segment overwrite makes replays
    // idempotent (no ledger)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("doc_id", "source", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        TextIndex.writeDelta(spark, batch, "bm25_stream", d, m, id)
      }
      .option("checkpointLocation", s"$d/_ckpt")
      .start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
    } finally q.stop()
    assert(TextIndex.segmentIds(spark, "bm25_stream", d).size == 3)

    val mRef = TextIndex.build(spark, documents, "bm25_ref", dRef)
    val want = TextIndex.probe(spark, "bm25_ref", dRef, terms, 25)
      .collect().toSeq
    val got = TextIndex.probe(spark, "bm25_stream", d, terms, 25)
      .collect().toSeq
    assert(got == want && want.nonEmpty)

    // exact redelivery of an already-committed batch: segment rewritten
    // with identical content — answers unchanged
    TextIndex.writeDelta(spark,
      b2.toDF("doc_id", "source", "text"), "bm25_stream", d, m, 1L)
    val replayed = TextIndex.probe(spark, "bm25_stream", d, terms, 25)
      .collect().toSeq
    assert(replayed == want)
  }

  test("atomic in-place compaction: probes see all-old or all-new across a crash") {
    import graft.pipeline.TierCommit
    val d = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val half1 = documents.filter(pmod(col("doc_id"), lit(2)) === 0)
    val half2 = documents.filter(pmod(col("doc_id"), lit(2)) === 1)
    TextIndex.build(spark, half1, "bm25_live", d)
    TextIndex.appendDelta(spark, half2, "bm25_live", d)
    assert(TextIndex.segmentIds(spark, "bm25_live", d) == Seq(0L, 1L))
    val answers = TextIndex.probe(spark, "bm25_live", d, terms, 25)
      .collect().toSeq

    // CRASH 1: after the compaction is staged but BEFORE the manifest
    // rename (= before the commit point). A reader healing first sees
    // the index untouched: ALL-OLD, both segments, same answers.
    TextIndex.stageCompactInPlace(spark, "bm25_live", d)
    assert(!TierCommit.heal(spark, d), "no manifest yet: heal is a no-op")
    assert(TextIndex.segmentIds(spark, "bm25_live", d) == Seq(0L, 1L))
    assert(TextIndex.probe(spark, "bm25_live", d, terms, 25)
      .collect().toSeq == answers)

    // CRASH 2: after the manifest rename (= the commit point) but
    // before any promotion ran. The reader's heal rolls the swap
    // FORWARD: ALL-NEW — one compacted segment, identical answers.
    TierCommit.writeManifest(spark, d, Seq(s"$d/bm25_live"))
    assert(TierCommit.heal(spark, d), "manifest present: heal must promote")
    assert(TextIndex.segmentIds(spark, "bm25_live", d) == Seq(0L),
      "healed index must be the compacted one-segment layout")
    assert(TextIndex.probe(spark, "bm25_live", d, terms, 25)
      .collect().toSeq == answers,
      "compaction is answer-invariant across the crash-healed swap")

    // and the uninterrupted path: rebuild-in-place from the full
    // corpus over the live index — same answers, single segment
    TextIndex.rebuildInPlace(spark, documents, "bm25_live", d)
    assert(TextIndex.segmentIds(spark, "bm25_live", d) == Seq(0L))
    assert(TextIndex.probe(spark, "bm25_live", d, terms, 25)
      .collect().toSeq == answers)
    TextIndex.compactInPlace(spark, "bm25_live", d)
    assert(TextIndex.probe(spark, "bm25_live", d, terms, 25)
      .collect().toSeq == answers)
  }

  test("FRESH session opens the index with only (name, dir) via the meta sidecar") {
    val d = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val built = TextIndex.build(spark, documents, "bm25_fresh", d)
    val want = TextIndex.probe(spark, "bm25_fresh", d, terms, 25)
      .collect().toSeq
    val fresh = spark.newSession()
    assert(TextIndex.readMeta(fresh, "bm25_fresh", d) == built)
    val got = TextIndex.probe(fresh, "bm25_fresh", d, terms, 25)
      .collect().toSeq
    assert(got == want && want.nonEmpty)
  }

  test("probe terms are not restricted to identifier-safe strings (ADVICE r8)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    // terms with '.' and '`' are legal postings keys the tokenizer
    // emits; the probe's positional tf_i/df_i fold must handle them
    val docsDf = Seq(
      (1L, "s", "a.b a.b x`y plain"),
      (2L, "s", "plain plain other"),
      (3L, "s", "other other other"))
      .toDF("doc_id", "source", "text")
    TextIndex.build(spark, docsDf, "bm25_dots", d)
    val got = TextIndex.probe(spark, "bm25_dots", d,
      Seq("a.b", "x`y"), topk = 10).collect().toSeq
    assert(got.map(_.getLong(0)) == Seq(1L),
      "only doc 1 contains the dotted/backticked terms")
    assert(got.head.getAs[Double]("score") > 0.0)
  }

  test("a stray non-numeric seg= directory never breaks probes (ADVICE r8)") {
    val d = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    TextIndex.build(spark, documents, "bm25_stray", d)
    val want = TextIndex.probe(spark, "bm25_stray", d, terms, 25)
      .collect().toSeq
    // an interrupted writer's tmp directory (or a foreign tool's)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$d/bm25_stray/postings/seg=__tmp"))
    assert(TextIndex.segmentIds(spark, "bm25_stray", d) == Seq(0L),
      "non-numeric directories are not segments")
    assert(TextIndex.probe(spark, "bm25_stray", d, terms, 25)
      .collect().toSeq == want)
  }

  test("build is deterministic: two builds serve identical probe answers") {
    val d1 = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val m1 = TextIndex.build(spark, documents, "bm25_det1", d1)
    val m2 = TextIndex.build(spark, documents, "bm25_det2", d2)
    assert(m1 == TextIndex.readMeta(spark, "bm25_det1", d1))
    val a = TextIndex.probe(spark, "bm25_det1", d1, terms, 25)
      .collect().toSeq
    val b = TextIndex.probe(spark, "bm25_det2", d2, terms, 25)
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
