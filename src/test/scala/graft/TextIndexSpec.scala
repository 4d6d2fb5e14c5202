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
  private def expected = expectedOver(documents)

  /** [[expected]] over an arbitrary document population — the
    * reference for the deletion identity (probe-after-delete ==
    * fresh-scoring-minus-deleted) and probeWhere's within-population
    * semantics (fresh scoring over the subpopulation). */
  private def expectedOver(docs: org.apache.spark.sql.DataFrame) = {
    val ts = TextOps.tokens(col("text"))
    def tf(t: String) = size(filter(ts, x => x === lit(t))).cast("long")
    val base = docs.select(
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

  test("deletion (the HARD case): stats subtraction makes probe-after-delete == fresh scoring minus deleted") {
    import graft.operators.Tombstones
    val d = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    // split across two segments so the tombstones cut across segment
    // boundaries (the cross-segment statistics are the point)
    TextIndex.build(spark,
      documents.filter(pmod(col("doc_id"), lit(2)) === 0), "bm25_del", d)
    TextIndex.appendDelta(spark,
      documents.filter(pmod(col("doc_id"), lit(2)) === 1), "bm25_del", d)
    val deleted = documents.filter(pmod(col("doc_id"), lit(10)) === 2)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(deleted.nonEmpty)
    TextIndex.deleteDocs(spark, deleted, "bm25_del", d)
    TextIndex.deleteDocs(spark, deleted.take(3), "bm25_del", d) // dedupe
    assert(Tombstones.count(spark, s"$d/bm25_del/tombstones") == deleted.size)

    val want = expectedOver(
      documents.filter(pmod(col("doc_id"), lit(10)) =!= 2)).collect().toSeq
    val got = TextIndex.probe(spark, "bm25_del", d, terms, 25)
      .collect().toSeq
    // score doubles shift for EVERY row when n_docs/total_tokens/df
    // change — equality here proves the subtraction is exact
    assert(got == want && want.nonEmpty,
      s"deletion must shift global statistics exactly:\n$got\nvs\n$want")

    // compaction drains: rows dropped, stats recomputed, ledger cleared
    TextIndex.compactInPlace(spark, "bm25_del", d)
    assert(Tombstones.count(spark, s"$d/bm25_del/tombstones") == 0)
    assert(spark.read.parquet(s"$d/bm25_del/doclens")
      .filter(col("doc_id").isin(deleted.take(20): _*)).count() == 0)
    assert(TextIndex.probe(spark, "bm25_del", d, terms, 25)
      .collect().toSeq == want)
  }

  test("deleting a document with NO query term still shifts every score (pure statistics subtraction)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    // doc 3 shares no term with the query: deleting it changes no
    // pruned posting list — the ONLY channel to the scores is the
    // (n_docs, total_tokens) subtraction from the tombstone's recorded
    // dl, which is what this pins (every surviving row's score shifts)
    val tiny = Seq(
      (1L, "a", "spark table spark hash"),
      (2L, "a", "table hash table"),
      (3L, "b", "entirely unrelated words here"),
      (4L, "b", "spark spark hash table")).toDF("doc_id", "source", "text")
    TextIndex.build(spark, tiny, "bm25_zero", d)
    val before = TextIndex.probe(spark, "bm25_zero", d, terms, 25)
      .collect().toSeq
    TextIndex.deleteDocs(spark, Seq(3L), "bm25_zero", d)
    val want = expectedOver(tiny.filter(col("doc_id") =!= 3L)).collect().toSeq
    val got = TextIndex.probe(spark, "bm25_zero", d, terms, 25)
      .collect().toSeq
    assert(got == want && want.nonEmpty,
      s"an off-list doc's deletion must shift the statistics:\n$got\nvs\n$want")
    assert(got.map(_.getLong(0)) == before.map(_.getLong(0)) && got != before,
      "same survivors, different scores — the shift is pure statistics")
  }

  test("probeWhere: within-population statistics == fresh scoring over the subpopulation; predicate pushed") {
    val d = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    TextIndex.build(spark, documents, "bm25_pop", d)
    val srcs = documents.select(col("source")).distinct()
      .orderBy(col("source")).limit(2)
      .collect().map(_.getString(0)).toSeq
    val pred = col("source").isin(srcs: _*)
    val probe = TextIndex.probeWhere(spark, "bm25_pop", d, terms, 25, pred)
    val want = expectedOver(documents.filter(pred)).collect().toSeq
    val got = probe.collect().toSeq
    assert(got == want && want.nonEmpty,
      s"probeWhere must be a fresh BM25 over the population:\n$got\nvs\n$want")

    // the population predicate reaches the parquet scans as a pushed
    // filter (postings carry source as a passenger column)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
      }.flatten
    val postingScans = allScans(probe.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("postings")))
    assert(postingScans.nonEmpty && postingScans.forall(
      _.metadata.get("PushedFilters").exists(_.contains("In(source"))),
      s"population predicate must push into the posting scan:\n" +
        probe.queryExecution.executedPlan)

    // deletion composes: tombstoned docs leave population, candidates,
    // and statistics alike
    val delIds = documents.filter(pred && pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(delIds.nonEmpty)
    TextIndex.deleteDocs(spark, delIds, "bm25_pop", d)
    val want2 = expectedOver(documents.filter(pred &&
      pmod(col("doc_id"), lit(3)) =!= 1)).collect().toSeq
    assert(TextIndex.probeWhere(spark, "bm25_pop", d, terms, 25, pred)
      .collect().toSeq == want2)
  }

  test("format 1 (no doclens) still probes; deletion and probeWhere refuse it with a rebuild message") {
    val d = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    TextIndex.build(spark, documents, "bm25_fmt", d)
    val want = TextIndex.probe(spark, "bm25_fmt", d, terms, 25)
      .collect().toSeq
    // model a format-1 index: sidecar without the format key
    graft.operators.IndexMeta.write(spark, s"$d/bm25_fmt/meta.json",
      Map("buckets" -> 16L))
    assert(TextIndex.probe(spark, "bm25_fmt", d, terms, 25)
      .collect().toSeq == want, "format 1 must still serve plain probes")
    assert(intercept[Exception] {
      TextIndex.deleteDocs(spark, Seq(1L), "bm25_fmt", d)
    }.getMessage.contains("format 1"))
    assert(intercept[Exception] {
      TextIndex.probeWhere(spark, "bm25_fmt", d, terms, 25, lit(true))
    }.getMessage.contains("format 1"))
  }
}
