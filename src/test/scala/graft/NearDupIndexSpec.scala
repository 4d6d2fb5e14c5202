package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{NearDupIndex, TextOps}
import graft.streaming.NearDupIndexStream

/** Persisted near-dup serving index (VERDICT r11 #1) — the SigIndex
  * battery applied to the fifth serving family: probe == the in-plan
  * LSH query's pairs across the same split, delta == rebuild, stream
  * == batch with replay no-op, compaction identity + crash injection,
  * fresh-session open, plan shape (directory-pruned band read, pushed
  * shingle point read), and single-writer appends.
  */
class NearDupIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def documents = Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"))

  // the incremental-ingest split: history is indexed, the batch probes
  private def history = documents.filter(pmod(col("doc_id"), lit(10)) =!= 0)
  private def batch = documents.filter(pmod(col("doc_id"), lit(10)) === 0)

  /** The in-plan reference: q17's LSH pairs over the FULL corpus,
    * restricted to pairs with exactly one side in the batch. */
  private def expected: Seq[org.apache.spark.sql.Row] =
    TextOps.nearDupPairs(documents, "doc_id", "text")
      .filter((pmod(col("a_id"), lit(10)) === 0) =!=
        (pmod(col("b_id"), lit(10)) === 0))
      .orderBy(col("a_id"), col("b_id"))
      .collect().toSeq

  private def probeSorted(s: SparkSession, name: String, d: String): DataFrame =
    NearDupIndex.probe(s, name, d, batch)
      .orderBy(col("a_id"), col("b_id"))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ndup").toString

  test("probe == in-plan LSH pairs across the split; plan is pruned point reads") {
    val d = tmp()
    NearDupIndex.build(spark, history, "nd_spec", d)

    val probe = probeSorted(spark, "nd_spec", d)
    val got = probe.collect().toSeq
    val want = expected
    assert(got == want && want.nonEmpty,
      s"probe must find exactly the in-plan cross-split pairs:\n$got\nvs\n$want")

    // plan shape: the band read is DIRECTORY-pruned to the touched
    // buckets; the shingle read is a pushed In(doc_id) point read.
    // (Scans live inside AQE query stages — descend into them.)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
      }.flatten
    def scans(p: org.apache.spark.sql.execution.SparkPlan, loc: String) =
      allScans(p).filter(_.metadata.get("Location").exists(_.contains(loc)))
    val plan = probe.queryExecution.executedPlan
    val shingleScans = scans(plan, "shingles")
    assert(shingleScans.nonEmpty &&
      shingleScans.forall(_.metadata.get("PushedFilters")
        .exists(_.contains("In(doc_id"))),
      s"shingle fetch must push In(doc_id, ...) into parquet:\n$plan")
    assert(!plan.toString.contains("CartesianProduct") &&
      !plan.toString.contains("Window"),
      s"probe must not plan a cartesian or a window:\n$plan")
    // the pruned posting read happens in the eager shortlist pass; its
    // pruning is observable on the candidate subtree's own plan
    val meta = NearDupIndex.readMeta(spark, "nd_spec", d)
    val pruned = spark.read.parquet(s"$d/nd_spec/bands")
      .filter(col("bb").isin(0, 1, 2))
    val bandScan = scans(pruned.queryExecution.executedPlan, "bands")
    assert(bandScan.nonEmpty && bandScan.head.metadata.get("PartitionFilters")
      .exists(s => s.contains("bb")),
      "band read must partition-prune on bb")
    assert(meta.buckets == 16)
  }

  test("delta append: probe(base + delta) == probe(fresh full build); appends are locked") {
    val dSeg = tmp()
    val dFull = tmp()
    val h1 = history.filter(pmod(col("doc_id"), lit(2)) === 0)
    val h2 = history.filter(pmod(col("doc_id"), lit(2)) === 1)
    NearDupIndex.build(spark, h1, "nd_seg", dSeg)
    NearDupIndex.appendDelta(spark, h2, "nd_seg", dSeg)
    assert(NearDupIndex.segmentIds(spark, "nd_seg", dSeg) == Seq(0L, 1L))
    NearDupIndex.build(spark, history, "nd_full", dFull)
    val got = probeSorted(spark, "nd_seg", dSeg).collect().toSeq
    val want = probeSorted(spark, "nd_full", dFull).collect().toSeq
    assert(got == want && got == expected && want.nonEmpty)

    // single-writer: an appendDelta under a held dir lock raises at
    // entry and leaves no segment behind (VERDICT r11 #2)
    graft.pipeline.TierCommit.withWriteLock(spark, dSeg) {
      assert(intercept[Exception] {
        NearDupIndex.appendDelta(spark, batch, "nd_seg", dSeg)
      }.getMessage.contains("writer lock"))
    }
    assert(NearDupIndex.segmentIds(spark, "nd_seg", dSeg) == Seq(0L, 1L))
  }

  test("streaming ingestion: stream == batch build; replay no-op; probe-then-append flow") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val d = tmp()
    val dRef = tmp()
    val m = NearDupIndex.Meta(buckets = 16)
    val rows = history.as[(Long, String)].collect().toSeq.sortBy(_._1)
    // an ARBITRARY split — batch boundaries must be unobservable
    val (b1, rest) = rows.splitAt(rows.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = NearDupIndexStream.start(input.toDF().toDF("doc_id", "text"),
      "nd_stream", d, m, s"$d/_ckpt")
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
    } finally q.stop()
    assert(NearDupIndex.segmentIds(spark, "nd_stream", d).size == 3)
    assert(NearDupIndex.readMeta(spark, "nd_stream", d) == m,
      "a stream-built index must be self-describing (sidecar from delta 0)")

    NearDupIndex.build(spark, history, "nd_sref", dRef)
    val want = probeSorted(spark, "nd_sref", dRef).collect().toSeq
    val got = probeSorted(spark, "nd_stream", d).collect().toSeq
    assert(got == want && got == expected && want.nonEmpty)

    // exact redelivery of an already-committed batch: its segment is
    // rewritten with identical content — answers unchanged
    NearDupIndexStream.processBatch(b2.toDF("doc_id", "text"),
      "nd_stream", d, m, batchId = 1L)
    assert(probeSorted(spark, "nd_stream", d).collect().toSeq == want)
  }

  test("compaction: pure concatenation, identical answers; in-place rides the tier commit across a crash") {
    import graft.pipeline.TierCommit
    val d = tmp()
    val h1 = history.filter(pmod(col("doc_id"), lit(2)) === 0)
    val h2 = history.filter(pmod(col("doc_id"), lit(2)) === 1)
    val m = NearDupIndex.build(spark, h1, "nd_lsm", d)
    NearDupIndex.appendDelta(spark, h2, "nd_lsm", d)
    val answers = probeSorted(spark, "nd_lsm", d).collect().toSeq
    assert(answers == expected && answers.nonEmpty)

    // rewrite-to-sibling: one segment, identical answers
    val mc = NearDupIndex.compactTo(spark, "nd_lsm", d, "nd_lsm_c")
    assert(mc == m)
    assert(NearDupIndex.segmentIds(spark, "nd_lsm_c", d) == Seq(0L))
    assert(probeSorted(spark, "nd_lsm_c", d).collect().toSeq == answers)

    // CRASH 1: staged, commit point not reached — ALL-OLD
    NearDupIndex.stageCompactInPlace(spark, "nd_lsm", d)
    assert(!TierCommit.heal(spark, d), "no manifest yet: heal is a no-op")
    assert(NearDupIndex.segmentIds(spark, "nd_lsm", d) == Seq(0L, 1L))
    assert(probeSorted(spark, "nd_lsm", d).collect().toSeq == answers)

    // CRASH 2: manifest renamed (the commit point), no promotion ran —
    // heal rolls the swap FORWARD: ALL-NEW, one segment, same answers
    TierCommit.writeManifest(spark, d, Seq(s"$d/nd_lsm"))
    assert(TierCommit.heal(spark, d), "manifest present: heal must promote")
    assert(NearDupIndex.segmentIds(spark, "nd_lsm", d) == Seq(0L))
    assert(probeSorted(spark, "nd_lsm", d).collect().toSeq == answers)

    // the uninterrupted paths over the live index
    NearDupIndex.compactInPlace(spark, "nd_lsm", d)
    assert(probeSorted(spark, "nd_lsm", d).collect().toSeq == answers)
    NearDupIndex.rebuildInPlace(spark, history, "nd_lsm", d)
    assert(NearDupIndex.segmentIds(spark, "nd_lsm", d) == Seq(0L))
    assert(probeSorted(spark, "nd_lsm", d).collect().toSeq == answers)
  }

  test("incremental ingest law: union of probe-then-append rounds == all cross-batch pairs") {
    // the flow NearDupIndexStream's scaladoc describes, proven end to
    // end: batches arrive in order, each is probed against everything
    // indexed so far, then appended. The union of the per-round pair
    // sets must equal the CROSS-BATCH near-dup pairs of the whole
    // corpus (pairs whose sides landed in different batches) — no pair
    // found twice, none missed, regardless of the batching.
    val d = tmp()
    val m = NearDupIndex.Meta(buckets = 16)
    val batches = (0 until 4).map(i =>
      documents.filter(pmod(col("doc_id"), lit(4)) === i))

    NearDupIndex.build(spark, batches.head, "nd_flow", d)
    val found = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double)]
    batches.tail.zipWithIndex.foreach { case (b, i) =>
      found ++= NearDupIndex.probe(spark, "nd_flow", d, b).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      NearDupIndex.writeDelta(spark, b, "nd_flow", d, m, segId = i + 1L)
    }

    val want = TextOps.nearDupPairs(documents, "doc_id", "text")
      .filter(pmod(col("a_id"), lit(4)) =!= pmod(col("b_id"), lit(4)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(found.size == found.distinct.size, "no pair may be found twice")
    assert(found.toSet == want.toSet && want.nonEmpty,
      s"incremental rounds must find exactly the cross-batch pairs:\n" +
        s"${found.toSet.diff(want.toSet)} extra\n" +
        s"${want.toSet.diff(found.toSet)} missed")
  }

  test("FRESH session opens the index with only (name, dir); geometry mismatch is refused") {
    val d = tmp()
    val built = NearDupIndex.build(spark, history, "nd_fresh", d)
    val want = probeSorted(spark, "nd_fresh", d).collect().toSeq
    val fresh = spark.newSession()
    assert(NearDupIndex.readMeta(fresh, "nd_fresh", d) == built)
    val freshBatch = Tables.documents(fresh, dir)
      .select(col("doc_id"), col("text"))
      .filter(pmod(col("doc_id"), lit(10)) === 0)
    val got = NearDupIndex.probe(fresh, "nd_fresh", d, freshBatch)
      .orderBy(col("a_id"), col("b_id")).collect().toSeq
    assert(got == want && want.nonEmpty)

    // a sidecar whose banding disagrees with this reader's geometry is
    // refused loudly — probing with mismatched signatures would
    // silently miss pairs
    graft.operators.IndexMeta.write(spark, s"$d/nd_fresh/meta.json",
      Map("buckets" -> 16L, "perms" -> 32L, "bands" -> 8L,
        "band_rows" -> 4L, "format" -> NearDupIndex.FormatVersion))
    val e = intercept[Exception] {
      NearDupIndex.probe(spark, "nd_fresh", d, batch)
    }
    assert(e.getMessage.contains("banding geometry"),
      s"mismatched geometry must be refused, got: ${e.getMessage}")

    // a PRE-HASH sidecar (no format key — raw-string shingle sets,
    // VERDICT r12 #4) is refused with a rebuild message, never fed
    // string arrays into the hashed verifier
    graft.operators.IndexMeta.write(spark, s"$d/nd_fresh/meta.json",
      Map("buckets" -> 16L, "perms" -> 64L, "bands" -> 16L,
        "band_rows" -> 4L))
    val e2 = intercept[Exception] {
      NearDupIndex.probe(spark, "nd_fresh", d, batch)
    }
    assert(e2.getMessage.contains("layout format"),
      s"pre-hash layout must be refused, got: ${e2.getMessage}")
  }

  test("probe cap: all-dup batch exercises the distributed fallback — identical answers, no driver IN list") {
    val d = tmp()
    NearDupIndex.build(spark, history, "nd_cap", d)
    val collected = probeSorted(spark, "nd_cap", d).collect().toSeq
    assert(collected == expected && collected.nonEmpty)

    // drop the cap below the fixture's own collision count so the SAME
    // batch takes the distributed path — answers must be identical and
    // the shingle fetch must be a semi-join, not a pushed IN list
    val old = spark.conf.getOption("spark.graft.neardup.maxCollectedPairs")
    spark.conf.set("spark.graft.neardup.maxCollectedPairs", "1")
    try {
      val probe = probeSorted(spark, "nd_cap", d)
      assert(probe.collect().toSeq == collected,
        "fallback path must find exactly the collected path's pairs")
      assert(!probe.queryExecution.executedPlan.toString.contains("In(doc_id"),
        "fallback must not route a driver-side IN list")
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.graft.neardup.maxCollectedPairs", v)
        case None => spark.conf.unset("spark.graft.neardup.maxCollectedPairs")
      }
    }
  }

  test("deletion: probe-after-delete == fresh-build-minus-deleted; compaction drains; build clears a stale ledger") {
    val d = tmp()
    val dRef = tmp()
    NearDupIndex.build(spark, history, "nd_del", d)
    val deleted = history.filter(pmod(col("doc_id"), lit(7)) === 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(deleted.nonEmpty)
    // the ledger records only INDEXED documents (those with a shingle
    // row — a <3-token doc never indexed anything)
    val indexedDeleted = spark.read.parquet(s"$d/nd_del/shingles")
      .filter(col("doc_id").isin(deleted: _*)).count()
    // delete twice: the second call must dedupe to a no-op ledger-wise
    NearDupIndex.deleteDocs(spark, deleted, "nd_del", d)
    NearDupIndex.deleteDocs(spark, deleted.take(3), "nd_del", d)
    assert(graft.operators.Tombstones
      .count(spark, s"$d/nd_del/tombstones") == indexedDeleted,
      "re-deleting ids must not double-record them")

    NearDupIndex.build(spark,
      history.filter(pmod(col("doc_id"), lit(7)) =!= 1), "nd_ref", dRef)
    val want = probeSorted(spark, "nd_ref", dRef).collect().toSeq
    val got = probeSorted(spark, "nd_del", d).collect().toSeq
    assert(got == want && want.nonEmpty,
      s"probe after delete must equal fresh build minus deleted:\n$got\nvs\n$want")

    // compaction physically drops tombstoned rows and clears the ledger
    NearDupIndex.compactInPlace(spark, "nd_del", d)
    assert(graft.operators.Tombstones.count(spark, s"$d/nd_del/tombstones") == 0)
    assert(spark.read.parquet(s"$d/nd_del/shingles")
      .filter(col("doc_id").isin(deleted.take(20): _*)).count() == 0,
      "compaction must drop tombstoned documents physically")
    assert(probeSorted(spark, "nd_del", d).collect().toSeq == want)

    // a rebuild over the reused dir must not inherit the (now empty)
    // ledger's semantics: full history again, original answers
    NearDupIndex.deleteDocs(spark, deleted.take(5), "nd_del", d)
    NearDupIndex.rebuildInPlace(spark, history, "nd_del", d)
    assert(graft.operators.Tombstones.count(spark, s"$d/nd_del/tombstones") == 0,
      "rebuildInPlace must clear the deletion ledger (new corpus snapshot)")
    assert(probeSorted(spark, "nd_del", d).collect().toSeq == expected)
  }

  test("deletion x streaming: a redelivered batch cannot resurrect a deleted document") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val d = tmp()
    val m = NearDupIndex.Meta(buckets = 16)
    val rows = history.as[(Long, String)].collect().toSeq.sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.size / 2)
    NearDupIndexStream.processBatch(b1.toDF("doc_id", "text"),
      "nd_sdel", d, m, batchId = 0L)
    NearDupIndexStream.processBatch(b2.toDF("doc_id", "text"),
      "nd_sdel", d, m, batchId = 1L)
    val deleted = history.filter(pmod(col("doc_id"), lit(7)) === 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    NearDupIndex.deleteDocs(spark, deleted, "nd_sdel", d)
    val want = probeSorted(spark, "nd_sdel", d).collect().toSeq
    // redeliver batch 1 (its docs include deleted ids): the segment is
    // rewritten with identical content, but the tombstone ledger is
    // independent of segment rewrites — the deletion must survive
    NearDupIndexStream.processBatch(b2.toDF("doc_id", "text"),
      "nd_sdel", d, m, batchId = 1L)
    assert(probeSorted(spark, "nd_sdel", d).collect().toSeq == want,
      "a replayed segment must not resurrect tombstoned documents")
  }
}
