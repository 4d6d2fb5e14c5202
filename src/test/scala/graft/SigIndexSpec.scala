package graft

import org.apache.spark.sql.functions._

import graft.operators.{SigIndex, VectorOps}
import graft.streaming.SigStream

/** Plan + parity proof for the persisted sign-hash index (VERDICT r9
  * #2): the probe must READ the index — (vid, sig) column-pruned
  * Hamming scan, bounded top-k aggregate (no window), pushed
  * `vid IN (survivors)` point read for the exact rescore — and return
  * exactly what q202's in-plan packing returns, bit for bit.
  */
class SigIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def vectors = Tables.embeddings(spark, dir)
    .select(col("vec_id"), VectorOps.quantized(col("embedding")).as("q"))
    .withColumn("n2", VectorOps.qnorm2(col("q")))

  private def queries = vectors.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))

  /** Independent in-plan reference — q202's semantics through the
    * WINDOW formulation (deliberately NOT the probe's top-k aggregate,
    * so the two rankings check each other). */
  private def expected = {
    import org.apache.spark.sql.expressions.Window
    val e = vectors.withColumn("sig", VectorOps.signSig("q"))
    val qs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("sig").as("qsig"),
        col("q").as("qq"), col("n2").as("qn2"))
    val scored = e
      .select(col("vec_id").as("cid"), col("sig").as("csig"),
        col("q").as("cq"), col("n2").as("cn2"))
      .join(broadcast(qs), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        VectorOps.hamming(col("qsig"), col("csig")).as("hamming"),
        VectorOps.cosine(VectorOps.qdot(col("qq"), col("cq")),
          col("qn2"), col("cn2")).as("cos_sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("hamming").asc_nulls_first, col("cid").asc_nulls_first)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("cid"), col("hamming"), col("cos_sim"))
      .orderBy(col("qid"), col("cid"))
  }

  private def probeSorted(s: org.apache.spark.sql.SparkSession,
                          name: String, d: String) =
    SigIndex.probe(s, name, d, queries, topk = 3)
      .orderBy(col("qid"), col("cid"))

  test("probe plan reads the index: pruned Hamming scan, pushed rescore, no window") {
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    SigIndex.build(spark, vectors, "sig_spec", d)

    def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    def sigScans(p: org.apache.spark.sql.execution.SparkPlan) =
      unwrap(p).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("sigs")) => f
      }
    def readCols(f: org.apache.spark.sql.execution.FileSourceScanExec) =
      f.metadata.get("ReadSchema").toSeq
        .flatMap(_.stripPrefix("struct<").stripSuffix(">").split(",(?![^<]*>)"))
        .map(_.split(":")(0).trim).toSet

    // 1. the RANKING half (the corpus-wide pass the index exists to
    //    make cheap — run exactly ONCE per probe, as the eager
    //    shortlist job): reads ONLY (vid, sig) — 8 + 8·⌈d/64⌉ bytes/vector; the
    //    raw vector bytes never enter the Hamming scan (`seg` rides as
    //    a hive partition column) — and ranks through the bounded
    //    aggregate, never a row_number window
    val rankPlan = SigIndex.rank(spark,
      spark.read.parquet(s"$d/sig_spec/sigs"), queries, 3, nbits = 64)
      .queryExecution.executedPlan
    val rankScans = sigScans(rankPlan)
    assert(rankScans.size == 1 && readCols(rankScans.head) == Set("vid", "sig"),
      s"Hamming scan must column-prune to (vid, sig):\n$rankPlan")
    assert(rankPlan.toString.contains("top_k_pairs_long"),
      s"ranking must use the bounded top-k aggregate:\n$rankPlan")
    assert(!rankPlan.toString.contains("Window"),
      s"ranking must not plan a Window:\n$rankPlan")

    // 2. the RESCORE half (what probe() returns — the shortlist
    //    re-entered as a LocalRelation): exactly ONE sigs scan, the
    //    pushed In(vid, ...) point read of the topk survivors — the
    //    Hamming subtree must NOT reappear here (it already ran; a
    //    first cut of this probe re-planned it and paid the corpus
    //    pass twice), and no Window anywhere
    val probe = SigIndex.probe(spark, "sig_spec", d, queries, topk = 3)
    val plan = probe.queryExecution.executedPlan
    val scans = sigScans(plan)
    assert(scans.size == 1,
      s"rescore must be the ONLY sigs scan (Hamming pass ran once, eagerly):\n$plan")
    assert(readCols(scans.head).contains("q"), s"no rescore scan:\n$plan")
    assert(scans.head.metadata.get("PushedFilters").exists(_.contains("In(vid")),
      s"survivor fetch must push In(vid, ...) into parquet:\n$plan")
    assert(!plan.toString.contains("Window"),
      s"probe must not plan a Window:\n$plan")

    // 3. and the probe answers are q202's in-plan answers, bit for bit
    val got = probeSorted(spark, "sig_spec", d).collect().toSeq
    val want = expected.collect().toSeq
    assert(got == want && want.nonEmpty)
  }

  test("delta append: probe(base + delta) == probe(fresh full build)") {
    val dSeg = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val dFull = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val half1 = vectors.filter(pmod(col("vec_id"), lit(2)) === 0)
    val half2 = vectors.filter(pmod(col("vec_id"), lit(2)) === 1)
    SigIndex.build(spark, half1, "sig_seg", dSeg)
    SigIndex.appendDelta(spark, half2, "sig_seg", dSeg)
    assert(SigIndex.segmentIds(spark, "sig_seg", dSeg) == Seq(0L, 1L))
    SigIndex.build(spark, vectors, "sig_full", dFull)
    val got = probeSorted(spark, "sig_seg", dSeg).collect().toSeq
    val want = probeSorted(spark, "sig_full", dFull).collect().toSeq
    // packing is a per-row pure function — segment structure is
    // unobservable in answers (and both equal the in-plan reference)
    assert(got == want && want.nonEmpty)
    assert(got == expected.collect().toSeq)
  }

  test("streaming ingestion: SigStream == batch build; replay no-op") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val dRef = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val m = SigIndex.Meta(nbits = 64)
    val rows = Tables.embeddings(spark, dir)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    // an ARBITRARY split — batch boundaries must be unobservable
    val (b1, rest) = rows.splitAt(rows.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val q = SigStream.start(input.toDF().toDF("vec_id", "embedding"),
      "sig_stream", d, m, s"$d/_ckpt")
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
    } finally q.stop()
    assert(SigIndex.segmentIds(spark, "sig_stream", d).size == 3)
    assert(SigIndex.readMeta(spark, "sig_stream", d) == m,
      "a stream-built index must be self-describing (sidecar from delta 0)")

    SigIndex.build(spark, vectors, "sig_sref", dRef)
    val want = probeSorted(spark, "sig_sref", dRef).collect().toSeq
    val got = probeSorted(spark, "sig_stream", d).collect().toSeq
    assert(got == want && want.nonEmpty)

    // exact redelivery of an already-committed batch: its segment is
    // rewritten with identical content — answers unchanged
    SigStream.processBatch(b2.toDF("vec_id", "embedding"),
      "sig_stream", d, m, batchId = 1L)
    assert(probeSorted(spark, "sig_stream", d).collect().toSeq == want)
  }

  test("rewrite compaction: one segment afterwards, identical answers") {
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val half1 = vectors.filter(pmod(col("vec_id"), lit(2)) === 0)
    val half2 = vectors.filter(pmod(col("vec_id"), lit(2)) === 1)
    val m = SigIndex.build(spark, half1, "sig_lsm", d)
    SigIndex.appendDelta(spark, half2, "sig_lsm", d)
    assert(SigIndex.segmentIds(spark, "sig_lsm", d) == Seq(0L, 1L))
    val before = probeSorted(spark, "sig_lsm", d).collect().toSeq
    val mc = SigIndex.compactTo(spark, "sig_lsm", d, "sig_lsm_c")
    assert(mc == m, "compaction must carry the geometry over")
    assert(SigIndex.segmentIds(spark, "sig_lsm_c", d) == Seq(0L))
    val after = probeSorted(spark, "sig_lsm_c", d).collect().toSeq
    assert(after == before && before.nonEmpty)
    // and both equal a fresh full build (pure concatenation — no
    // cross-segment statistics to re-derive)
    val dRef = java.nio.file.Files.createTempDirectory("graft-sig").toString
    SigIndex.build(spark, vectors, "sig_lsm_ref", dRef)
    assert(after == probeSorted(spark, "sig_lsm_ref", dRef).collect().toSeq)
  }

  test("LSM lifecycle with streaming: stream → stop → compact → resume → probe == fresh build") {
    // the streaming order contract (SigIndex.compactInPlace): compact
    // only at a committed stream boundary; afterwards the stream keeps
    // appending NEW batchId segments on top of the compacted seg=0 —
    // the redelivery window the contract forecloses is a batch that
    // was never checkpoint-committed, which a clean stop cannot leave
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val dRef = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val m = SigIndex.Meta(nbits = 64)
    val rows = Tables.embeddings(spark, dir)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    val (pre, post) = rows.splitAt(rows.size / 2)
    val (b1, b2) = pre.splitAt(pre.size / 2)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val q1 = SigStream.start(input.toDF().toDF("vec_id", "embedding"),
      "sig_lsm_s", d, m, s"$d/_ckpt")
    try {
      input.addData(b1); q1.processAllAvailable()
      input.addData(b2); q1.processAllAvailable()
    } finally q1.stop() // clean stop: every delivered batch committed
    assert(SigIndex.segmentIds(spark, "sig_lsm_s", d).size == 2)

    // compact at the committed boundary: segments fold to one
    SigIndex.compactInPlace(spark, "sig_lsm_s", d)
    assert(SigIndex.segmentIds(spark, "sig_lsm_s", d) == Seq(0L))

    // resume: the SAME checkpoint continues with later batchIds —
    // none collide with the compacted seg=0's content
    val q2 = SigStream.start(input.toDF().toDF("vec_id", "embedding"),
      "sig_lsm_s", d, m, s"$d/_ckpt")
    try {
      input.addData(post); q2.processAllAvailable()
    } finally q2.stop()
    assert(SigIndex.segmentIds(spark, "sig_lsm_s", d).size == 2,
      "resumed stream must append a NEW segment beside the compacted one")

    SigIndex.build(spark, vectors, "sig_lsm_ref", dRef)
    val got = probeSorted(spark, "sig_lsm_s", d).collect().toSeq
    val want = probeSorted(spark, "sig_lsm_ref", dRef).collect().toSeq
    assert(got == want && want.nonEmpty)
  }

  test("atomic in-place compaction: probes see all-old or all-new across a crash") {
    import graft.pipeline.TierCommit
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val half1 = vectors.filter(pmod(col("vec_id"), lit(2)) === 0)
    val half2 = vectors.filter(pmod(col("vec_id"), lit(2)) === 1)
    SigIndex.build(spark, half1, "sig_clive", d)
    SigIndex.appendDelta(spark, half2, "sig_clive", d)
    assert(SigIndex.segmentIds(spark, "sig_clive", d) == Seq(0L, 1L))
    val answers = probeSorted(spark, "sig_clive", d).collect().toSeq

    // CRASH 1: compaction staged, commit point not reached — a healing
    // reader sees the index untouched: ALL-OLD, both segments
    SigIndex.stageCompactInPlace(spark, "sig_clive", d)
    assert(!TierCommit.heal(spark, d), "no manifest yet: heal is a no-op")
    assert(SigIndex.segmentIds(spark, "sig_clive", d) == Seq(0L, 1L))
    assert(probeSorted(spark, "sig_clive", d).collect().toSeq == answers)

    // CRASH 2: manifest renamed (the commit point), no promotion ran —
    // heal rolls the swap FORWARD: ALL-NEW, one segment, identical
    // answers (compaction is answer-invariant)
    TierCommit.writeManifest(spark, d, Seq(s"$d/sig_clive"))
    assert(TierCommit.heal(spark, d), "manifest present: heal must promote")
    assert(SigIndex.segmentIds(spark, "sig_clive", d) == Seq(0L),
      "healed index must be the compacted one-segment layout")
    assert(probeSorted(spark, "sig_clive", d).collect().toSeq == answers,
      "compaction is answer-invariant across the crash-healed swap")

    // and the uninterrupted path over the live index: same answers
    SigIndex.compactInPlace(spark, "sig_clive", d)
    assert(SigIndex.segmentIds(spark, "sig_clive", d) == Seq(0L))
    assert(probeSorted(spark, "sig_clive", d).collect().toSeq == answers)
  }

  test("atomic in-place rebuild: probes see all-old or all-new across a crash") {
    import graft.pipeline.TierCommit
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val half1 = vectors.filter(pmod(col("vec_id"), lit(2)) === 0)
    SigIndex.build(spark, half1, "sig_reb", d)
    val oldAns = probeSorted(spark, "sig_reb", d).collect().toSeq

    // CRASH 1: rebuild staged, commit point not reached — a healing
    // reader sees ALL-OLD: the half-corpus index, byte for byte
    SigIndex.stageRebuildInPlace(spark, vectors, "sig_reb", d, nbits = 64)
    assert(!TierCommit.heal(spark, d), "no manifest yet: heal is a no-op")
    assert(SigIndex.segmentIds(spark, "sig_reb", d) == Seq(0L))
    assert(probeSorted(spark, "sig_reb", d).collect().toSeq == oldAns)

    // CRASH 2: manifest renamed (the commit point), no promotion ran —
    // heal rolls sigs + sidecar forward TOGETHER: ALL-NEW, identical
    // to a fresh full build (packing is deterministic)
    TierCommit.writeManifest(spark, d, Seq(s"$d/sig_reb"))
    assert(TierCommit.heal(spark, d), "manifest present: heal must promote")
    val got = probeSorted(spark, "sig_reb", d).collect().toSeq
    assert(got == expected.collect().toSeq)
    assert(got != oldAns, "full-corpus rebuild must change the answers here")

    // and the uninterrupted path over the live index: same answers
    SigIndex.rebuildInPlace(spark, vectors, "sig_reb", d)
    assert(probeSorted(spark, "sig_reb", d).collect().toSeq == got)
  }

  test("FRESH session opens the index with only (name, dir) via the meta sidecar") {
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val built = SigIndex.build(spark, vectors, "sig_fresh", d)
    val want = probeSorted(spark, "sig_fresh", d).collect().toSeq
    val fresh = spark.newSession()
    assert(SigIndex.readMeta(fresh, "sig_fresh", d) == built)
    val freshQueries = Tables.embeddings(fresh, dir)
      .select(col("vec_id"), VectorOps.quantized(col("embedding")).as("q"))
      .withColumn("n2", VectorOps.qnorm2(col("q")))
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
    val got = SigIndex.probe(fresh, "sig_fresh", d, freshQueries, topk = 3)
      .orderBy(col("qid"), col("cid")).collect().toSeq
    assert(got == want && want.nonEmpty)
  }

  test("multi-word signatures: dim > 64 packs ⌈d/64⌉ words, Hamming == per-element sign disagreement") {
    // VERDICT r10 #2: the old signSig raised on dim > 64 (shiftleft's
    // 6-bit masking would alias bits); the multi-word generalization
    // must instead pack word w from elements [64w, 64w+63] — proven
    // here against a signature-free per-element reference on a WIDENED
    // dim-96 fixture (two words, partial tail word)
    val wide = vectors.filter(col("vec_id") < 50)
      .select(col("vec_id"),
        concat(col("q"), slice(reverse(col("q")), 1, 32)).as("q"))
      .withColumn("n2", VectorOps.qnorm2(col("q")))
      .withColumn("sig", VectorOps.signSig("q"))
      .localCheckpoint(true)
    assert(wide.select(size(col("sig"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(2),
      "dim 96 must pack into exactly 2 signature words")
    val a = wide.select(col("vec_id").as("aid"), col("q").as("aq"),
      col("sig").as("asig"))
    val b = wide.select(col("vec_id").as("bid"), col("q").as("bq"),
      col("sig").as("bsig"))
    val mismatches = a.join(b, col("aid") < col("bid"))
      .select(
        VectorOps.hamming(col("asig"), col("bsig")).as("got"),
        expr("""CAST(size(filter(zip_with(aq, bq,
                  (x, y) -> (x > 0L) != (y > 0L)), m -> m)) AS BIGINT)""")
          .as("want"))
      .filter(col("got") =!= col("want"))
    assert(mismatches.count() == 0,
      "multi-word Hamming must equal the per-element sign-disagreement count")

    // and dim <= 64 packs ONE word whose bits are the old scalar fold
    assert(vectors.select(size(VectorOps.signSig("q"))).distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(1))

    // the persisted index serves the widened fixture end to end
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    SigIndex.build(spark, wide.select(col("vec_id"), col("q"), col("n2")),
      "sig_wide", d, nbits = 96)
    val wq = wide.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
    val got = SigIndex.probe(spark, "sig_wide", d, wq, topk = 3)
    assert(got.count() > 0 && SigIndex.readMeta(spark, "sig_wide", d).nbits == 96)
  }

  test("passenger columns: pre-filtered probe, pushed into the scan, surviving append + compaction") {
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    // passenger: parity class of the vec_id (a stand-in for any
    // metadata a filterable index denormalizes into its rows)
    val tagged = vectors.withColumn("tag",
      when(pmod(col("vec_id"), lit(2)) === 0, "even").otherwise("odd"))
    val h1 = tagged.filter(col("vec_id") < 250)
    val h2 = tagged.filter(col("vec_id") >= 250)
    SigIndex.build(spark, h1, "sig_pass", d)
    SigIndex.appendDelta(spark, h2, "sig_pass", d)

    // a delta DROPPING the passenger is refused (it would break the
    // unified segment read for every later probe)
    assert(intercept[Exception] {
      SigIndex.appendDelta(spark,
        vectors.select(col("vec_id") + 100000L as "vec_id", col("q"), col("n2")),
        "sig_pass", d)
    }.getMessage.contains("passenger columns"))

    val filtered = SigIndex.probeWhere(spark, "sig_pass", d, queries,
      topk = 3, col("tag") === "even")
    // brute-force filtered reference: exact Hamming rank among EVEN
    // candidates only, then rescore — full recall within the filter
    val cand = tagged.filter(pmod(col("vec_id"), lit(2)) === 0)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2"),
        VectorOps.signSig("q").as("csig"))
    val qs = queries.withColumn("qsig", VectorOps.signSig("qq"))
    val want = cand.join(broadcast(qs), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        VectorOps.hamming(col("qsig"), col("csig")).as("hamming"),
        VectorOps.cosine(VectorOps.qdot(col("qq"), col("cq")),
          col("qn2"), col("cn2")).as("cos_sim"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("hamming").asc, col("cid").asc)))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(col("qid"), col("cid")).collect().toSeq
    val got = filtered.orderBy(col("qid"), col("cid")).collect().toSeq
    assert(got == want && want.nonEmpty,
      "pre-filtered probe must equal the brute-force filtered ranking")
    // and every survivor satisfies the predicate (no post-filter leak)
    assert(got.forall(r => r.getLong(1) % 2 == 0))

    // the predicate is PUSHED into the parquet scan (the pre-filter's
    // whole point: the Hamming pass never reads non-matching rows'
    // signature bytes beyond footer pruning)
    val sigs = spark.read.parquet(s"$d/sig_pass/sigs")
      .filter(col("tag") === "even")
    val rankPlan = SigIndex.rank(spark, sigs, queries, 3, nbits = 64)
      .queryExecution.executedPlan.toString
    assert(rankPlan.contains("EqualTo(tag,even)"),
      s"passenger predicate must push into the scan:\n$rankPlan")

    // compaction preserves passengers and answers
    SigIndex.compactInPlace(spark, "sig_pass", d)
    assert(SigIndex.segmentIds(spark, "sig_pass", d) == Seq(0L))
    val after = SigIndex.probeWhere(spark, "sig_pass", d, queries,
      topk = 3, col("tag") === "even")
      .orderBy(col("qid"), col("cid")).collect().toSeq
    assert(after == want)
  }

  test("dimension guards: mismatched vectors raise loudly at build and probe (ADVICE r11)") {
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    // build: declared nbits disagrees with the vectors' actual length
    val eBuild = intercept[Exception] {
      SigIndex.build(spark, vectors, "sig_guard_b", d, nbits = 96)
    }
    assert(exceptionChain(eBuild).exists(_.contains("!= index nbits 96")),
      s"build must raise the dimension error, got: $eBuild")

    // probe: a query vector narrower than the index's nbits must raise,
    // not silently rank on a truncated common-prefix Hamming
    SigIndex.build(spark, vectors, "sig_guard", d) // nbits = 64, correct
    val narrowQ = vectors.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        slice(col("q"), 1, 32).as("qq"), col("n2").as("qn2"))
    val eProbe = intercept[Exception] {
      SigIndex.probe(spark, "sig_guard", d, narrowQ, topk = 3).collect()
    }
    assert(exceptionChain(eProbe).exists(_.contains("!= index nbits 64")),
      s"probe must raise the dimension error, got: $eProbe")

    // appendDelta inherits the check from the persisted meta
    val eApp = intercept[Exception] {
      SigIndex.appendDelta(spark,
        vectors.select(col("vec_id") + 100000L as "vec_id",
          slice(col("q"), 1, 16).as("q"), col("n2")),
        "sig_guard", d)
    }
    assert(exceptionChain(eApp).exists(_.contains("!= index nbits 64")),
      s"appendDelta must raise the dimension error, got: $eApp")
    // and the loser's lock + segment left no trace
    assert(SigIndex.segmentIds(spark, "sig_guard", d) == Seq(0L))
    SigIndex.appendDelta(spark,
      vectors.select(col("vec_id") + 100000L as "vec_id", col("q"), col("n2")),
      "sig_guard", d) // correct width proceeds (lock was released)
  }

  test("format version: a pre-multiword sidecar is refused with an explicit message (ADVICE r11)") {
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    SigIndex.build(spark, vectors, "sig_fmt", d)
    // model a format-1 index: sidecar without the format key (what the
    // scalar-BIGINT layout wrote before round 11's multi-word change)
    graft.operators.IndexMeta.write(spark, s"$d/sig_fmt/meta.json",
      Map("nbits" -> 64L))
    val e = intercept[Exception] {
      SigIndex.probe(spark, "sig_fmt", d,
        vectors.filter(col("vec_id") < 5).select(col("vec_id").as("qid"),
          col("q").as("qq"), col("n2").as("qn2")), topk = 3)
    }
    assert(e.getMessage.contains("format 1") &&
      e.getMessage.contains("rebuildInPlace"),
      s"old layout must be refused explicitly, got: ${e.getMessage}")
    // appendDelta against it is refused too (it would write a
    // mixed-schema segment); rebuildInPlace is the upgrade path
    assert(intercept[Exception] {
      SigIndex.appendDelta(spark, vectors, "sig_fmt", d)
    }.getMessage.contains("format 1"))
    SigIndex.rebuildInPlace(spark, vectors, "sig_fmt", d)
    assert(SigIndex.probe(spark, "sig_fmt", d,
      vectors.filter(col("vec_id") < 5).select(col("vec_id").as("qid"),
        col("q").as("qq"), col("n2").as("qn2")), topk = 3).count() > 0)
  }

  test("deletion: probe-after-delete == fresh-build-minus-deleted; compaction drains the ledger") {
    import graft.operators.Tombstones
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val dRef = java.nio.file.Files.createTempDirectory("graft-sig").toString
    SigIndex.build(spark, vectors, "sig_del", d)
    val deleted = vectors.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(deleted.nonEmpty)
    SigIndex.deleteVectors(spark, deleted, "sig_del", d)
    SigIndex.deleteVectors(spark, deleted.take(4), "sig_del", d) // dedupe
    assert(Tombstones.count(spark, s"$d/sig_del/tombstones") == deleted.size)

    SigIndex.build(spark,
      vectors.filter(pmod(col("vec_id"), lit(7)) =!= 3), "sig_ref", dRef)
    val want = probeSorted(spark, "sig_ref", dRef).collect().toSeq
    val got = probeSorted(spark, "sig_del", d).collect().toSeq
    assert(got == want && want.nonEmpty,
      s"probe after delete must equal fresh build minus deleted:\n$got\nvs\n$want")

    // compaction physically drops tombstoned rows and clears the ledger
    SigIndex.compactInPlace(spark, "sig_del", d)
    assert(Tombstones.count(spark, s"$d/sig_del/tombstones") == 0)
    assert(spark.read.parquet(s"$d/sig_del/sigs")
      .filter(col("vid").isin(deleted.take(20): _*)).count() == 0,
      "compaction must drop tombstoned vectors physically")
    assert(probeSorted(spark, "sig_del", d).collect().toSeq == want)

    // rebuild = new corpus snapshot: ledger cleared, full answers back
    SigIndex.deleteVectors(spark, deleted.take(5), "sig_del", d)
    SigIndex.rebuildInPlace(spark, vectors, "sig_del", d)
    assert(Tombstones.count(spark, s"$d/sig_del/tombstones") == 0,
      "rebuildInPlace must clear the deletion ledger")
    assert(probeSorted(spark, "sig_del", d).collect().toSeq ==
      expected.collect().toSeq)
  }

  test("typed passenger contract: a same-named delta column with a different type is refused (ADVICE r12)") {
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    SigIndex.build(spark,
      vectors.withColumn("src", concat(lit("s"),
        pmod(col("vec_id"), lit(4)).cast("string"))), "sig_typed", d)
    // same column NAME, different TYPE (int vs string): a name-only
    // check would accept this and write a mixed-type segment
    val e = intercept[Exception] {
      SigIndex.appendDelta(spark,
        vectors.select(col("vec_id") + 100000L as "vec_id", col("q"),
          col("n2"), pmod(col("vec_id"), lit(4)).cast("int").as("src")),
        "sig_typed", d)
    }
    assert(e.getMessage.contains("passenger columns"),
      s"typed mismatch must be refused, got: ${e.getMessage}")
    assert(SigIndex.segmentIds(spark, "sig_typed", d) == Seq(0L),
      "the refused delta must leave no segment behind")
  }

  /** Every message down the cause chain (Spark wraps a raise_error from
    * an executor in SparkException layers). */
  private def exceptionChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
}
