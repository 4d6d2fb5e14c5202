package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfPqIndex, VectorOps}

/** Plan + parity proof for the persisted IVF-PQ index: the probe must
  * READ the compressed index — statically bucket-pruned codes scan,
  * no coarse-quantizer argmax, no PQ encode (min_by), no training
  * aggregate — and serve exactly what q115's in-plan-trained IVFADC
  * pipeline serves, down to every ADC integer.
  */
class IvfPqIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val (m, subDim, ksub, iters) = (4, 16, 16, 2)

  private def vectors = Tables.embeddings(spark, dir)
    .select(col("vec_id"), VectorOps.quantized(col("embedding")).as("q"))
    .withColumn("n2", VectorOps.qnorm2(col("q")))

  private def queries = vectors.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))

  private def corpus = vectors
    .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2"))

  test("probe plan reads the index: bucket-pruned codes scan, no training") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val meta = IvfPqIndex.build(spark, vectors, "ivfpq_spec", idxDir,
      m, subDim, ksub, iters)
    try {
      val probe = IvfPqIndex.probe(spark, "ivfpq_spec", idxDir, queries,
        corpus, cand = 20, topk = 5)
      val plan = probe.queryExecution.executedPlan.toString

      // 1. the codes scan is statically bucket-pruned
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"codes scan not bucket-pruned:\n$plan")
      val (got, total) = (sel.get.group(1).toInt, sel.get.group(2).toInt)
      assert(total == meta.buckets && got <= total,
        s"bucket pruning shape off: $got/$total")

      // 2. no training/encode subtree anywhere in the probe plan:
      //    coarse-quantizer assignment (cell_argmax), PQ encode
      //    (min_by), and the Lloyd-update exact sums must all be absent
      val lower = plan.toLowerCase
      assert(!lower.contains("argmax"),
        s"probe plan contains the coarse-assignment argmax:\n$plan")
      assert(!lower.contains("min_by"),
        s"probe plan contains the PQ-encode min_by:\n$plan")

      // 2b. shortlist AND final top-k are the BOUNDED aggregates,
      //     never row_number windows over the ADC candidate set
      //     (VERDICT r9 #3; the routing window runs in the collected
      //     routing job, not in this plan)
      assert(plan.contains("top_k_pairs_long")
          && plan.contains("top_k_pairs_double"),
        s"probe must rank through the bounded top-k aggregates:\n$plan")
      assert(!plan.contains("Window"),
        s"probe plan must not contain a Window:\n$plan")

      // 3. nonempty, shaped as promised
      val rows = probe.collect()
      assert(rows.nonEmpty)
      assert(probe.columns.toSeq ==
        Seq("qid", "cid", "adc_dot", "cos_sim"))
    } finally spark.sql("DROP TABLE IF EXISTS ivfpq_spec_codes")
  }

  test("probe of the persisted index == q115's in-plan IVFADC, bit for bit") {
    // The registry pair IS the contract: q197 builds+probes the
    // persisted index, q115 trains in-plan; identical math, identical
    // rows. (This is also why q197 reuses q115's DuckDB oracle
    // verbatim.)
    val reg = VectorQueries.all.toMap
    val got = reg("q197_ivfpq_probe").fn(spark, dir)
      .orderBy(col("qid"), col("cid")).collect().toSeq
    val want = reg("q115_ivfpq").fn(spark, dir)
      .orderBy(col("qid"), col("cid")).collect().toSeq
    assert(got == want && want.nonEmpty)
  }

  test("frozen append: probe(base + delta) == full build under same centroids+codebooks") {
    val dA = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val dB = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val half1 = vectors.filter(pmod(col("vec_id"), lit(2)) === 0)
    val half2 = vectors.filter(pmod(col("vec_id"), lit(2)) === 1)
    val mA = IvfPqIndex.build(spark, half1, "ivfpq_app", dA,
      m, subDim, ksub, iters)
    IvfPqIndex.append(spark, half2, "ivfpq_app", dA)
    try {
      val got = IvfPqIndex.probe(spark, "ivfpq_app", dA, queries, corpus,
        cand = 20, topk = 5)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      // expected: the SAME frozen centroids + codebooks assigning and
      // encoding the FULL corpus — what a build would have written had
      // it seen every vector under them
      val cents = spark.read.parquet(s"$dA/ivfpq_app_centroids")
      val books = spark.read.parquet(s"$dA/ivfpq_app_codebooks")
      cents.write.parquet(s"$dB/ivfpq_ref_centroids")
      books.write.parquet(s"$dB/ivfpq_ref_codebooks")
      val ca = graft.operators.VectorOps.centroidArrays(cents, "cell", "cq")
      val assigned = vectors.crossJoin(broadcast(ca))
        .select(col("vec_id").as("vid"),
          graft.operators.VectorOps.cellArgMax(col("q"), col("n2"),
            col("cells"), col("cqs"), col("cn2s")).cast("int").as("cell"))
      val sub = graft.operators.Pq.subvectors(vectors, "vec_id", "q", m, subDim)
      val codes = graft.operators.Pq.assignCodes(sub, "vec_id", books)
      val postings = assigned
        .join(codes.withColumnRenamed("vec_id", "vid"), Seq("vid"))
        .select(col("cell"), col("vid"), col("s"), col("code"))
      graft.operators.Layout.writeBucketed(postings, "ivfpq_ref_codes",
        "cell", mA.buckets, s"$dB/ivfpq_ref_codes")
      IvfPqIndex.writeMeta(spark, "ivfpq_ref", dB, mA) // hand-built: sidecar too
      val want = IvfPqIndex.probe(spark, "ivfpq_ref", dB, queries, corpus,
        cand = 20, topk = 5)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      assert(got == want && want.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfpq_app_codes")
      spark.sql("DROP TABLE IF EXISTS ivfpq_ref_codes")
    }
  }

  test("FRESH session opens the index with only (name, dir): meta sidecar + catalog re-registration") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val mBuilt = IvfPqIndex.build(spark, vectors, "ivfpq_fresh", idxDir,
      m, subDim, ksub, iters)
    try {
      val want = IvfPqIndex.probe(spark, "ivfpq_fresh", idxDir, queries,
        corpus, cand = 20, topk = 5)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      spark.sql("DROP TABLE ivfpq_fresh_codes")
      val fresh = spark.newSession()
      assert(!fresh.catalog.tableExists("ivfpq_fresh_codes"))
      assert(IvfPqIndex.readMeta(fresh, "ivfpq_fresh", idxDir) == mBuilt,
        "full geometry (incl. PQ m/subDim/ksub) must round-trip the sidecar")
      val fv = Tables.embeddings(fresh, dir)
        .select(col("vec_id"), VectorOps.quantized(col("embedding")).as("q"))
        .withColumn("n2", VectorOps.qnorm2(col("q")))
      val fq = fv.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
      val fc = fv.select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
      val probe = IvfPqIndex.probe(fresh, "ivfpq_fresh", idxDir, fq, fc,
        cand = 20, topk = 5)
      val plan = probe.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"fresh-session codes scan not bucket-pruned:\n$plan")
      assert(sel.get.group(2).toInt == mBuilt.buckets)
      val got = probe.orderBy(col("qid"), col("cid")).collect().toSeq
      assert(got == want && want.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS ivfpq_fresh_codes")
  }

  test("atomic in-place rebuild: all four artifacts promote together across a crash") {
    import graft.pipeline.TierCommit
    val d = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val dRef = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val half1 = vectors.filter(pmod(col("vec_id"), lit(2)) === 0)
    IvfPqIndex.build(spark, half1, "ivfpq_reb", d, m, subDim, ksub, iters)
    try {
      val oldAns = IvfPqIndex.probe(spark, "ivfpq_reb", d, queries, corpus,
        cand = 20, topk = 5).orderBy(col("qid"), col("cid")).collect().toSeq

      // staged retrain invisible before the commit point: ALL-OLD
      IvfPqIndex.stageRebuildInPlace(spark, vectors, "ivfpq_reb", d,
        m, subDim, ksub, iters, buckets = 8)
      assert(!TierCommit.heal(spark, d))
      assert(IvfPqIndex.probe(spark, "ivfpq_reb", d, queries, corpus, 20, 5)
        .orderBy(col("qid"), col("cid")).collect().toSeq == oldAns)

      // after the manifest rename, heal promotes centroids + codebooks
      // + codes + meta TOGETHER — never new codebooks over old codes
      TierCommit.writeManifest(spark, d,
        IvfPqIndex.rebuildTargets("ivfpq_reb", d))
      assert(TierCommit.heal(spark, d))
      spark.catalog.refreshTable("ivfpq_reb_codes")
      val got = IvfPqIndex.probe(spark, "ivfpq_reb", d, queries, corpus,
        20, 5).orderBy(col("qid"), col("cid")).collect().toSeq
      IvfPqIndex.build(spark, vectors, "ivfpq_rebref", dRef,
        m, subDim, ksub, iters)
      val want = IvfPqIndex.probe(spark, "ivfpq_rebref", dRef, queries,
        corpus, 20, 5).orderBy(col("qid"), col("cid")).collect().toSeq
      assert(got == want && want.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfpq_reb_codes")
      spark.sql("DROP TABLE IF EXISTS ivfpq_rebref_codes")
    }
  }

  test("build is deterministic: two builds serve identical probe answers") {
    val d1 = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val m1 = IvfPqIndex.build(spark, vectors, "ivfpq_det1", d1,
      m, subDim, ksub, iters)
    val m2 = IvfPqIndex.build(spark, vectors, "ivfpq_det2", d2,
      m, subDim, ksub, iters)
    try {
      assert(m1 == m2)
      val a = IvfPqIndex.probe(spark, "ivfpq_det1", d1, queries, corpus,
        cand = 20, topk = 5)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      val b = IvfPqIndex.probe(spark, "ivfpq_det2", d2, queries, corpus,
        cand = 20, topk = 5)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      assert(a == b && a.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfpq_det1_codes")
      spark.sql("DROP TABLE IF EXISTS ivfpq_det2_codes")
    }
  }

  test("deletion: suppressed candidates never surface; vacuum is invisible and clears the ledger") {
    import graft.operators.Tombstones
    val d = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    IvfPqIndex.build(spark, vectors, "ivfpq_del", d, m, subDim, ksub, iters)
    try {
      val deleted = vectors.filter(pmod(col("vec_id"), lit(7)) === 3)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
      assert(deleted.nonEmpty)
      IvfPqIndex.deleteVectors(spark, deleted, "ivfpq_del", d)
      def probed = IvfPqIndex.probe(spark, "ivfpq_del", d, queries, corpus,
          cand = 20, topk = 5)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      val after = probed
      assert(after.nonEmpty &&
        !after.map(_.getLong(1)).exists(deleted.toSet),
        "a deleted vector must never surface in any shortlist")

      // vacuum: physical drop of the code rows, identical answers,
      // ledger cleared — the logical-suppression == physical-drop
      // identity that makes tombstones safe to defer
      IvfPqIndex.vacuumInPlace(spark, "ivfpq_del", d)
      assert(Tombstones.count(spark, s"$d/ivfpq_del_tombstones") == 0)
      assert(spark.read.parquet(s"$d/ivfpq_del_codes")
        .filter(col("vid").isin(deleted.take(20): _*)).count() == 0,
        "vacuum must drop tombstoned vectors' code rows physically")
      assert(probed == after, "vacuum must not change any answer")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfpq_del_codes")
    }
  }
}
