package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, VectorOps}

/** Plan + parity proof for the persisted IVF index (VERDICT r7 #4):
  * the probe must READ the index — no k-means subtree, statically
  * bucket-pruned cell scan — and return exactly what the in-plan-
  * trained pipeline (q40's shape) returns.
  */
class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def vectors = Tables.embeddings(spark, dir)
    .select(col("vec_id"), VectorOps.quantized(col("embedding")).as("q"))
    .withColumn("n2", VectorOps.qnorm2(col("q")))

  test("probe plan reads the index: bucket-pruned scan, no training subtree") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val meta = IvfIndex.build(spark, vectors, "ivf_spec", idxDir)
    try {
      val queries = vectors.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
      val probe = IvfIndex.probe(spark, "ivf_spec", idxDir, queries,
        topk = 3)
      val plan = probe.queryExecution.executedPlan.toString

      // 1. the cell scan is statically bucket-pruned: fewer buckets
      //    selected than written (nprobe cells << k cells at this sf)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"cell scan not bucket-pruned:\n$plan")
      val (got, total) = (sel.get.group(1).toInt, sel.get.group(2).toInt)
      assert(total == meta.buckets && got <= total,
        s"bucket pruning shape off: $got/$total")

      // 2. no training subtree: the assignment/training expression
      //    (cell_argmax_cosine) and the k-means update aggregates must
      //    not appear anywhere in the probe plan
      assert(!plan.toLowerCase.contains("argmax"),
        s"probe plan contains the training-side argmax:\n$plan")

      // 2b. the final top-k is the BOUNDED aggregate, never a
      //     row_number window over the probed candidates (VERDICT r9
      //     #3; the routing window runs in the collected routing job,
      //     not in this plan)
      assert(plan.contains("top_k_pairs"),
        s"probe must rank through the bounded top-k aggregate:\n$plan")
      assert(!plan.contains("Window"),
        s"probe plan must not contain a Window:\n$plan")

      // 3. and the probe answers are the in-plan-trained pipeline's
      //    answers, bit for bit (same math as q40: rank cells, read
      //    probed cells, exact rescore, top-3)
      import org.apache.spark.sql.expressions.Window
      val cents = spark.read.parquet(s"$idxDir/ivf_spec_centroids")
      val sim = queries.crossJoin(broadcast(cents))
        .select(col("qid"), col("cell"),
          VectorOps.cosine(VectorOps.qdot(col("qq"), col("cq")),
            col("qn2"), col("cn2")).as("cos_sim"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc_nulls_last, col("cell").asc_nulls_first)
      val probes = sim.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= meta.nprobe).select(col("qid"), col("cell"))
      val ca = VectorOps.centroidArrays(cents, "cell", "cq")
      val cells = vectors.crossJoin(broadcast(ca))
        .select(col("vec_id").as("vid"),
          VectorOps.cellArgMax(col("q"), col("n2"),
            col("cells"), col("cqs"), col("cn2s")).cast("int").as("cell"),
          col("q"), col("n2"))
      val w2 = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc_nulls_last, col("cid").asc_nulls_first)
      val want = probes.join(cells, Seq("cell"))
        .filter(col("qid") =!= col("vid"))
        .join(queries, Seq("qid"))
        .select(col("qid"), col("vid").as("cid"),
          VectorOps.cosine(VectorOps.qdot(col("qq"), col("q")),
            col("qn2"), col("n2")).as("cos_sim"))
        .withColumn("rn", row_number().over(w2)).filter(col("rn") <= 3)
        .select(col("qid"), col("cid"), col("cos_sim"))
        .orderBy(col("qid"), col("cid"))
        .collect().toSeq
      val got2 = probe.orderBy(col("qid"), col("cid")).collect().toSeq
      assert(got2 == want && want.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS ivf_spec_cells")
  }

  test("frozen-quantizer append: probe(base + delta) == full build under the same centroids") {
    val dA = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val dB = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val half1 = vectors.filter(pmod(col("vec_id"), lit(2)) === 0)
    val half2 = vectors.filter(pmod(col("vec_id"), lit(2)) === 1)
    // index A: built on half1, half2 added later under FROZEN centroids
    val mA = IvfIndex.build(spark, half1, "ivf_app", dA)
    IvfIndex.append(spark, half2, "ivf_app", dA)
    try {
      val queries = vectors.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
      val got = IvfIndex.probe(spark, "ivf_app", dA, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      // expected: the SAME frozen centroids (copied from index A)
      // assigning the FULL corpus — i.e. what a build would have
      // written had it seen every vector under these centroids
      val cents = spark.read.parquet(s"$dA/ivf_app_centroids")
      cents.write.parquet(s"$dB/ivf_ref_centroids")
      val ca = VectorOps.centroidArrays(cents, "cell", "cq")
      val allCells = vectors.crossJoin(broadcast(ca))
        .select(col("vec_id").as("vid"),
          VectorOps.cellArgMax(col("q"), col("n2"),
            col("cells"), col("cqs"), col("cn2s")).cast("int").as("cell"),
          col("q"), col("n2"))
      graft.operators.Layout.writeBucketed(allCells, "ivf_ref_cells",
        "cell", mA.buckets, s"$dB/ivf_ref_cells")
      IvfIndex.writeMeta(spark, "ivf_ref", dB, mA) // hand-built index: sidecar too
      val want = IvfIndex.probe(spark, "ivf_ref", dB, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      assert(got == want && want.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_app_cells")
      spark.sql("DROP TABLE IF EXISTS ivf_ref_cells")
    }
  }

  test("FRESH session opens the index with only (name, dir): meta sidecar + catalog re-registration") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val mBuilt = IvfIndex.build(spark, vectors, "ivf_fresh", idxDir)
    try {
      val queries = vectors.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
      val want = IvfIndex.probe(spark, "ivf_fresh", idxDir, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      // simulate the serving frontend: a session that never ran the
      // build — no catalog entry, no Meta value in scope. Everything
      // it has is (name, dir).
      spark.sql("DROP TABLE ivf_fresh_cells")
      val fresh = spark.newSession()
      assert(!fresh.catalog.tableExists("ivf_fresh_cells"))
      assert(IvfIndex.readMeta(fresh, "ivf_fresh", idxDir) == mBuilt,
        "geometry must be discoverable from the persisted sidecar alone")
      val freshQueries = Tables.embeddings(fresh, dir)
        .select(col("vec_id"), graft.operators.VectorOps.quantized(col("embedding")).as("q"))
        .withColumn("n2", VectorOps.qnorm2(col("q")))
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
      val probe = IvfIndex.probe(fresh, "ivf_fresh", idxDir, freshQueries, 3)
      // the re-registered table must still plan a statically
      // bucket-pruned scan — the fresh session loses nothing
      val plan = probe.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"fresh-session cell scan not bucket-pruned:\n$plan")
      assert(sel.get.group(2).toInt == mBuilt.buckets)
      val got = probe.orderBy(col("qid"), col("cid")).collect().toSeq
      assert(got == want && want.nonEmpty,
        "fresh-session probe must serve the building session's answers")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_fresh_cells")
  }

  test("atomic in-place rebuild: probes see all-old or all-new across a crash") {
    import graft.pipeline.TierCommit
    val d = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val dRef = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val half1 = vectors.filter(pmod(col("vec_id"), lit(2)) === 0)
    IvfIndex.build(spark, half1, "ivf_reb", d)
    try {
      val queries = vectors.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
      val oldAns = IvfIndex.probe(spark, "ivf_reb", d, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq

      // CRASH 1: retrain staged, commit point not reached — a healing
      // reader sees ALL-OLD: the half-corpus index, byte for byte
      IvfIndex.stageRebuildInPlace(spark, vectors, "ivf_reb", d, buckets = 8)
      assert(!TierCommit.heal(spark, d), "no manifest yet: heal is a no-op")
      assert(IvfIndex.probe(spark, "ivf_reb", d, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq == oldAns)

      // CRASH 2: manifest renamed (commit point), no promotion ran —
      // heal rolls centroids+cells+meta forward TOGETHER: ALL-NEW,
      // identical to a fresh full build (training is deterministic)
      TierCommit.writeManifest(spark, d, IvfIndex.rebuildTargets("ivf_reb", d))
      assert(TierCommit.heal(spark, d), "manifest present: heal must promote")
      spark.catalog.refreshTable("ivf_reb_cells") // same-session reader
      val got = IvfIndex.probe(spark, "ivf_reb", d, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      IvfIndex.build(spark, vectors, "ivf_rebref", dRef)
      val want = IvfIndex.probe(spark, "ivf_rebref", dRef, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      assert(got == want && want.nonEmpty)
      assert(got != oldAns, "full-corpus rebuild must change the answers here")

      // uninterrupted path, with a CHANGED bucket count: the catalog
      // spec must follow the new layout (DROP + re-register inside)
      IvfIndex.rebuildInPlace(spark, vectors, "ivf_reb", d, buckets = 4)
      val probe2 = IvfIndex.probe(spark, "ivf_reb", d, queries, 3)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(probe2.queryExecution.executedPlan.toString)
      assert(sel.isDefined && sel.get.group(2).toInt == 4,
        "catalog bucket spec must describe the rebuilt 4-bucket layout")
      assert(probe2.orderBy(col("qid"), col("cid")).collect().toSeq == want,
        "bucket count is physical layout only — answers unchanged")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_reb_cells")
      spark.sql("DROP TABLE IF EXISTS ivf_rebref_cells")
    }
  }

  test("build is deterministic: two builds serve identical probe answers") {
    val d1 = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val m1 = IvfIndex.build(spark, vectors, "ivf_det1", d1)
    val m2 = IvfIndex.build(spark, vectors, "ivf_det2", d2)
    try {
      assert(m1 == m2)
      val queries = vectors.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
      val a = IvfIndex.probe(spark, "ivf_det1", d1, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      val b = IvfIndex.probe(spark, "ivf_det2", d2, queries, 3)
        .orderBy(col("qid"), col("cid")).collect().toSeq
      assert(a == b && a.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_det1_cells")
      spark.sql("DROP TABLE IF EXISTS ivf_det2_cells")
    }
  }

  test("deletion under frozen centroids: suppressed == oversampled-probe-minus-deleted; vacuum is invisible and clears the ledger") {
    import graft.operators.Tombstones
    val d = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(spark, vectors, "ivf_del", d)
    try {
      val queries = vectors.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
      val deleted = vectors.filter(pmod(col("vec_id"), lit(7)) === 3)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      assert(deleted.nonEmpty)
      // the frozen-centroid reference: probe BEFORE deletion with an
      // exhaustive topk, drop deleted candidates, re-cut top-3 — what a
      // suppression-only deletion must reproduce exactly
      val big = IvfIndex.probe(spark, "ivf_del", d, queries, topk = 100000)
        .collect().filterNot(r => deleted(r.getLong(1)))
        .groupBy(_.getLong(0)).toSeq.flatMap { case (_, rows) =>
          rows.sortBy(r => (-r.getDouble(2), r.getLong(1))).take(3).toSeq
        }.sortBy(r => (r.getLong(0), -r.getDouble(2), r.getLong(1)))

      IvfIndex.deleteVectors(spark, deleted.toSeq, "ivf_del", d)
      def probed = IvfIndex.probe(spark, "ivf_del", d, queries, topk = 3)
        .orderBy(col("qid"), col("cos_sim").desc_nulls_last, col("cid"))
        .collect().toSeq
      val got = probed
      assert(got == big && got.nonEmpty,
        s"deletion must be pure candidate suppression:\n$got\nvs\n$big")

      // vacuum: physical drop, identical answers, ledger cleared
      IvfIndex.vacuumInPlace(spark, "ivf_del", d)
      assert(Tombstones.count(spark, s"$d/ivf_del_tombstones") == 0)
      assert(spark.read.parquet(s"$d/ivf_del_cells")
        .filter(col("vid").isin(deleted.take(20).toSeq: _*)).count() == 0,
        "vacuum must drop tombstoned vectors physically")
      assert(probed == big, "vacuum must not change any answer")

      // rebuild = new corpus snapshot: ledger cleared, full answers back
      IvfIndex.deleteVectors(spark, deleted.take(5).toSeq, "ivf_del", d)
      IvfIndex.rebuildInPlace(spark, vectors, "ivf_del", d)
      assert(Tombstones.count(spark, s"$d/ivf_del_tombstones") == 0,
        "rebuildInPlace must clear the deletion ledger")
      assert(probed.map(_.getLong(1)).exists(deleted),
        "after the rebuild the formerly deleted vectors are candidates again")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_del_cells")
    }
  }
}
