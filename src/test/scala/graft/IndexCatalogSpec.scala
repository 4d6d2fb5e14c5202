package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeIndex, BpeTrain, IndexCatalog, IvfIndex,
  IvfPqIndex, NearDupIndex, SigIndex, TextIndex, VectorOps}

/** `SHOW INDEXES` (VERDICT r10 #5): one warehouse dir holding all six
  * persisted index kinds must list each with its kind, sidecar
  * geometry, segment count, and row/item counts — and a FRESH session
  * must produce the identical listing from the on-disk layout alone.
  */
class IndexCatalogSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def vectors = Tables.embeddings(spark, dir)
    .select(col("vec_id"), VectorOps.quantized(col("embedding")).as("q"))
    .withColumn("n2", VectorOps.qnorm2(col("q")))

  private def documents = Tables.documents(spark, dir)
    .select(col("doc_id"), col("source"), col("text"))

  test("all six index kinds list with kind, geometry, segments, rows, items") {
    val d = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    try {
      IvfIndex.build(spark, vectors, "cat_ivf", d)
      IvfPqIndex.build(spark, vectors, "cat_ivfpq", d,
        m = 4, subDim = 16, ksub = 16, iters = 2)
      TextIndex.build(spark, documents, "cat_bm25", d)
      SigIndex.build(spark, vectors, "cat_sig", d)
      // a second sig segment: the catalog must count segments
      SigIndex.appendDelta(spark,
        vectors.withColumn("vec_id", col("vec_id") + 100000L),
        "cat_sig", d)
      val words = documents
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "" && length(col("w")) <= 32)
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      BpeIndex.build(spark, BpeTrain.fit(words, rounds = 4), "cat_bpe", d)
      NearDupIndex.build(spark,
        documents.select(col("doc_id"), col("text")), "cat_ndup", d)

      val got = IndexCatalog.list(spark, d).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      val byName = got.map(r => r._1 -> r).toMap
      assert(got.map(_._1).toSeq ==
        Seq("cat_bm25", "cat_bpe", "cat_ivf", "cat_ivfpq", "cat_ndup",
          "cat_sig"),
        s"unexpected listing: ${got.toSeq}")

      assert(byName("cat_ndup")._2 == "near_dup")
      assert(byName("cat_ndup")._3 ==
        "band_rows=4, bands=16, buckets=16, perms=64",
        "near_dup geometry must pin the full banding")
      assert(byName("cat_ndup")._4 == 1L)
      assert(byName("cat_ndup")._5 > 0, "band postings rows")
      // n_items = indexed documents (shingle-set rows): every document
      // with at least one shingle (>= 3 tokens)
      val nDocs3 = documents
        .filter(size(split(col("text"), " ")) >= 3).count()
      assert(byName("cat_ndup")._6 == nDocs3,
        s"near_dup n_items must be the indexed doc count $nDocs3")

      val n = vectors.count()
      assert(byName("cat_ivf")._2 == "ivf")
      assert(byName("cat_ivf")._3.contains("k=") &&
        byName("cat_ivf")._3.contains("nprobe="))
      assert(byName("cat_ivf")._5 == n)

      assert(byName("cat_ivfpq")._2 == "ivf_pq")
      assert(byName("cat_ivfpq")._3.contains("ksub=16"))
      assert(byName("cat_ivfpq")._5 == n * 4, "codes table carries n*m rows")

      // n_items compares apples-to-apples across kinds (VERDICT r11
      // #5): an ivf and an ivf_pq built over the SAME vectors report
      // the same item count even though their physical rows differ 4x
      assert(byName("cat_ivf")._6 == n && byName("cat_ivfpq")._6 == n,
        s"ivf/ivf_pq n_items must both be the vector count $n: " +
          s"${byName("cat_ivf")._6} vs ${byName("cat_ivfpq")._6}")

      assert(byName("cat_bm25")._2 == "bm25")
      assert(byName("cat_bm25")._3.contains("buckets="))
      assert(byName("cat_bm25")._4 == 1L && byName("cat_bm25")._5 > 0)
      assert(byName("cat_bm25")._6 == documents.count(),
        "bm25 n_items = indexed documents (segment-stats sum)")

      assert(byName("cat_sig")._2 == "sign_hash")
      assert(byName("cat_sig")._3 == "nbits=64")
      assert(byName("cat_sig")._4 == 2L, "two segments after the delta")
      assert(byName("cat_sig")._5 == 2 * n)
      assert(byName("cat_sig")._6 == 2 * n)

      assert(byName("cat_bpe")._2 == "bpe")
      assert(byName("cat_bpe")._3 == "n_merges=4")
      assert(byName("cat_bpe")._5 == 4L)

      // FRESH session: the listing is derived from disk alone
      val fresh = spark.newSession()
      val again = IndexCatalog.list(fresh, d).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(again.toSeq == got.toSeq)

      // an empty / non-warehouse dir lists nothing (no error)
      val empty = java.nio.file.Files.createTempDirectory("graft-cat-e").toString
      assert(IndexCatalog.list(spark, empty).count() == 0)

      // a staged-but-uncommitted rebuild must NOT appear as a phantom
      // index: the stage tree lives at <name>.__swap_tmp until the
      // tier commit promotes it
      SigIndex.stageRebuildInPlace(spark, vectors, "cat_sig", d, nbits = 64)
      val during = IndexCatalog.list(spark, d).collect().map(_.getString(0))
      assert(during.toSeq ==
        Seq("cat_bm25", "cat_bpe", "cat_ivf", "cat_ivfpq", "cat_ndup",
          "cat_sig"),
        s"stage tree leaked into the catalog: ${during.toSeq}")

      // ADVICE r11: a writer crash AT the commit point (manifest
      // published, promotion not run) graveyards nothing yet — but a
      // crash mid-promotion can leave the live dir graveyarded with
      // the tmp unswapped. list() must heal first, so the index
      // neither vanishes nor lists stale stats.
      graft.pipeline.TierCommit.writeManifest(spark, d, Seq(s"$d/cat_sig"))
      val healed = IndexCatalog.list(spark, d).collect()
        .map(r => (r.getString(0), r.getLong(3)))
      assert(healed.map(_._1).toSeq.contains("cat_sig"))
      // the healed listing shows the PROMOTED (rebuilt, one-segment)
      // index, not the old two-segment one
      assert(healed.toMap.apply("cat_sig") == 1L,
        s"list() must heal the interrupted commit forward: $healed")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cat_ivf_cells")
      spark.sql("DROP TABLE IF EXISTS cat_ivfpq_codes")
    }
  }

  test("storage health: footprint, deletion backlog, and the needs_compaction verdict (VERDICT r12 #6)") {
    val d = java.nio.file.Files.createTempDirectory("graft-cath").toString
    SigIndex.build(spark, vectors, "h_sig", d)
    def rowOf(name: String) = IndexCatalog.list(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8), r.getBoolean(9))).toMap.apply(name)

    // a fresh one-segment index: footprint positive, nothing pending
    val fresh = rowOf("h_sig")
    assert(fresh._1 == 1L && fresh._4 > 0 && fresh._5 > 0,
      s"total_bytes/n_files must be positive: $fresh")
    assert(fresh._6 == 0L && !fresh._7, s"fresh index needs nothing: $fresh")

    // many deltas: segment count crosses the threshold → advise
    (1 to 4).foreach { i =>
      SigIndex.appendDelta(spark,
        vectors.withColumn("vec_id", col("vec_id") + lit(i * 100000L)),
        "h_sig", d)
    }
    val piled = rowOf("h_sig")
    assert(piled._1 == 5L && piled._7,
      s"5 segments must advise compaction: $piled")

    // compaction folds: verdict clears
    SigIndex.compactInPlace(spark, "h_sig", d)
    val folded = rowOf("h_sig")
    assert(folded._1 == 1L && !folded._7,
      s"compacted index must not advise: $folded")

    // a deletion backlog advises too (vacuum/compaction drains it),
    // and n_items drops to the probe's view while n_rows stays physical
    val nAll = folded._3
    SigIndex.deleteVectors(spark, Seq(0L, 1L, 2L), "h_sig", d)
    val pending = rowOf("h_sig")
    assert(pending._6 == 3L && pending._7,
      s"deletion backlog must advise compaction: $pending")
    assert(pending._3 == nAll - 3 && pending._2 == folded._2,
      s"n_items is the serving view, n_rows stays physical: $pending")
    SigIndex.compactInPlace(spark, "h_sig", d)
    val drained = rowOf("h_sig")
    assert(drained._6 == 0L && !drained._7 && drained._3 == nAll - 3,
      s"compaction must drain the ledger: $drained")
  }

  test("degradation: one damaged index lists as placeholders; empty stats sum to 0; listing skips heal under a live writer lock (ADVICE r12)") {
    val d = java.nio.file.Files.createTempDirectory("graft-catd").toString
    SigIndex.build(spark, vectors, "d_sig", d)
    TextIndex.build(spark, documents, "d_bm25", d)

    // damage the bm25 stats table: its row degrades, the listing lives
    val statsDir = new org.apache.hadoop.fs.Path(s"$d/d_bm25/stats")
    val fs = statsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(statsDir, true)
    val got = IndexCatalog.list(spark, d).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got("d_bm25")._1 == "bm25" &&
      got("d_bm25")._2 == IndexCatalog.Damaged &&
      got("d_bm25")._3 == IndexCatalog.Damaged,
      s"damaged index must degrade, not fail: ${got("d_bm25")}")
    assert(got("d_sig")._2 > 0, "healthy indexes list normally beside it")

    // a STAGED commit + live writer lock: list() must not heal (the
    // writer finishes its own promotion) — the old index keeps listing
    SigIndex.stageRebuildInPlace(spark, vectors, "d_sig", d, nbits = 64)
    graft.pipeline.TierCommit.writeManifest(spark, d, Seq(s"$d/d_sig"))
    graft.pipeline.TierCommit.withWriteLock(spark, d) {
      val during = IndexCatalog.list(spark, d).collect().map(_.getString(0))
      assert(during.contains("d_sig"), s"listing under lock: ${during.toSeq}")
      val fsm = new org.apache.hadoop.fs.Path(
        s"$d/${graft.pipeline.TierCommit.ManifestName}")
      assert(fs.exists(fsm),
        "list() must NOT heal (promote the manifest) while the lock is held")
    }
    // lock released (writer died): the next listing heals forward
    IndexCatalog.list(spark, d).collect()
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$d/${graft.pipeline.TierCommit.ManifestName}")),
      "after the lock clears, list() heals the interrupted commit")
  }
}
