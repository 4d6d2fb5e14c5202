package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeTable}
import graft.operators.{BpeIndex, BpeTrain}

/** The persisted BPE merge table (VERDICT r10 #1): train → persist →
  * open by (name, dir) → encode under the LEARNED table. Proven here:
  * round-trip fidelity, the dynamic-encoder law (BpeTable over the
  * fixture table == the static Bpe encoder, symbol for symbol), the
  * atomic rebuild across crash injection, and the end-to-end serve
  * path equaling a direct driver-side encode.
  */
class BpeIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def words = Tables.documents(spark, dir)
    .select(explode(split(col("text"), " ")).as("w"))
    .filter(col("w") =!= "" && length(col("w")) <= 32)
    .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-bpe").toString

  test("build/readMerges round-trip preserves the table in rank order") {
    val d = tmp()
    val merges = BpeTrain.fit(words, rounds = 6)
    assert(merges.size == 6)
    val meta = BpeIndex.build(spark, merges, "bpe_rt", d)
    assert(meta == BpeIndex.Meta(6))
    assert(BpeIndex.readMerges(spark, "bpe_rt", d) == merges)
  }

  test("dynamic-encoder law: BpeTable(fixture) == static Bpe, symbol for symbol") {
    val table = new BpeTable(Bpe.Merges)
    val sample = words.orderBy(col("cnt").desc, col("w")).limit(500)
      .collect().map(_.getString(0))
    // structured probes beyond the corpus: merge chains, overlaps, edges
    val probes = Seq("spark", "sparkspark", "thethethe", "join", "ggg",
      "gggg", "a", "", "batch", "unbatched", "database", "xyzzy")
    (sample ++ probes).foreach { w =>
      assert(table.segment(w) == Bpe.segment(w),
        s"dynamic encoder diverged from the static one on '$w'")
      assert(table.count(org.apache.spark.unsafe.types.UTF8String.fromString(w))
        == Bpe.segment(w).length.toLong)
    }
  }

  test("atomic in-place rebuild: readers see all-old or all-new across a crash") {
    import graft.pipeline.TierCommit
    val d = tmp()
    val m1 = BpeTrain.fit(words, rounds = 4)
    val m2 = BpeTrain.fit(words, rounds = 8)
    assert(m2.take(4) == m1, "greedy training is prefix-stable")
    BpeIndex.build(spark, m1, "bpe_reb", d)

    // CRASH 1: retrain staged, commit point not reached — a healing
    // reader sees ALL-OLD: the 4-merge table
    BpeIndex.stageRebuildInPlace(spark, m2, "bpe_reb", d)
    assert(!TierCommit.heal(spark, d), "no manifest yet: heal is a no-op")
    assert(BpeIndex.readMerges(spark, "bpe_reb", d) == m1)
    assert(BpeIndex.readMeta(spark, "bpe_reb", d) == BpeIndex.Meta(4))

    // CRASH 2: manifest renamed (the commit point), no promotion ran —
    // heal rolls merges + sidecar forward TOGETHER: ALL-NEW
    TierCommit.writeManifest(spark, d, Seq(s"$d/bpe_reb"))
    assert(TierCommit.heal(spark, d), "manifest present: heal must promote")
    assert(BpeIndex.readMerges(spark, "bpe_reb", d) == m2)
    assert(BpeIndex.readMeta(spark, "bpe_reb", d) == BpeIndex.Meta(8))

    // and the uninterrupted path over the live artifact
    BpeIndex.rebuildInPlace(spark, m1, "bpe_reb", d)
    assert(BpeIndex.readMerges(spark, "bpe_reb", d) == m1)
  }

  test("FRESH session opens the table with only (name, dir); serve == direct encode") {
    val d = tmp()
    val merges = BpeTrain.fit(words, rounds = 8)
    BpeIndex.build(spark, merges, "bpe_fresh", d)

    val fresh = spark.newSession()
    val served = BpeIndex.table(fresh, "bpe_fresh", d)
    val direct = new BpeTable(merges.map(m => (m.left, m.right)).toIndexedSeq)
    val sample = words.limit(300).collect().map(_.getString(0))
    sample.foreach { w =>
      assert(served.segment(w) == direct.segment(w))
    }

    // and through the codegen'd expression in a real plan: per-word
    // counts from the served table match the driver-side encoder
    val got = words.limit(300)
      .withColumn("n_bpe", BpeTable.countCol(served, col("w")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    got.foreach { case (w, n) =>
      assert(n == direct.segment(w).length.toLong, s"count mismatch on '$w'")
    }
  }

  test("token ids: round-trip law, vocab artifact == derivation, OOV = 0") {
    val d = tmp()
    val merges = BpeTrain.fit(words, rounds = 8)
    BpeIndex.build(spark, merges, "bpe_ids", d)
    val table = BpeIndex.table(spark, "bpe_ids", d)

    // vocabulary structure: base chars sorted ascending, then merge
    // outputs in rank order — derivable from the merge table alone
    val bases = merges.flatMap(m => (m.left + m.right).map(_.toString))
      .distinct.sorted
    assert(table.vocab == bases ++ merges.map(m => m.left + m.right))

    // the persisted artifact equals the derivation, ids 1-based dense
    val onDisk = BpeIndex.readVocab(spark, "bpe_ids", d)
    assert(onDisk.map(_._1) == (1L to table.vocab.size.toLong) &&
      onDisk.map(_._2) == table.vocab)

    // round-trip law over the real corpus vocabulary: ids decode back
    // to the exact segmentation whenever every symbol is in-vocab, and
    // |ids| always equals the symbol count
    val sample = words.orderBy(col("cnt").desc, col("w")).limit(500)
      .collect().map(_.getString(0))
    sample.foreach { w =>
      val ids = table.encodeIds(w).toSeq
      assert(ids.size == table.countSymbols(w), s"|ids| mismatch on '$w'")
      if (ids.forall(_ >= 1))
        assert(table.decode(ids) == table.segment(w), s"round-trip on '$w'")
    }

    // OOV: a character no merge side contains numbers as 0; everything
    // else in the word still gets its real id
    val oovChar = (33 to 0x2FFF).map(_.toChar.toString)
      .find(c => !table.vocab.exists(_.contains(c))).get
    val mixed = table.encodeIds(oovChar + sample.head)
    assert(mixed.head == 0L || mixed.contains(0L),
      s"OOV char must map to 0 in $mixed")

    // the codegen'd expression equals the direct method, row for row
    import spark.implicits._
    val got = spark.createDataset(sample.toSeq).toDF("w")
      .withColumn("ids", graft.functions.BpeTable.idsCol(table, col("w")))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    sample.foreach { w =>
      assert(got(w) == table.encodeIds(w).toSeq, s"expression ids on '$w'")
    }
  }

  test("sidecar/table drift fails loudly") {
    val d = tmp()
    val merges = BpeTrain.fit(words, rounds = 4)
    BpeIndex.build(spark, merges, "bpe_drift", d)
    // a partial rewrite that changed the table but not the sidecar
    BpeIndex.writeMeta(spark, "bpe_drift", d, BpeIndex.Meta(7))
    val e = intercept[Exception] {
      BpeIndex.readMerges(spark, "bpe_drift", d)
    }
    assert(e.getMessage.contains("merges on disk"))
  }
}
