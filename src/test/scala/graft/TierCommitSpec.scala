package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipeline.TierCommit

/** Crash-injection proof for the manifest-pinned multi-table commit
  * (VERDICT r7 #5): the serving tiers (gold + warehouse + summary) must
  * be observable only as ALL-OLD (crash before the manifest rename) or
  * ALL-NEW (crash after it, healed on the next read) — never a mix.
  */
class TierCommitSpec extends SparkSpec {

  private def writeV(root: String, marker: Long): Seq[String] = {
    import spark.implicits._
    val t1 = s"$root/gold/mart_a"
    val t2 = s"$root/warehouse/table_b"
    val t3 = s"$root/gold/summary.md"
    TierCommit.stageDf(spark, Seq((marker, "x")).toDF("v", "k"), t1)
    TierCommit.stageDf(spark, Seq((marker, "y")).toDF("v", "k"), t2)
    TierCommit.stageFile(spark, s"summary v$marker".getBytes("UTF-8"), t3)
    Seq(t1, t2, t3)
  }

  private def readV(root: String): (Long, Long, String) = (
    spark.read.parquet(s"$root/gold/mart_a").select("v").head.getLong(0),
    spark.read.parquet(s"$root/warehouse/table_b").select("v").head.getLong(0),
    Files.readString(Paths.get(s"$root/gold/summary.md")))

  test("commit publishes all targets and leaves no manifest") {
    val root = Files.createTempDirectory("graft-tc").toString
    TierCommit.commit(spark, root, writeV(root, 1L))
    assert(readV(root) == ((1L, 1L, "summary v1")))
    assert(!Files.exists(Paths.get(s"$root/${TierCommit.ManifestName}")))
    // second version fully replaces the first
    TierCommit.commit(spark, root, writeV(root, 2L))
    assert(readV(root) == ((2L, 2L, "summary v2")))
  }

  test("crash BEFORE the manifest rename is all-old: staged tmps are invisible") {
    val root = Files.createTempDirectory("graft-tc").toString
    TierCommit.commit(spark, root, writeV(root, 1L))
    writeV(root, 2L) // stage only — simulated crash before writeManifest
    assert(!TierCommit.heal(spark, root), "no manifest -> nothing to heal")
    assert(readV(root) == ((1L, 1L, "summary v1")))
    // and a subsequent complete commit overwrites the stale tmps cleanly
    TierCommit.commit(spark, root, writeV(root, 3L))
    assert(readV(root) == ((3L, 3L, "summary v3")))
  }

  test("crash AFTER the manifest rename is all-new: heal rolls every target forward") {
    val root = Files.createTempDirectory("graft-tc").toString
    TierCommit.commit(spark, root, writeV(root, 1L))
    val targets = writeV(root, 2L)
    TierCommit.writeManifest(spark, root, targets) // crash before any promote
    assert(readV(root) == ((1L, 1L, "summary v1")), "pre-heal: old still served")
    assert(TierCommit.heal(spark, root))
    assert(readV(root) == ((2L, 2L, "summary v2")))
    assert(!Files.exists(Paths.get(s"$root/${TierCommit.ManifestName}")))
  }

  test("crash MID-promotion (some targets swapped) still converges to all-new") {
    val root = Files.createTempDirectory("graft-tc").toString
    TierCommit.commit(spark, root, writeV(root, 1L))
    val targets = writeV(root, 2L)
    TierCommit.writeManifest(spark, root, targets)
    // simulate the first promotion having completed before the crash:
    // graveyard old mart_a, swap in its tmp, leave the rest staged
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val a = new org.apache.hadoop.fs.Path(s"$root/gold/mart_a")
    val aTmp = new org.apache.hadoop.fs.Path(s"$root/gold/mart_a.__swap_tmp")
    val aOld = new org.apache.hadoop.fs.Path(s"$root/gold/mart_a.__swap_old")
    assert(fs.rename(a, aOld) && fs.rename(aTmp, a))
    assert(TierCommit.heal(spark, root))
    assert(readV(root) == ((2L, 2L, "summary v2")))
    assert(!fs.exists(aOld), "graveyard cleaned up")
  }

  test("heal is idempotent and re-entrant (crash during heal re-heals)") {
    val root = Files.createTempDirectory("graft-tc").toString
    TierCommit.commit(spark, root, writeV(root, 1L))
    val targets = writeV(root, 2L)
    TierCommit.writeManifest(spark, root, targets)
    assert(TierCommit.heal(spark, root))
    // a crash after the promotions but before the manifest delete would
    // re-run heal over already-promoted targets: must be a no-op
    TierCommit.writeManifest(spark, root, targets)
    assert(TierCommit.heal(spark, root))
    assert(readV(root) == ((2L, 2L, "summary v2")))
  }
}
