package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared DELETION ledger of the persisted serving indexes
  * (VERDICT r12 #1) — the one index-mutation verb the LSM lifecycle
  * lacked: build/append/compact/rebuild cover growth, but a real
  * deployment gets erasure requests (GDPR/LGPD — q185 already measures
  * their blast radius) weekly, and the only remedy was a full rebuild.
  *
  * Design: deletion is a TOMBSTONE SEGMENT, the same discipline the
  * segmented layouts already use for growth —
  *
  *  - `<tombRoot>/seg=<k>/` parquet holds the deleted ids (plus any
  *    per-family payload the probe-side correction needs, e.g. BM25's
  *    per-document length); `seg` is a hive partition level, so one
  *    read of the root sees every deletion batch.
  *  - [[append]] dedupes the incoming batch against itself AND against
  *    already-tombstoned ids before writing — a twice-deleted id can
  *    never subtract twice from cross-segment statistics (the BM25
  *    hazard), and ids absent from the index simply never match.
  *  - Probes ANTI-JOIN the broadcast tombstone set (deletion sets are
  *    small by contract — an erasure batch, not a corpus); compaction
  *    physically drops tombstoned rows and does NOT copy the tombstone
  *    segments, clearing the set; a whole-root rebuild swaps them away.
  *
  * Callers hold their index dir's writer lock across [[append]] (the
  * same single-writer rule as appendDelta — two concurrent deletions
  * would race the segment-id pick AND the dedupe read); a failed write
  * deletes its own fresh segment.
  *
  * 100 TB posture: tombstones are ids, not data — the broadcast is
  * bounded by the un-compacted deletion backlog, and compaction (the
  * lifecycle step that already exists) resets it to zero.
  */
object Tombstones {

  /** Existing tombstone segment ids under `tombRoot`, ascending — the
    * [[TextIndex.segmentIds]] listing discipline (non-numeric
    * directories skipped). */
  def segmentIds(spark: SparkSession, tombRoot: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(tombRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg="))
      .map(_.getPath.getName.stripPrefix("seg="))
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong)
      .sorted
  }

  /** The unified tombstone set (the `seg` partition column dropped), or
    * None when no deletion has ever been recorded — including the
    * staged-empty directory a rebuild promotes to clear the set. */
  def read(spark: SparkSession, tombRoot: String): Option[DataFrame] =
    if (segmentIds(spark, tombRoot).isEmpty) None
    else {
      val df = spark.read.parquet(tombRoot)
      Some(df.select(df.columns.filterNot(_ == "seg").map(col): _*))
    }

  /** Append `fresh` (first column = the id) as the next tombstone
    * segment, deduped within the batch and against already-tombstoned
    * ids. Caller holds the index dir's writer lock. Returns the rows
    * actually recorded (the payload the caller may need for its own
    * bookkeeping). A failed write deletes its own segment. */
  def append(spark: SparkSession, tombRoot: String, fresh: DataFrame): Unit = {
    val idCol = fresh.columns.head
    val deduped0 = fresh.dropDuplicates(idCol)
    val deduped = read(spark, tombRoot) match {
      case Some(existing) =>
        deduped0.join(broadcast(existing.select(col(idCol))),
          Seq(idCol), "left_anti")
      case None => deduped0
    }
    val segId = segmentIds(spark, tombRoot) match {
      case Seq() => 0L
      case segs => segs.max + 1L
    }
    try deduped.coalesce(1) // an erasure batch: one small file
      .write.mode("overwrite").parquet(s"$tombRoot/seg=$segId")
    catch { case e: Throwable =>
      val p = new org.apache.hadoop.fs.Path(s"$tombRoot/seg=$segId")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      throw e
    }
  }

  /** `df` minus tombstoned rows: anti-join on `key` against the
    * broadcast tombstone id set; identity when no tombstones exist. */
  def antiJoin(spark: SparkSession, tombRoot: String, df: DataFrame,
               key: String): DataFrame =
    read(spark, tombRoot) match {
      case Some(t) =>
        val ids = t.select(col(t.columns.head).as(key)).dropDuplicates(key)
        df.join(broadcast(ids), Seq(key), "left_anti")
      case None => df
    }

  /** Tombstoned-id count (catalog surface). */
  def count(spark: SparkSession, tombRoot: String): Long =
    read(spark, tombRoot).map(_.count()).getOrElse(0L)

  /** Drop the ledger — a (re)build over a reused directory must not
    * inherit the previous index's deletions: its ids belong to the old
    * corpus. */
  def clear(spark: SparkSession, tombRoot: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(tombRoot)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
