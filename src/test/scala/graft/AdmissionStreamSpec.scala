package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.NearDupIndex
import graft.streaming.NearDupIndexStream

/** The streaming ingest-admission sink (VERDICT r12 #5): q214's
  * probe-then-append composition inside one foreachBatch. Laws:
  *
  *  1. stream verdicts == the driver-side batch loop (admission
  *     against everything indexed so far, then append) across an
  *     ARBITRARY split — batch boundaries are unobservable beyond the
  *     history-so-far semantics they define;
  *  2. the first batch of a fresh ingest is admitted wholesale;
  *  3. REPLAY of an already-written batch is a no-op — the subtle
  *     case: its own segment exists at re-probe time, but the probe's
  *     batch-id anti-join makes it see exactly the pre-batch history,
  *     so verdicts recompute bit-identically;
  *  4. union of 'dup' verdicts == the cross-batch near-dup pairs of
  *     the whole corpus (no admission missed, none fabricated) — the
  *     q214 incremental-ingest law served from the stream.
  */
class AdmissionStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def documents = Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-adm").toString

  private def verdictRows(df: DataFrame): Seq[(Long, String, Any, Any)] =
    df.select(col("doc_id"), col("verdict"), col("match_id"),
        col("match_jaccard"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3)))
      .toSeq.sortBy(_._1)

  test("stream admission == batch probe-then-append loop; first batch all-new; replay no-op") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val d = tmp()
    val dRef = tmp()
    val vd = s"$d/verdicts"
    val m = NearDupIndex.Meta(buckets = 16)
    val rows = documents.as[(Long, String)].collect().toSeq.sortBy(_._1)
    val (b1, rest) = rows.splitAt(rows.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)
    val batches = Seq(b1, b2, b3)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = NearDupIndexStream.startAdmission(
      input.toDF().toDF("doc_id", "text"), "adm", d, m, vd, s"$d/_ckpt")
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()

    // the driver-side reference loop on a second index dir: admission
    // against history-so-far, then append — the q214 composition
    val want = batches.zipWithIndex.map { case (b, i) =>
      val bdf = b.toDF("doc_id", "text")
      val v = verdictRows(
        NearDupIndex.admission(spark, "adm_ref", dRef, bdf))
      NearDupIndex.writeDelta(spark, bdf, "adm_ref", dRef, m, segId = i.toLong)
      v
    }

    def streamed(i: Int) =
      verdictRows(spark.read.parquet(s"$vd/seg=$i"))
    batches.indices.foreach { i =>
      assert(streamed(i) == want(i) && want(i).nonEmpty,
        s"batch $i verdicts must match the reference loop")
    }
    assert(want.head.forall(_._2 == "new"),
      "the first batch of a fresh ingest is admitted wholesale")
    assert(want.flatten.exists(_._2 == "dup"),
      "the fixture must exercise rejections")

    // REPLAY the middle batch: its segment exists — verdicts and index
    // answers must be bit-identical afterwards
    val before1 = streamed(1)
    NearDupIndexStream.processAdmissionBatch(b2.toDF("doc_id", "text"),
      "adm", d, m, vd, batchId = 1L)
    assert(streamed(1) == before1, "replayed verdicts must not change")
    assert(NearDupIndex.segmentIds(spark, "adm", d) == Seq(0L, 1L, 2L))

    // law 4: the rejected set == the later side of every cross-batch
    // near-dup pair of the whole corpus (each later-batch doc with ANY
    // earlier near-dup is rejected exactly once; same-batch pairs are
    // invisible to history-so-far admission, by design)
    val idx = batches.zipWithIndex
      .flatMap { case (b, i) => b.map { case (id, _) => id -> i } }.toMap
    val wantRejected = graft.operators.TextOps
      .nearDupPairs(documents, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        if (idx(a) < idx(b)) Some(b) else if (idx(b) < idx(a)) Some(a)
        else None
      }.toSet
    val gotRejected = batches.indices
      .flatMap(i => streamed(i).filter(_._2 == "dup").map(_._1)).toSet
    assert(gotRejected == wantRejected && wantRejected.nonEmpty,
      s"rejected set must be exactly the later-side of cross-batch pairs:\n" +
        s"extra ${gotRejected.diff(wantRejected)}, " +
        s"missing ${wantRejected.diff(gotRejected)}")
  }
}
