package graft

import org.apache.spark.sql.functions._

/** q212's serving contract (VERDICT r11 #6): both retrieval legs must
  * be INDEX READS — the lexical leg never tokenizes the corpus, the
  * vector leg never packs a corpus signature; the only corpus-table
  * touch in the serving plan is the one-row query-vector fetch (the
  * request itself), pushed into the embeddings scan.
  */
class HybridServeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
    }.flatten

  test("hybrid serve: legs are index reads; the only corpus touch is the pushed query-vector fetch") {
    // build both indexes once (the registry query's builder half)
    Queries.queries("q212_hybrid_serve")(spark, dir).collect()

    val probe = CorpusQueries.hybridServeOnly(spark, dir)
    val got = probe.collect()
    assert(got.nonEmpty && got.length <= 15)

    val scans = allScans(probe.queryExecution.executedPlan)
    val locs = scans.flatMap(_.metadata.get("Location"))
    assert(!locs.exists(_.contains("documents")),
      s"serving plan must not scan the documents corpus:\n$locs")
    assert(locs.exists(_.contains("postings")),
      s"lexical leg must read the BM25 postings index:\n$locs")
    assert(locs.exists(_.contains("sigs")),
      s"vector leg must read the sign-hash index:\n$locs")
    // the request: a one-row embeddings fetch, pushed vec_id = 7
    val emb = scans.filter(_.metadata.get("Location").exists(_.contains("embeddings")))
    assert(emb.nonEmpty && emb.forall(_.metadata.get("PushedFilters")
      .exists(_.contains("EqualTo(vec_id,7)"))),
      s"query-vector fetch must be pushed vec_id = 7:\n" +
        emb.map(_.metadata.get("PushedFilters")).mkString("\n"))
    // the sig rescore is the pushed point read, not a corpus pass
    val sig = scans.filter(_.metadata.get("Location").exists(_.contains("sigs")))
    assert(sig.forall(_.metadata.get("PushedFilters").exists(_.contains("In(vid"))),
      "sig read in the serving plan must be the In(vid, ...) rescore")
  }
}
