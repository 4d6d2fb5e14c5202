package graft

/** Every registered query must execute and return rows on the smallest
  * scale factor — catches runtime breakage (schema drift, bad column
  * refs, convergence failures) in `sbt test` instead of at the driver's
  * verify stage. Oracle equivalence is checked separately by the DuckDB
  * parity harness. */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  Queries.all.foreach { case (name, q) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = q.fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      // near-dup style queries can legitimately be empty at tiny scale;
      // everything else must produce output
      val emptyOk = Set("q17_near_dup_lsh", "q18_simhash_pairs", "q27_embed_neardup",
        "q39_neardup_clusters", "q41_winnowing", "q42_embed_clusters",
        "q43_dedup_survivors")
      val n = df.count()
      assert(n > 0 || emptyOk(name), s"$name returned 0 rows")
    }
  }

  test("every query has oracle SQL registered") {
    val missing = Queries.all.map(_._1).filterNot(Queries.oracleSql.contains)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
