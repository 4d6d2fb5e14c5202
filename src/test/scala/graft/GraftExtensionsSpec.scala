package graft

import graft.plans.GraftExtensions

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("array_dot_long is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT array_dot_long(a, b) AS d FROM vecs").first().getLong(0)
    assert(got == 4 + 10 + 18)
  }

  test("cell_argmax_cosine_long is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT cell_argmax_cosine_long(
           array(1L, 0L), 1L,
           array(0L, 1L),
           array(array(1L, 0L), array(0L, 1L)),
           array(1L, 1L)) AS cell""").first().getLong(0)
    assert(got == 0L, "query (1,0) must route to the (1,0) centroid's cell")
  }

  test("registration is idempotent") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT array_dot_long(array(2L, 2L), array(3L, 3L))")
      .first().getLong(0)
    assert(got == 12L)
  }

  test("BPE expressions are callable from SQL and match the Scala encoder") {
    GraftExtensions.register(spark)
    val word = "spark"
    val row = spark.sql(
      s"""SELECT bpe_count_long('$word') AS c,
             bpe_count_text_long('$word $word') AS ct,
             bpe_segments_array('$word') AS segs""").first()
    val expect = graft.functions.Bpe.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(word))
    assert(row.getLong(0) == expect)
    assert(row.getLong(1) == 2 * expect)
    assert(row.getSeq[String](2).mkString("") == word,
      "segments must concatenate back to the word")
    assert(row.getSeq[String](2).length.toLong == expect)
  }

  test("multi_match_pack_long is callable from SQL; literal patterns only") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT multi_match_pack_long('abcabc', array('abc', 'bc')) AS p")
      .first().getLong(0)
    // 2 'abc' hits + 2 'bc' hits, 2 distinct patterns -> 4*1024 + 2
    assert(got == 4L * 1024L + 2L)
    // a per-row (non-foldable) pattern list must be rejected at analysis
    Seq(("abc", Seq("a"))).toDF("t", "ps").createOrReplaceTempView("mm_in")
    val e = intercept[Exception] {
      spark.sql("SELECT multi_match_pack_long(t, ps) FROM mm_in").collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable")
      || e.getMessage.toLowerCase.contains("literal"))
  }

  test("top_k_pairs_long aggregates from SQL with map-side-bounded state") {
    GraftExtensions.register(spark)
    Seq((1L, 10L), (5L, 20L), (3L, 30L), (5L, 15L))
      .toDF("v", "id").createOrReplaceTempView("tk_in")
    val arr = spark.sql(
      "SELECT top_k_pairs_long(v, id, 2) AS top FROM tk_in")
      .first().getSeq[org.apache.spark.sql.Row](0)
    // (5,15) beats (5,20) on the id tiebreaker; then (5,20); k=2 cuts (3,30)
    assert(arr.map(r => (r.getLong(0), r.getLong(1)))
      == Seq((5L, 15L), (5L, 20L)))
  }
}
