package graft

import graft.operators.Fuzzy
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: Seq[(Long, String)], maxDist: Int, maxBlock: Long) =
    Fuzzy.blockedEditStats(rows.toDF("id", "nm"), "id", "nm",
        substring(col("nm"), 1, 1), maxDist, maxBlock)
      .orderBy("blk").collect()

  test("matches within a block, none across blocks") {
    // "cat"~"cut" (dist 1) share block 'c'; "dog" is alone in 'd';
    // "cat"~"dog" never compared (different blocks) even though dist 3
    val r = stats(Seq((1L, "cat"), (2L, "cut"), (3L, "dog")), 2, 100L)
    assert(r.length == 2)
    val c = r.head
    assert(c.getAs[Long]("n_cand_pairs") == 1L &&
      c.getAs[Long]("n_matches") == 1L && c.getAs[Int]("min_dist") == 1)
    val d = r.last
    assert(d.getAs[Long]("n_cand_pairs") == 0L && d.getAs[Int]("min_dist") == -1)
  }

  test("length band prunes candidates before edit distance") {
    // same block 'a', lengths 2 vs 6: |diff| 4 > maxDist 2 — never a
    // candidate, so n_cand_pairs must be 0 (the band is a lower bound
    // on edit distance, so no true match is lost)
    val r = stats(Seq((1L, "ab"), (2L, "abcdef")), 2, 100L)
    assert(r.length == 1 && r.head.getAs[Long]("n_cand_pairs") == 0L)
  }

  test("over-cap blocks are excluded from pair work and flagged, not silent") {
    val hot = (1L to 5L).map(i => (i, s"aaa$i")) // block 'a', 5 rows
    val r = stats(hot :+ (9L -> "bz"), 2, maxBlock = 4L)
    val a = r.head
    assert(a.getAs[Boolean]("capped") &&
      a.getAs[Long]("n_rows") == 5L &&
      a.getAs[Long]("n_cand_pairs") == 0L &&
      a.getAs[Long]("n_matches") == 0L)
    assert(!r.last.getAs[Boolean]("capped"))
  }

  test("thresholded levenshtein agrees with the unthresholded distance") {
    // above-threshold pairs count as candidates but never as matches
    val r = stats(Seq((1L, "abcdef"), (2L, "axxxef")), 2, 100L)
    assert(r.head.getAs[Long]("n_cand_pairs") == 1L &&
      r.head.getAs[Long]("n_matches") == 0L &&
      r.head.getAs[Int]("min_dist") == -1)
  }
}
