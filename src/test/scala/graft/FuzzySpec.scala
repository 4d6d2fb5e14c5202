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

  test("identical-name collapse expands pair stats exactly (closed form)") {
    // 3x "cat" + 1x "cut" in block 'c': row-level pairing would see
    // C(4,2)=6 candidate pairs — C(3,2)=3 identical (d=0) + 3x1 cross
    // (d=1) — all matching at maxDist 2. The collapsed engine must
    // reproduce those ROW-pair units from one Levenshtein evaluation.
    val r = stats(Seq((1L, "cat"), (2L, "cat"), (3L, "cat"), (4L, "cut")), 2, 100L)
    val c = r.head
    assert(c.getAs[Long]("n_rows") == 4L &&
      c.getAs[Long]("n_distinct") == 2L &&
      c.getAs[Long]("n_cand_pairs") == 6L &&
      c.getAs[Long]("n_matches") == 6L &&
      c.getAs[Int]("min_dist") == 0)
  }

  test("a duplicated name never trips the cap: cap binds on DISTINCT names") {
    // 5 copies of one string: distinct count 1 <= maxBlock 3, so the
    // block pairs up (closed form C(5,2)=10 at d=0) instead of the old
    // row-count cap excluding it — the round-6 q88 coverage fix.
    val r = stats(Seq.tabulate(5)(i => (i + 1L, "same")), 2, 3L)
    val b = r.head
    assert(!b.getAs[Boolean]("capped") &&
      b.getAs[Long]("n_cand_pairs") == 10L &&
      b.getAs[Long]("n_matches") == 10L &&
      b.getAs[Int]("min_dist") == 0)
  }

  test("hash-bit refiners keep over-cap rows participating with depth recorded") {
    // 12 distinct names share block 'n'; cap 3 forces bisection. With
    // 8 hash bits every final block must be within cap, no row is
    // excluded, and split blocks carry depth >= 1.
    val rows = Seq.tabulate(12)(i => (i + 1L, f"name$i%02d"))
    val r = Fuzzy.blockedEditStats(rows.toDF("id", "nm"), "id", "nm",
        substring(col("nm"), 1, 1), 2, 3L,
        refiners = Fuzzy.hashRefiners(8))
      .collect()
    assert(r.map(_.getAs[Long]("n_rows")).sum == 12L, "every row participates")
    assert(r.forall(!_.getAs[Boolean]("capped")))
    assert(r.forall(_.getAs[Long]("n_distinct") <= 3L))
    assert(r.exists(_.getAs[Int]("depth") >= 1))
  }

  test("token refiners split on the next token before hash bits") {
    // two families share block 'a' (first char); the second token
    // separates them semantically, so tokenHashRefiners' level 1 must
    // split by token — near-dups WITHIN a family keep matching, and
    // depth stops at 1 (no hash bits spent)
    val rows = Seq((1L, "acme corp east"), (2L, "acme corp west"),
      (3L, "acme labs east"), (4L, "acme labs west"))
    val r = Fuzzy.blockedEditStats(rows.toDF("id", "nm"), "id", "nm",
        substring(col("nm"), 1, 1), 10, 1L,
        refiners = Fuzzy.tokenHashRefiners(" ", tokens = 1, bits = 2))
      .orderBy("blk").collect()
    // level 1 splits on token 2 ("corp" vs "labs") -> 2 distinct each,
    // still over cap 1 -> one hash bit more; every row participates
    assert(r.map(_.getAs[Long]("n_rows")).sum == 4L)
    assert(r.exists(row => row.getAs[String]("blk").contains("|corp|") ||
      row.getAs[String]("blk").endsWith("|corp")))
    assert(r.forall(_.getAs[Int]("depth") >= 1))
  }

  test("refiners exhausted -> still-over-cap block is flagged, not silent") {
    // cap 1 with a single refinement bit cannot always reach cap; any
    // block still over cap is excluded from pair work but observable.
    val rows = Seq.tabulate(6)(i => (i + 1L, s"x$i"))
    val r = Fuzzy.blockedEditStats(rows.toDF("id", "nm"), "id", "nm",
        substring(col("nm"), 1, 1), 2, 1L,
        refiners = Fuzzy.hashRefiners(1))
      .collect()
    val capped = r.filter(_.getAs[Boolean]("capped"))
    assert(capped.nonEmpty, "6 names over one bit cannot all reach cap 1")
    assert(capped.forall(_.getAs[Long]("n_cand_pairs") == 0L))
    assert(r.map(_.getAs[Long]("n_rows")).sum == 6L, "capped rows still counted")
  }
}
