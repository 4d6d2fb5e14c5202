package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.operators.{History, Skyline}

/** Warehouse-structure tier units + properties: SCD2 islands against a
  * hand-built feed (including the null-attribute and same-day-change
  * edges), skyline vs the quadratic dominance definition (ScalaCheck),
  * and the frontier-merge streaming kernel's split invariance.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  // --- SCD2 --------------------------------------------------------------

  test("scd2 collapses consecutive equal values into validity intervals") {
    // entity 1: A A B A  → 3 islands; entity 2: single row → 1 current run
    val feed = Seq(
      (1L, 10, 100L, "A"), (1L, 11, 101L, "A"),
      (1L, 12, 102L, "B"), (1L, 13, 103L, "A"),
      (2L, 10, 200L, "X"))
      .toDF("k", "d", "tb", "s")
    val out = History.scd2(feed, "k", "d", "tb", "s")
      .orderBy(col("k"), col("seq"))
      .select("k", "seq", "s", "valid_from", "valid_to", "last_seen",
        "n_obs", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4), r.getInt(5), r.getLong(6),
        r.getBoolean(7)))
      .toList
    assert(out == List(
      (1L, 1L, "A", 10, 12, 11, 2L, false),
      (1L, 2L, "B", 12, 13, 12, 1L, false),
      (1L, 3L, "A", 13, -1, 13, 1L, true),
      (2L, 1L, "X", 10, -1, 10, 1L, true)))
  }

  test("scd2: null attribute forms its own island (IS DISTINCT FROM)") {
    val feed = Seq(
      (1L, 1, 1L, Some("A")), (1L, 2, 2L, None),
      (1L, 3, 3L, None), (1L, 4, 4L, Some("A")))
      .toDF("k", "d", "tb", "s")
    val out = History.scd2(feed, "k", "d", "tb", "s")
      .orderBy(col("seq"))
      .select("seq", "s", "n_obs").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toList
    // A | null,null | A — the two nulls glue to each other, not to A
    assert(out == List(
      (1L, Some("A"), 1L), (2L, None, 2L), (3L, Some("A"), 1L)))
  }

  test("scd2: same-day status change is ordered by the tiebreaker") {
    val feed = Seq(
      (1L, 5, 1L, "A"), (1L, 5, 2L, "B"), (1L, 6, 3L, "B"))
      .toDF("k", "d", "tb", "s")
    val out = History.scd2(feed, "k", "d", "tb", "s")
      .orderBy(col("seq")).select("seq", "s", "n_obs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(out == List((1L, "A", 1L), (2L, "B", 2L)))
  }

  // --- Skyline -----------------------------------------------------------

  private def pass(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(25), p)
    assert(r.passed, r.status.toString)
  }

  /** Quadratic reference frontier: strict-dominance definition. */
  private def bruteFrontier(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filter { case (c, g) =>
      !pts.exists { case (c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.toSet

  test("property: distributed skyline == quadratic dominance frontier") {
    val pt = Gen.zip(Gen.choose(0L, 400L), Gen.choose(0L, 100L))
    pass(Prop.forAll(Gen.listOfN(120, pt), Gen.oneOf(1L, 7L, 50L, 1000L)) {
      (pts, width) =>
        val df = pts.zipWithIndex
          .map { case ((c, g), i) => (i.toLong, c, g) }.toDF("id", "c", "g")
        val got = Skyline.frontier(df, col("c"), col("g"), width)
          .select("c", "g").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        got == bruteFrontier(pts)
    })
  }

  test("property: frontier-merge kernel is split-invariant (stream == batch)") {
    val pt = Gen.zip(Gen.choose(0L, 200L), Gen.choose(0L, 50L))
    pass(Prop.forAll(Gen.listOfN(80, pt), Gen.choose(0, 80)) { (pts, cut) =>
      val (a, b) = pts.splitAt(cut)
      val once = Skyline.mergeFrontier(Nil, pts)
      val twice = Skyline.mergeFrontier(Skyline.mergeFrontier(Nil, a), b)
      once == twice && once.toSet == bruteFrontier(pts.distinct)
    })
  }

  test("skyline keeps exact-tie duplicates (neither strictly dominates)") {
    val df = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 11L, 5L))
      .toDF("id", "c", "g")
    val got = Skyline.frontier(df, col("c"), col("g"), 4L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // the 11-cost point is dominated
  }
}
