package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.functions.MultiMatch

/** Aho-Corasick multi-pattern matcher contracts: scan == brute force
  * on random text (all match positions, overlapping across patterns),
  * the packed long layout, border detection, and the literal-patterns
  * analysis guard on the native expression. */
class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private def pack(text: String, pats: Seq[String]): Long =
    MultiMatch.stats(UTF8String.fromString(text),
      UTF8String.fromString(pats.mkString(MultiMatch.Sep.toString)))

  private def brute(text: String, pats: Seq[String]): (Long, Long) = {
    val occ = pats.map { p =>
      var c = 0L
      var i = text.indexOf(p)
      while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) } // all positions
      c
    }
    (occ.sum, occ.count(_ > 0).toLong)
  }

  test("hand-checked: overlapping hits across patterns, nested patterns") {
    // "aba" and "bab" overlap each other in "ababab"; "ab" nests inside
    // both and ends at 3 positions
    val pats = Seq("aba", "bab", "ab")
    val (total, np) = brute("ababab", pats)
    assert((total, np) == (7L, 3L)) // aba x2, bab x2, ab x3
    assert(pack("ababab", pats) == total * MultiMatch.PackBase + np)
    assert(pack("zzz", pats) == 0L)
  }

  test("hasBorder: self-overlap detector") {
    assert(MultiMatch.hasBorder("abab")) // border "ab"
    assert(MultiMatch.hasBorder("aa"))
    assert(!MultiMatch.hasBorder("fast table"))
    assert(!MultiMatch.hasBorder("ab"))
  }

  test("property: scan == brute force on random small-alphabet text") {
    val pat = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val gen = for {
      pats <- Gen.choose(1, 8).flatMap(k => Gen.listOfN(k, pat))
        .map(_.distinct)
      text <- Gen.choose(0, 60).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    } yield (pats, text)
    val p = Prop.forAll(gen) { case (pats, text) =>
      val (total, np) = brute(text, pats)
      pack(text, pats) == total * MultiMatch.PackBase + np
    }
    val r = check(Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  test("native expression: codegen path over a DataFrame; null in, null out") {
    val df = Seq(Some("xabay"), Some("aba"), None).toDF("t")
      .select(MultiMatch.packCol(col("t"), Seq("aba", "ab")).as("pk"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    // "xabay": aba x1 + ab x1 = 2 hits, 2 patterns; "aba": same
    assert(got sameElements Array[Any](2L * MultiMatch.PackBase + 2,
      2L * MultiMatch.PackBase + 2, null))
  }

  test("non-literal pattern list is rejected at analysis") {
    val df = Seq(("abc", "ab")).toDF("t", "p")
    val bad = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.MultiMatchPackLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("t")),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("p"))))
    val e = intercept[Exception] { df.select(bad).collect() }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.toLowerCase.contains("literal"))
  }

  test("packCol guards: empty list, oversized list, separator in pattern") {
    intercept[IllegalArgumentException] {
      MultiMatch.packCol(col("t"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      MultiMatch.packCol(col("t"), (1 to 65).map("p" + _))
    }
    intercept[IllegalArgumentException] {
      MultiMatch.packCol(col("t"), Seq("a" + MultiMatch.Sep + "b"))
    }
  }
}
