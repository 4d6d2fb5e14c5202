package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** BPE tokenizer training (operators/BpeTrain): the merge-apply fold
  * against an independent two-pointer reference (exhaustively over a
  * small alphabet — the overlap-run alternation is the subtle part),
  * whole-run fit against an independent driver-side trainer on the
  * classic Sennrich corpus, partition-layout invariance, and the
  * dry-corpus stop. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: textbook greedy left-to-right two-pointer
    * merge — NOT the fold formulation under test and NOT the oracle's
    * relational island/alternation rule, so agreement of all three is
    * three-way evidence for the semantics. */
  private def refApply(toks: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < toks.size) {
      if (i + 1 < toks.size && toks(i) == l && toks(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += toks(i); i += 1 }
    }
    b.result()
  }

  private def refFit(words: Seq[(String, Long)], rounds: Int)
      : Seq[(String, String, Long)] = {
    var st = words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.Buffer[(String, String, Long)]()
    var dry = false
    while (out.size < rounds && !dry) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((toks, c) <- st; i <- 0 until toks.size - 1)
        counts((toks(i), toks(i + 1))) =
          counts.getOrElse((toks(i), toks(i + 1)), 0L) + c
      if (counts.isEmpty) dry = true
      else {
        val ((l, r), c) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        st = st.map { case (toks, cnt) => (refApply(toks, l, r), cnt) }
      }
    }
    out.toSeq
  }

  test("merge fold == two-pointer reference, exhaustively over {a,b}^<=8") {
    // every token sequence over a 2-letter alphabet up to length 8 x
    // every merge pair — includes all overlap-run shapes (aaa, aaaa,
    // abab) where leftmost-alternation is easy to get wrong
    val seqs = (0 to 8).flatMap { n =>
      (0 until (1 << n)).map { bits =>
        (0 until n).map(i => if ((bits >> i & 1) == 1) "b" else "a").toVector
      }
    }
    for (l <- Seq("a", "b"); r <- Seq("a", "b")) {
      val got = seqs.toDF("toks")
        .select(BpeTrain.applyMerge(col("toks"), l, r).as("m"))
        .collect().map(_.getSeq[String](0).toVector)
      val want = seqs.map(refApply(_, l, r))
      assert(got.toSeq == want, s"merge ($l,$r)")
    }
  }

  test("overlap runs alternate leftmost-first") {
    def one(w: String, l: String, r: String): Vector[String] =
      Seq(w.map(_.toString).toVector).toDF("toks")
        .select(BpeTrain.applyMerge(col("toks"), l, r)).head
        .getSeq[String](0).toVector
    assert(one("aaaa", "a", "a") == Vector("aa", "aa"))
    assert(one("aaa", "a", "a") == Vector("aa", "a"))
    assert(one("ababa", "a", "b") == Vector("ab", "ab", "a"))
    // a merged token is strictly longer than the left side, so it can
    // never cascade within the same round
    assert(one("abb", "a", "b") == Vector("ab", "b"))
  }

  private val sennrich = Seq( // the ACL'16 example corpus
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("fit == independent driver-side trainer on the Sennrich corpus") {
    val words = sennrich.toDF("w", "cnt")
    val got = BpeTrain.fit(words, rounds = 8)
      .map(m => (m.left, m.right, m.pairCnt))
    assert(got == refFit(sennrich, 8))
    // the first rounds by hand: (e,s)=9 beats (s,t)=9 on the left-token
    // tie-break; the new 'es' token then pairs with 't' at the same 9
    assert(got.take(2) == Seq(("e", "s", 9L), ("es", "t", 9L)))
  }

  test("fit is invariant to input partitioning") {
    val a = BpeTrain.fit(sennrich.toDF("w", "cnt").repartition(7), 6)
    val b = BpeTrain.fit(sennrich.toDF("w", "cnt").coalesce(1), 6)
    assert(a == b)
  }

  test("a corpus with no adjacent pairs stops dry") {
    val words = Seq(("a", 3L), ("b", 2L)).toDF("w", "cnt")
    assert(BpeTrain.fit(words, 4).isEmpty)
  }

  test("ranks are 1-based and counts positive") {
    val ms = BpeTrain.fit(sennrich.toDF("w", "cnt"), 5)
    assert(ms.map(_.rank) == (1 to ms.size))
    assert(ms.forall(_.pairCnt > 0))
  }
}
