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

  // ---- batched training ---------------------------------------------------

  test("selectCompatible: token, member-vs-concat, and concat-vs-member clashes") {
    val cands = Seq(
      ("e", "r", 10L),  // picked
      ("o", "r", 9L),   // shares r -> skip
      ("i", "n", 8L),   // picked
      ("er", "x", 7L),  // left == concat of (e,r) -> skip
      ("x", "er", 6L),  // right == concat of (e,r) -> skip
      ("i", "i", 5L),   // shares i -> skip
      ("a", "b", 4L))   // picked
    assert(BpeTrain.selectCompatible(cands, 4) ==
      Seq(("e", "r", 10L), ("i", "n", 8L), ("a", "b", 4L)))
    // concat-vs-member: candidate whose concatenation equals a picked
    // member would let the fold re-match a just-merged token
    val c2 = Seq(("ab", "c", 9L), ("a", "b", 8L), ("x", "y", 7L))
    assert(BpeTrain.selectCompatible(c2, 3) ==
      Seq(("ab", "c", 9L), ("x", "y", 7L)))
    assert(BpeTrain.selectCompatible(Seq.empty, 3).isEmpty)
    assert(BpeTrain.selectCompatible(cands, 1) == Seq(("e", "r", 10L)))
  }

  test("batch fold == sequential single-pair folds for compatible batches") {
    // every token sequence over {a,b,c,d} up to length 6 x a set of
    // compatible batches — simultaneous and any-order-sequential
    // application must agree (the selectCompatible contract)
    val alpha = Vector("a", "b", "c", "d")
    val seqs = (0 to 6).flatMap { n =>
      (0 until math.pow(4, n).toInt).map { bits =>
        (0 until n).map(i => alpha((bits >> (2 * i)) & 3)).toVector
      }
    }
    val batches = Seq(
      Seq(("a", "b"), ("c", "d")),
      Seq(("a", "a"), ("b", "c")),
      Seq(("b", "a"), ("c", "c")))
    for (batch <- batches) {
      val gotBatch = seqs.toDF("toks")
        .select(BpeTrain.applyMergeBatch(col("toks"), batch).as("m"))
        .collect().map(_.getSeq[String](0).toVector).toSeq
      for (order <- Seq(batch, batch.reverse)) {
        val gotSeqn = order.foldLeft(seqs.toDF("toks")) { case (df, (l, r)) =>
          df.select(BpeTrain.applyMerge(col("toks"), l, r).as("toks"))
        }.collect().map(_.getSeq[String](0).toVector).toSeq
        assert(gotBatch == gotSeqn, s"batch $batch order $order")
      }
    }
  }

  test("fitBatched with p = 1 degenerates to fit, merge for merge") {
    val words = sennrich.toDF("w", "cnt")
    val batched = BpeTrain.fitBatched(words, rounds = 6, p = 1)
    val greedy = BpeTrain.fit(words, rounds = 6)
    assert(batched == greedy && greedy.nonEmpty)
  }

  test("fitBatched: global ranks contiguous, within-round pairs compatible") {
    val words = sennrich.toDF("w", "cnt")
    val ms = BpeTrain.fitBatched(words, rounds = 3, p = 3)
    assert(ms.map(_.rank) == (1 to ms.size))
    assert(ms.size > 3, "p > 1 should pick more than one pair per round")
    // re-run == deterministic
    assert(BpeTrain.fitBatched(words.repartition(5), rounds = 3, p = 3) == ms)
  }

  /** Independent driver-side replay of the BATCHED walk — the oracle's
    * selection rule stated imperatively: per round, exact pair counts,
    * rank order (count DESC, left ASC, right ASC), top-`topCap`
    * window, greedy compatible selection up to p, sequential
    * application (compatible pairs are order-independent — proven
    * above). */
  private def refFitBatched(words: Seq[(String, Long)], rounds: Int,
                            p: Int, topCap: Int)
      : Seq[(String, String, Long)] = {
    var st = words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.Buffer[(String, String, Long)]()
    var round = 0
    var dry = false
    while (round < rounds && !dry) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((toks, c) <- st; i <- 0 until toks.size - 1)
        counts((toks(i), toks(i + 1))) =
          counts.getOrElse((toks(i), toks(i + 1)), 0L) + c
      val window = counts.toSeq
        .map { case ((l, r), c) => (l, r, c) }
        .sortBy { case (l, r, c) => (-c, l, r) }
        .take(topCap)
      val picked = BpeTrain.selectCompatible(window, p)
      if (picked.isEmpty) dry = true
      else {
        out ++= picked
        for ((l, r, _) <- picked)
          st = st.map { case (toks, cnt) => (refApply(toks, l, r), cnt) }
        round += 1
      }
    }
    out.toSeq
  }

  test("topCap exhaustion: a round picking < p merges still matches the reference walk (VERDICT r10 #4)") {
    // crafted so round 1's ENTIRE top-3 window shares the token 'a':
    // selectCompatible keeps only (a,b) even though p = 3 and a
    // compatible pair (x,y) exists BEYOND the window — the window is
    // part of the algorithm contract, so training must pick 1 and
    // continue, exactly as the oracle's rank-ordered walk would
    val vocab = Seq(("ab", 10L), ("ac", 9L), ("ad", 8L), ("xy", 7L))
    val words = vocab.toDF("w", "cnt")
    val cap = 3
    val got = BpeTrain.fitBatched(words, rounds = 3, p = 3, topCap = cap)
    val want = refFitBatched(vocab, rounds = 3, p = 3, topCap = cap)
    assert(got.map(m => (m.left, m.right, m.pairCnt)) == want)
    // the edge actually fired: round 1 yielded exactly ONE merge, and
    // it is (a,b) — (x,y) was outside the window, (a,c)/(a,d) clashed
    assert(want.head == ("a", "b", 10L))
    assert(got.size < 3 * 3, "every round must have exhausted the window")
    // round 2 then sees (x,y) inside the window: it picks (a,c) (the
    // new top pair) AND (x,y) — two merges where round 1 managed one
    assert(want.slice(1, 3).map { case (l, r, _) => (l, r) } ==
      Seq(("a", "c"), ("x", "y")))
    // and the window-free run differs, proving topCap is observable
    // contract, not an optimization detail
    val uncapped = BpeTrain.fitBatched(words, rounds = 3, p = 3, topCap = 64)
    assert(uncapped.take(2).map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("x", "y")),
      "with a wide window round 1 picks both compatible pairs")
    assert(uncapped.map(m => (m.left, m.right, m.pairCnt)) ==
      refFitBatched(vocab, rounds = 3, p = 3, topCap = 64))
  }
}
