package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles produce overlapping 3-grams; short docs produce none") {
    val got = Seq("a b c d", "x y").toDF("text")
      .select(TextOps.shingles(TextOps.tokens(col("text"))).as("sh"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq.empty))
  }

  test("jaccard: identical sets 1.0, disjoint sets 0.0") {
    val df = Seq(("a b c d", "a b c d"), ("a b c", "x y z")).toDF("t1", "t2")
    val got = df.select(TextOps.jaccard(
      TextOps.shingles(TextOps.tokens(col("t1"))),
      TextOps.shingles(TextOps.tokens(col("t2")))).as("j"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("winnowing: a shared run of gram+window-1 tokens guarantees a shared fingerprint") {
    // docs 0 and 1 share a 7-token run embedded in different contexts;
    // doc 2 is unrelated; doc 3 is too short for any window
    val docs = Seq(
      (0L, "aa bb the quick brown fox jumps over lazy cc dd"),
      (1L, "xx yy zz the quick brown fox jumps over lazy ww"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "too short for windows"))
      .toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(0L) & byDoc(1L)).nonEmpty, "shared run produced no shared fingerprint")
    assert((byDoc(0L) & byDoc(2L)).isEmpty, "unrelated docs share a fingerprint")
    assert(!byDoc.contains(3L), "sub-window doc must emit no fingerprints")
  }

  test("simhashPairs chunk-join finds exactly the brute-force pairs") {
    val docs = Seq(
      (0L, "spark makes fast tables and fast joins really fast"),
      (1L, "spark makes fast tables and fast joins really quick"), // near-dup of 0
      (2L, "completely different words about databases and streams"),
      (3L, "completely different words about databases and streams")) // exact dup of 2
      .toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
    val sigs = TextOps.simhash(tok, "doc_id", "token", "cnt")
    val got = TextOps.simhashPairs(sigs, "doc_id", maxHamming = 3)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // brute-force reference over the collected signatures
    val s = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- s.keys; b <- s.keys if a < b
      if java.lang.Long.bitCount(s(a) ^ s(b)) <= 3
    } yield (a, b)).toSeq.sorted
    assert(got == want)
    assert(want.contains((2L, 3L))) // exact dup must have hamming 0
  }

  test("chunked produces overlapping windows and a short tail, never empty") {
    val df = Seq((1L, (1 to 9).map(i => s"w$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextOps.chunked(df, "doc_id", "text", chunkSize = 4, stride = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(got.filter(_._1 == 2L) == Seq((2L, 0, "a b", 2L))) // short doc: one chunk
    val c1 = got.filter(_._1 == 1L)
    assert(c1.size == 4) // starts 0,2,4,6 — ceil((9-4)/2)+1
    assert(c1.head._3 == "w1 w2 w3 w4" && c1(1)._3 == "w3 w4 w5 w6") // 2-token overlap
    assert(c1.last._3 == "w7 w8 w9" && c1.last._4 == 3L) // short tail kept
  }

  test("chunked carry columns ride along unchanged on every chunk row") {
    val df = Seq((1L, (1 to 9).map(i => s"w$i").mkString(" "), "srcA"),
      (2L, "a b", "srcB")).toDF("doc_id", "text", "source")
    val got = graft.operators.TextOps
      .chunked(df, "doc_id", "text", chunkSize = 4, stride = 2, carry = Seq("source"))
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("chunk_idx"), r.getAs[String]("chunk"))).toSeq
    assert(got.count(_._1 == 1L) == 4)
    assert(got.filter(_._1 == 1L).forall(_._2 == "srcA"))
    assert(got.filter(_._1 == 2L) == Seq((2L, "srcB", 0, "a b")))
    // carry-free call keeps the original 4-column shape
    val plain = graft.operators.TextOps
      .chunked(df, "doc_id", "text", chunkSize = 4, stride = 2)
    assert(plain.columns.toSeq == Seq("doc_id", "chunk_idx", "chunk", "n_tokens"))
  }

  test("simhash is deterministic across partitionings") {
    val docs = Seq((0L, "a b c a b"), (1L, "z y x w v u t")).toDF("doc_id", "text")
    def sigs(parts: Int) = {
      val tok = docs.repartition(parts)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      TextOps.simhash(tok, "doc_id", "token", "cnt")
        .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    }
    assert(sigs(1) == sigs(5))
  }

  test("gramHashes: multiplicity kept, short and empty docs give empty arrays") {
    val rows = Seq("a b a b a", "a b", "a", "").toDF("text")
      .select(TextOps.gramHashes(TextOps.tokens(col("text")), 3).as("g"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(rows(0).size == 3, "5 tokens -> 3 trigrams, duplicates kept")
    assert(rows(0)(0) == rows(0)(2), "'a b a' recurs -> equal hashes")
    assert(rows(0)(0) != rows(0)(1))
    assert(rows(1).isEmpty && rows(2).isEmpty,
      "docs shorter than n must NOT fabricate grams from a descending sequence")
    assert(rows(3).isEmpty)
  }

  test("topRunLength: run maxima, singleton, and empty array") {
    val got = Seq(
      Seq(1L, 1L, 1L, 2L, 3L, 3L),
      Seq(7L),
      Seq.empty[Long],
      Seq(5L, 5L))
      .toDF("a")
      .select(TextOps.topRunLength(col("a")).as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 1L, 0L, 2L))
  }

  test("topRunLength on sorted gramHashes counts the dominant bigram") {
    val got = Seq("x y x y x y z").toDF("text")
      .select(TextOps.topRunLength(
        array_sort(TextOps.gramHashes(TextOps.tokens(col("text")), 2))).as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L), "'x y' appears 3 times in the bigram stream")
  }

  test("containmentPairs sees a template inside a larger page (Jaccard can't)") {
    // doc 1 = 6-token template; doc 2 = template + 30 tokens of page
    // chrome. Containment(1→2) = 1.0; Jaccard ≈ 4/34 — far below any
    // near-dup threshold. The asymmetric direction (2→1) must NOT fire.
    val template = "terms of service apply here now"
    val page = template + " " + (1 to 30).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, template), (2L, page), (3L, "unrelated words only three"))
      .toDF("doc_id", "text")
    val got = TextOps.containmentPairs(df, "doc_id", "text", 4, 5)
      .select("a_id", "b_id", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got == List((1L, 2L, 1.0)))
  }

  test("property: prefix-filtered containment == quadratic definition") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // small vocab forces real shingle overlap; threshold 1/2 keeps the
    // candidate space honest (big prefixes, many near-misses)
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val doc = Gen.choose(3, 12).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val r = check(Parameters.default.withMinSuccessfulTests(12),
      Prop.forAll(Gen.listOfN(8, doc)) { texts =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val got = TextOps.containmentPairs(df, "doc_id", "text", 1, 2)
          .select("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        // quadratic reference over distinct 3-shingle sets
        def sh(t: String): Set[String] =
          t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
        val sets = texts.zipWithIndex.map { case (t, i) => (i.toLong, sh(t)) }
        val want = (for {
          (ia, sa) <- sets; (ib, sb) <- sets
          if ia != ib && sa.nonEmpty && (sa & sb).size * 2 >= sa.size
        } yield (ia, ib)).toSet
        got == want
      })
    assert(r.passed, r.status.toString)
  }
}
