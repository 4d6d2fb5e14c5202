package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE encoder contracts: the greedy leftmost-lowest-rank spec on
  * hand-checked words, merge-chain depth, degenerate inputs, and the
  * codegen'd expression agreeing with the kernel (including nulls). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked segmentations follow the merge ranks") {
    // full chains collapse to one symbol
    assert(Bpe.segment("join") == Vector("join"))
    assert(Bpe.segment("spark") == Vector("spark")) // depth-4 chain
    assert(Bpe.segment("batch") == Vector("batch"))
    assert(Bpe.segment("the") == Vector("the"))
    // partial coverage stops at the fixpoint
    assert(Bpe.segment("value") == Vector("val", "ue"))
    assert(Bpe.segment("agg") == Vector("a", "gg"))
    assert(Bpe.segment("window") == Vector("w", "in", "d", "ow"))
    // no merges apply at all: stays at character symbols
    assert(Bpe.segment("big") == Vector("b", "i", "g"))
  }

  test("rank priority beats position: lowest rank merges first") {
    // "thin": pairs (t,h) rank 0, (h,i) none, (i,n) rank 2 — (t,h)
    // wins though both exist; then (i,n); no (th,in) merge exists.
    assert(Bpe.segment("thin") == Vector("th", "in"))
  }

  test("degenerate inputs") {
    assert(Bpe.countSymbols("") == 0)
    assert(Bpe.countSymbols("a") == 1)
    assert(Bpe.countSymbols("zzz") == 3) // wholly unknown chars
  }

  test("expression matches the kernel over the corpus vocabulary, null-safe") {
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
      "data", "dup", "fast", "filter", "group", "hash", "join", "key",
      "line", "merge", "order", "part", "query", "row", "scan", "slow",
      "small", "sort", "spark", "stream", "table", "the", "value",
      "vector", "window")
    val got = vocab.toDF("w")
      .select(col("w"), Bpe.countCol(col("w")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vocab.foreach { w =>
      assert(got(w) == Bpe.countSymbols(w).toLong, s"word $w")
    }
    val withNull = Seq(Some("hash"), None).toDF("w")
      .select(Bpe.countCol(col("w")).as("n")).collect()
    assert(withNull.map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
      == Set(1L, -1L), "null in -> null out")
  }

  test("segments expression matches the kernel, null-safe") {
    val vocab = Seq("spark", "thin", "batch", "zzz", "a", "grouping")
    val got = vocab.toDF("w")
      .select(col("w"), Bpe.segmentsCol(col("w")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    vocab.foreach(w => assert(got(w) == Bpe.segment(w), s"word $w"))
    val withNull = Seq(Some("spark"), None).toDF("w")
      .select(Bpe.segmentsCol(col("w")).as("s")).collect()
    assert(withNull.count(_.isNullAt(0)) == 1, "null in -> null out")
  }
}
