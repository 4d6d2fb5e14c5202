package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Contracts of the integer-space fixed-iteration PageRank
  * (operators/GraphOps.pageRankInt): layout independence (the q76
  * determinism claim), approximate mass conservation under floor
  * truncation, hub-vs-leaf ordering on a known graph, and teleport-only
  * mass for nodes without in-edges.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000L

  test("star graph: hub outranks leaves; leaves tie exactly") {
    // undirected star a<->l1..l10, encoded as directed both ways
    val leaves = (1 to 10).map(i => s"l$i")
    val edges = leaves.flatMap(l => Seq(("a", l), (l, "a"))).toDF("s", "d")
    val ranks = GraphOps.pageRankInt(edges, "s", "d", iters = 3, scale = Scale)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks.size == 11)
    val hub = ranks("a")
    val leafRanks = leaves.map(ranks).distinct
    assert(leafRanks.size == 1, "symmetric leaves get the identical rank")
    assert(hub > leafRanks.head * 5, s"hub $hub vs leaf ${leafRanks.head}")
  }

  test("total mass stays ~ n * scale (floor truncation only loses ulps)") {
    val edges = (0 until 50).flatMap { i =>
      Seq((s"n$i", s"n${(i + 1) % 50}"), (s"n${(i + 1) % 50}", s"n$i"))
    }.toDF("s", "d")
    val total = GraphOps.pageRankInt(edges, "s", "d", iters = 3, scale = Scale)
      .agg(sum(col("rank"))).first().getLong(0)
    val expect = 50L * Scale
    // each node loses < 2 micro-ranks per iteration to the two floors
    assert(math.abs(total - expect) < 50L * 2L * 3L + 50L,
      s"mass $total vs $expect")
  }

  test("result is identical under any partition layout (integer arithmetic)") {
    val edges = (0 until 300).flatMap { i =>
      val a = s"v${i % 40}"; val b = s"v${(i * 7 + 3) % 40}"
      if (a == b) Nil else Seq((a, b), (b, a))
    }.toDF("s", "d")
    def run(parts: Int): Map[String, Long] =
      GraphOps.pageRankInt(edges.repartition(parts), "s", "d", iters = 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }

  test("a node with out-edges but no in-edges keeps exactly the teleport mass") {
    // directed: src -> sink, sink -> sink2, sink2 -> src makes a cycle;
    // add an extra pure-source node "x" pointing into the cycle. x has no
    // in-edges, so after iteration 1 its rank is teleport + 0.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("x", "a")).toDF("s", "d")
    val ranks = GraphOps.pageRankInt(edges, "s", "d", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("x") == (15L * Scale) / 100L)
    assert(ranks("a") > ranks("x"), "the cycle accumulates x's mass")
  }
}
