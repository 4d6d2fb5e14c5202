package graft

import org.apache.spark.sql.functions._

/** q27's scale-safe near-dup contract: the multi-table sign-LSH result
  * must be internally exact (every emitted pair carries the true cosine,
  * i.e. it is a subset of the all-pairs form — retained here, test-scoped,
  * as the recall reference), it must find genuine near-dups (planted
  * perturbed copies), and its physical plan must contain no all-pairs
  * join. */
class VectorQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val q27 = Queries.queries("q27_embed_neardup")

  test("q27 is a subset of the exact all-pairs result with identical cosines") {
    val lsh = q27(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = VectorQueries.exactNearDupPairs(spark, sfDir, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty || exact.isEmpty)
    lsh.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"LSH emitted $pair absent from exact result")
      assert(exact(pair) == cos, s"cosine drift for $pair")
    }
  }

  test("q27 finds all planted near-duplicate pairs (recall 1.0 on true near-dups)") {
    // Deterministic corpus: 50 random 64-dim vectors plus 10 lightly
    // perturbed copies of vectors 0..9 (cosine ~0.9999 — the regime a
    // real dedup pipeline targets; the testdata corpus is isotropic and
    // has no such pairs, hence the synthetic fixture).
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(50)(Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    val dups = (0 until 10).map(i => base(i).map(x => x + (rnd.nextDouble() * 2e-4 - 1e-4).toFloat))
    val all = (base ++ dups).zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    val dir = java.nio.file.Files.createTempDirectory("graft-vq").toString
    all.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = q27(spark, dir).filter(col("cos_sim") >= 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 10).map(i => (i.toLong, (50 + i).toLong)).toSet
    assert(planted.subsetOf(got), s"missed planted pairs: ${planted -- got}")
  }

  test("q27 physical plan has no all-pairs join (BNLJ / cartesian)") {
    val plan = q27(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "q27 plan contains a BNLJ")
    assert(!plan.contains("CartesianProduct"), "q27 plan contains a cartesian product")
  }
}
