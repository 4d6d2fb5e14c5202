package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(0.1f, -0.2f, 0.3f, 0.4f)),
    (1L, Seq(0.1f, -0.2f, 0.3f, 0.4f)),
    (2L, Seq(-0.5f, 0.5f, -0.5f, 0.5f)))

  test("ArrayDotLong (codegen) equals the built-in higher-order formulation") {
    val df = vecs.toDF("id", "v").select(col("id"), VectorOps.quantized(col("v")).as("q"))
    val both = df.select(
      VectorOps.qdot(col("q"), col("q")).as("custom"),
      aggregate(zip_with(col("q"), col("q"), (x, y) => x * y), lit(0L), (a, x) => a + x)
        .as("builtin")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("qdot matches exact BigInt arithmetic") {
    val q = vecs.map(_._2.map(x => math.round(x.toDouble * 1e6)))
    val want = q(0).zip(q(2)).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    val df = vecs.toDF("id", "v").select(col("id"), VectorOps.quantized(col("v")).as("q"))
    val got = df.filter(col("id") === 0).crossJoin(
      df.filter(col("id") === 2).select(col("q").as("q2")))
      .select(VectorOps.qdot(col("q"), col("q2"))).first().getLong(0)
    assert(BigInt(got) == want)
  }

  test("cellArgMax (codegen) equals the crossJoin + max_by formulation") {
    // seeded random corpus + centroid set; the expression must pick the
    // same cell as the relational argmax for every vector, including on
    // cosine ties (both break to the smallest cell id)
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 200L).map(i =>
      (i, Seq.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)))
    val nCents = 13
    val e = corpus.toDF("vec_id", "v")
      .select(col("vec_id"), VectorOps.quantized(col("v")).as("q"))
      .withColumn("n2", VectorOps.qnorm2(col("q")))
    val cents = e.filter(col("vec_id") < nCents)
      .select(col("vec_id").as("cell"), col("q").as("cq"))
      .withColumn("cn2", VectorOps.qnorm2(col("cq")))
    val viaMaxBy = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        VectorOps.cosine(VectorOps.qdot(col("q"), col("cq")),
          col("n2"), col("cn2")).as("cos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("cos"), -col("cell"))).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = e.crossJoin(broadcast(
        VectorOps.centroidArrays(cents, "cell", "cq")))
      .select(col("vec_id"),
        VectorOps.cellArgMax(col("q"), col("n2"),
          col("cells"), col("cqs"), col("cn2s")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr.size == 200 && viaExpr == viaMaxBy)
    // an exact tie: a vector equal to TWO duplicate centroids must take
    // the smaller cell id
    val dupCents = Seq((5L, corpus.head._2), (9L, corpus.head._2))
      .toDF("cell", "cq0")
      .select(col("cell"), VectorOps.quantized(col("cq0")).as("cq"))
    val tied = e.filter(col("vec_id") === 0L)
      .crossJoin(broadcast(VectorOps.centroidArrays(dupCents, "cell", "cq")))
      .select(VectorOps.cellArgMax(col("q"), col("n2"),
        col("cells"), col("cqs"), col("cn2s"))).first().getLong(0)
    assert(tied == 5L)
  }

  test("cellArgMax enforces the non-zero-norm contract (null, not NaN argmax)") {
    // a zero-norm query vector or any zero-norm centroid would make a
    // cosine NaN and the argmax order-dependent; the expression returns
    // null instead (ADVICE r4) — asserted through BOTH paths: the
    // codegen'd projection and the interpreted eval (after a filter
    // Catalyst may route through eval)
    val zeroQ = Seq((0L, Seq.fill(16)(0.0f)), (1L, Seq.fill(16)(0.25f)))
      .toDF("vec_id", "v")
      .select(col("vec_id"), VectorOps.quantized(col("v")).as("q"))
      .withColumn("n2", VectorOps.qnorm2(col("q")))
    val cents = Seq((3L, Seq.fill(16)(0.5f))).toDF("cell", "cq0")
      .select(col("cell"), VectorOps.quantized(col("cq0")).as("cq"))
    val got = zeroQ.crossJoin(broadcast(VectorOps.centroidArrays(cents, "cell", "cq")))
      .select(col("vec_id"), VectorOps.cellArgMax(col("q"), col("n2"),
        col("cells"), col("cqs"), col("cn2s")).as("cell"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(0L -> None, 1L -> Some(3L)))
    // zero-norm CENTROID poisons the whole set -> null for every vector
    val zeroCent = Seq((3L, Seq.fill(16)(0.5f)), (4L, Seq.fill(16)(0.0f)))
      .toDF("cell", "cq0")
      .select(col("cell"), VectorOps.quantized(col("cq0")).as("cq"))
    val got2 = zeroQ.filter(col("vec_id") === 1L)
      .crossJoin(broadcast(VectorOps.centroidArrays(zeroCent, "cell", "cq")))
      .select(VectorOps.cellArgMax(col("q"), col("n2"),
        col("cells"), col("cqs"), col("cn2s")).as("cell"))
    assert(got2.first().isNullAt(0))
    assert(got2.filter(col("cell").isNull).count() == 1)
  }

  test("cosine of identical vectors is 1.0 within fp rounding") {
    val df = vecs.toDF("id", "v").select(col("id"), VectorOps.quantized(col("v")).as("q"))
      .withColumn("n2", VectorOps.qnorm2(col("q")))
    val a = df.filter(col("id") === 0)
      .select(col("q").as("qa"), col("n2").as("na"))
    val b = df.filter(col("id") === 1)
      .select(col("q").as("qb"), col("n2").as("nb"))
    val cos = a.crossJoin(b)
      .select(VectorOps.cosine(VectorOps.qdot(col("qa"), col("qb")), col("na"), col("nb")))
      .first().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("signBucket maps sign pattern of leading dims to a stable bucket id") {
    val got = vecs.toDF("id", "v")
      .select(col("id"), VectorOps.signBucket(col("v"), bits = 4).as("b"))
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    // signs: (+,-,+,+) -> 1011 = 11 ; (-,+,-,+) -> 0101 = 5
    assert(got == Seq(11, 11, 5))
  }
}
