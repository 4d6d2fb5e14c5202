package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeepFirst is deterministic on full-duplicate keys (q05 regression)") {
    // The r1 failure: two rows share the entire key; without a total
    // order the kept row was partition-order dependent.
    val df = Seq((13685L, 318L, 1, 43.0), (13685L, 318L, 1, 10.0), (1L, 1L, 1, 7.0))
      .toDF("k1", "k2", "ln", "qty")
    def run(parts: Int) = Relational.dedupKeepFirst(
      df.repartition(parts), Seq("k1", "k2"), Seq(col("ln"), col("qty")))
      .orderBy("k1").collect().map(_.getDouble(3)).toSeq
    assert(run(1) == Seq(7.0, 10.0))
    assert(run(5) == Seq(7.0, 10.0))
  }

  test("latestPerGroup returns the row at max order columns") {
    val df = Seq((1, "2024-01-01", 5.0), (1, "2024-02-01", 7.0), (2, "2024-01-15", 9.0))
      .toDF("k", "d", "v")
    val got = Relational.latestPerGroup(df, Seq("k"), Seq(col("d"), col("v")))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getDouble(2))).toSeq
    assert(got == Seq((1, 7.0), (2, 9.0)))
  }

  test("topK applies tiebreakers") {
    val df = Seq(("b", 1.0), ("a", 1.0), ("c", 2.0)).toDF("id", "m")
    val got = Relational.topK(df, 2, "m", Seq("id")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("c", "a"))
  }

  test("saltedSumCount equals the direct groupBy aggregate") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "cold" else "hot", i * 0.01))
      .toDF("k", "v")
    val got = Relational.saltedSumCount(df, Seq("k"), "v", buckets = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = df.groupBy("k")
      .agg(count(lit(1)).as("n"), graft.functions.Exact.exactSum(col("v")).as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("saltedJoin equals the plain join on skewed keys, any partitioning") {
    // 900 of 1000 fact rows share one hot key — the shape that floods a
    // single reducer in a plain shuffle join
    val fact = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k${i % 7}", i.toLong))
      .toDF("k", "fv")
    val dim = Seq(("hot", 1L), ("k0", 2L), ("k3", 3L)).toDF("k", "dv")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val plain = canon(fact.join(dim, Seq("k")).select(col("k"), col("fv"), col("dv")))
    val salted = canon(Relational.saltedJoin(fact, dim, Seq("k"), buckets = 8)
      .select(col("k"), col("fv"), col("dv")))
    assert(salted == plain)
    // left joins keep unmatched fact rows exactly once
    val leftPlain = fact.join(dim, Seq("k"), "left").count()
    val leftSalted = Relational.saltedJoin(fact, dim, Seq("k"), 8, "left").count()
    assert(leftSalted == leftPlain)
    // deterministic under a different fact partitioning
    val again = canon(Relational.saltedJoin(fact.repartition(13), dim, Seq("k"), 8)
      .select(col("k"), col("fv"), col("dv")))
    assert(again == plain)
    // right/full outer would emit one spurious row per unmatched
    // replica — rejected, not silently wrong
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(fact, dim, Seq("k"), 8, "right")
    }
    // a pre-existing __salt column would be silently clobbered — rejected
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(fact.withColumn("__salt", lit(1L)), dim, Seq("k"), 8)
    }
  }

  test("asofJoinLatest picks the latest right row at or before each left ts") {
    val left = Seq((1L, 1, "2024-01-01 10:00:00"), (2L, 1, "2024-01-01 12:00:00"),
      (3L, 2, "2024-01-01 09:00:00"))
      .toDF("id", "k", "lts").withColumn("lts", col("lts").cast("timestamp"))
    val right = Seq((1, "2024-01-01 09:30:00", 5.0), (1, "2024-01-01 10:00:00", 7.0),
      (1, "2024-01-01 11:00:00", 9.0), (2, "2024-01-01 09:30:00", 1.0))
      .toDF("k", "rts", "v").withColumn("rts", col("rts").cast("timestamp"))
    val got = Relational.asofJoinLatest(left, right, Seq("k"), "lts", "rts")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq
    // id=1: equal-ts right row (10:00, 7.0) IS included (>= semantics);
    // id=2 sees 11:00's 9.0; id=3 has no prior purchase -> null
    assert(got == Seq((1L, Some(7.0)), (2L, Some(9.0)), (3L, None)))
  }

  test("momChange lags within each group ordered by month") {
    val df = Seq(("x", "2024-01-01", 10.0), ("x", "2024-02-01", 12.5), ("y", "2024-01-01", 1.0))
      .toDF("g", "month", "m")
    val got = Relational.momChange(df, Seq("g"), "m")
      .orderBy("g", "month").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3))).toSeq
    assert(got == Seq(None, Some(2.5), None))
  }
}
