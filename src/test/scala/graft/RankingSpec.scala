package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranking

class RankingSpec extends SparkSpec {
  import spark.implicits._

  // Skewed fixture: group "a" holds 80% of rows, plus a singleton group
  // and a NULL group; values interleave so every range partition sees
  // several groups.
  private def fixture() = {
    val rows = (1 to 400).map { i =>
      val g = if (i % 5 != 0) "a" else if (i % 10 == 0) "b" else null
      (g, (i * 7919) % 1000, i.toLong) // (group, value, unique tiebreaker)
    } ++ Seq(("solo", 42, 9999L))
    rows.toDF("g", "v", "id")
  }

  private def windowTruth(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v").asc_nulls_first, col("id").asc_nulls_first)
    val wn = Window.partitionBy(col("g"))
    df.select(col("g"), col("v"), col("id"),
      row_number().over(w).cast("long").as("rk"),
      count(lit(1)).over(wn).as("grp_n"))
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "v", "id", "rk", "grp_n").collect()
      .map(r => (Option(r.getString(0)), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1.getOrElse(""), t._3))
      .toSeq

  test("rankInGroup equals the window row_number on a skewed fixture") {
    val df = fixture()
    for (parts <- Seq(1, 3, 7)) {
      val got = canon(Ranking.rankInGroup(df, "g", Seq("v", "id"), numPartitions = parts))
      val want = canon(windowTruth(df))
      assert(got == want, s"mismatch at numPartitions=$parts")
    }
  }

  test("payload columns ride along correctly (the counts/corpus passes share partitions)") {
    // With non-key payload columns, column pruning would give the
    // counts pass its own (narrower) range exchange whose sampled
    // boundaries can differ from the corpus pass's — the checkpoint
    // in rankInGroup pins one set of physical partitions for both.
    // 12k rows over 7 partitions exceeds the sampler's per-partition
    // reservoir, the regime where independent samples actually diverge.
    val rows = (1 to 12000).map { i =>
      val g = if (i % 3 == 0) "x" else "y"
      (g, (i * 7919) % 5000, i.toLong, s"payload-$i" * 3)
    }
    val df = rows.toDF("g", "v", "id", "payload")
    val ranked = Ranking.rankInGroup(df, "g", Seq("v", "id"), numPartitions = 7)
    val got = ranked.select("g", "v", "id", "rk", "grp_n", "payload").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .sortBy(t => (t._1, t._3)).toSeq
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v").asc_nulls_first, col("id").asc_nulls_first)
    val want = df.select(col("g"), col("v"), col("id"),
        row_number().over(w).cast("long").as("rk"),
        count(lit(1)).over(Window.partitionBy(col("g"))).as("grp_n"), col("payload"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(got == want)
  }

  // Walk a physical plan INCLUDING through AQE wrapper nodes (adaptive
  // root, query stages, reused exchanges), which hide their subplans
  // from the regular children traversal.
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("rankInGroup never windows over the corpus (offsets only)") {
    val df = fixture()
    val ranked = Ranking.rankInGroup(df, "g", Seq("v", "id"), numPartitions = 7)
    ranked.collect() // materialize so AQE finalizes the plan
    val all = flatten(ranked.queryExecution.executedPlan)
    // every WindowExec must sit above the tiny counts aggregate — i.e.
    // its subtree contains a hash aggregate; the corpus side has none
    val windows = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected offset windows over the counts table")
    windows.foreach { w =>
      val hasAgg = flatten(w.child).collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty
      assert(hasAgg, s"WindowExec over non-aggregated (corpus-sized) input:\n$w")
    }
  }

  test("rankInGroup: both passes read ONE materialized range exchange") {
    // The range shuffle runs eagerly at checkpoint time, so the query
    // plan must show both branches scanning the SAME checkpointed RDD
    // and NO residual range exchange — the partition-agreement
    // guarantee (distinct exchanges could sample different boundaries).
    val df = fixture()
    val ranked = Ranking.rankInGroup(df, "g", Seq("v", "id"), numPartitions = 7)
    ranked.collect()
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"a residual range exchange means a pass re-partitioned independently:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"expected both passes to scan the checkpointed partitions:\n$plan")
  }

  test("ntileFromRank matches the SQL ntile on every (n, buckets) shape") {
    // n < b, n == b, n % b == 0, n % b != 0
    for ((n, b) <- Seq((3, 10), (10, 10), (40, 10), (47, 10), (1, 4), (5, 2))) {
      val df = (1 to n).map(i => (i.toLong, n.toLong)).toDF("rk", "n")
      val got = df.select(Ranking.ntileFromRank(col("rk"), col("n"), b))
        .collect().map(_.getLong(0)).toSeq
      val w = Window.orderBy(col("rk"))
      val want = df.select(ntile(b).over(w).cast("long"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == want, s"ntile mismatch at n=$n b=$b: $got vs $want")
    }
  }

  test("percentRank/cumeDist match the window forms bit-for-bit") {
    val df = fixture()
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v").asc_nulls_first, col("id").asc_nulls_first)
    val want = df.select(col("id"), percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val ranked = Ranking.rankInGroup(df, "g", Seq("v", "id"), numPartitions = 5)
    val got = ranked.select(col("id"),
        Ranking.percentRankFromRank(col("rk"), col("grp_n")).as("pr"),
        Ranking.cumeDistFromRank(col("rk"), col("grp_n")).as("cd"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == want) // exact ==, not approx: same IEEE divisions
  }
}
