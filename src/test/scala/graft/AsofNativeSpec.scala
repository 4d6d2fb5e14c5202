package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Native as-of join contracts: row-identical to the composed
  * union+window form on randomized inputs (incl. ties, unmatched keys,
  * null right keys/times), the physical plan actually contains the
  * custom exec (not a fallback), and partition-layout independence. */
class AsofNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  // Randomized but seeded: 40 keys, left-side time ties (harmless:
  // each left row matches independently), keys present on one side
  // only. Right (key, time) pairs are UNIQUE by construction — among
  // EXACT right ties the "latest" is sort-order-dependent in the
  // native exec, the composed window form, and DuckDB ASOF alike
  // (documented contract), so a determinism spec must not create them.
  private val rng = new scala.util.Random(11)
  private val leftRows: Seq[(Long, Long, Timestamp)] =
    (1L to 400L).map(i => (i, (rng.nextInt(40) + 1).toLong, ts(rng.nextInt(200).toLong)))
  private val rightRows: Seq[(Long, Timestamp, Double)] =
    (1L to 300L).map { i =>
      val k = if (i % 7 == 0) (rng.nextInt(10) + 100).toLong // right-only keys
              else (rng.nextInt(40) + 1).toLong
      (k, ts((i * 7L) % 400L), rng.nextInt(1000) / 10.0) // globally unique times
    }

  private def leftDf: DataFrame = leftRows.toDF("event_id", "k", "t")
  private def rightDf: DataFrame = rightRows.toDF("k", "rt", "v")

  private def collectSet(df: DataFrame): Set[(Long, Long, Option[Double])] =
    df.select(col("event_id"), col("k"), col("asof_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

  test("native == composed on randomized data with ties and unmatched keys") {
    val native = collectSet(Relational.asofJoinNative(
      leftDf, rightDf, Seq("k"), "t", "rt"))
    val composed = collectSet(Relational.asofJoinLatest(
      leftDf, rightDf, Seq("k"), "t", "rt"))
    assert(native.size == leftRows.size, "left outer: one row per left row")
    assert(native == composed)
    assert(native.exists(_._3.isDefined) && native.exists(_._3.isEmpty),
      "fixture must exercise both matched and unmatched rows")
  }

  test("null right keys and times match nothing (same contract as composed)") {
    val r = Seq(
      (Some(1L), Some(ts(10)), 1.0),
      (None: Option[Long], Some(ts(10)), 2.0),
      (Some(1L), None: Option[Timestamp], 3.0))
      .toDF("k", "rt", "v")
    val l = Seq((1L, 1L, ts(20)), (2L, 9L, ts(20))).toDF("event_id", "k", "t")
    val got = collectSet(Relational.asofJoinNative(l, r, Seq("k"), "t", "rt"))
    assert(got == Set((1L, 1L, Some(1.0)), (2L, 9L, None)))
  }

  test("the plan contains AsofJoinExec — no silent fallback") {
    val df = Relational.asofJoinNative(leftDf, rightDf, Seq("k"), "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected the custom exec in:\n$plan")
    assert(!plan.contains("WindowExec"),
      "the native path must not fall back to the union+window form")
  }

  test("result is partition-layout independent") {
    val a = collectSet(Relational.asofJoinNative(
      leftDf.repartition(1), rightDf.repartition(7), Seq("k"), "t", "rt"))
    val b = collectSet(Relational.asofJoinNative(
      leftDf.repartition(13), rightDf.repartition(2), Seq("k"), "t", "rt"))
    assert(a == b)
  }

  test("bucketed inputs plan with NO exchange (declared distribution pays off)") {
    val wh = java.nio.file.Files.createTempDirectory("asof-bucketed").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.operators.Layout.writeBucketed(
        leftDf, "asof_l", "k", buckets = 4, s"$wh/l")
      graft.operators.Layout.writeBucketed(
        rightDf, "asof_r", "k", buckets = 4, s"$wh/r")
      val joinedPlan = Relational.asofJoinNative(
        spark.table("asof_l"), spark.table("asof_r"), Seq("k"), "t", "rt")
        .queryExecution.executedPlan.toString
      assert(joinedPlan.contains("AsofJoin"))
      assert(!joinedPlan.contains("Exchange"),
        s"same-bucketed sides must satisfy the distribution with no shuffle:\n$joinedPlan")
      // and the result still matches the composed reference
      val native = collectSet(Relational.asofJoinNative(
        spark.table("asof_l"), spark.table("asof_r"), Seq("k"), "t", "rt"))
      val composed = collectSet(Relational.asofJoinLatest(
        leftDf, rightDf, Seq("k"), "t", "rt"))
      assert(native == composed)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS asof_l")
      spark.sql("DROP TABLE IF EXISTS asof_r")
    }
  }

  test("exact time ties match (<=, latest right in sort order wins)") {
    val l = Seq((1L, 5L, ts(10))).toDF("event_id", "k", "t")
    val r = Seq((5L, ts(10), 7.0)).toDF("k", "rt", "v")
    val got = collectSet(Relational.asofJoinNative(l, r, Seq("k"), "t", "rt"))
    assert(got == Set((1L, 5L, Some(7.0))), "tr == tl must match (<= bound)")
  }
}
