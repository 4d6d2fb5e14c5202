package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Prefix

/** Prefix.scanSums must equal the single-window global cumulative sum it
  * replaces — on unique keys, tied keys, bucket boundaries, and empty
  * buckets — and must never build a corpus-sized window partition. */
class PrefixSpec extends SparkSpec {

  private def naiveCum(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("k", "wa", "wb")
    val w = Window.orderBy(col("k")).rangeBetween(Window.unboundedPreceding, 0)
    df.withColumn("cum_wa", sum(col("wa")).over(w))
      .withColumn("cum_wb", sum(col("wb")).over(w))
      .select("k", "wa", "wb", "cum_wa", "cum_wb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
  }

  private def scanned(rows: Seq[(Long, Long, Long)], width: Long) = {
    import spark.implicits._
    Prefix.scanSums(rows.toDF("k", "wa", "wb"), "k", Seq("wa", "wb"), width)
      .select("k", "wa", "wb", "cum_wa", "cum_wb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
  }

  test("matches the global-window cumsum on scattered unique keys") {
    val rows = Seq.tabulate(200)(i => ((i * 37L) % 1000, i.toLong, 1000L - i))
      .groupBy(_._1).map(_._2.head).toSeq // unique keys
    for (width <- Seq(1L, 7L, 64L, 10000L))
      assert(scanned(rows, width) == naiveCum(rows), s"width=$width")
  }

  test("tied keys all receive the inclusive total of their tie run") {
    val rows = Seq((5L, 1L, 1L), (5L, 2L, 1L), (5L, 3L, 1L),
      (9L, 10L, 1L), (9L, 20L, 1L), (0L, 100L, 1L))
    for (width <- Seq(1L, 4L, 100L))
      assert(scanned(rows, width) == naiveCum(rows), s"width=$width")
  }

  test("keys exactly on bucket boundaries and with empty buckets between") {
    val rows = Seq(0L, 64L, 128L, 640L, 641L, 6400L).zipWithIndex
      .map { case (k, i) => (k, i + 1L, 2L * i) }
    assert(scanned(rows, 64L) == naiveCum(rows))
  }

  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s.plan)
      case o => o.children
    }
    p +: kids.flatMap(flatten)
  }

  test("every UNPARTITIONED window sits above the bucket digest aggregate") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, 1L, 1L)).toDF("k", "wa", "wb")
    val out = Prefix.scanSums(df, "k", Seq("wa", "wb"), 10L)
    out.collect() // materialize so AQE finalizes the plan
    val windows = flatten(out.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected a digest window and a per-bucket window")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val hasAgg = flatten(w.child).collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty
      assert(hasAgg, s"unpartitioned WindowExec over non-aggregated input:\n$w")
    }
  }
}
