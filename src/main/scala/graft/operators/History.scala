package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building (SCD Type 2) from an
  * append-only change feed — the warehouse operator the reference's
  * full-replace gold sink (load.py's swap-write) deliberately skips:
  * instead of overwriting the latest state, collapse each entity's
  * attribute timeline into validity intervals ("gaps and islands").
  *
  * Shape: one row per (entity, consecutive run of equal attribute
  * values), with `valid_from` (first observation), `valid_to` (the NEXT
  * run's first observation — exclusive bound, SCD2 convention; null for
  * the current run), `last_seen` (last observation inside the run),
  * `n_obs`, and a per-entity 1-based `seq`.
  *
  * 100 TB shape: the island id is lag+running-sum over ONE window
  * partitioned by the entity key — a single hash exchange on the key and
  * one per-partition sort; the island collapse is then a groupBy
  * (entity, island) whose partial aggregation runs map-side on the
  * already-sorted stream, and the closing `lead` window is over the
  * collapsed (small: one row per run) frame. Nothing is ever global: no
  * corpus-sized single-partition window, no self-join. Skewed entities
  * cost O(their rows log their rows) locally, the AQE skew split the
  * suite already asserts (LayoutSpec) applies to the exchange.
  */
object History {

  /** Collapse `df` into SCD2 validity intervals.
    *
    * @param key      entity column name
    * @param ts       observation time column name (orderable)
    * @param tieBreak deterministic within-timestamp tiebreaker column
    * @param attr     tracked attribute column name
    */
  def scd2(df: DataFrame, key: String, ts: String, tieBreak: String,
           attr: String): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    // IS DISTINCT FROM the previous value — a null attribute starts (and
    // continues) its own island rather than gluing to neighbours.
    val changed = when(
      lag(col(attr), 1).over(byKey).eqNullSafe(col(attr)), lit(0L))
      .otherwise(lit(1L))
    val islands = df
      .withColumn("__isl",
        sum(changed).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
    val runs = islands.groupBy(col(key), col("__isl"))
      .agg(
        min(col(attr)).as(attr), // constant within an island by construction
        min(col(ts)).as("valid_from"),
        max(col(ts)).as("last_seen"),
        count(lit(1)).as("n_obs"))
    val byRun = Window.partitionBy(col(key)).orderBy(col("valid_from"), col("__isl"))
    runs
      .withColumn("seq", row_number().over(byRun).cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__isl")
  }
}
