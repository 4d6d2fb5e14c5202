package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Linear multi-touch attribution — q124's kernel as a reusable
  * operator so the batch query and the streaming twin
  * ([[graft.streaming.AttributionStream]]) share one definition.
  *
  * Input: events with (user_id, tus, event_id, event_type, cents);
  * touch types attribute the NEXT purchase's cents equally (integer
  * floor shares, remainder pinned to the EARLIEST touch); conversions
  * with no touches since the previous purchase go to 'direct';
  * trailing touches with no subsequent purchase attribute nothing.
  * See q124's scaladoc for the scale argument (one reverse-cumulative
  * window per user, then (user, conv_seq)-keyed aggregates).
  */
object Attribution {

  val TouchTypes: Seq[String] = Seq("view", "click")

  /** Per-channel totals: (channel, n_attr, attr_cents). */
  def linearTotals(events: DataFrame): DataFrame = {
    val ev = events
      .filter(col("event_type").isin(TouchTypes :+ "purchase": _*))
      .filter(col("cents") >= 0L) // keeps div/floor-div engine-equal
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grp = ev.withColumn("conv_seq",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(w))
      .filter(col("conv_seq") >= 1L) // trailing touches: no conversion yet
    val convs = grp.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("conv_seq"), col("cents"))
    val touches = grp.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("conv_seq"), col("tus"),
        col("event_id"), col("event_type"))
    val tstats = touches.groupBy(col("user_id"), col("conv_seq"))
      .agg(count(lit(1)).as("n_touch"),
        min(struct(col("tus"), col("event_id"))).as("first_t"))
    val joined = convs.join(tstats, Seq("user_id", "conv_seq"), "left")
    val direct = joined.filter(col("n_touch").isNull)
      .agg(count(lit(1)).as("n_attr"),
        Exact.exactIntSum(col("cents")).cast("long").as("attr_cents"))
      .select(lit("direct").as("channel"), col("n_attr"), col("attr_cents"))
    val attributed = touches
      .join(joined.filter(col("n_touch").isNotNull)
        .select(col("user_id"), col("conv_seq"), col("cents"),
          col("n_touch"), col("first_t")),
        Seq("user_id", "conv_seq"))
      .withColumn("share",
        expr("cents div n_touch") +
          when(struct(col("tus"), col("event_id")) === col("first_t"),
            col("cents") - expr("cents div n_touch") * col("n_touch"))
            .otherwise(0L))
      .groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("n_attr"),
        Exact.exactIntSum(col("share")).cast("long").as("attr_cents"))
    attributed.unionByName(direct)
      .filter(col("n_attr") > 0L) // an empty direct bucket stays absent
  }
}
