package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.KmvSketchLong

/** The KMV bottom-k sketch column algebra — ONE home for the hash
  * keying, the aggregate, the set-union merge, and the estimator, so
  * every consumer (q58/q61, Profile/ProfileStream, VocabStream) shares
  * them by construction and the cross-module comparability contracts
  * ("streamed sketches compare against the batch query") cannot drift.
  *
  * All DuckDB oracles mirror these exact formulas; change them only
  * together with every oracle CTE.
  */
object Kmv {

  /** The hash domain: 15 hex chars = 60 bits, so kth/2^60 is the
    * uniform normalization the estimator divides by. */
  val TwoPow60: Double = 1152921504606846976.0

  /** md5-derived 60-bit hash of any string column — identical in
    * DuckDB as `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The bottom-k aggregate over a BIGINT hash column. Keep the input
    * a BARE column reference — TypedImperativeAggregate evaluates its
    * child interpreted per row (see plans/KmvSketchLong). */
  def sketch(hv: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchLong(ColumnBridge.expression(hv), k).toAggregateExpression())

  /** Bottom-k of the union of two sketches (either nullable) — the
    * set-union homomorphism that makes sketches mergeable/streamable. */
  def mergeArrays(a: Column, b: Column, k: Int): Column = {
    val empty = array().cast("array<bigint>")
    slice(array_sort(array_distinct(concat(
      coalesce(a, empty), coalesce(b, empty)))), 1, k)
  }

  /** The bottom-k estimator (Bar-Yossef et al., RANDOM '02): exact
    * below k, (k-1)/normalized(kth) at k. */
  def estimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TwoPow60) /
        element_at(kmv, -1).cast("double"))

  /** Per-source vocabulary sketch over a documents frame:
    * (source, n_tokens, kmv). The single tokenize→hash→sketch
    * construction behind q58/q61 and VocabStream. */
  def sourceVocabSketch(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
      .select(col("source"), hash60(col("term")).as("hv"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"), sketch(col("hv"), k).as("kmv"))
}
