package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch: keeps the k (hash, value) pairs with the
  * SMALLEST hashes — a deterministic bottom-k row sample (the
  * [[KmvSketchLong]] discipline extended to carry the sampled value).
  * Quantiles are then read off the sampled values: with a uniform
  * 60-bit hash keyed on a unique row id, the k kept rows are a uniform
  * sample without replacement, so the sample's p-quantile estimates the
  * population's with ±O(1/√k) rank error — and is EXACT whenever the
  * group holds ≤ k rows.
  *
  * Why not KLL/GK: their compaction results depend on the ORDER buffers
  * merge in, so two cluster layouts (or the DuckDB oracle) produce
  * different summaries. This sketch is a pure function of the input
  * SET — "k lexicographically-smallest distinct (hash, value) pairs" —
  * which is what the exact-hash correctness gate and any-layout
  * determinism require. The trade is sampling error √ instead of KLL's
  * ε-rank guarantee at equal space; at k=256 the p50 rank error is
  * ~±3%, and the q36 exact percentile remains the small-scale baseline.
  *
  * Scale shape: ≤ k 16-byte pairs of state per group per task,
  * map-side combinable, merge = bounded set-union — exchanges move
  * kilobytes. Replaces the executor-OOM shape of exact
  * `percentile()`, whose TypedImperativeAggregate buffers EVERY group
  * value.
  *
  * Caveats (documented contract): hash on a unique row key (doc id,
  * or a whole-row hash) — hashing the bare value samples DISTINCT
  * values and ignores multiplicity; full-duplicate (hash, value)
  * pairs collapse under set semantics. Null hash or value is ignored
  * (SQL aggregate semantics).
  *
  * Returns `ARRAY<STRUCT<hv BIGINT, v DOUBLE>>` sorted by (hv, v) —
  * the raw mergeable sample; [[graft.operators.QSketch]] holds the
  * column algebra (merge, quantile read-off) every consumer shares.
  */
case class QuantilePairSketch(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Double)]] {

  require(k >= 2, s"quantile sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = hash :: value :: Nil

  override def nullable: Boolean = false

  override def dataType: DataType = QuantilePairSketch.PairArrayType

  override def checkInputDataTypes(): TypeCheckResult = (hash.dataType, value.dataType) match {
    case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (h, v) => TypeCheckResult.TypeCheckFailure(
      s"quantile_pair_sketch needs (BIGINT hash, DOUBLE value), got ($h, $v)")
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Double)] =
    new java.util.TreeSet[(Long, Double)](QuantilePairSketch.PairCmp)

  override def update(
      buffer: java.util.TreeSet[(Long, Double)],
      input: InternalRow): java.util.TreeSet[(Long, Double)] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      add(buffer, (h.asInstanceOf[Long], v.asInstanceOf[Double]))
    }
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[(Long, Double)],
      other: java.util.TreeSet[(Long, Double)]): java.util.TreeSet[(Long, Double)] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  // Insert-if-competitive, same as KmvSketchLong: the buffer never
  // holds more than k pairs after add().
  private def add(buffer: java.util.TreeSet[(Long, Double)], p: (Long, Double)): Unit = {
    if (buffer.size() < k) { buffer.add(p); () }
    else if (QuantilePairSketch.PairCmp.compare(p, buffer.last()) < 0) {
      if (buffer.add(p)) { buffer.remove(buffer.last()); () }
    }
  }

  override def eval(buffer: java.util.TreeSet[(Long, Double)]): Any = {
    val out = new Array[Any](buffer.size())
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) {
      val (h, v) = it.next()
      out(i) = new GenericInternalRow(Array[Any](h, v))
      i += 1
    }
    new GenericArrayData(out) // TreeSet iterates ascending (hv, v)
  }

  override def serialize(buffer: java.util.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) {
      val (h, v) = it.next()
      bb.putLong(h)
      bb.putDouble(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buffer = createAggregationBuffer()
    var i = 0
    while (i < n) { buffer.add((bb.getLong, bb.getDouble)); i += 1 }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantilePairSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): QuantilePairSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), value = newChildren(1))

  override def prettyName: String = "quantile_pair_sketch"
}

object QuantilePairSketch {
  val PairArrayType: DataType = ArrayType(StructType(Seq(
    StructField("hv", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  /** Lexicographic (hash, value) order; Double.compare's total order
    * keeps even NaN/-0.0 inputs deterministic. Static so buffers never
    * capture the expression tree. */
  val PairCmp: java.util.Comparator[(Long, Double)] with Serializable =
    new java.util.Comparator[(Long, Double)] with Serializable {
      override def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Double.compare(a._2, b._2)
      }
    }
}
