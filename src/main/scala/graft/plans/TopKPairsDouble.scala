package graft.plans

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** [[TopKPairsLong]] with a DOUBLE-valued rank key: keeps the k best
  * (value, id) pairs under (value DESC, id ASC) — the shape of the
  * serving probes' final top-k, which ranks candidates by an exact
  * COSINE (a correctly-rounded double computed from integer operands,
  * so deterministic per pair).
  *
  * Why this exists (VERDICT r9 #3): the IVF / IVF-PQ / sign-hash
  * probes used to finish with `row_number().over(partitionBy(qid))` —
  * at a high query batch x nprobe·(n/k) candidates, that window's
  * per-qid partition is the serving path's widest stage. This
  * aggregate carries at most k 16-byte pairs per query per task,
  * combines MAP-SIDE, and merges as a bounded ordered union — the
  * shuffle moves queries x k pairs, not the shortlist.
  *
  * Ordering matches `desc_nulls_last` window semantics for non-null
  * values via `java.lang.Double.compare`; rows with a null value or id
  * are ignored (SQL aggregate semantics — the probes' cosines are
  * never null, so this equals the window's rank order exactly).
  * Returns a sorted ARRAY<STRUCT<v DOUBLE, id BIGINT>> (best first).
  */
case class TopKPairsDouble(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def children: Seq[Expression] = value :: id :: Nil

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_k_pairs_double needs (DOUBLE, BIGINT) inputs, got $other")
    }

  private def ord: Comparator[(Double, Long)] = TopKPairsDouble.BestFirst

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  override def update(
      buffer: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      add(buffer, (v.asInstanceOf[Double], i.asInstanceOf[Long]))
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  private def add(buffer: java.util.TreeSet[(Double, Long)], p: (Double, Long)): Unit = {
    if (buffer.size() < k) { buffer.add(p); () }
    else if (ord.compare(p, buffer.last()) < 0) {
      if (buffer.add(p)) { buffer.remove(buffer.last()); () }
    }
  }

  override def eval(buffer: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buffer.size())
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = new GenericInternalRow(Array[Any](p._1, p._2))
      i += 1
    }
    new GenericArrayData(out) // TreeSet iterates best-first by ord
  }

  override def serialize(buffer: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) { val p = it.next(); bb.putDouble(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buffer = createAggregationBuffer()
    var i = 0
    while (i < n) { buffer.add((bb.getDouble, bb.getLong)); i += 1 }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsDouble =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsDouble =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_pairs_double"
}

object TopKPairsDouble {
  object BestFirst extends Comparator[(Double, Long)] with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val byV = java.lang.Double.compare(b._1, a._1)
      if (byV != 0) byV else java.lang.Long.compare(a._2, b._2)
    }
  }
}
