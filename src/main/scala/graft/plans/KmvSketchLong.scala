package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV ("k minimum values") distinct-count sketch over a BIGINT hash
  * column, as a native Catalyst [[TypedImperativeAggregate]].
  *
  * Keeps the k smallest DISTINCT hash values seen per group. From the
  * k-th smallest of a uniform hash one estimates the distinct count as
  * `(k-1) / normalized(kth)` (Bar-Yossef et al., RANDOM '02 — the
  * classic bottom-k estimator, ±1/√k relative error).
  *
  * Why this exists: exact `COUNT(DISTINCT token)` over a 100 TB corpus
  * shuffles every distinct (group, token-hash) pair — the distinct set
  * IS the shuffle. This aggregate carries at most k longs per group
  * per task (k=256 ⇒ 2 KB), combines map-side like any partial
  * aggregate, and its merge is a bounded set-union. The result is
  * order- and partition-independent — `k smallest distinct values` is
  * a pure function of the input SET — so the estimate is deterministic
  * on any cluster layout and reproducible in the DuckDB oracle (q58
  * sorts the same md5-derived hashes in SQL).
  *
  * Returns the kept hashes as a sorted ASC `ARRAY<BIGINT>` (size ≤ k):
  * callers derive `kth = element_at(arr, -1)`, `n = size(arr)`, and the
  * estimate, keeping this operator a reusable sketch rather than a
  * baked-in formula. Null inputs are ignored (SQL aggregate semantics).
  */
case class KmvSketchLong(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def children: Seq[Expression] = child :: Nil

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch_long needs a BIGINT input, got $other")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next().longValue())
    buffer
  }

  // Insert-if-competitive: only grows past k transiently, then trims the
  // largest — the buffer never holds more than k values after add().
  private def add(buffer: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buffer.size() < k) { buffer.add(v); () }
    else if (v < buffer.last().longValue()) {
      if (buffer.add(v)) { buffer.remove(buffer.last()); () }
    }
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size())
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending — already sorted
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buffer = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buffer.add(bb.getLong); i += 1 }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchLong =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchLong =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_sketch_long"
}
