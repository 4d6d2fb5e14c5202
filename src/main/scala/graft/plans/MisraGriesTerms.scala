package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter candidate summary over a STRING column, as a
  * native Catalyst [[TypedImperativeAggregate]] (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS '12).
  *
  * Keeps at most k (term, count) counters. GUARANTEE: any term whose true
  * frequency exceeds N/(k+1) over the aggregated input of N term
  * instances is present in the output — regardless of partition layout or
  * merge order. The candidate SET itself may vary with merge order (only
  * the guarantee is order-free), so consumers MUST re-verify candidates
  * with an exact count pass; the verified result is then deterministic
  * and oracle-replayable (see CorpusQueries q73).
  *
  * Why this exists: exact `GROUP BY term` heavy hitters shuffle the whole
  * vocabulary — at 100 TB the distinct-term set is the shuffle. This
  * aggregate carries ≤ k counters per task, combines map-side, and the
  * follow-up exact pass touches only the ≤ k surviving candidates
  * (broadcast semi-join), so nothing vocabulary-sized ever moves.
  *
  * Returns candidates as a lexicographically sorted `ARRAY<STRING>`
  * (size ≤ k). Null inputs are ignored (SQL aggregate semantics).
  *
  * Update is amortized O(1): the decrement-all path pays one unit per
  * prior insert. Merge is O(k log k) (count sort to find the (k+1)-th
  * largest offset), bounded by k = a few hundred.
  */
case class MisraGriesTerms(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  require(k >= 1, s"Misra-Gries needs k >= 1, got $k")

  override def children: Seq[Expression] = child :: Nil

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries_terms needs a STRING input, got $other")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(
      buffer: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      val cur = buffer.get(term)
      if (cur != null) buffer.put(term, cur.longValue() + 1L)
      else if (buffer.size() < k) buffer.put(term, 1L)
      else decrementAll(buffer) // classic MG: new term vs full table
    }
    buffer
  }

  private def decrementAll(buffer: java.util.HashMap[String, java.lang.Long]): Unit = {
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.longValue() == 1L) it.remove()
      else e.setValue(e.getValue.longValue() - 1L)
    }
  }

  /** Mergeable-summaries rule: add counts, then if > k counters remain
    * subtract the (k+1)-th largest count from every counter and drop the
    * non-positive ones — the summed error stays ≤ N/(k+1) overall. */
  override def merge(
      buffer: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buffer.get(e.getKey)
      buffer.put(e.getKey,
        if (cur == null) e.getValue else cur.longValue() + e.getValue.longValue())
    }
    if (buffer.size() > k) {
      val counts = new Array[Long](buffer.size())
      var i = 0
      val vs = buffer.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next().longValue(); i += 1 }
      java.util.Arrays.sort(counts)
      val off = counts(counts.length - k - 1) // (k+1)-th largest
      val es = buffer.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue.longValue() <= off) es.remove()
        else e.setValue(e.getValue.longValue() - off)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[String, java.lang.Long]): Any = {
    val terms = new Array[String](buffer.size())
    buffer.keySet().toArray(terms)
    java.util.Arrays.sort(terms, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(terms.map(t => UTF8String.fromString(t): AnyRef))
  }

  override def serialize(buffer: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val es0 = buffer.entrySet().iterator()
    while (es0.hasNext) {
      bytes += 12 + es0.next().getKey.getBytes(StandardCharsets.UTF_8).length
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.size())
    val es = buffer.entrySet().iterator()
    while (es.hasNext) {
      val e = es.next()
      val tb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(tb.length)
      bb.put(tb)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buffer = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      buffer.put(new String(tb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTerms =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTerms =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "misra_gries_terms"
}
