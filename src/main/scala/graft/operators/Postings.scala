package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index postings encoding — the shared kernel behind q190's
  * batch compression audit and [[graft.streaming.PostingsStream]]'s
  * incremental index maintenance.
  *
  * Layout (the standard block-resynchronized delta scheme, e.g.
  * Lucene's doc-delta blocks): postings for a term are doc-id-sorted;
  * each [[Block]]-id block re-anchors (its first id is stored absolute,
  * +1 so the value stays positive), every later id in the block stores
  * the gap to its predecessor, and each value costs ceil(bits/7) LEB128
  * varint bytes — expressed as an exact integer CASE chain on
  * power-of-128 thresholds (never float log2, which differs across
  * engines at boundaries).
  *
  * The SAME arithmetic exists in three forms that must never drift:
  * the Column form here (batch), the scalar form here (streaming
  * state fold), and q190's inline SQL oracle — all three derive their
  * thresholds from [[LebThresholds]] / the 128-id block constant.
  *
  * Scale shape: the (term, block) window partitions hold at most
  * [[Block]] rows even for a stopword whose df is the corpus size —
  * block re-anchoring is exactly what kills the giant-partition window
  * a naive per-term lag would create.
  */
object Postings {

  /** Postings per re-anchor block (Lucene uses 128 as well). */
  val Block = 128

  /** LEB128 byte-count thresholds: a gap below 128^k fits in k bytes.
    * The FULL 8-entry table (128^1 .. 128^8 = 2^56) so 63-bit values
    * cost their true 5-9 bytes — the 4-entry table this replaced
    * silently understated the audit once doc ids passed ~2^28
    * (ADVICE r7). The fold's else-branch (size+1 = 9 bytes) is the
    * exact cost of any value in [2^56, 2^63). All three forms (Column,
    * scalar, q190's generated oracle SQL) derive from this one Seq. */
  val LebThresholds: Seq[Long] =
    Seq.iterate(128L, 8)(_ * 128L) // 128^1 .. 128^8

  /** Column form: varint byte count of one non-negative gap value. */
  def lebBytes(gap: Column): Column =
    LebThresholds.zipWithIndex
      .foldRight(lit(LebThresholds.size + 1).cast("long")) {
        case ((limit, i), rest) => when(gap < limit, (i + 1).toLong).otherwise(rest)
      }

  /** Scalar form for the streaming fold — same thresholds, same result. */
  def lebBytesLong(gap: Long): Long = {
    val i = LebThresholds.indexWhere(gap < _)
    if (i >= 0) i + 1L else LebThresholds.size + 1L
  }

  /** Encoded size per term of a (term, docId) postings set (rows must
    * be distinct; doc ids non-negative). Output: (term, df,
    * varint_bytes). One term-keyed shuffle + the bounded (term, block)
    * delta window. */
  def encode(postings: DataFrame, term: String, doc: String): DataFrame = {
    val w = Window.partitionBy(col(term), col("blk"))
      .orderBy(col(doc).asc)
    postings
      .withColumn("blk", expr(s"$doc div $Block"))
      .withColumn("gap", coalesce(
        col(doc) - lag(col(doc), 1).over(w), col(doc) + 1L))
      .withColumn("vb", lebBytes(col("gap")))
      .groupBy(col(term))
      .agg(count(lit(1)).as("df"), sum(col("vb")).as("varint_bytes"))
  }
}
