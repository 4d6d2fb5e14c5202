package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Pure-JVM 8-bit BMP pixel decode + 64-bit difference-hash, straight
  * from the public BITMAPFILEHEADER/BITMAPINFOHEADER spec — the pixel
  * sibling of [[ImageHeader]]'s header-only parse.
  *
  * Strictly accepts the storage class the fabricated corpus emits (and
  * the common grayscale-thumbnail class in the wild): 'BM' magic,
  * 40-byte BITMAPINFOHEADER, 8 bits per pixel (palette INDEX read as
  * intensity — correct for any grayscale-identity palette), BI_RGB
  * (uncompressed), width ≥ 9 and |height| ≥ 8. Rows are 4-byte-aligned
  * (stride = ceil(w/4)·4); positive height means bottom-up row order,
  * negative means top-down — both handled, magnitudes used.
  *
  * The hash is dHash over the TOP-LEFT 9×8 pixel window (no resampling
  * — deterministic and exactly mirrorable in SQL; real thumbnails are
  * pre-resized upstream): bit y·8+x is set iff p(x,y) > p(x+1,y).
  * Returns -1 for anything unparseable (callers surface NULL).
  */
object BmpPixels {

  def dhash(b: Array[Byte]): Long = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return -1L
    val dataOffset = le32(b, 10)
    val hdrSize = le32(b, 14)
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val planes = le16(b, 26)
    val bits = le16(b, 28)
    val compression = le32(b, 30)
    if (hdrSize != 40 || planes != 1 || bits != 8 || compression != 0)
      return -1L
    val height = math.abs(rawHeight)
    if (width < 9 || height < 8 || dataOffset < 54) return -1L
    // stride in LONG: a crafted header claiming width near 2^31 would
    // overflow (width+3) in Int to a NEGATIVE stride that passes the
    // needTo bounds check and then indexes at a negative offset —
    // an exception where the contract says "return -1 for anything
    // unparseable" (ADVICE r7). The Long math keeps the bounds check
    // honest for the whole Int width domain.
    val stride = ((width.toLong + 3L) / 4L) * 4L
    // top-left 9x8 window; bottom-up files store image row y at file
    // row (height-1-y)
    val needTo = if (rawHeight > 0) dataOffset.toLong + height.toLong * stride
                 else dataOffset.toLong + 8L * stride
    if (needTo > b.length) return -1L
    var hash = 0L
    var y = 0
    while (y < 8) {
      val fileRow = if (rawHeight > 0) height - 1 - y else y
      // needTo <= b.length <= Int.MaxValue bounds every product below,
      // so the toInt cannot truncate
      val base = (dataOffset.toLong + fileRow.toLong * stride).toInt
      var x = 0
      while (x < 8) {
        val p0 = b(base + x) & 0xff
        val p1 = b(base + x + 1) & 0xff
        if (p0 > p1) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
}

/** `bmp_dhash_long(payload BINARY): BIGINT` — 64-bit dHash of an 8-bit
  * uncompressed BMP's top-left 9×8 window, NULL when the payload is
  * not such a BMP. A native expression (not a UDF) so the decode stays
  * inside whole-stage codegen next to the banding projection; the byte
  * walk is a static call into [[BmpPixels]], shared verbatim with the
  * interpreted path. */
case class BmpDhashLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bmp_dhash_long needs a BINARY input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = BmpPixels.dhash(input.asInstanceOf[Array[Byte]])
    if (v == -1L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.plans.BmpPixels.dhash($c);
        if (${ev.value} == -1L) { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
