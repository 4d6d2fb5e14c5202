package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Pure-JVM image header parse: width/height straight from the public
  * container specs, no native decoder.
  *
  *  - PNG (ISO/IEC 15948 §5.2-§11.2.2): 8-byte signature, then the IHDR
  *    chunk is REQUIRED first — width/height are the two big-endian
  *    u32s at byte offsets 16 and 20.
  *  - JPEG (ITU-T T.81 §B.2): SOI (FFD8) then marker segments, each
  *    FF<marker><len u16 incl. itself>; dimensions live in the first
  *    frame header SOFn (C0-CF minus C4 DHT / C8 JPG / CC DAC) as
  *    lines u16 at segment offset 3 and samples-per-line u16 at 5.
  *    Fill bytes (repeated FF) and standalone markers (TEM, RSTn) are
  *    skipped per spec.
  *  - GIF (GIF87a/89a): logical-screen little-endian u16s at 6/8.
  *  - BMP (BITMAPINFOHEADER): signed little-endian i32s at 18/22
  *    (negative height = top-down; magnitude taken).
  *
  * Shared by the interpreted and codegen'd paths of [[ImageDimsLong]]
  * (a Scala object's static forwarder is callable from generated Java)
  * and by Multimodal.decodeAll's per-partition loop.
  */
object ImageHeader {

  /** (width << 32) | height, or -1 when `b` is not a parseable
    * JPEG/PNG header. Never throws — any malformed/truncated input is
    * just "not an image" (-1). */
  def parseDims(b: Array[Byte]): Long = {
    if (b == null || b.length < 4) return -1L
    // --- GIF (GIF87a/GIF89a §17/§18: logical screen width/height,
    // little-endian u16 at offsets 6/8) ---
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') {
      if (b.length < 10 || (b(4) != '7' && b(4) != '9') || b(5) != 'a') return -1L
      val w = le16(b, 6)
      val h = le16(b, 8)
      if (w <= 0L || h <= 0L) return -1L
      return (w << 32) | h
    }
    // --- BMP (BITMAPINFOHEADER: signed little-endian i32 width at
    // offset 18, height at 22; height may be negative for top-down
    // rows — dimensions are the magnitudes) ---
    if (b(0) == 'B' && b(1) == 'M') {
      if (b.length < 26) return -1L
      val w = le32(b, 18)
      val h = math.abs(le32(b, 22))
      if (w <= 0L || h <= 0L || w > 0xffffffffL || h > 0xffffffffL) return -1L
      return (w << 32) | h
    }
    // --- PNG ---
    if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      if (b.length < 24 ||
        b(4) != 0x0d || b(5) != 0x0a || b(6) != 0x1a || b(7) != 0x0a ||
        b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return -1L
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w <= 0L || h <= 0L) return -1L
      return (w << 32) | h
    }
    // --- JPEG ---
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) return -1L
        // skip fill bytes: any number of FFs may precede a marker
        while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
        if (i + 1 >= b.length) return -1L
        val marker = b(i + 1) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // TEM / RSTn: standalone, no length field
        } else if (marker == 0xd9) {
          return -1L // EOI before any SOF: no frame header
        } else {
          if (i + 3 >= b.length) return -1L
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2) return -1L
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (len < 9 || i + 8 >= b.length) return -1L
            val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
            val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
            if (w <= 0 || h <= 0) return -1L
            return (w.toLong << 32) | h.toLong
          }
          i += 2 + len
        }
      }
      return -1L
    }
    -1L
  }

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def le16(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8)

  /** Sign-extended little-endian i32 (BMP dimensions are signed). */
  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)).toInt.toLong
}

/** `image_dims_long(payload BINARY): BIGINT` — (width << 32) | height
  * from a JPEG/PNG/GIF/BMP header, NULL when the payload is not a
  * parseable image. A native expression (not a UDF) so the parse stays inside
  * whole-stage codegen next to the rest of the projection; the byte
  * walk itself is a static call into [[ImageHeader]], shared verbatim
  * with the interpreted path. Extract with
  * `shiftright(v, 32)` / `v & 4294967295` (both codegen'd). */
case class ImageDimsLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"image_dims_long needs a BINARY input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = ImageHeader.parseDims(input.asInstanceOf[Array[Byte]])
    if (v < 0L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.plans.ImageHeader.parseDims($c);
        if (${ev.value} < 0L) { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
