package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Pure-JVM WAV (RIFF) header parse — the audio sibling of
  * [[ImageHeader]], straight from the public container spec (RIFF:
  * "RIFF"<size>"WAVE", then chunks of <id><size LE u32><body>; the
  * `fmt ` chunk carries channels at offset 2 (LE u16), sample rate at
  * offset 4 (LE u32), bits per sample at offset 14 (LE u16)). Chunk
  * bodies are word-aligned: an odd-sized chunk is followed by one pad
  * byte.
  */
object AudioHeader {

  /** (sampleRate << 24) | (channels << 16) | bitsPerSample, or -1 when
    * `b` is not a parseable RIFF/WAVE header. sampleRate is capped
    * into u32 by the format; real rates fit far below 2^39, so the
    * packed value is always positive. Never throws. */
  def parseMeta(b: Array[Byte]): Long = {
    if (b == null || b.length < 12) return -1L
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return -1L
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      // a declared chunk size past the buffer is malformed — and must
      // be rejected BEFORE the .toInt below, where a crafted u32 size
      // (e.g. 0x80000000) would wrap negative and walk i backwards
      if (size > b.length) return -1L
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return -1L
        val channels = le16(b, i + 10)
        val rate = le32(b, i + 12)
        val bits = le16(b, i + 22)
        // channels gets an 8-bit slot in the packed layout — a (spec-
        // valid u16) channel count past 255 would bleed into the rate
        // field and report BOTH fields silently wrong; reject instead
        if (channels <= 0 || channels > 255 || rate <= 0 || bits <= 0) return -1L
        return (rate << 24) | (channels.toLong << 16) | bits.toLong
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    -1L
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
}

/** `audio_meta_long(payload BINARY): BIGINT` —
  * (sampleRate << 24) | (channels << 16) | bits from a WAV header,
  * NULL when the payload is not parseable WAV. Native codegen'd
  * expression; the byte walk is the shared static [[AudioHeader]]
  * parse. Extract with `shiftright(v, 24)` / `(v >> 16) & 255` /
  * `v & 65535`. */
case class AudioMetaLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"audio_meta_long needs a BINARY input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = AudioHeader.parseMeta(input.asInstanceOf[Array[Byte]])
    if (v < 0L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.plans.AudioHeader.parseMeta($c);
        if (${ev.value} < 0L) { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
