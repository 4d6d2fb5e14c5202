package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Pure-JVM ISO-BMFF (MP4/MOV) header parse — the video sibling of
  * [[ImageHeader]]/[[AudioHeader]], straight from the public container
  * spec (ISO/IEC 14496-12: a file is a sequence of boxes
  * `<size BE u32><type 4cc><body>`; `moov` holds the movie header
  * `mvhd` — timescale BE u32 + duration (u32 in version 0, u64 in
  * version 1) — and one `trak` per track whose `tkhd` ends with width
  * and height as 16.16 BE fixed-point).
  *
  * Subset honestly supported (and rejected otherwise, never guessed):
  * plain u32 box sizes only — `size == 1` (64-bit largesize) and
  * `size == 0` (box-extends-to-EOF) return -1; mvhd/tkhd versions 0
  * AND 1. Track selection walks each trak's mdia/hdlr (handler_type
  * 4cc at byte 16 of the hdlr box, §8.4.3) and takes the FIRST trak
  * whose handler is 'vide' — so an audio-first MP4 reports the video
  * track's dimensions, not the audio track's 0×0; when no trak
  * carries a parseable 'vide' handler, the first trak with a tkhd
  * supplies the dimensions (the single-track fallback). Every
  * declared size is bounds-checked BEFORE use — including the
  * version byte, which needs the box to be at least 12 bytes
  * (header + version/flags) — so a crafted header can neither
  * overrun the buffer nor walk the cursor backwards (the AudioHeader
  * lesson, ADVICE r7 on BmpPixels applied from birth: all
  * size/offset arithmetic in Long).
  */
object VideoHeader {

  /** (durationMs << 26) | (width << 13) | height, or -1 when `b` is
    * not a parseable ISO-BMFF header. durationMs = (1000 * duration)
    * / timescale in integer arithmetic (floor — both engines' `//`),
    * capped at 2^37-1 ms (~4.3 years); width/height are the integer
    * parts of tkhd's 16.16 values, capped at 8191 (covers 8K). Values
    * past a cap reject the payload rather than silently truncate
    * (the AudioHeader channels>255 discipline). Never throws. */
  def parseMeta(b: Array[Byte]): Long = {
    if (b == null || b.length < 16) return -1L
    var ts = -1L; var dur = -1L; var w = -1L; var h = -1L
    var vidFound = false // a 'vide'-handler trak already supplied w/h
    var i = 0L
    while (i + 8 <= b.length) {
      val size = be32(b, i)
      if (size < 8 || i + size > b.length) return -1L
      if (is4cc(b, i + 4, 'm', 'o', 'o', 'v')) {
        // walk moov children
        var j = i + 8
        val end = i + size
        while (j + 8 <= end) {
          val cs = be32(b, j)
          if (cs < 8 || j + cs > end) return -1L
          if (is4cc(b, j + 4, 'm', 'v', 'h', 'd')) {
            if (cs < 12) return -1L // version byte needs a full header
            val ver = b((j + 8).toInt) & 0xff
            if (ver == 0) {
              if (cs < 28) return -1L
              ts = be32(b, j + 20); dur = be32(b, j + 24)
            } else if (ver == 1) {
              if (cs < 40) return -1L
              ts = be32(b, j + 28); dur = be64(b, j + 32)
            } else return -1L
          } else if (is4cc(b, j + 4, 't', 'r', 'a', 'k') && !vidFound) {
            // this trak's tkhd dims + whether its mdia/hdlr says 'vide'
            var tw = -1L; var th = -1L; var isVide = false
            var k = j + 8
            val tend = j + cs
            while (k + 8 <= tend) {
              val ks = be32(b, k)
              if (ks < 8 || k + ks > tend) return -1L
              if (is4cc(b, k + 4, 't', 'k', 'h', 'd') && tw < 0) {
                if (ks < 12) return -1L // version byte needs a full header
                val ver = b((k + 8).toInt) & 0xff
                val (wOff, hOff) =
                  if (ver == 0) (84L, 88L)
                  else if (ver == 1) (96L, 100L)
                  else return -1L
                if (ks < hOff + 4) return -1L
                tw = be32(b, k + wOff) >> 16 // 16.16 integer part
                th = be32(b, k + hOff) >> 16
              } else if (is4cc(b, k + 4, 'm', 'd', 'i', 'a') && !isVide) {
                // hdlr: handler_type 4cc at byte 16 of the box (§8.4.3);
                // a box too short to hold it is simply not a handler
                var m = k + 8
                val mend = k + ks
                while (m + 8 <= mend && !isVide) {
                  val ms = be32(b, m)
                  if (ms < 8 || m + ms > mend) return -1L
                  if (is4cc(b, m + 4, 'h', 'd', 'l', 'r') && ms >= 20 &&
                      is4cc(b, m + 16, 'v', 'i', 'd', 'e')) isVide = true
                  m += ms
                }
              }
              k += ks
            }
            if (tw >= 0) {
              if (w < 0 || isVide) { w = tw; h = th }
              if (isVide) vidFound = true
            }
          }
          j += cs
        }
      }
      i += size
    }
    if (ts <= 0 || dur < 0 || w < 0 || h < 0) return -1L
    if (dur > (1L << 50)) return -1L // 1000*dur must not overflow Long
    val ms = 1000L * dur / ts
    if (ms >= (1L << 37) || w > 8191 || h > 8191) return -1L
    (ms << 26) | (w << 13) | h
  }

  private def is4cc(b: Array[Byte], off: Long, c0: Char, c1: Char,
                    c2: Char, c3: Char): Boolean = {
    val o = off.toInt
    b(o) == c0 && b(o + 1) == c1 && b(o + 2) == c2 && b(o + 3) == c3
  }

  private def be32(b: Array[Byte], off: Long): Long = {
    val o = off.toInt
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  private def be64(b: Array[Byte], off: Long): Long =
    (be32(b, off) << 32) | be32(b, off + 4)
}

/** `video_meta_long(payload BINARY): BIGINT` —
  * (durationMs << 26) | (width << 13) | height from an ISO-BMFF
  * (MP4/MOV) header, NULL when the payload is not parseable. Native
  * codegen'd expression; the byte walk is the shared static
  * [[VideoHeader]] parse. Extract with `shiftright(v, 26)` /
  * `(v >> 13) & 8191` / `v & 8191`. */
case class VideoMetaLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"video_meta_long needs a BINARY input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = VideoHeader.parseMeta(input.asInstanceOf[Array[Byte]])
    if (v < 0L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.plans.VideoHeader.parseMeta($c);
        if (${ev.value} < 0L) { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
