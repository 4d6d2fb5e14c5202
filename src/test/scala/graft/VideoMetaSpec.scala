package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.plans.VideoHeader

/** video_meta_long contracts: round-trip of the ISO-BMFF builder
  * payloads through the codegen'd expression, version-1 (64-bit time)
  * box parsing from hand-built spec bytes, packing-cap rejection, and
  * null-not-throw on malformed/crafted inputs. No JDK encoder exists
  * for ISO-BMFF (unlike PNG/JPEG/BMP/WAV), so the bytes under test
  * are the ISO/IEC 14496-12 §8.2.2/§8.3.2 layouts written literally —
  * the same independence the arithmetic DuckDB oracle gives q199. */
class VideoMetaSpec extends SparkSpec {
  import spark.implicits._

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)

  private def box(typ: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body

  /** Hand-built mvhd v1 (64-bit creation/modification/duration). */
  private def mvhdV1(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(ts) ++ be64(dur) ++ be32(0x00010000L) ++
      Array.fill[Byte](2 + 2 + 8 + 36 + 24 + 4)(0))

  /** Hand-built tkhd v1 (width/height at offsets 96/100). */
  private def tkhdV1(w: Long, h: Long): Array[Byte] =
    box("tkhd", Array[Byte](1, 0, 0, 7) ++ be64(0) ++ be64(0) ++
      be32(1) ++ be32(0) ++ be64(0) ++ Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++
      be32(w << 16) ++ be32(h << 16))

  private def ftyp: Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200) ++
      "isom".getBytes("US-ASCII"))

  /** Hand-built hdlr (§8.4.3): version/flags + pre_defined +
    * handler_type + 12 reserved + NUL name. */
  private def hdlr(handler: String): Array[Byte] =
    box("hdlr", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
      handler.getBytes("US-ASCII") ++ Array.fill[Byte](12)(0) ++ Array[Byte](0))

  private def trak(tkhd: Array[Byte], handler: Option[String]): Array[Byte] =
    box("trak", tkhd ++ handler.map(h => box("mdia", hdlr(h))).toSeq.flatten)

  test("builder payloads round-trip through the expression (codegen'd)") {
    val out = Seq((1L, 600L, 90000L, 640L, 360L), (2L, 90000L, 123456L, 1920L, 1080L),
      (3L, 1000L, 1L, 16L, 16L))
      .toDF("id", "ts", "dur", "w", "h")
      .select(col("id"), col("ts"), col("dur"), col("w"), col("h"),
        Multimodal.videoMeta(Multimodal.mp4Payload(
          col("ts"), col("dur"), col("w"), col("h"))).as("m"))
      .select(col("id"),
        ((Multimodal.metaDurationMs(col("m")) ===
          expr("(dur * 1000) div ts")) &&              // integer div on longs
          (Multimodal.metaVideoWidth(col("m")) === col("w")) &&
          (Multimodal.metaVideoHeight(col("m")) === col("h"))).as("ok"))
      .collect()
    assert(out.forall(_.getBoolean(1)), "builder fields must round-trip")
  }

  test("version-1 mvhd/tkhd (64-bit times) parse from literal spec bytes") {
    val moov = box("moov", mvhdV1(90000L, 9000000L) ++ box("trak", tkhdV1(3840L, 2160L)))
    val m = VideoHeader.parseMeta(ftyp ++ moov)
    assert(m >= 0L, "v1 boxes did not parse")
    assert((m >> 26) == 9000000L * 1000L / 90000L)
    assert(((m >> 13) & 8191L, m & 8191L) == ((3840L, 2160L)))
  }

  test("packing caps reject, never truncate: 8K parses, >8191 px is NULL") {
    val ok = VideoHeader.parseMeta(ftyp ++
      box("moov", mvhdV1(600, 600) ++ box("trak", tkhdV1(7680, 4320))))
    assert(ok >= 0L && ((ok >> 13) & 8191L) == 7680L)
    val over = VideoHeader.parseMeta(ftyp ++
      box("moov", mvhdV1(600, 600) ++ box("trak", tkhdV1(8192, 100))))
    assert(over == -1L, "width past the 13-bit slot must reject")
  }

  test("malformed and crafted payloads return NULL, never throw") {
    val good = ftyp ++ box("moov",
      mvhdV1(600, 600) ++ box("trak", tkhdV1(100, 100)))
    val crafted = Seq(
      Array.empty[Byte],
      "0000001466747970".grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
      good.take(40),                                  // truncated mid-moov
      be32(0) ++ "ftyp".getBytes("US-ASCII"),         // size-0 (to-EOF) unsupported
      be32(1) ++ "ftyp".getBytes("US-ASCII") ++ be64(16), // 64-bit largesize unsupported
      be32(0xffffffffL) ++ "moov".getBytes("US-ASCII"),   // size past buffer
      ftyp ++ box("moov", mvhdV1(0, 600)))            // timescale 0
    crafted.foreach { b =>
      assert(VideoHeader.parseMeta(b) == -1L,
        s"crafted ${b.length}-byte payload must reject")
    }
    assert(VideoHeader.parseMeta(good) >= 0L)
  }

  test("audio-first MP4 reports the VIDEO track's dims (hdlr selection)") {
    // trak 1 is a sound track (0x0 dims, hdlr 'soun'); trak 2 carries
    // the real dimensions under hdlr 'vide' — first-trak-wins would
    // report 0x0 (VERDICT r8 #4); the hdlr walk must pick trak 2
    val m = VideoHeader.parseMeta(ftyp ++ box("moov",
      mvhdV1(90000L, 9000000L) ++
        trak(tkhdV1(0L, 0L), Some("soun")) ++
        trak(tkhdV1(1920L, 1080L), Some("vide"))))
    assert(m >= 0L, "two-track file did not parse")
    assert(((m >> 13) & 8191L, m & 8191L) == ((1920L, 1080L)),
      "must report the video track's dims, not the audio track's 0x0")
    // selection stops at the FIRST video track: a second 'vide' trak
    // never overrides it
    val m2 = VideoHeader.parseMeta(ftyp ++ box("moov",
      mvhdV1(600L, 600L) ++
        trak(tkhdV1(0L, 0L), Some("soun")) ++
        trak(tkhdV1(640L, 360L), Some("vide")) ++
        trak(tkhdV1(3840L, 2160L), Some("vide"))))
    assert(((m2 >> 13) & 8191L, m2 & 8191L) == ((640L, 360L)))
  }

  test("builder two-track payload round-trips through the expression (codegen'd)") {
    val out = Seq((1L, 600L, 90000L, 640L, 360L), (2L, 90000L, 123456L, 1920L, 1080L))
      .toDF("id", "ts", "dur", "w", "h")
      .select(col("id"), col("ts"), col("dur"), col("w"), col("h"),
        Multimodal.videoMeta(Multimodal.mp4TwoTrackPayload(
          col("ts"), col("dur"), col("w"), col("h"))).as("m"))
      .select(col("id"),
        ((Multimodal.metaDurationMs(col("m")) ===
          expr("(dur * 1000) div ts")) &&
          (Multimodal.metaVideoWidth(col("m")) === col("w")) &&
          (Multimodal.metaVideoHeight(col("m")) === col("h"))).as("ok"))
      .collect()
    assert(out.forall(_.getBoolean(1)),
      "two-track builder fields must round-trip to the VIDEO track's values")
  }

  test("no parseable 'vide' handler: first trak with a tkhd is the fallback") {
    // no hdlr anywhere (the q199 fixture shape): first trak wins
    val m = VideoHeader.parseMeta(ftyp ++ box("moov",
      mvhdV1(600L, 600L) ++
        trak(tkhdV1(100L, 50L), None) ++
        trak(tkhdV1(640L, 360L), None)))
    assert(((m >> 13) & 8191L, m & 8191L) == ((100L, 50L)))
    // explicit non-video handlers only: still the first-trak fallback
    val m2 = VideoHeader.parseMeta(ftyp ++ box("moov",
      mvhdV1(600L, 600L) ++
        trak(tkhdV1(7L, 9L), Some("soun")) ++
        trak(tkhdV1(640L, 360L), Some("text"))))
    assert(((m2 >> 13) & 8191L, m2 & 8191L) == ((7L, 9L)))
  }

  test("boundary boxes at exact buffer end reject, never throw (ADVICE r8)") {
    // an 8-byte mvhd whose version byte would sit AT the buffer end —
    // the exact payload that used to throw ArrayIndexOutOfBounds
    assert(VideoHeader.parseMeta(box("moov", box("mvhd", Array.empty))) == -1L)
    // the tkhd analog: 8-byte tkhd at the very end of the buffer
    assert(VideoHeader.parseMeta(box("moov",
      mvhdV1(600L, 600L) ++ box("trak", box("tkhd", Array.empty)))) == -1L)
    // 9..11-byte boxes (header present, version byte inside but flags
    // truncated) are also rejected by the cs >= 12 guard
    (1 to 3).foreach { n =>
      assert(VideoHeader.parseMeta(box("moov",
        box("mvhd", Array.fill[Byte](n)(0)))) == -1L)
      assert(VideoHeader.parseMeta(box("moov", mvhdV1(600L, 600L) ++
        box("trak", box("tkhd", Array.fill[Byte](n)(0))))) == -1L)
    }
    // an 8-byte hdlr (too short for a handler_type) is not a video
    // handler but must not reject the file either
    val m = VideoHeader.parseMeta(ftyp ++ box("moov", mvhdV1(600L, 600L) ++
      box("trak", tkhdV1(640L, 360L) ++ box("mdia", box("hdlr", Array.empty)))))
    assert(((m >> 13) & 8191L, m & 8191L) == ((640L, 360L)))
  }

  test("SQL surface: video_meta_long registered") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT video_meta_long(CAST(NULL AS BINARY)) AS m").collect()
    assert(r.head.isNullAt(0))
  }
}
