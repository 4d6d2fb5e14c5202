package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star "multimodal columns"): media
  * payloads ride as opaque BINARY columns next to a typed metadata
  * struct; decode / feature-extraction / resize / frame-sampling run
  * partition-parallel over the payload bytes.
  *
  * HEADER DECODE IS REAL: [[imageDims]] parses JPEG SOFn / PNG IHDR
  * width-height straight from the container bytes (public specs,
  * pure-JVM, codegen'd — graft.plans.ImageHeader), and [[decodeAll]]
  * uses it for any payload that IS a recognizable image. Only the
  * pixel-level decode remains faked (`fake*` functions derive
  * DETERMINISTIC pseudo-outputs from the raw bytes): full decoders
  * need native libraries absent in this build environment. The
  * surrounding plumbing — schema convention, binary column handling,
  * the `mapPartitions` batch shape, partition-parallel execution — is
  * the real production shape and is tested.
  */
object Multimodal {

  /** Media row convention: (media_id, payload BINARY, meta STRUCT). */
  final case class MediaMeta(mediaType: String, nBytes: Long, width: Int, height: Int)
  final case class Media(mediaId: Long, payload: Array[Byte], meta: MediaMeta)
  final case class Decoded(mediaId: Long, width: Int, height: Int, channels: Int,
                           checksum: String)

  /** Attach a BINARY payload column derived from a text column (the
    * testdata carries no real media; production reads `binaryFile` or
    * parquet BINARY directly). */
  def withPayload(df: DataFrame, textCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, encode(col(textCol), "UTF-8"))

  /** Typed metadata from the payload alone (real: container headers). */
  def withMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("meta", struct(
      lit("text/plain").as("media_type"),
      octet_length(col(payloadCol)).cast("long").as("n_bytes")))

  /** Deterministic pseudo feature: element i = first 28 bits of
    * md5(i || '|' || payload-as-text) scaled to [0,1). Codegen'd
    * built-ins only; the real version would be a decoder + model head.
    * `textCol` must hold the payload's exact text form so the DuckDB
    * oracle (md5 over the same bytes) matches. */
  def fakeFeature(textCol: Column, i: Int): Column =
    conv(substring(md5(concat(lit(s"$i|"), textCol)), 1, 7), 16, 10).cast("long")

  /** Scale a [[fakeFeature]] integer to the unit interval. */
  def featureValue(k: Column): Column = k.cast("double") / lit(268435456.0) // 16^7

  /** "Resize" stub: truncate the payload to its first n bytes. Real
    * plumbing: SUBSTRING over BINARY is codegen'd and partition-local. */
  def thumbnail(payload: Column, nBytes: Int): Column =
    substring(payload, 1, nBytes)

  /** "Frame sampling" stub: split the payload into fixed-size chunks and
    * keep every `stride`-th — ARRAY<BINARY> out, no shuffle. */
  def frames(payload: Column, frameBytes: Int, stride: Int = 1): Column = {
    val nFrames = ceil(octet_length(payload) / lit(frameBytes.toDouble)).cast("int")
    filter(
      transform(sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => substring(payload, i * frameBytes + 1, lit(frameBytes))),
      (f, i) => (i % stride === 0) && octet_length(f) > 0)
  }

  /** `(width << 32) | height` parsed from a JPEG/PNG payload's header,
    * NULL for anything unrecognizable — the REAL decode step, as a
    * native codegen'd expression ([[graft.plans.ImageDimsLong]]). */
  def imageDims(payload: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.ImageDimsLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(payload)))

  /** Width / height halves of an [[imageDims]] value (codegen'd). */
  def dimsWidth(dims: Column): Column = shiftright(dims, 32)
  def dimsHeight(dims: Column): Column = dims.bitwiseAND(lit(0xffffffffL))

  // --- synthetic image payloads (spec-valid headers, known dims) --------
  // Built from codegen'd builtins so tests/queries can fabricate
  // REAL container bytes at any scale without a media library; the
  // payloads are honest-to-spec headers a real decoder accepts (the
  // spec round-trips them through javax.imageio).

  private def be32(v: Column): Column = unhex(lpad(hex(v), 8, "0"))
  private def be16(v: Column): Column = unhex(lpad(hex(v), 4, "0"))

  /** Minimal spec-valid PNG prefix: signature + IHDR(width, height,
    * 8-bit RGBA). Enough container for any header parser; not a full
    * renderable file (no IDAT), which header parsing never reads. */
  def pngPayload(width: Column, height: Column): Column =
    concat(unhex(lit("89504E470D0A1A0A0000000D49484452")),
      be32(width), be32(height), unhex(lit("0806000000")))

  /** Minimal spec-valid JPEG prefix: SOI + JFIF APP0 + SOF0 frame
    * header carrying (height, width) + EOI. Dimensions are u16 —
    * callers keep width/height <= 65535 (JPEG's own ceiling). */
  def jpegPayload(width: Column, height: Column): Column =
    concat(unhex(lit("FFD8FFE000104A46494600010100000100010000")),
      unhex(lit("FFC0001108")), be16(height), be16(width),
      unhex(lit("03012200021101031101FFD9")))

  /** 64-bit perceptual difference-hash of an 8-bit uncompressed BMP's
    * top-left 9×8 window ([[graft.plans.BmpDhashLong]], codegen'd),
    * NULL for anything else. Caveat stated once here: the NULL
    * sentinel folds the one degenerate all-ones hash (every adjacent
    * pixel strictly decreasing in all 8 rows) into "not an image". */
  def bmpDhash(payload: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.BmpDhashLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(payload)))

  /** Grayscale-identity BMP palette: 256 × (B,G,R,0) entries. */
  private val bmpPaletteHex: String =
    (0 until 256).map(i => f"$i%02X$i%02X$i%02X00").mkString

  /** Spec-valid COMPLETE 9×8 8-bit grayscale BMP (BITMAPFILEHEADER +
    * 40-byte BITMAPINFOHEADER + 256-entry palette + 4-byte-aligned
    * bottom-up pixel rows — renderable by any decoder, spec-checked
    * against javax.imageio in BmpDhashSpec). Pixel (x,y) of the 12
    * stride × 8 rows is `pixel(x, y)` evaluated per row bottom-up.
    * The builder is pure codegen'd concat/hex column algebra — bytes
    * fabricated at any scale with no media library. */
  def bmpPayload(pixel: (Int, Int) => Column): Column = {
    // file: 14 (file hdr) + 40 (info hdr) + 1024 (palette) + 96 (8 rows
    // of stride 12) = 1174 bytes; data offset 14+40+1024 = 1078
    val fileHeaderHex = "424D" + "96040000" + "00000000" + "36040000"
    val infoHeaderHex = "28000000" + "09000000" + "08000000" + "0100" +
      "0800" + "00000000" + "60000000" + "00000000" + "00000000" +
      "00010000" + "00000000"
    val pixelByte = (x: Int, y: Int) =>
      unhex(lpad(hex(pixel(x, y)), 2, "0"))
    val rows = (7 to 0 by -1).flatMap { y => // bottom-up row order
      (0 until 9).map(x => pixelByte(x, y)) :+ unhex(lit("000000"))
    }
    concat(unhex(lit(fileHeaderHex + infoHeaderHex + bmpPaletteHex)) +: rows: _*)
  }

  /** `(sampleRate << 24) | (channels << 16) | bitsPerSample` parsed
    * from a WAV (RIFF) payload's fmt chunk, NULL for anything
    * unrecognizable — audio's [[imageDims]]
    * ([[graft.plans.AudioMetaLong]], codegen'd). */
  def audioMeta(payload: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.AudioMetaLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(payload)))

  /** Sample-rate / channels / bits halves of an [[audioMeta]] value. */
  def metaSampleRate(m: Column): Column = shiftright(m, 24)
  def metaChannels(m: Column): Column = shiftright(m, 16).bitwiseAND(lit(0xffL))
  def metaBits(m: Column): Column = m.bitwiseAND(lit(0xffffL))

  private def le16(v: Column): Column =
    concat(unhex(lpad(hex(v.bitwiseAND(lit(0xffL))), 2, "0")),
      unhex(lpad(hex(shiftright(v, 8).bitwiseAND(lit(0xffL))), 2, "0")))
  private def le32(v: Column): Column = concat(le16(v), le16(shiftright(v, 16)))

  /** Minimal spec-valid WAV prefix: RIFF/WAVE + a 16-byte PCM `fmt `
    * chunk with the given sample rate and channel count (16-bit). A
    * real decoder accepts the header (the spec round-trips it against
    * javax.sound.sampled's writer); no data chunk, which header
    * parsing never reads. */
  def wavPayload(sampleRate: Column, channels: Column): Column = {
    val byteRate = sampleRate * channels * 2
    concat(lit("RIFF").cast("binary"), le32(lit(36)), lit("WAVE").cast("binary"),
      lit("fmt ").cast("binary"), le32(lit(16)),
      le16(lit(1)), le16(channels), le32(sampleRate),
      le32(byteRate), le16(channels * 2), le16(lit(16)))
  }

  /** `(durationMs << 26) | (width << 13) | height` parsed from an
    * ISO-BMFF (MP4/MOV) payload's moov/mvhd + trak/tkhd boxes, NULL
    * for anything unrecognizable — video's [[imageDims]]
    * ([[graft.plans.VideoMetaLong]], codegen'd). */
  def videoMeta(payload: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.VideoMetaLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(payload)))

  /** Duration-ms / width / height fields of a [[videoMeta]] value. */
  def metaDurationMs(m: Column): Column = shiftright(m, 26)
  def metaVideoWidth(m: Column): Column = shiftright(m, 13).bitwiseAND(lit(8191L))
  def metaVideoHeight(m: Column): Column = m.bitwiseAND(lit(8191L))

  /** Minimal spec-valid ISO-BMFF (MP4) prefix: `ftyp` (isom) + `moov`
    * holding an mvhd v0 with the given movie timescale/duration and
    * one trak/tkhd v0 with the given 16.16 width/height — the box
    * layout written LITERALLY from ISO/IEC 14496-12 §8.2.2 / §8.3.2
    * (unity matrix, next_track_ID 2, track flags enabled|in_movie|
    * in_preview). Enough container for any header parser; no mdat,
    * which header parsing never reads. No JDK encoder exists for
    * ISO-BMFF (unlike PNG/JPEG/BMP/WAV), so the spec verifies the
    * parser against these literal layouts and hand-built v1 variants
    * instead of a round-trip. */
  def mp4Payload(timescale: Column, duration: Column,
                 width: Column, height: Column): Column = {
    val unityMatrix =
      "000100000000000000000000" + "000000000001000000000000" +
        "000000000000000040000000"
    val ftyp = "00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D"
    concat(
      unhex(lit(ftyp)),
      unhex(lit("000000D8" + "6D6F6F76")),              // moov (216)
      unhex(lit("0000006C" + "6D766864" + "00000000" +  // mvhd v0 (108)
        "00000000" + "00000000")),                      // creation, modification
      be32(timescale), be32(duration),
      unhex(lit("00010000" + "0100" + "0000" +          // rate, volume, reserved
        "0000000000000000" + unityMatrix +              // reserved2, matrix
        "0" * 48 + "00000002")),                        // pre_defined, next_track_ID
      unhex(lit("00000064" + "7472616B")),              // trak (100)
      unhex(lit("0000005C" + "746B6864" + "00000007" +  // tkhd v0 (92), flags 7
        "00000000" + "00000000" + "00000001" +          // creation, mod, track_ID
        "00000000")),                                   // reserved
      be32(duration),
      unhex(lit("0000000000000000" +                    // reserved
        "0000" + "0000" + "0000" + "0000" +             // layer, alt, volume, rsvd
        unityMatrix)),
      be16(width), unhex(lit("0000")),                  // width  16.16
      be16(height), unhex(lit("0000")))                 // height 16.16
  }

  /** [[mp4Payload]]'s adversarial sibling: an AUDIO-FIRST two-track
    * ISO-BMFF file — trak 1 is a sound track (tkhd dims 0×0, mdia/hdlr
    * handler_type 'soun'), trak 2 is the video track carrying the real
    * 16.16 width/height and an mdia/hdlr of 'vide'. A first-trak-wins
    * parser reports 0×0 for this file; the hdlr-walking selector must
    * report the video track's dimensions (VERDICT r8 #4). Box sizes
    * are the literal §8.3.2/§8.4.3 layouts: hdlr = 33 bytes (version/
    * flags + pre_defined + handler_type + 12 reserved + NUL name),
    * mdia = 41, trak = 141, moov = 398. */
  def mp4TwoTrackPayload(timescale: Column, duration: Column,
                         width: Column, height: Column): Column = {
    val unityMatrix =
      "000100000000000000000000" + "000000000001000000000000" +
        "000000000000000040000000"
    val ftyp = "00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D"
    def hdlr(handler4cc: String) =
      "00000021" + "68646C72" + "00000000" + "00000000" + handler4cc +
        "0" * 24 + "00"
    def mdia(handler4cc: String) = "00000029" + "6D646961" + hdlr(handler4cc)
    def tkhdHead(trackId: String) =
      "0000005C" + "746B6864" + "00000007" +              // tkhd v0 (92), flags 7
        "00000000" + "00000000" + trackId + "00000000"    // creation, mod, ID, rsvd
    val tkhdMid = "0000000000000000" +                    // reserved
      "0000" + "0000" + "0000" + "0000" + unityMatrix     // layer, alt, vol, rsvd
    concat(
      unhex(lit(ftyp)),
      unhex(lit("0000018E" + "6D6F6F76")),                // moov (398)
      unhex(lit("0000006C" + "6D766864" + "00000000" +    // mvhd v0 (108)
        "00000000" + "00000000")),                        // creation, modification
      be32(timescale), be32(duration),
      unhex(lit("00010000" + "0100" + "0000" +            // rate, volume, reserved
        "0000000000000000" + unityMatrix +                // reserved2, matrix
        "0" * 48 + "00000003")),                          // pre_defined, next_track_ID
      // trak 1 (141): the AUDIO track — tkhd dims 0x0, hdlr 'soun'
      unhex(lit("0000008D" + "7472616B" + tkhdHead("00000001"))),
      be32(duration),
      unhex(lit(tkhdMid + "00000000" + "00000000" + mdia("736F756E"))),
      // trak 2 (141): the VIDEO track — real dims, hdlr 'vide'
      unhex(lit("0000008D" + "7472616B" + tkhdHead("00000002"))),
      be32(duration),
      unhex(lit(tkhdMid)),
      be16(width), unhex(lit("0000")),                    // width  16.16
      be16(height), unhex(lit("0000")),                   // height 16.16
      unhex(lit(mdia("76696465"))))
  }

  /** Decode with the REAL batch shape: partition-parallel
    * `mapPartitions` over typed media rows, one decoder session per
    * partition. Header decode (dimensions) is REAL — ImageHeader's
    * JPEG/PNG parse — for any payload that is a recognizable image;
    * non-image payloads fall back to deterministic pseudo-dims so the
    * pipeline shape stays total. Pixel decode (channels) would need a
    * native library; a real implementation initializes it once per
    * partition right where the comment sits. */
  def decodeAll(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val decoder = NativeDecoder.open() — once per partition
      rows.map { m =>
        val bytes = m.payload
        val dims = graft.plans.ImageHeader.parseDims(bytes)
        val (w, h) =
          if (dims >= 0L) ((dims >>> 32).toInt, (dims & 0xffffffffL).toInt)
          else {
            // non-image payload: deterministic pseudo-dims from content
            val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
            ((sum % 640).toInt + 1, (bytes.length % 480) + 1)
          }
        Decoded(
          mediaId = m.mediaId,
          width = w,
          height = h,
          channels = 3,
          checksum = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString)
      }
    }
  }
}
