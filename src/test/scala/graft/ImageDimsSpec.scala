package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.plans.ImageHeader

/** image_dims_long contracts: the header parse agrees with REAL encoder
  * output (the JDK's own javax.imageio PNG and JPEG writers, which emit
  * full spec files — chunk layout, APP segments, fill bytes and all),
  * with the synthetic minimal payloads queries fabricate, and returns
  * null (never throws) on every malformed shape. */
class ImageDimsSpec extends SparkSpec {
  import spark.implicits._

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h,
      if (fmt == "jpg" || fmt == "bmp") BufferedImage.TYPE_INT_RGB
      else BufferedImage.TYPE_INT_ARGB)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
    out.toByteArray
  }

  test("parses dimensions from real javax.imageio PNG/JPEG/GIF/BMP output") {
    for ((fmt, w, h) <- Seq(("png", 17, 9), ("png", 1, 1), ("png", 1920, 1080),
                            ("jpg", 17, 9), ("jpg", 1, 1), ("jpg", 1920, 1080),
                            ("gif", 17, 9), ("gif", 1, 1), ("gif", 1920, 1080),
                            ("bmp", 17, 9), ("bmp", 1, 1), ("bmp", 1920, 1080))) {
      val dims = ImageHeader.parseDims(encode(fmt, w, h))
      assert(dims >= 0L, s"$fmt ${w}x$h did not parse")
      assert(((dims >>> 32).toInt, (dims & 0xffffffffL).toInt) == (w, h),
        s"$fmt ${w}x$h parsed wrong")
    }
  }

  test("expression path (codegen'd) matches the static parse on real bytes") {
    val payloads = Seq(
      (1L, encode("png", 33, 21)), (2L, encode("jpg", 640, 480)),
      (3L, "not an image at all".getBytes("UTF-8")))
    val out = payloads.toDF("id", "payload")
      .select(col("id"), Multimodal.imageDims(col("payload")).as("dims"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == (33L << 32 | 21L))
    assert(out(1).getLong(1) == (640L << 32 | 480L))
    assert(out(2).isNullAt(1), "junk bytes must parse to NULL, not throw")
  }

  test("synthetic minimal payloads round-trip and real decoders' dims match the builders'") {
    val df = Seq((2L, 640L, 480L), (3L, 65535L, 1L), (4L, 1L, 65535L))
      .toDF("doc_id", "w", "h")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, Multimodal.pngPayload(col("w"), col("h")))
          .otherwise(Multimodal.jpegPayload(col("w"), col("h"))).as("payload"),
        col("w"), col("h"))
      .select(col("doc_id"), col("w"), col("h"),
        Multimodal.dimsWidth(Multimodal.imageDims(col("payload"))).as("pw"),
        Multimodal.dimsHeight(Multimodal.imageDims(col("payload"))).as("ph"))
    assert(df.filter(col("w") =!= col("pw") || col("h") =!= col("ph")).isEmpty,
      "builder dims must round-trip through the parser")
  }

  test("malformed inputs: null, truncated, bad marker walk — all NULL, never a throw") {
    val png = encode("png", 8, 8)
    val jpg = encode("jpg", 8, 8)
    val bad: Seq[Array[Byte]] = Seq(
      null,
      Array.emptyByteArray,
      png.take(7),                       // signature cut short
      png.take(20),                      // IHDR cut mid-width
      jpg.take(2),                       // SOI only
      jpg.take(12),                      // cut inside APP0
      Array(0xff, 0xd8, 0x00, 0x11).map(_.toByte),          // non-FF where marker due
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte),          // EOI before SOF
      Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x01).map(_.toByte)) // len < 2
    for (b <- bad) assert(ImageHeader.parseDims(b) == -1L,
      s"expected -1 for ${Option(b).map(_.length)}")
    // SQL registration works and nulls flow through
    graft.plans.GraftExtensions.register(spark)
    val out = spark.sql("SELECT image_dims_long(CAST(NULL AS BINARY)) AS d")
      .collect()
    assert(out(0).isNullAt(0))
  }

  test("decodeAll uses real header dims for images, pseudo-dims for the rest") {
    import Multimodal.{Media, MediaMeta}
    val png = encode("png", 44, 33)
    val media = Seq(
      Media(1L, png, MediaMeta("image/png", png.length.toLong, 0, 0)),
      Media(2L, "plain text".getBytes("UTF-8"), MediaMeta("text/plain", 10L, 0, 0)))
      .toDS()
    val out = Multimodal.decodeAll(media).collect().map(d => d.mediaId -> d).toMap
    assert(out(1L).width == 44 && out(1L).height == 33)
    assert(out(2L).width >= 1 && out(2L).height >= 1, "fallback stays total")
  }
}
