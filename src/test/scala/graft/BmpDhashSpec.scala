package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.plans.BmpPixels

/** bmp_dhash_long contracts: (1) the fabricated bmpPayload is a REAL
  * renderable BMP — javax.imageio decodes it and every pixel intensity
  * round-trips; (2) the native dhash equals the reference dHash
  * computed independently from the decoded image; (3) top-down
  * (negative-height) files parse identically; (4) every malformed
  * shape returns null, never throws. */
class BmpDhashSpec extends SparkSpec {
  import spark.implicits._

  private def pix(seed: Int)(x: Int, y: Int): Int =
    (seed * 31 + x * 7 + y * 13) % 251

  private def payloadBytes(seed: Int): Array[Byte] = {
    val df = spark.range(1).select(
      Multimodal.bmpPayload((x, y) =>
        pmod(lit(seed) * 31 + lit(x * 7 + y * 13), lit(251))).as("p"))
    df.collect()(0).getAs[Array[Byte]]("p")
  }

  private def refDhash(img: BufferedImage): Long = {
    var h = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      val p0 = img.getRaster.getSample(x, y, 0)
      val p1 = img.getRaster.getSample(x + 1, y, 0)
      if (p0 > p1) h |= 1L << (y * 8 + x)
    }
    h
  }

  test("fabricated payload is a real BMP: javax.imageio round-trips pixels") {
    val bytes = payloadBytes(seed = 5)
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "JDK BMP reader rejected the fabricated payload")
    assert(img.getWidth == 9 && img.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 9) {
      // grayscale-identity palette: decoded intensity == palette index.
      // Raster samples, not getRGB — the JDK reader recognizes the
      // gray ramp, emits TYPE_BYTE_GRAY, and getRGB would re-encode
      // the linear sample through sRGB gamma.
      assert(img.getRaster.getSample(x, y, 0) == pix(5)(x, y),
        s"pixel ($x,$y) did not round-trip")
    }
  }

  test("native dhash equals the reference dHash of the decoded image") {
    for (seed <- 0 until 8) {
      val bytes = payloadBytes(seed)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(BmpPixels.dhash(bytes) == refDhash(img), s"seed $seed")
    }
  }

  test("top-down (negative height) BMP hashes identically") {
    val up = payloadBytes(seed = 3)
    // rewrite height +8 -> -8 and flip rows into top-down order
    val down = up.clone()
    val negH = -8
    for (i <- 0 until 4) down(22 + i) = ((negH >> (8 * i)) & 0xff).toByte
    val off = 1078
    for (r <- 0 until 8; c <- 0 until 12)
      down(off + r * 12 + c) = up(off + (7 - r) * 12 + c)
    assert(BmpPixels.dhash(down) == BmpPixels.dhash(up))
  }

  test("malformed shapes give null, never throw") {
    val good = payloadBytes(seed = 1)
    val bad = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      good.take(10),              // truncated header
      good.take(1000),            // truncated pixel data
      "BMxx".getBytes,            // magic only
      { val b = good.clone(); b(28) = 24; b }, // 24-bit, not 8
      { val b = good.clone(); b(30) = 1; b },  // compressed
      { val b = good.clone(); b(18) = 4; b })  // width < 9
    for ((b, i) <- bad.zipWithIndex)
      assert(BmpPixels.dhash(b) == -1L, s"case $i")
    // the expression surfaces null
    val out = spark.createDataset(Seq(Array[Byte]('B', 'M')))
      .toDF("payload")
      .select(Multimodal.bmpDhash(col("payload")).as("h"))
      .collect()
    assert(out(0).isNullAt(0))
  }
}
