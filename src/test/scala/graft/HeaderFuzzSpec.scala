package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.multimodal.Multimodal
import graft.plans.{AudioHeader, BmpPixels, ImageHeader, VideoHeader}

/** Fuzz law for every binary header parser exposed to arbitrary BINARY
  * through the SQL surface (image_dims_long, audio_meta_long,
  * video_meta_long, bmp_dhash_long): on ANY byte sequence — pure
  * random, or a valid container payload with random byte mutations
  * (the adversarial band: magic bytes right, sizes/offsets lying) —
  * the parse returns a value or the -1 reject sentinel and NEVER
  * throws. This is the property form of the hand-crafted malformed
  * cases in ImageDimsSpec/AudioMetaSpec/BmpDhashSpec/VideoMetaSpec,
  * and the regression net for the round-7 ADVICE class (Int-overflow
  * stride arithmetic reachable from crafted headers). */
class HeaderFuzzSpec extends SparkSpec {

  private def pass(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val parsers: Seq[(String, Array[Byte] => Long)] = Seq(
    ("image_dims_long", ImageHeader.parseDims),
    ("audio_meta_long", AudioHeader.parseMeta),
    ("video_meta_long", VideoHeader.parseMeta),
    ("bmp_dhash_long", BmpPixels.dhash))

  private val randomBytes: Gen[Array[Byte]] =
    Gen.choose(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  /** One spec-valid payload of each container family, materialized
    * once through the engine's own builders (the Spark plan that q68/
    * q70/q199/q150 fabricate with). */
  private lazy val validPayloads: Seq[Array[Byte]] = {
    import spark.implicits._
    Seq(1).toDF("one").select(
      Multimodal.pngPayload(lit(640), lit(480)).as("png"),
      Multimodal.jpegPayload(lit(640), lit(480)).as("jpg"),
      Multimodal.wavPayload(lit(44100), lit(2)).as("wav"),
      Multimodal.mp4Payload(lit(600), lit(90000), lit(1280), lit(720)).as("mp4"),
      Multimodal.bmpPayload((x, y) => lit(x * 8 + y)).as("bmp"),
      Multimodal.mp4TwoTrackPayload(lit(600), lit(90000), lit(1280), lit(720))
        .as("mp4v2"))
      .collect().head.toSeq.map(_.asInstanceOf[Array[Byte]])
  }

  /** A valid payload with 1-8 random byte mutations — magic intact
    * often enough that the parser walks deep into sizes/offsets. */
  private lazy val mutatedPayload: Gen[Array[Byte]] = for {
    base <- Gen.oneOf(validPayloads)
    n <- Gen.choose(1, 8)
    muts <- Gen.listOfN(n, for {
      i <- Gen.choose(0, base.length - 1)
      b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield (i, b))
  } yield {
    val out = base.clone()
    muts.foreach { case (i, b) => out(i) = b }
    out
  }

  test("property: no header parser ever throws on random bytes") {
    pass(Prop.forAll(randomBytes) { b =>
      parsers.forall { case (name, f) =>
        try { f(b); true }
        catch { case e: Throwable =>
          throw new AssertionError(s"$name threw on ${b.length} random bytes", e)
        }
      }
    })
  }

  test("property: no header parser ever throws on mutated valid payloads") {
    pass(Prop.forAll(mutatedPayload) { b =>
      parsers.forall { case (name, f) =>
        try { f(b); true }
        catch { case e: Throwable =>
          throw new AssertionError(s"$name threw on a mutated payload", e)
        }
      }
    })
  }

  /** STRUCTURED mutations — the band random byte flips miss (ADVICE
    * r8: the mvhd-at-exact-buffer-end crash needed a box ending
    * precisely where the buffer does): declared-size off-by-one at
    * every 32-bit position, truncation at every prefix length, and
    * truncation with a bare 4cc re-appended at the new end. */
  private lazy val structuredMutation: Gen[Array[Byte]] = for {
    base <- Gen.oneOf(validPayloads)
    kind <- Gen.choose(0, 2)
    off <- Gen.choose(0, math.max(0, base.length - 4))
    delta <- Gen.oneOf(-1L, 1L)
    cut <- Gen.choose(0, base.length)
    cc <- Gen.oneOf("mvhd", "tkhd", "trak", "moov", "hdlr", "mdia", "fmt ")
  } yield kind match {
    case 0 => // u32 off-by-one: a box that claims one byte more/less
      val out = base.clone()
      val v = ((out(off) & 0xffL) << 24) | ((out(off + 1) & 0xffL) << 16) |
        ((out(off + 2) & 0xffL) << 8) | (out(off + 3) & 0xffL)
      val nv = v + delta
      out(off) = ((nv >> 24) & 0xff).toByte
      out(off + 1) = ((nv >> 16) & 0xff).toByte
      out(off + 2) = ((nv >> 8) & 0xff).toByte
      out(off + 3) = (nv & 0xff).toByte
      out
    case 1 => base.take(cut) // truncation anywhere, incl. mid-header
    case 2 => // a 4cc landing EXACTLY at the buffer end
      base.take(cut) ++ cc.getBytes("US-ASCII")
  }

  test("property: no header parser ever throws on structured mutations") {
    pass(Prop.forAll(structuredMutation) { b =>
      parsers.forall { case (name, f) =>
        try { f(b); true }
        catch { case e: Throwable =>
          throw new AssertionError(
            s"$name threw on a ${b.length}-byte structured mutation", e)
        }
      }
    })
  }

  test("sanity: the unmutated payloads parse in their own parser") {
    val Seq(png, jpg, wav, mp4, bmp, mp4v2) = validPayloads
    assert(ImageHeader.parseDims(png) >= 0 && ImageHeader.parseDims(jpg) >= 0)
    assert(AudioHeader.parseMeta(wav) >= 0)
    assert(VideoHeader.parseMeta(mp4) >= 0)
    assert(VideoHeader.parseMeta(mp4v2) >= 0)
    assert(BmpPixels.dhash(bmp) >= -1L) // -1 only for the degenerate hash
  }
}
