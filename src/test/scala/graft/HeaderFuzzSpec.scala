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

  /** EXHAUSTIVE per-format mutation matrix (VERDICT r9 #7), applied
    * deterministically to EVERY header family — not sampled.
    * Class 1: declared-size/limb off-by-one at every byte offset (both
    * directions). Class 2: truncation at every prefix length. Class 3:
    * the format's OWN structural token (box 4cc, JPEG marker, PNG
    * chunk type, GIF introducer, RIFF chunk id) landing exactly at the
    * buffer end after any truncation. Class 4 (ISO-BMFF): every box
    * resized short AND ending exactly at the buffer end with ancestor
    * sizes rewritten consistently — the r8 mvhd crash band, which the
    * truncation classes cannot reach (an inconsistent ancestor size
    * rejects first). Every mutation runs through ALL four parsers —
    * cross-format confusion included. Mutation-tested: reintroducing
    * the r8 VideoHeader guard gap (version-byte read on a box shorter
    * than 12 bytes) fails this test at "resized box@28 to 8". */
  test("exhaustive structured-mutation matrix: all formats x all four classes") {
    // minimal spec-valid GIF89a (the one family with a parser but no
    // Column builder): header + LE u16 logical screen + trailer
    val gif: Array[Byte] =
      "GIF89a".getBytes("US-ASCII") ++
        Array[Byte](0x40, 0x01, 0xf0.toByte, 0x00, // 320 x 240 LE
          0x00, 0x00, 0x00, 0x3b)
    assert(ImageHeader.parseDims(gif) >= 0, "GIF fixture must self-parse")

    def t(s: String) = s.getBytes("US-ASCII")
    val families: Seq[(String, Array[Byte], Seq[Array[Byte]])] = {
      val Seq(png, jpg, wav, mp4, bmp, mp4v2) = validPayloads
      Seq(
        ("png", png, Seq(t("IHDR"), t("IDAT"), t("IEND"))),
        ("jpeg", jpg, Seq(Array(0xff, 0xc0).map(_.toByte),
          Array(0xff, 0xda).map(_.toByte), Array(0xff, 0xd9).map(_.toByte),
          Array(0xff.toByte))),
        ("wav", wav, Seq(t("fmt "), t("data"), t("RIFF"), t("WAVE"))),
        ("mp4", mp4, Seq(t("mvhd"), t("tkhd"), t("trak"), t("moov"),
          t("hdlr"), t("mdia"), t("ftyp"))),
        ("bmp", bmp, Seq(t("BM"))),
        ("mp4v2", mp4v2, Seq(t("mvhd"), t("hdlr"), t("mdia"))),
        ("gif", gif, Seq(Array(0x2c.toByte), Array(0x21.toByte, 0xf9.toByte),
          Array(0x3b.toByte))))
    }

    def mustNotThrow(fmt: String, what: String, b: Array[Byte]): Unit =
      parsers.foreach { case (name, f) =>
        try { f(b); () }
        catch { case e: Throwable =>
          throw new AssertionError(
            s"$name threw on $fmt $what (${b.length} bytes)", e)
        }
      }

    for ((fmt, base, tokens) <- families) {
      // class 1: u32 off-by-one at EVERY offset, both directions
      for (off <- 0 to base.length - 4; delta <- Seq(-1L, 1L)) {
        val out = base.clone()
        val v = ((out(off) & 0xffL) << 24) | ((out(off + 1) & 0xffL) << 16) |
          ((out(off + 2) & 0xffL) << 8) | (out(off + 3) & 0xffL)
        val nv = v + delta
        out(off) = ((nv >> 24) & 0xff).toByte
        out(off + 1) = ((nv >> 16) & 0xff).toByte
        out(off + 2) = ((nv >> 8) & 0xff).toByte
        out(off + 3) = (nv & 0xff).toByte
        mustNotThrow(fmt, s"u32${if (delta > 0) "+1" else "-1"}@$off", out)
      }
      // class 2: truncation at EVERY prefix length
      for (cut <- 0 to base.length)
        mustNotThrow(fmt, s"truncate@$cut", base.take(cut))
      // class 3: the format's own token at EXACTLY the buffer end,
      // after every truncation point (the r8 crash band's outer form)
      for (cut <- 0 to base.length; tok <- tokens)
        mustNotThrow(fmt, s"token@$cut", base.take(cut) ++ tok)
    }

    // class 4 (ISO-BMFF only): CONSISTENT resize-to-buffer-end — for
    // every box in the real payload, claim each short size cs and end
    // the buffer exactly at the box end, with every ANCESTOR size
    // rewritten to match. This is the exact r8 band: the boundary the
    // pure truncation classes cannot reach, because an inconsistent
    // ancestor size rejects before the parser touches the short box.
    def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def put32(b: Array[Byte], o: Int, v: Long): Unit = {
      b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
      b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
    }
    val containers = Set("moov", "trak", "mdia")
    def boxes(b: Array[Byte], from: Int, to: Int,
              anc: List[Int]): Seq[(Int, Int, List[Int])] = {
      var out = Vector.empty[(Int, Int, List[Int])]
      var i = from
      while (i + 8 <= to) {
        val s = be32(b, i).toInt
        if (s < 8 || i + s > to) return out
        out :+= ((i, s, anc))
        val cc = new String(b.slice(i + 4, i + 8), "US-ASCII")
        if (containers(cc)) out ++= boxes(b, i + 8, i + s, i :: anc)
        i += s
      }
      out
    }
    for (fmt <- Seq("mp4", "mp4v2")) {
      val base = families.find(_._1 == fmt).get._2
      for ((o, size, anc) <- boxes(base, 0, base.length, Nil);
           cs <- 8 until math.min(size, 48)) {
        val out = base.take(o + cs)
        put32(out, o, cs.toLong)
        anc.foreach(ao => put32(out, ao, (o + cs - ao).toLong))
        mustNotThrow(fmt, s"resized box@$o to $cs at buffer end", out)
      }
    }
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
