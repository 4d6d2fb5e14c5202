package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.plans.AudioHeader

/** audio_meta_long contracts: agreement with REAL encoder output (the
  * JDK's own javax.sound.sampled WAV writer), round-trip of the
  * builder payloads, and null-not-throw on malformed inputs. */
class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  private def encode(rate: Int, channels: Int, bits: Int): Array[Byte] = {
    val fmt = new AudioFormat(rate.toFloat, bits, channels, true, false)
    val frames = 64
    val data = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("parses rate/channels/bits from real javax.sound WAV output") {
    for ((r, c, b) <- Seq((44100, 2, 16), (8000, 1, 8), (192000, 8, 16))) {
      val m = AudioHeader.parseMeta(encode(r, c, b))
      assert(m >= 0L, s"$r/$c/$b did not parse")
      assert(((m >> 24).toInt, ((m >> 16) & 0xff).toInt, (m & 0xffff).toInt) == ((r, c, b)),
        s"$r/$c/$b parsed wrong: $m")
    }
  }

  test("builder payloads round-trip through the expression (codegen'd)") {
    val out = Seq((1L, 44100, 2), (2L, 8000, 1), (3L, 96000, 6))
      .toDF("id", "rate", "ch")
      .select(col("id"), col("rate"), col("ch"),
        Multimodal.audioMeta(Multimodal.wavPayload(col("rate"), col("ch"))).as("m"))
      .select(col("id"),
        (Multimodal.metaSampleRate(col("m")) === col("rate")) &&
          (Multimodal.metaChannels(col("m")) === col("ch")) &&
          (Multimodal.metaBits(col("m")) === 16).as("ok"))
      .collect()
    assert(out.forall(_.getBoolean(1)), "builder fields must round-trip")
  }

  test("malformed inputs all NULL, never a throw; SQL registration works") {
    val wav = encode(22050, 1, 16)
    val bad: Seq[Array[Byte]] = Seq(
      null, Array.emptyByteArray,
      wav.take(8),                        // RIFF but cut before WAVE
      wav.take(14),                       // cut inside first chunk header
      wav.take(24),                       // cut inside fmt body
      "RIFFxxxxDATA".getBytes("UTF-8"),   // RIFF but not WAVE
      "not audio".getBytes("UTF-8"))
    for (b <- bad) assert(AudioHeader.parseMeta(b) == -1L,
      s"expected -1 for ${Option(b).map(_.length)}")
    graft.plans.GraftExtensions.register(spark)
    assert(spark.sql("SELECT audio_meta_long(CAST(NULL AS BINARY)) AS m")
      .collect()(0).isNullAt(0))
  }
}
