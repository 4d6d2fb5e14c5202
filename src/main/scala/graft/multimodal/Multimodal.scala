package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star "multimodal columns"): media
  * payloads ride as opaque BINARY columns next to a typed metadata
  * struct; decode / feature-extraction / resize / frame-sampling run
  * partition-parallel over the payload bytes.
  *
  * DECODE IS STUBBED: real image/audio decoders need native libraries
  * that are absent in this build environment, so every `fake*` function
  * derives DETERMINISTIC pseudo-outputs from the raw bytes. Everything
  * around the stub — the schema convention, the binary column handling,
  * the `mapPartitions` batch shape, the partition-parallel execution —
  * is the real production plumbing and is tested. Swapping in a real
  * decoder changes only the function body.
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

  /** Decode stub with the REAL batch shape: partition-parallel
    * `mapPartitions` over typed media rows, one native-decoder session
    * per partition (that is where a real implementation would initialize
    * its decoder once and stream the iterator through it). */
  def decodeAll(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val decoder = NativeDecoder.open() — once per partition
      rows.map { m =>
        val bytes = m.payload
        // deterministic fake "decode": dimensions derived from content
        val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        Decoded(
          mediaId = m.mediaId,
          width = (sum % 640).toInt + 1,
          height = (bytes.length % 480) + 1,
          channels = 3,
          checksum = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString)
      }
    }
  }
}
