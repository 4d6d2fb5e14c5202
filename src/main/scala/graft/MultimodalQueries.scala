package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column query surface (north-star "multimodal columns"):
  * documents ride as opaque BINARY payloads + typed metadata; features
  * derive deterministically from payload bytes (decode stubbed — see
  * [[graft.multimodal.Multimodal]]). Oracle-checked: per-source payload
  * sizes and exact-integer-averaged pseudo features.
  */
object MultimodalQueries {

  // The TextQueries.docs discipline: per-doc payload fabrication /
  // decode must parallelize even when the corpus arrives as one
  // parquet file (a single input partition serializes the whole map
  // pass — measured 56 s vs ~2 s on the q148 gram scan at sf1).
  private def docs(spark: org.apache.spark.sql.SparkSession,
                   dir: String): org.apache.spark.sql.DataFrame = {
    val d = Tables.documents(spark, dir)
    if (d.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism) d
    else d.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
  }

  private def hex7Sql(e: String): String =
    s"""list_sum(list_transform(range(7), i ->
        (strpos('0123456789abcdef', substr(md5($e), CAST(i AS INT) + 1, 1)) - 1)
          * CAST(power(16, 6 - i) AS BIGINT)))"""

  // --- binary payload + metadata + feature extraction --------------------
  private val q31 = Q(
    (spark, dir) => {
      val d = Multimodal.withMeta(
        Multimodal.withPayload(docs(spark, dir), "text"))
      d.select(col("source"), col("meta.n_bytes").as("n_bytes"),
          Multimodal.fakeFeature(col("text"), 0).as("k0"),
          Multimodal.fakeFeature(col("text"), 1).as("k1"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bytes")).as("total_bytes"),
          (sum(col("k0")).cast("double") / lit(268435456.0) / count(lit(1))).as("avg_f0"),
          (sum(col("k1")).cast("double") / lit(268435456.0) / count(lit(1))).as("avg_f1"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH f AS (
        SELECT source, strlen(text) AS n_bytes,
               ${hex7Sql("'0|' || text")} AS k0,
               ${hex7Sql("'1|' || text")} AS k1
        FROM documents)
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
             CAST(sum(k0) AS DOUBLE) / 268435456.0 / count(*) AS avg_f0,
             CAST(sum(k1) AS DOUBLE) / 268435456.0 / count(*) AS avg_f1
      FROM f GROUP BY 1 ORDER BY source ASC NULLS FIRST"""))

  // --- frame sampling over the binary payload ----------------------------
  // The video/audio chunking shape: split each payload into fixed 64-byte
  // frames, keep every 2nd (Multimodal.frames — codegen'd built-ins,
  // partition-local, no shuffle until the per-source rollup), and account
  // frames + a content hash of the first frame per source. The corpus
  // text is ASCII, so the oracle mirrors byte frames with character
  // substr over the same positions; the frame hash crosses engines as
  // md5 over identical bytes. Scale shape: one map pass over payloads,
  // then a tiny per-source aggregate — the frame EXPLOSION never
  // shuffles (only per-doc counts and one hash do).
  private val q65 = Q(
    (spark, dir) => {
      val d = Multimodal.withPayload(docs(spark, dir), "text")
      val fr = Multimodal.frames(col("payload"), 64, stride = 2)
      d.select(col("source"),
          size(fr).cast("long").as("n_frames"),
          md5(element_at(fr, 1)).as("f1"))
        // a zero-frame (empty-payload) doc has nothing to account; the
        // oracle's fr CTE drops it the same way, keeping both sides
        // aligned even on corpora with empty documents
        .filter(col("n_frames") > 0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_frames")).as("total_frames"),
          countDistinct(col("f1")).as("distinct_first_frames"))
        .orderBy(col("source"))
    },
    Some("""
      WITH idx AS (
        SELECT source, doc_id, text,
               unnest(range(0, greatest(CAST(ceil(length(text) / 64.0) AS BIGINT), 1))) AS i
        FROM documents),
      fr AS (
        SELECT source, doc_id, count(*) AS n_frames
        FROM idx
        WHERE i % 2 = 0 AND length(substr(text, CAST(i * 64 + 1 AS INT), 64)) > 0
        GROUP BY 1, 2),
      f1 AS (SELECT source, doc_id, md5(substr(text, 1, 64)) AS f1 FROM documents)
      SELECT fr.source, count(*) AS n_docs,
             CAST(sum(fr.n_frames) AS BIGINT) AS total_frames,
             count(DISTINCT f1.f1) AS distinct_first_frames
      FROM fr JOIN f1 ON fr.doc_id = f1.doc_id
      GROUP BY 1 ORDER BY fr.source ASC NULLS FIRST"""))

  // --- real image header decode (JPEG SOFn / PNG IHDR) -------------------
  // Each document fabricates a SPEC-VALID container payload (even
  // doc_id → PNG, odd → JPEG; every 7th → a truncated non-image) with
  // dimensions derived arithmetically from (doc_id, n_chars). The
  // engine side then parses the dimensions BACK out of the raw bytes
  // with the native image_dims_long expression — the oracle predicts
  // them with pure arithmetic and never touches a byte, so the hash
  // match proves encode→parse round-trips the container formats
  // exactly. Scale shape: one codegen'd map pass over payloads
  // (build + parse fused in one WholeStageCodegen), then a tiny
  // (source, format) rollup.
  private val q68 = Q(
    (spark, dir) => {
      val d = docs(spark, dir)
        .select(col("source"), col("doc_id"),
          (col("doc_id") % 640 + 1).as("w0"), (col("n_chars") % 480 + 1).as("h0"))
        .withColumn("payload",
          when(col("doc_id") % 7 === 0, unhex(lit("89504E47"))) // truncated: not an image
            .when(col("doc_id") % 2 === 0, Multimodal.pngPayload(col("w0"), col("h0")))
            .otherwise(Multimodal.jpegPayload(col("w0"), col("h0"))))
      val parsed = d.withColumn("dims", Multimodal.imageDims(col("payload")))
        .select(col("source"),
          when(col("dims").isNull, lit("unknown"))
            .when(hex(substring(col("payload"), 1, 2)) === "FFD8", lit("jpeg"))
            .otherwise(lit("png")).as("format"),
          Multimodal.dimsWidth(col("dims")).as("w"),
          Multimodal.dimsHeight(col("dims")).as("h"))
      parsed.groupBy(col("source"), col("format"))
        .agg(count(lit(1)).as("n_images"),
          sum(col("w")).as("sum_width"), sum(col("h")).as("sum_height"),
          max(col("w")).as("max_width"), max(col("h")).as("max_height"))
        .orderBy(col("source"), col("format"))
    },
    Some("""
      WITH f AS (
        SELECT source,
               CASE WHEN doc_id % 7 = 0 THEN 'unknown'
                    WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
               CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id % 640 + 1 END AS w,
               CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars % 480 + 1 END AS h
        FROM documents)
      SELECT source, format, count(*) AS n_images,
             CAST(sum(w) AS BIGINT) AS sum_width,
             CAST(sum(h) AS BIGINT) AS sum_height,
             CAST(max(w) AS BIGINT) AS max_width,
             CAST(max(h) AS BIGINT) AS max_height
      FROM f GROUP BY 1, 2
      ORDER BY source ASC NULLS FIRST, format ASC NULLS FIRST"""))

  // --- real WAV header decode (audio metadata) ---------------------------
  // q68's audio sibling: spec-valid RIFF/WAVE fmt headers fabricated
  // per document (sample rate and channel count derived arithmetically;
  // every 9th doc a truncated non-audio payload), parsed back natively
  // with audio_meta_long, rolled up per (source, channels). The oracle
  // predicts every field arithmetically — the hash match proves the
  // little-endian encode/parse round-trip.
  private val q70 = Q(
    (spark, dir) => {
      val d = docs(spark, dir)
        .select(col("source"), col("doc_id"),
          (lit(8000) + (col("doc_id") % 89) * 1000).as("rate0"),
          (lit(1) + col("doc_id") % 2).as("ch0"))
        .withColumn("payload",
          when(col("doc_id") % 9 === 0, lit("RIFFxxxx").cast("binary"))
            .otherwise(Multimodal.wavPayload(col("rate0"), col("ch0"))))
      val m = Multimodal.audioMeta(col("payload"))
      d.select(col("source"),
          coalesce(Multimodal.metaChannels(m), lit(-1L)).as("channels"),
          Multimodal.metaSampleRate(m).as("rate"),
          Multimodal.metaBits(m).as("bits"))
        .groupBy(col("source"), col("channels"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("rate")).as("sum_rate"), max(col("rate")).as("max_rate"),
          sum(col("bits")).as("sum_bits"))
        .orderBy(col("source"), col("channels"))
    },
    Some("""
      WITH f AS (
        SELECT source,
               CASE WHEN doc_id % 9 = 0 THEN -1 ELSE 1 + doc_id % 2 END AS channels,
               CASE WHEN doc_id % 9 = 0 THEN NULL
                    ELSE 8000 + (doc_id % 89) * 1000 END AS rate,
               CASE WHEN doc_id % 9 = 0 THEN NULL ELSE 16 END AS bits
        FROM documents)
      SELECT source, CAST(channels AS BIGINT) AS channels, count(*) AS n_clips,
             CAST(sum(rate) AS BIGINT) AS sum_rate,
             CAST(max(rate) AS BIGINT) AS max_rate,
             CAST(sum(bits) AS BIGINT) AS sum_bits
      FROM f GROUP BY 1, 2
      ORDER BY source ASC NULLS FIRST, channels ASC NULLS FIRST"""))

  // --- q144: aspect-ratio bucketing for image batch assembly -------------
  // The image-side q56: diffusion/vision training groups images into
  // ASPECT buckets so a batch shares one canvas (SDXL-style aspect
  // bucketing) — padding waste is the metric. Payloads are fabricated
  // and parsed back exactly as q68 (the dims used downstream are the
  // ones the native image_dims_long expression DECODED from bytes, so
  // the oracle hash still proves the container round-trip); the aspect
  // ratio is integer ppm (one truncating div, matching `//`), buckets
  // are fixed thresholds, and batches of 16 per (source, bucket) are
  // pure count arithmetic.
  //
  // 100 TB posture: decode + bucket is one codegen'd map pass; the
  // rollup is a tiny (source, bucket) agg. No window, no shuffle of
  // payload bytes — the batch count needs only the bucket sizes.
  private val ArBatch = 16L
  private val q144 = Q(
    (spark, dir) => {
      val d = docs(spark, dir)
        .select(col("source"), col("doc_id"),
          (col("doc_id") % 640 + 1).as("w0"), (col("n_chars") % 480 + 1).as("h0"))
        .withColumn("payload",
          when(col("doc_id") % 7 === 0, unhex(lit("89504E47")))
            .when(col("doc_id") % 2 === 0, Multimodal.pngPayload(col("w0"), col("h0")))
            .otherwise(Multimodal.jpegPayload(col("w0"), col("h0"))))
      val dims = d.withColumn("dims", Multimodal.imageDims(col("payload")))
        .filter(col("dims").isNotNull) // non-images carry no aspect
        .select(col("source"), Multimodal.dimsWidth(col("dims")).as("w"),
          Multimodal.dimsHeight(col("dims")).as("h"))
        .withColumn("ar_ppm", expr("(w * 1000000) div h"))
        .withColumn("bucket",
          when(col("ar_ppm") < 750000L, lit("portrait"))
            .when(col("ar_ppm") <= 1333333L, lit("square"))
            .otherwise(lit("landscape")))
      dims.groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_images"),
          min(col("ar_ppm")).as("min_ar_ppm"),
          max(col("ar_ppm")).as("max_ar_ppm"))
        .withColumn("n_batches", expr(s"(n_images + ${ArBatch - 1}) div $ArBatch"))
        .withColumn("pad_waste", col("n_batches") * ArBatch - col("n_images"))
        .select(col("source"), col("bucket"), col("n_images"),
          col("n_batches"), col("pad_waste"),
          col("min_ar_ppm"), col("max_ar_ppm"))
        .orderBy(col("source"), col("bucket"))
    },
    Some(s"""
      WITH f AS (
        SELECT source, doc_id % 640 + 1 AS w, n_chars % 480 + 1 AS h
        FROM documents WHERE doc_id % 7 <> 0),
      a AS (
        SELECT source, (w * 1000000) // h AS ar_ppm,
               CASE WHEN (w * 1000000) // h < 750000 THEN 'portrait'
                    WHEN (w * 1000000) // h <= 1333333 THEN 'square'
                    ELSE 'landscape' END AS bucket
        FROM f),
      g AS (
        SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_images,
               CAST(min(ar_ppm) AS BIGINT) AS min_ar_ppm,
               CAST(max(ar_ppm) AS BIGINT) AS max_ar_ppm
        FROM a GROUP BY 1, 2)
      SELECT source, bucket, n_images,
             (n_images + ${ArBatch - 1}) // $ArBatch AS n_batches,
             ((n_images + ${ArBatch - 1}) // $ArBatch) * $ArBatch - n_images
               AS pad_waste,
             min_ar_ppm, max_ar_ppm
      FROM g
      ORDER BY source ASC NULLS FIRST, bucket ASC NULLS FIRST"""))

  // --- q150: perceptual-hash (dHash) image near-dup ----------------------
  // The image-side q17/q18: near-duplicate IMAGE detection by 64-bit
  // difference hash + banded LSH, with REAL pixel decode. Each doc
  // fabricates a COMPLETE renderable 9×8 grayscale BMP (every 11th a
  // truncated non-image) whose pixels derive from (class, variant)
  // arithmetic — same class = same base image, variant perturbs ONE
  // pixel, which moves ≤2 dHash bits. The engine decodes the pixels
  // BACK out of the container bytes with the native bmp_dhash_long
  // expression (spec-proven against javax.imageio in BmpDhashSpec);
  // the oracle predicts the hash with pure arithmetic and never
  // touches a byte, so the match proves encode→pixel-decode→hash
  // round-trips exactly. Candidates come from 4×16-bit band equality
  // against each bucket's min-id REPRESENTATIVE (pigeonhole: a doc at
  // hamming ≤3 from its rep shares ≥1 band, =4 best-effort — LSH
  // recall semantics, both sides identical), then the exact hamming
  // filter; the links feed union-find clustering exactly like
  // q39/q43's pair streams.
  //
  // 100 TB posture: fabricate+decode+hash+band is ONE codegen'd map
  // pass over payload bytes (no payload shuffle — only (id, 64-bit
  // hash, 16-bit chunk) rows move); the band join is equi-key,
  // skew-bounded by band cardinality; distinct over candidate pairs
  // collapses the ≤4 duplicate discoveries of identical pairs.
  private val DhashMaxHam = 4
  private val q150 = Q(
    (spark, dir) => {
      val cls = col("doc_id") % 64
      val v = expr("doc_id div 64") % 4
      // squared-congruential pixel mixing: a LINEAR formula makes every
      // class's dHash bits fire only at mod-wraps (near-identical
      // hashes across classes — measured 47k cross-class pairs at
      // sf0.01); squaring mod 251 decorrelates classes (9 cross-class
      // near-pairs over all 256 fabricated images)
      val pix = (x: Int, y: Int) => {
        val t = cls * 73 + lit(x * 37 + y * 11 + 1)
        pmod(t * t +
          when(v === x && v === y, lit(40)).otherwise(lit(0)), lit(251))
      }
      val d = docs(spark, dir)
        .withColumn("payload",
          when(col("doc_id") % 11 === 0, unhex(lit("424D")))
            .otherwise(Multimodal.bmpPayload(pix)))
      val hashed = d
        .select(col("doc_id"), Multimodal.bmpDhash(col("payload")).as("dh"))
        .filter(col("dh").isNotNull)
      val bands = hashed.select(col("doc_id"), col("dh"),
        explode(array((0 until 4).map(k =>
          struct(lit(k).as("k"),
            shiftright(col("dh"), 16 * k).bitwiseAND(lit(0xffffL))
              .as("chunk"))): _*)).as("b"))
        .select(col("doc_id"), col("dh"),
          col("b.k").as("k"), col("b.chunk").as("chunk"))
      // representative links, NOT all pairs: each band bucket elects
      // its min-doc_id member and every other member links to it —
      // the union-find shape real dedup uses (q39/q43). An all-pairs
      // self-join within buckets is quadratic in duplicate-class size
      // (measured 14x time at 10x data on the fabricated corpus);
      // representative links are linear in docs and feed the same
      // downstream clustering.
      val reps = bands.groupBy(col("k"), col("chunk"))
        .agg(min(col("doc_id")).as("rep_id"),
          min_by(col("dh"), col("doc_id")).as("rep_dh"))
      val cand = bands.join(reps, Seq("k", "chunk"))
        .filter(col("rep_id") < col("doc_id"))
        .select(col("rep_id").as("a_id"), col("doc_id").as("b_id"),
          col("rep_dh").as("ha"), col("dh").as("hb"))
        .distinct()
      cand
        .withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("hamming") <= DhashMaxHam)
        .select(col("a_id"), col("b_id"), col("hamming"))
        .orderBy(col("a_id").asc, col("b_id").asc)
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id, doc_id % 64 AS cls, (doc_id // 64) % 4 AS v
        FROM documents WHERE doc_id % 11 <> 0),
      h AS (
        SELECT doc_id, CAST(list_sum(list_transform(range(64), i ->
          CASE WHEN (((cls * 73 + (i % 8) * 37 + (i // 8) * 11 + 1)
                      * (cls * 73 + (i % 8) * 37 + (i // 8) * 11 + 1) +
                      CASE WHEN (i % 8) = v AND (i // 8) = v
                           THEN 40 ELSE 0 END)) % 251
                   > (((cls * 73 + ((i % 8) + 1) * 37 + (i // 8) * 11 + 1)
                      * (cls * 73 + ((i % 8) + 1) * 37 + (i // 8) * 11 + 1) +
                      CASE WHEN ((i % 8) + 1) = v AND (i // 8) = v
                           THEN 40 ELSE 0 END)) % 251
               THEN CASE WHEN i = 63 THEN -9223372036854775808
                         ELSE (CAST(1 AS BIGINT) << CAST(i AS INT)) END
               ELSE 0 END)) AS BIGINT) AS dh
        FROM d),
      bb AS (
        SELECT doc_id, dh, k, (dh >> CAST(16 * k AS INT)) & 65535 AS chunk
        FROM (SELECT doc_id, dh, unnest(range(4)) AS k FROM h)),
      reps AS (
        SELECT k, chunk, min(doc_id) AS rep_id,
               arg_min(dh, doc_id) AS rep_dh
        FROM bb GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT r.rep_id AS a_id, b.doc_id AS b_id,
               r.rep_dh AS ha, b.dh AS hb
        FROM bb b JOIN reps r
          ON b.k = r.k AND b.chunk = r.chunk AND r.rep_id < b.doc_id)
      SELECT a_id, b_id, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(ha, hb)) <= $DhashMaxHam
      ORDER BY a_id ASC NULLS FIRST, b_id ASC NULLS FIRST"""))

  // --- q199: real ISO-BMFF (MP4) header decode — video metadata ----------
  // Completes the image/audio/VIDEO multimodal triple (q68/q70/q199):
  // each document fabricates a spec-valid MP4 box tree (ftyp +
  // moov{mvhd, trak{tkhd}} written literally from ISO/IEC 14496-12;
  // every 11th doc a truncated non-video payload) with movie
  // timescale/duration and track dimensions derived arithmetically
  // from (doc_id, n_chars). The native video_meta_long expression
  // parses duration-ms/width/height BACK out of the raw bytes — the
  // oracle predicts them with pure arithmetic (duration_ms replayed
  // as the same integer division) and never touches a byte, so the
  // hash match proves the big-endian box encode→parse round-trip.
  // Scale shape: fabricate + parse fuse into one codegen'd map pass,
  // then a tiny (source, format) rollup.
  private val q199 = Q(
    (spark, dir) => {
      val d = docs(spark, dir)
        .select(col("source"), col("doc_id"),
          (lit(600) + (col("doc_id") % 90) * 100).as("ts0"),
          (col("n_chars") % 100000 + lit(600)).as("dur0"),
          (col("doc_id") % 1920 + 16).as("w0"),
          (col("n_chars") % 1080 + 16).as("h0"))
        .withColumn("payload",
          when(col("doc_id") % 11 === 0, unhex(lit("0000001466747970"))) // truncated
            .otherwise(Multimodal.mp4Payload(
              col("ts0"), col("dur0"), col("w0"), col("h0"))))
      val m = Multimodal.videoMeta(col("payload"))
      d.select(col("source"),
          when(m.isNull, lit("unknown")).otherwise(lit("mp4")).as("format"),
          Multimodal.metaDurationMs(m).as("dur_ms"),
          Multimodal.metaVideoWidth(m).as("w"),
          Multimodal.metaVideoHeight(m).as("h"))
        .groupBy(col("source"), col("format"))
        .agg(count(lit(1)).as("n_videos"),
          sum(col("dur_ms")).as("sum_dur_ms"), max(col("dur_ms")).as("max_dur_ms"),
          max(col("w")).as("max_width"), max(col("h")).as("max_height"))
        .orderBy(col("source"), col("format"))
    },
    Some("""
      WITH f AS (
        SELECT source,
               CASE WHEN doc_id % 11 = 0 THEN 'unknown' ELSE 'mp4' END AS format,
               CASE WHEN doc_id % 11 = 0 THEN NULL
                    ELSE (1000 * (n_chars % 100000 + 600))
                           // (600 + (doc_id % 90) * 100) END AS dur_ms,
               CASE WHEN doc_id % 11 = 0 THEN NULL ELSE doc_id % 1920 + 16 END AS w,
               CASE WHEN doc_id % 11 = 0 THEN NULL ELSE n_chars % 1080 + 16 END AS h
        FROM documents)
      SELECT source, format, count(*) AS n_videos,
             CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms,
             CAST(max(dur_ms) AS BIGINT) AS max_dur_ms,
             CAST(max(w) AS BIGINT) AS max_width,
             CAST(max(h) AS BIGINT) AS max_height
      FROM f GROUP BY 1, 2
      ORDER BY source ASC NULLS FIRST, format ASC NULLS FIRST"""))

  val all: Seq[(String, Q)] = Seq(
    "q31_multimodal_features" -> q31,
    "q65_frame_sample" -> q65,
    "q68_image_dims" -> q68,
    "q70_audio_meta" -> q70,
    "q144_aspect_buckets" -> q144,
    "q150_dhash_neardup" -> q150,
    "q199_video_meta" -> q199)
}
