package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling for training-data pipelines: media payloads
 * ride as opaque `binary` columns with a typed metadata struct, and flow
 * through the SAME vector machinery (knn join, LSH near-dup, collections)
 * once a feature extractor maps them to `array<float>`.
 *
 * Two feature paths:
 *  - IMAGES decode for real via the JDK's ImageIO (PNG/BMP/GIF/JPEG —
 *    ships with the JRE): [[imageMeta]] / [[extractImageFeatures]]
 *    ([[graft.expr.ImageOps]], mean-RGB grid thumbnail features).
 *  - AUDIO decodes for real via the JDK's javax.sound (WAV/AIFF/AU PCM):
 *    [[audioMeta]] / [[extractAudioFeatures]] ([[graft.expr.AudioOps]],
 *    mean-|amplitude| energy-envelope features).
 *  - VIDEO decodes for real via Motion-JPEG: the stream splits into
 *    complete JPEG frames on SOI/EOI markers ([[graft.expr.VideoOps]])
 *    and each frame decodes through the same ImageIO path —
 *    [[sampleVideoFrameFeatures]]. Containers needing inter-frame
 *    codecs (H.264/VP9 — genuinely absent in the JRE) fall back to the
 *    byte-stripe path below.
 *  - remaining modalities (compressed audio, inter-frame video) keep
 *    the DETERMINISTIC byte-histogram kernel
 *    ([[graft.expr.ByteHistogram]]) behind [[extractFeatures]] /
 *    [[sampleFrameFeatures]]; swapping in a codec changes ONE
 *    expression.
 * Shared physical shape either way:
 *  - payloads are map-side only — a binary column never rides a shuffle
 *    in this module (features are a few hundred bytes instead of the
 *    media);
 *  - CPU-heavy extraction parallelizes per input split (repartition after
 *    a skinny scan if the source collapses to few splits).
 */
object Multimodal {

  /** Typed media metadata: modality kind + payload size (the image
    * width/height / audio sample-rate analogues would extend this struct —
    * nullable per-modality fields, one struct column). */
  def mediaMeta(kind: Column, media: Column): Column =
    struct(kind.as("kind"), octet_length(media).cast("long").as("n_bytes"))

  /** Wrap a text column as a binary media payload + metadata — the demo
    * modality available in this container. Binary sources (images on a
    * blob store) land in the same shape via
    * `spark.read.format("binaryFile")` (see graft.ingest.DirSource). */
  def packText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("media"),
      mediaMeta(lit("text/plain"), encode(col(textCol), "UTF-8")).as("meta"))

  /** Modality-agnostic decode+embed: binary payload -> array<float>
    * feature vector via the deterministic byte-histogram kernel — the
    * path for payloads without a JVM codec (compressed audio,
    * inter-frame video). Every downstream consumer (knn, near-dup, IVF)
    * is agnostic to how the vector was produced; images, PCM audio, and
    * MJPEG video have real decode paths ([[extractImageFeatures]],
    * [[extractAudioFeatures]], [[sampleVideoFrameFeatures]]). */
  def extractFeatures(df: DataFrame, mediaCol: String, featCol: String,
      buckets: Int = 64): DataFrame =
    df.withColumn(featCol,
      graft.functions.byte_histogram(col(mediaCol), buckets))

  /** Decoded image metadata (width, height, sniffed format) — NULL rows
    * are undecodable payloads; quarantine with `WHERE meta IS NULL`
    * rather than letting one corrupt crawl image kill a 100 TB stage. */
  def imageMeta(media: Column): Column = graft.functions.image_meta(media)

  /** REAL image decode+embed (JDK ImageIO): mean-RGB g×g thumbnail
    * features, 3·grid² floats in [0,1]. Deterministic for lossless
    * formats (PNG/BMP/GIF); JPEG rasters are decoder-defined, so pipelines
    * needing bit-stable features should transcode first. Undecodable
    * payloads yield NULL features. */
  def extractImageFeatures(df: DataFrame, mediaCol: String, featCol: String,
      grid: Int = 4): DataFrame =
    df.withColumn(featCol,
      graft.functions.image_grid_features(col(mediaCol), grid))

  /** REAL video frame decode+embed (Motion-JPEG via the JDK's ImageIO):
    * the payload splits into complete JPEG frames on SOI/EOI markers and
    * each frame reduces to mean-RGB g×g thumbnail features — one row per
    * (doc, frame_idx). Everything map-side in one projection: the video
    * payload never rides a shuffle, only the small per-frame vectors do.
    * Undecodable frames yield NULL features (quarantine downstream, same
    * contract as the image path); a NULL payload yields no rows. Exact
    * for frames whose blocks are DC-only (e.g. the solid-frame fixture —
    * a flat block's IDCT is exact in every conformant decoder); general
    * JPEG rasters are decoder-defined, the image-path caveat. */
  def sampleVideoFrameFeatures(df: DataFrame, mediaCol: String,
      featCol: String, grid: Int = 4): DataFrame =
    df.select((df.columns.filter(_ != mediaCol).map(col) :+
      posexplode(graft.functions.mjpeg_frames(col(mediaCol)))
        .as(Seq("frame_idx", "__frame"))): _*)
      .withColumn(featCol, graft.functions.image_grid_features(col("__frame"), grid))
      .drop("__frame")

  /** Per-frame decoded metadata (width, height, format) for an MJPEG
    * payload — one row per (doc, frame_idx); NULL meta = corrupt frame. */
  def videoFrameMeta(df: DataFrame, mediaCol: String): DataFrame =
    df.select((df.columns.filter(_ != mediaCol).map(col) :+
      posexplode(graft.functions.mjpeg_frames(col(mediaCol)))
        .as(Seq("frame_idx", "__frame"))): _*)
      .withColumn("frame_meta", graft.functions.image_meta(col("__frame")))
      .drop("__frame")

  /** Byte-stripe frame sampling — the CODEC-LESS fallback for payloads
    * whose container the JRE cannot decode (H.264/VP9 video, MP3/Opus
    * audio): k evenly-spaced byte stripes [i·len/k, (i+1)·len/k), each
    * reduced to its byte histogram — deterministic content features
    * without decoding, emitted as (…, frame_idx, featCol) rows. Same
    * physical shape as the real path (map-side, one projection, payload
    * never shuffles); empty stripes (len < k) yield zero vectors rather
    * than dropping indices. MJPEG payloads should use
    * [[sampleVideoFrameFeatures]] (real decode). */
  def sampleFrameFeatures(df: DataFrame, mediaCol: String, featCol: String,
      k: Int, buckets: Int = 64): DataFrame = {
    require(k >= 1 && k <= 4096, s"k must be in [1,4096], got $k")
    val len = octet_length(col(mediaCol)).cast("long")
    val frames = transform(sequence(lit(0L), lit(k - 1L)), i => {
      // Column./ is DOUBLE division in Spark SQL — floor keeps the stripe
      // bounds exact integers
      val start = floor(len * i / k).cast("long")
      val end = floor(len * (i + lit(1L)) / k).cast("long")
      graft.functions.byte_histogram(
        col(mediaCol).substr(start + lit(1L), end - start), buckets)
    })
    // NULL payloads must not smuggle null elements into the
    // containsNull=false feature array — a null media column yields a
    // null frame ARRAY, which posexplode drops (no rows for that doc)
    df.select((df.columns.filter(_ != mediaCol).map(col) :+
      posexplode(when(col(mediaCol).isNotNull, frames))
        .as(Seq("frame_idx", featCol))): _*)
  }

  /** Decoded audio metadata (sample rate, channels, bits, frame count,
    * container format) — NULL rows are undecodable payloads; quarantine
    * with `WHERE meta IS NULL` like the image path. */
  def audioMeta(media: Column): Column = graft.functions.audio_meta(media)

  /** REAL audio decode+embed (JDK javax.sound): mean-|amplitude| energy
    * envelope, `windows` floats in [0,1]. Exact for PCM containers
    * (WAV/AIFF/AU, any JDK-convertible width/law); undecodable payloads
    * yield NULL features. */
  def extractAudioFeatures(df: DataFrame, mediaCol: String, featCol: String,
      windows: Int = 16): DataFrame =
    df.withColumn(featCol,
      graft.functions.audio_envelope(col(mediaCol), windows))
}
