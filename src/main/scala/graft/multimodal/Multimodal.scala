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
 *  - remaining modalities (compressed audio, video frame sampling —
 *    codecs genuinely absent in the JRE) keep the DETERMINISTIC
 *    byte-histogram kernel ([[graft.expr.ByteHistogram]]) behind
 *    [[extractFeatures]]; swapping in a real codec changes ONE
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
    * path for payloads without a JVM codec (audio/video). Every
    * downstream consumer (knn, near-dup, IVF) is agnostic to how the
    * vector was produced; image payloads should prefer
    * [[extractImageFeatures]] (real decode). */
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

  /** Frame-sample PLUMBING for video payloads: k evenly-spaced "frames"
    * per payload, each reduced to a feature vector, emitted as
    * (…, frame_idx, featCol) rows. No JVM video codec exists in this
    * container, so the DECODE IS A DOCUMENTED STUB: a "frame" is the
    * byte stripe [i·len/k, (i+1)·len/k) and its feature the byte
    * histogram. The Spark-side shape is the real contract — binary in,
    * k feature rows out, everything map-side in one projection (the
    * payload never rides a shuffle; k small vectors do), empty stripes
    * (len < k) yield zero vectors rather than dropping indices. A real
    * codec changes ONE lambda: stripe→decoded-frame-features. */
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
