package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling for training-data pipelines: media payloads
 * ride as opaque `binary` columns with a typed metadata struct, and flow
 * through the SAME vector machinery (knn join, LSH near-dup, collections)
 * once a feature extractor maps them to `array<float>`.
 *
 * The real decoders (JPEG/PNG, PCM, video frame sampling) are not
 * available in this environment — `extractFeatures` is therefore a
 * DETERMINISTIC STUB: an L2-normalized byte histogram
 * ([[graft.expr.ByteHistogram]]). Swapping it for a real decoder changes
 * ONE expression; the schema, partitioning, and downstream plumbing are
 * the production shape:
 *  - payloads are map-side only — a binary column never rides a shuffle
 *    in this module (features are 4·buckets bytes instead of the media);
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

  /** STUB decode+embed: binary payload -> array<float> feature vector.
    * Deterministic byte-histogram kernel; replace with a real decoder to
    * productionize — every downstream consumer (knn, near-dup, IVF) is
    * agnostic to how the vector was produced. */
  def extractFeatures(df: DataFrame, mediaCol: String, featCol: String,
      buckets: Int = 64): DataFrame =
    df.withColumn(featCol,
      graft.functions.byte_histogram(col(mediaCol), buckets))
}
