package graft.ingest

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Recursive directory scan + lossy text decode — the reference's POJ source
 * (S3/S5): `get_dataset_structure` walks the tree keeping `*.txt`
 * (`/root/reference/poj_utils.py:15-28`), then `read_batch` decodes each file
 * with chardet-detected charset, `errors="ignore"` (`poj_utils.py:64-70`).
 *
 * Spark shape: the `binaryFile` source with `recursiveFileLookup` +
 * `pathGlobFilter` — listing happens distributed on the driver/executors,
 * not in a Python loop, and the content arrives as one binary column.
 * Decode is a small deterministic kernel (UTF-8 with replacement, then the
 * replacement chars dropped = "errors=ignore" semantics; charset *detection*
 * is explicitly best-effort in the reference and out of scope — UTF-8-lossy
 * is the documented stand-in, SURVEY §2.8 F11).
 */
object DirSource {

  /** UTF-8 lossy decode kernel: invalid byte sequences are dropped,
    * mirroring python `bytes.decode(enc, errors="ignore")` exactly. A
    * replace-then-strip-U+FFFD shortcut would also delete LEGITIMATE
    * replacement chars present in the input; a CharsetDecoder with IGNORE
    * actions only skips genuinely undecodable bytes. */
  def decodeLossy(bytes: Array[Byte]): String = {
    if (bytes == null) null
    else {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.IGNORE)
        .onUnmappableCharacter(CodingErrorAction.IGNORE)
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    }
  }

  /** (path, modificationTime, length, text) for every file under `dir`
    * matching `glob` (default `*.txt`), recursively. */
  def files(spark: SparkSession, dir: String, glob: String = "*.txt"): DataFrame = {
    val decode = udf(decodeLossy _)
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("modificationTime"), col("length"),
        decode(col("content")).as("text"))
  }

  /** Whole-text read of explicit paths (the BCB `files` input of
    * [[Corpus.bcb]]): one row per file, path + full text. */
  def wholeText(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    files(spark, dir, glob)
}
