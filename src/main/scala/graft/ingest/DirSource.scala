package graft.ingest

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Recursive directory scan + charset-detected lossy text decode — the
 * reference's POJ source (S3/S5): `get_dataset_structure` walks the tree
 * keeping `*.txt` (`/root/reference/poj_utils.py:15-28`), then `read_batch`
 * decodes each file with chardet-detected charset, `errors="ignore"`
 * (`poj_utils.py:64-70`).
 *
 * Spark shape: the `binaryFile` source with `recursiveFileLookup` +
 * `pathGlobFilter` — listing happens distributed, not in a Python loop, and
 * the content arrives as one binary column. Decode is a small deterministic
 * kernel; charset detection is a dependency-free chardet stand-in
 * ([[detectAndDecode]]) covering the encodings that actually occur in code
 * corpora: BOM-marked UTF-8/UTF-16, plain UTF-8, and legacy single-byte
 * text (windows-1252 — chardet's usual verdict for non-UTF-8 Latin bytes).
 * Statistical multi-byte CJK detection (GB18030, Shift-JIS, …) is out of
 * scope; such files decode via the windows-1252 fallback, byte-preserving.
 */
object DirSource {

  /** Lossy decode from `offset`: invalid byte sequences are dropped,
    * mirroring python `bytes.decode(enc, errors="ignore")` exactly. A
    * replace-then-strip-U+FFFD shortcut would also delete LEGITIMATE
    * replacement chars present in the input; a CharsetDecoder with IGNORE
    * actions only skips genuinely undecodable bytes. */
  private def lossy(bytes: Array[Byte], offset: Int, cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.IGNORE)
      .onUnmappableCharacter(CodingErrorAction.IGNORE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, offset, bytes.length - offset)).toString
  }

  /** UTF-8 lossy decode kernel (F11) — kept as the documented single-charset
    * entry point; [[detectAndDecode]] adds the chardet-style detection. */
  def decodeLossy(bytes: Array[Byte]): String =
    if (bytes == null) null else lossy(bytes, 0, StandardCharsets.UTF_8)

  /** Strict UTF-8 decode, null when any byte sequence is invalid — doubles
    * as the validity test, so the dominant all-UTF-8 case decodes ONCE. */
  private def strictUtf8(bytes: Array[Byte]): String =
    try {
      StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(bytes)).toString
    } catch { case _: java.nio.charset.CharacterCodingException => null }

  /**
   * Chardet stand-in (`poj_utils.py:64-70`), deterministic: BOM sniff
   * (UTF-8-SIG / UTF-16 LE / UTF-16 BE, BOM stripped like python's
   * `utf-8-sig`/`utf-16` codecs), then strict UTF-8 validation, then
   * windows-1252 — which decodes EVERY byte (its five undefined bytes are
   * dropped, `errors="ignore"`), so legacy single-byte files keep their
   * accented characters instead of losing them to a UTF-8-lossy pass.
   *
   * @return (charsetName, decodedText)
   */
  def detectAndDecode(bytes: Array[Byte]): (String, String) = {
    if (bytes == null) (null, null)
    else if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      ("UTF-8-SIG", lossy(bytes, 3, StandardCharsets.UTF_8))
    else if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      ("UTF-16", lossy(bytes, 2, StandardCharsets.UTF_16LE))
    else if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      ("UTF-16", lossy(bytes, 2, StandardCharsets.UTF_16BE))
    else {
      val utf8 = strictUtf8(bytes)
      if (utf8 != null) ("utf-8", utf8)
      else ("Windows-1252", lossy(bytes, 0, Charset.forName("windows-1252")))
    }
  }

  /** (path, modificationTime, length, charset, text) for every file under
    * `dir` matching `glob` (default `*.txt`), recursively. `charset` is the
    * detected encoding ([[detectAndDecode]]) — carried as a column so
    * pipelines can audit/filter on it, like chardet's confidence dict. */
  def files(spark: SparkSession, dir: String, glob: String = "*.txt"): DataFrame = {
    val decode = udf(detectAndDecode _)
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(dir)
      .withColumn("__dec", decode(col("content")))
      .select(col("path"), col("modificationTime"), col("length"),
        col("__dec._1").as("charset"), col("__dec._2").as("text"))
  }

  /** Whole-text read of explicit paths (the BCB `files` input of
    * [[Corpus.bcb]]): one row per file, path + full text. */
  def wholeText(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    files(spark, dir, glob)
}
