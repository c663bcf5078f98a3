package graft.expr

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * REAL image decoding for the multimodal column path — the JDK's
 * `javax.imageio` (PNG/BMP/GIF/JPEG/WBMP readers ship with the JRE, no
 * external dependency), replacing the byte-histogram stand-in for payloads
 * that actually are images ([[graft.multimodal.Multimodal]] keeps the
 * histogram for modality-agnostic bytes).
 *
 * Scale shape: decode is pure map-side CPU per row — the binary payload
 * never rides a shuffle (these expressions reduce it to a small struct or
 * a 3·g² float vector in the same projection as the scan). Decode cost
 * dominates; a source that collapses to few splits should repartition
 * BEFORE the projection so decoding parallelizes (same guidance as every
 * CPU-heavy kernel in this package).
 *
 * Determinism: PNG/BMP/GIF decode to bit-exact rasters everywhere; JPEG
 * IDCT is implementation-defined, so deterministic pipelines (and the
 * fixture specs) should gate on lossless formats. Undecodable or null
 * payloads yield NULL (never a throw): a corrupt image in a 100 TB crawl
 * must not kill the stage — filter `IS NULL` downstream to quarantine.
 */
object ImageOps {
  // ImageIO defaults to DISK-backed stream caches (a temp file created
  // and deleted per ImageIO.read / createImageInputStream call) — pure
  // filesystem churn when every payload is already an in-memory byte
  // array. One static switch to memory-cache streams; JVM-global, and
  // strictly better for byte-array sources (javax.imageio caches exist
  // for non-seekable file/network streams, which this engine never
  // hands to ImageIO).
  ImageIO.setUseCache(false)

  // --- Reader plumbing: NOT ImageIO.read. Every ImageIO.read call
  // constructs a fresh ImageReader, and reader construction registers a
  // cleanup record with sun.java2d.Disposer — a JVM-GLOBAL synchronized
  // registry. At one reader per decoded frame a 32-thread executor
  // serializes on that monitor (thread dumps during the 30x video sweep
  // showed 26/32 task threads blocked in Disposer.add; decode itself
  // scales near-linearly when the reader is reused). The fix: ONE reader
  // per (thread, format), cached in a ThreadLocal and re-targeted with
  // setInput per payload — the Disposer sees each reader once per thread
  // lifetime instead of once per frame. The input side gets the same
  // treatment: a minimal ImageInputStream over the byte array (below)
  // instead of MemoryCacheImageInputStream, which both registers with the
  // global StreamCloser and copies the bytes through its block cache.
  // Unknown magic falls back to the stock ImageIO probe loop, so anything
  // the JRE can read still decodes.

  /** Random-access ImageInputStream DIRECTLY over a byte array: no
    * per-call global registration (StreamCloser), no cache-block copy —
    * ImageInputStreamImpl supplies seek/readBits on top of these two. */
  private final class ByteArrayImageInputStream(buf: Array[Byte])
      extends javax.imageio.stream.ImageInputStreamImpl {
    // Contract parity with the JDK streams: bitOffset resets on EVERY
    // read attempt (including at EOF), and a zero-length read returns 0
    // before the EOF check.
    override def read(): Int = {
      bitOffset = 0
      if (streamPos >= buf.length) -1
      else { val v = buf(streamPos.toInt) & 0xff; streamPos += 1; v }
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      java.util.Objects.checkFromIndexSize(off, len, b.length)
      bitOffset = 0
      if (len == 0) 0
      else if (streamPos >= buf.length) -1
      else {
        val n = math.min(len, buf.length - streamPos.toInt)
        System.arraycopy(buf, streamPos.toInt, b, off, n)
        streamPos += n
        n
      }
    }
    override def length(): Long = buf.length.toLong
    override def isCached: Boolean = true
    override def isCachedMemory: Boolean = true
    // ImageInputStreamImpl declares a non-trivial finalize(), which makes
    // EVERY stream construction register with the JVM's global Finalizer
    // queue (synchronized — thread dumps showed 17/32 task threads parked
    // in Finalizer.register during the 30x video sweep) and hands the
    // single finalizer daemon one object per decoded frame. This stream
    // holds no native or OS resource — close() is a no-op flag — so a
    // TRIVIAL finalizer is correct, and an empty body is exactly how
    // HotSpot is told not to register (is_empty_method check).
    override protected def finalize(): Unit = ()
  }

  /** Format key for the reader cache, from the container magic; null for
    * magic the cache doesn't know (→ stock ImageIO fallback). */
  private def formatKey(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else null

  private val readerCache =
    ThreadLocal.withInitial[java.util.HashMap[String, javax.imageio.ImageReader]](
      () => new java.util.HashMap[String, javax.imageio.ImageReader]())

  private def cachedReader(fmt: String): javax.imageio.ImageReader = {
    val cache = readerCache.get()
    var r = cache.get(fmt)
    if (r == null) {
      val it = ImageIO.getImageReadersByFormatName(fmt)
      if (!it.hasNext) return null
      r = it.next()
      cache.put(fmt, r)
    }
    r
  }

  /** Drop a reader whose read threw — a decoder left mid-frame must not
    * serve the next payload. */
  private def evictReader(fmt: String, r: javax.imageio.ImageReader): Unit = {
    readerCache.get().remove(fmt)
    try r.dispose() catch { case scala.util.control.NonFatal(_) => () }
  }

  private def decode(bytes: Array[Byte]): BufferedImage = {
    if (bytes == null || bytes.length == 0) return null
    val fmt = formatKey(bytes)
    val r = if (fmt == null) null else cachedReader(fmt)
    if (r == null)
      // unknown magic: stock probe loop (rare path, full generality)
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    else {
      val iis = new ByteArrayImageInputStream(bytes)
      try {
        r.setInput(iis, true, true) // seekForwardOnly, ignoreMetadata
        r.read(0)
      } catch {
        case scala.util.control.NonFatal(_) => evictReader(fmt, r); null
        // a task kill / speculation interrupt (InterruptedException — NOT
        // NonFatal) can land mid-read; the pooled task thread survives and
        // would reuse a decoder left mid-frame, surfacing as spurious
        // quarantined-null rows on the NEXT payload. Evict on ANY throw,
        // rethrow the fatal ones.
        case t: Throwable => evictReader(fmt, r); throw t
      } finally {
        // release the payload reference the cached reader would otherwise
        // pin (one array per thread x format) for the thread's lifetime
        try r.setInput(null) catch { case scala.util.control.NonFatal(_) => () }
        iis.close()
      }
    }
  }

  /** (width, height, format-ish MIME guess) or null when unparseable.
    * HEADER-ONLY: dimensions come from the codec header via
    * `ImageReader.getWidth/getHeight(0)` — no pixel decode, no raster
    * allocation. Metadata extraction over a 100 TB crawl must not pay
    * entropy-decode + IDCT per object when the header already carries
    * the answer (the r14 scale run showed full-decode metaRow going
    * superlinear from allocation pressure; header reads are ~10× cheaper
    * and flat). A payload whose header parses but whose scan data is
    * corrupt now reports its header dims — callers that need decode
    * VALIDATION use the feature kernels (NULL on decode failure), not
    * the metadata probe. Format sniff reads magic bytes. */
  def metaRow(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length == 0) return null
    val fmt = formatKey(bytes)
    if (fmt == null) {
      // unknown magic: stock registry probe (rare path)
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return null
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            InternalRow(r.getWidth(0), r.getHeight(0),
              UTF8String.fromString(sniffFormat(bytes)))
          } finally r.dispose()
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => null }
    } else {
      val r = cachedReader(fmt)
      if (r == null) return null
      val iis = new ByteArrayImageInputStream(bytes)
      try {
        r.setInput(iis, true, true) // seekForwardOnly, ignoreMetadata
        InternalRow(r.getWidth(0), r.getHeight(0),
          UTF8String.fromString(sniffFormat(bytes)))
      } catch {
        case scala.util.control.NonFatal(_) => evictReader(fmt, r); null
        // a task kill / speculation interrupt (InterruptedException — NOT
        // NonFatal) can land mid-read; the pooled task thread survives and
        // would reuse a decoder left mid-frame, surfacing as spurious
        // quarantined-null rows on the NEXT payload. Evict on ANY throw,
        // rethrow the fatal ones.
        case t: Throwable => evictReader(fmt, r); throw t
      } finally {
        try r.setInput(null) catch { case scala.util.control.NonFatal(_) => () }
        iis.close()
      }
    }
  }

  private def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      "image/png"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "image/bmp"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "image/gif"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      "image/jpeg"
    else "image/unknown"

  /** Mean-RGB thumbnail features: the raster partitioned into a g×g grid
    * (pixel (x,y) → cell (x·g/w, y·g/h) — exact integer arithmetic, no FP
    * in the binning), mean R,G,B per cell in [0,1], row-major cells with
    * interleaved channels → array<float> of length 3·g². A tiny, fully
    * deterministic image embedding: downstream knn/near-dup/IVF consume
    * it exactly like any other vector. Null when undecodable. */
  def gridFeatures(bytes: Array[Byte], grid: Int): ArrayData = {
    val img = decode(bytes)
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](3 * grid * grid)
    val counts = new Array[Long](grid * grid)
    // Single-band (grayscale) rasters read RAW samples: getRGB would run
    // the linear-gray→sRGB ICC conversion (16 → 71), which is neither the
    // stored pixel value nor replayable float math. r = g = b = sample.
    // Paletted images (GIF, indexed PNG/BMP) are ALSO single-band 8-bit,
    // but the sample is a palette INDEX, not a gray value — they must
    // take the getRGB path, which resolves the IndexColorModel.
    val cm = img.getColorModel
    val grayRaster =
      if (img.getRaster.getNumBands == 1 &&
          cm.getComponentSize(0) == 8 &&
          cm.getColorSpace.getType == java.awt.color.ColorSpace.TYPE_GRAY &&
          !cm.isInstanceOf[java.awt.image.IndexColorModel]) img.getRaster
      else null
    var y = 0
    while (y < h) {
      val cy = y * grid / h
      var x = 0
      while (x < w) {
        val cell = cy * grid + x * grid / w
        if (grayRaster != null) {
          val v = grayRaster.getSample(x, y, 0)
          sums(3 * cell) += v
          sums(3 * cell + 1) += v
          sums(3 * cell + 2) += v
        } else {
          val rgb = img.getRGB(x, y) // sRGB, alpha premultiplication undone
          sums(3 * cell) += (rgb >>> 16) & 0xff
          sums(3 * cell + 1) += (rgb >>> 8) & 0xff
          sums(3 * cell + 2) += rgb & 0xff
        }
        counts(cell) += 1L
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](3 * grid * grid)
    var c = 0
    while (c < grid * grid) {
      if (counts(c) > 0) {
        val inv = 1.0 / (255.0 * counts(c))
        out(3 * c) = (sums(3 * c) * inv).toFloat
        out(3 * c + 1) = (sums(3 * c + 1) * inv).toFloat
        out(3 * c + 2) = (sums(3 * c + 2) * inv).toFloat
      }
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** image_meta(binary) -> struct(width int, height int, format string),
  * NULL for undecodable payloads. */
case class ImageMeta(child: Expression) extends UnaryExpression {
  override def prettyName: String = "image_meta"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_meta expects binary, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ImageOps.metaRow(v.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.ImageOps.metaRow($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** image_grid_features(binary, grid) -> array<float> of 3·grid² mean-RGB
  * cells in [0,1]; NULL for undecodable payloads. */
case class ImageGridFeatures(child: Expression, grid: Int)
    extends UnaryExpression {
  require(grid >= 1 && grid <= 64, s"grid must be in [1,64], got $grid")
  override def prettyName: String = "image_grid_features"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_grid_features expects binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ImageOps.gridFeatures(v.asInstanceOf[Array[Byte]], grid)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.ImageOps.gridFeatures($c, $grid);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
