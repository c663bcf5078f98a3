package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * REAL video frame decoding for the multimodal column path, via the one
 * video container a bare JRE can actually decode: Motion-JPEG. An MJPEG
 * stream is a concatenation of complete JPEG images; the JDK ships a JPEG
 * reader (ImageIO), so splitting the stream on JPEG SOI/EOI markers and
 * feeding each frame through the already-real [[ImageOps]] decode path
 * gives true per-frame rasters — no external codec, no stub.
 *
 * Scale shape mirrors [[ImageOps]]/[[AudioOps]]: the split and each
 * frame's decode are map-side CPU in the same projection as the scan; the
 * video payload never rides a shuffle (it is reduced to k small feature
 * vectors before anything wide happens).
 *
 * Frame delimiting is a real marker-segment parser, not a raw SOI/EOI
 * byte scan: length-prefixed segments (APPn/COM/DQT/DHT/SOF/...) are
 * skipped by their declared 2-byte length, so an EXIF (APP1) thumbnail —
 * an embedded JPEG carrying its own SOI/EOI inside the segment payload,
 * the common real-world case — cannot trigger a false frame boundary.
 * Only entropy-coded scan data after SOS is byte-scanned, where a literal
 * 0xFF is always stuffed with 0x00 (T.81 B.1.1.5) and RSTn markers
 * continue the scan, so the first other marker genuinely ends it.
 *
 * Fixture synthesis ([[synthMjpeg]], the synth_wav playbook): frames are
 * hand-ENCODED baseline JPEGs of a solid gray, built so the decode is
 * bit-exact in any conformant JPEG implementation — single-component
 * (grayscale, so no chroma upsampling or YCbCr rounding), all-ones
 * quantization table, and DC-only blocks (a flat block's IDCT is exact:
 * output = (8·(g−128)·1 + 4) >> 3 + 128 = g in every libjpeg-family
 * decoder, which short-circuits DC-only blocks to a constant fill).
 * Gray of frame f under seed s: g = 16 + (s·31 + f·7) mod 225 — all
 * integer, replayable symbolically by any engine.
 */
object VideoOps {

  /** Deterministic solid gray of frame `f` under `seed`, in [16, 240]. */
  def frameGray(seed: Long, f: Int): Int =
    16 + java.lang.Math.floorMod(seed * 31 + f.toLong * 7, 225L).toInt

  // Standard JPEG Huffman tables (ITU T.81 Annex K.3) — public spec
  // constants. Only DC categories and the AC EOB symbol are ever emitted
  // for a solid frame, but the tables travel complete in the DHT segment.
  private val dcBits = Array[Int](0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = Array.tabulate[Int](12)(identity)
  private val acBits = Array[Int](0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acVals = Array[Int](
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman (code, length) per symbol from a BITS/HUFFVAL pair. */
  private def canonical(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }
  private val dcCodes = canonical(dcBits, dcVals)
  private val acCodes = canonical(acBits, acVals)

  /** Bit writer with JPEG byte stuffing (0xFF in entropy data → 0xFF 0x00). */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1s (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  /** One complete baseline JPEG of a solid gray `g`, `size`×`size`
    * (size a multiple of 8), single component, quant table all ones. */
  private[graft] def solidJpeg(g: Int, size: Int): Array[Byte] = {
    require(g >= 0 && g <= 255, s"gray out of range: $g")
    require(size >= 8 && size % 8 == 0 && size <= 1024,
      s"size must be a multiple of 8 in [8,1024], got $size")
    val out = new java.io.ByteArrayOutputStream(256)
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    b(0xff, 0xd8) // SOI
    b(0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00, // APP0 JFIF 1.1
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
    b(0xff, 0xdb, 0x00, 0x43, 0x00) // DQT, 8-bit table 0
    (0 until 64).foreach(_ => b(0x01)) // all-ones: DC rides unquantized
    b(0xff, 0xc0, 0x00, 0x0b, 0x08, // SOF0: 8-bit precision
      size >> 8, size & 0xff, size >> 8, size & 0xff, // height, width
      0x01, 0x01, 0x11, 0x00) // 1 component, 1x1 sampling, quant table 0
    b(0xff, 0xc4, 0x00, 0x1f, 0x00) // DHT: DC table 0
    dcBits.foreach(b(_)); dcVals.foreach(b(_))
    b(0xff, 0xc4, 0x00, 0xb5, 0x10) // DHT: AC table 0
    acBits.foreach(b(_)); acVals.foreach(b(_))
    b(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3f, 0x00) // SOS
    val bw = new BitWriter(out)
    val eob = acCodes(0x00)
    val mcus = (size / 8) * (size / 8)
    // first block: DC coefficient = 8·(g−128) (the 2-D DCT of a constant
    // block), coded as (category, magnitude bits); later blocks diff 0.
    val v = 8 * (g - 128)
    val mag = math.abs(v)
    val cat = 32 - Integer.numberOfLeadingZeros(mag) // 0 when v == 0
    val (c0, l0) = dcCodes(cat)
    bw.put(c0, l0)
    if (cat > 0) bw.put(if (v >= 0) v else v + (1 << cat) - 1, cat)
    bw.put(eob._1, eob._2)
    var m = 1
    while (m < mcus) {
      val (cz, lz) = dcCodes(0)
      bw.put(cz, lz) // DC diff 0
      bw.put(eob._1, eob._2)
      m += 1
    }
    bw.flush()
    b(0xff, 0xd9) // EOI
    out.toByteArray
  }

  /** Deterministic MJPEG synthesis: `nFrames` solid-gray `size`×`size`
    * JPEG frames concatenated, gray of frame f = [[frameGray]](seed, f).
    * The video fixture generator (no video files ship in this container);
    * every byte is derived from public-spec constants + the seed. */
  def synthMjpeg(seed: Long, nFrames: Int, size: Int): Array[Byte] = {
    require(nFrames >= 0 && nFrames <= 4096, s"nFrames out of range: $nFrames")
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      out.write(solidJpeg(frameGray(seed, f), size))
      f += 1
    }
    out.toByteArray
  }

  private final val Truncated = -1
  private final val Invalid = -2

  /** End index (exclusive, past EOI) of the JPEG starting at `start`
    * (which must point at SOI), walking marker segments by declared
    * length; [[Truncated]] when input ends mid-frame, [[Invalid]] when
    * the structure is not a JPEG (caller resumes its SOI scan). */
  private def parseJpegEnd(b: Array[Byte], start: Int): Int = {
    val n = b.length
    @inline def u(i: Int): Int = b(i) & 0xff
    var j = start + 2
    while (true) {
      if (j >= n) return Truncated
      if (u(j) != 0xff) return Invalid
      while (j < n && u(j) == 0xff) j += 1 // fill bytes (T.81 B.1.1.2)
      if (j >= n) return Truncated
      val m = u(j)
      j += 1
      if (m == 0xd9) return j // EOI
      else if (m == 0xd8 || m == 0x00) return Invalid // nested SOI / stray stuffing
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) () // TEM / RSTn: standalone
      else {
        // every other marker carries a 2-byte big-endian length that
        // includes itself — APPn/COM payloads (EXIF thumbnails!) are
        // skipped wholesale here, never scanned for markers
        if (j + 1 >= n) return Truncated
        val len = (u(j) << 8) | u(j + 1)
        if (len < 2) return Invalid
        val isSos = m == 0xda
        j += len
        if (isSos) {
          // entropy-coded scan data: 0xFF is either stuffed (FF 00),
          // an RSTn that continues the scan, or the next real marker
          var done = false
          while (!done) {
            if (j >= n - 1) return Truncated
            if (u(j) == 0xff) {
              val nx = u(j + 1)
              if (nx == 0x00 || (nx >= 0xd0 && nx <= 0xd7)) j += 2
              else if (nx == 0xff) j += 1 // fill
              else done = true // marker starts at j
            } else j += 1
          }
        }
      }
    }
    Invalid // unreachable
  }

  /** Split an MJPEG byte stream into its complete JPEG frames (SOI..EOI
    * inclusive) with the segment parser above. Bytes outside any frame
    * (including FFD8 runs that are not structurally JPEG) are skipped; a
    * truncated final frame (SOI without EOI) is dropped rather than
    * emitted broken. Returns null only for null input; an empty or
    * frameless payload yields an empty array (no frames ≠ undecodable). */
  def splitFrames(bytes: Array[Byte]): ArrayData = {
    if (bytes == null) return null
    val frames = Array.newBuilder[Array[Byte]]
    var i = 0
    val n = bytes.length
    while (i < n - 1) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd8) {
        val end = parseJpegEnd(bytes, i)
        if (end > 0) {
          frames += java.util.Arrays.copyOfRange(bytes, i, end)
          i = end
        } else if (end == Truncated) i = n // truncated tail frame: drop
        else i += 2 // not actually a JPEG: resume the SOI scan past it
      } else i += 1
    }
    new GenericArrayData(frames.result().asInstanceOf[Array[AnyRef]])
  }
}

/** mjpeg_frames(binary) -> array<binary> of complete JPEG frames split on
  * SOI/EOI markers; NULL only for null input (frameless bytes -> empty). */
case class MjpegFrames(child: Expression) extends UnaryExpression {
  override def prettyName: String = "mjpeg_frames"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mjpeg_frames expects binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    VideoOps.splitFrames(v.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.VideoOps.splitFrames($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** synth_mjpeg(seed long, n_frames int, size int) -> binary — deterministic
  * solid-gray MJPEG stream (see [[VideoOps.synthMjpeg]]). Fixture
  * synthesis / pipeline smoke-test utility; null if any input is null. */
case class SynthMjpeg(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "synth_mjpeg"
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType | IntegerType, IntegerType | LongType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"synth_mjpeg expects (long, int, int), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  private def toL(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue
    case i: java.lang.Integer => i.longValue
  }
  override def nullSafeEval(s: Any, n: Any, r: Any): Any =
    VideoOps.synthMjpeg(toL(s), toL(n).toInt, toL(r).toInt)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n, r) => s"""
      ${ev.value} = graft.expr.VideoOps.synthMjpeg((long) $s, (int) $n, (int) $r);""")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
