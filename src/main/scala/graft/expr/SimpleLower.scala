package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * UNICODE SIMPLE LOWERCASE — the engine's canonical case fold: per code
 * point, context-free, locale-independent (the `UnicodeData.txt` simple
 * mapping, i.e. `Character.toLowerCase(int)`).
 *
 * Deliberately NOT Spark's `lower()` / Java's `String.toLowerCase`, which
 * apply the FULL case mapping. Full casing is a presentation transform:
 * it is context-sensitive (Final_Sigma decides Σ → ς/σ from word-boundary
 * context that the JDK computes with a `BreakIterator` — measured: its
 * backward scan walks straight through CJK ideographs, digits and Mc
 * marks, a rule no regex engine replays) and locale-entangled (Spark's
 * own `toLowerCaseSlow` calls default-locale `toLowerCase()`, so a tr/az
 * JVM folds ASCII `I` to dotless ı — SPARK-papercut every deployment
 * inherits). A dedup/tokenization KEY needs none of that and must not
 * have it: the fold must be stable under slicing and concatenation
 * (context-free), identical on every JVM (locale-free), and replayable
 * by any SQL engine byte-for-byte. The simple mapping is all three —
 * the same reasoning that makes search engines fold with simple/case-fold
 * tables rather than locale casing.
 *
 * Divergence from full casing is exactly two inputs under Locale.ROOT:
 * U+0130 (İ) → `i` (full: `i` + U+0307) and U+03A3 (Σ) → σ in EVERY
 * position (full: ς when final). Cross-engine: DuckDB's utf8proc
 * `lower()` computes this same simple table except three code points
 * whose mappings its Unicode tables predate (U+A7C7, U+A7C9, U+A7F5 —
 * verified by exhaustive sweep over all code points); the oracle twins
 * pre-replace those three, making both engines agree on EVERY Unicode
 * string with no fixture guard.
 *
 * Codegen'd with the same ASCII fast path as Spark's Lower: full-ASCII
 * payloads never leave the byte array.
 */
object SimpleCaseFold {
  /** Version tag of the canonical fold, STAMPED into every persisted
    * artifact whose keys derive from folded text (MinHash signatures,
    * span grams, BM25 postings). Artifacts built under a different fold
    * — including every pre-stamp artifact, which used Spark's
    * full-mapping `lower()` — hold keys that silently disagree with
    * freshly-computed ones on İ/Σ-class characters; the stamp turns that
    * into a loud rebuild demand (or, for the engine's own tmpdir caches,
    * an automatic rebuild via `foldCurrent`). Bump on ANY change to the
    * fold semantics. */
  val Version = "simple-1"

  def lower(s: UTF8String): UTF8String =
    if (s.isFullAscii) s.toLowerCaseAscii()
    else lowerNonAscii(s)

  /** Non-ASCII path folded DIRECTLY over the UTF-8 payload bytes — no
    * String round-trip (the r15 implementation decoded to String and back,
    * a per-row allocation pair that shows up on CJK/Cyrillic-heavy corpora;
    * measured in BENCH_SCALE.md "fold probe"). Decode each code point,
    * map via the same `Character.toLowerCase`, re-encode. Output bound:
    * simple lowercase never more than doubles a code point's UTF-8 length
    * (ASCII→ASCII; 2-byte→≤3-byte, e.g. U+023A→U+2C65; 3-byte→≤4;
    * 4-byte→4 — pinned exhaustively in SimpleLowerSpec), so a 2× buffer
    * suffices.
    *
    * Sequence validation is STRICT (continuation bytes, overlong forms,
    * surrogate range, > U+10FFFF): on the first malformed sequence the
    * whole value falls back to the String-path fold, whose Java decode
    * repairs with U+FFFD — byte-for-byte what the retired r15
    * implementation produced, so the fold's OUTPUT is identical to r15 on
    * EVERY byte sequence (valid or not; property-pinned in
    * SimpleLowerSpec) and the artifact fold Version honestly stays
    * unchanged. Spark-produced text never takes the fallback (the
    * engine's ingest decodes lossy to valid UTF-8); it exists so
    * adversarial bytes can't silently fold to different keys than the
    * stamp claims. */
  private def lowerNonAscii(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val n = in.length
    val out = new Array[Byte](n * 2)
    var i = 0
    var o = 0
    @inline def cont(k: Int): Boolean = (in(k) & 0xC0) == 0x80
    while (i < n) {
      val b0 = in(i) & 0xFF
      var cp = -1
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0 && i + 1 < n && cont(i + 1)) {
        cp = ((b0 & 0x1F) << 6) | (in(i + 1) & 0x3F); len = 2
        if (cp < 0x80) cp = -1 // overlong
      } else if ((b0 & 0xF0) == 0xE0 && i + 2 < n && cont(i + 1) && cont(i + 2)) {
        cp = ((b0 & 0x0F) << 12) | ((in(i + 1) & 0x3F) << 6) | (in(i + 2) & 0x3F)
        len = 3
        if (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)) cp = -1 // overlong/surrogate
      } else if ((b0 & 0xF8) == 0xF0 && i + 3 < n && cont(i + 1) && cont(i + 2) && cont(i + 3)) {
        cp = ((b0 & 0x07) << 18) | ((in(i + 1) & 0x3F) << 12) |
          ((in(i + 2) & 0x3F) << 6) | (in(i + 3) & 0x3F)
        len = 4
        if (cp < 0x10000 || cp > 0x10FFFF) cp = -1 // overlong/out of range
      }
      if (cp < 0) { // malformed: the String path's Java decode repairs
        return UTF8String.fromString(lower(s.toString)) // exactly as r15 did
      } else {
        val lc = Character.toLowerCase(cp)
        if (lc < 0x80) { out(o) = lc.toByte; o += 1 }
        else if (lc < 0x800) {
          out(o) = (0xC0 | (lc >> 6)).toByte
          out(o + 1) = (0x80 | (lc & 0x3F)).toByte
          o += 2
        } else if (lc < 0x10000) {
          out(o) = (0xE0 | (lc >> 12)).toByte
          out(o + 1) = (0x80 | ((lc >> 6) & 0x3F)).toByte
          out(o + 2) = (0x80 | (lc & 0x3F)).toByte
          o += 3
        } else {
          out(o) = (0xF0 | (lc >> 18)).toByte
          out(o + 1) = (0x80 | ((lc >> 12) & 0x3F)).toByte
          out(o + 2) = (0x80 | ((lc >> 6) & 0x3F)).toByte
          out(o + 3) = (0x80 | (lc & 0x3F)).toByte
          o += 4
        }
        i += len
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** String-side fold for driver-side kernels (BPE pre-tokenization). */
  def lower(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }
}

/** simple_lower(string) -> string: Unicode simple (per-code-point)
  * lowercase; see [[SimpleCaseFold]] for why this, not `lower()`. */
case class SimpleLower(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simple_lower"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simple_lower expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SimpleCaseFold.lower(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimpleCaseFold.lower($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
