package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused whitespace tokenizer — the codegen replacement for the engine's
 * original `filter(split(simple_lower(text), "\\s+"), t -> length(t) > 0)`
 * spelling, with BYTE-IDENTICAL output (pinned in TokensSpec against the
 * original expression on every fixture + adversarial Unicode strings).
 *
 * Why fused (r21 optimization round, guide §1.2 "per-task work"):
 * stack-sampling the bench showed the old spelling as the #1 CPU sink of
 * the whole suite — `java.util.regex` dominates (the `\s+` pattern walks
 * every char through the NFA), `split` allocates a String round-trip plus
 * an ArrayList per row, and the outer `filter(...)` is a higher-order
 * `ArrayFilter`, which Catalyst CANNOT codegen: it runs interpreted AND
 * breaks the enclosing WholeStageCodegen span. One expression does one
 * byte pass instead.
 *
 * Semantics notes (why a byte scan is exact, not approximate):
 *  - Java regex `\s` (no UNICODE_CHARACTER_CLASS flag) is exactly the six
 *    ASCII bytes {0x09..0x0D, 0x20}. UTF-8 continuation bytes are ≥ 0x80,
 *    so scanning raw bytes can never split inside a multi-byte code point.
 *  - The simple case fold maps code points 1:1 and never maps any code
 *    point to or from ASCII whitespace, so folding the whole string first
 *    (as the original did) and folding each token are byte-equivalent; the
 *    fused kernel folds first, then slices tokens out of the folded buffer
 *    with zero copying.
 *  - `split` with limit −1 emits leading/trailing empty strings; the
 *    original dropped them with the length filter. A run scanner simply
 *    never produces them.
 */
object TokenOps {
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Non-empty simple-lowercased whitespace tokens, in order. */
  def tokens(s: UTF8String): ArrayData = {
    val folded = SimpleCaseFold.lower(s)
    val bytes = folded.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start)
        out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Token count = number of maximal non-whitespace runs. Boundaries are
    * case-fold-invariant, so this scans the RAW bytes — no fold, no
    * allocation; exactly `tokens(s).numElements()`. */
  def tokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    var inTok = false
    while (i < n) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) count += 1
      inTok = !ws
      i += 1
    }
    count
  }

  /** ALL word n-grams (single-space joined) in position order — fused
    * equivalent of
    * `transform(sequence(1, m-n+1), i -> array_join(slice(toks, i, n), ' '))`
    * over [[tokens]] (the span-dedup gram stream). Empty array when the
    * doc has fewer than n tokens (the original guarded `__len >= n`
    * upstream; `sequence(1, 0)` would count backwards). */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val folded = SimpleCaseFold.lower(s)
    val bytes = folded.getBytes
    val len = bytes.length
    val starts = new java.util.ArrayList[Integer](16)
    val ends = new java.util.ArrayList[Integer](16)
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) { starts.add(start); ends.add(i) }
    }
    val m = starts.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var t = 0
    while (t <= m - n) {
      var size = n - 1 // joining spaces
      var j = t
      while (j < t + n) { size += ends.get(j) - starts.get(j); j += 1 }
      val buf = new Array[Byte](size)
      var o = 0
      j = t
      while (j < t + n) {
        if (j > t) { buf(o) = 0x20.toByte; o += 1 }
        val l = ends.get(j) - starts.get(j)
        System.arraycopy(bytes, starts.get(j), buf, o, l)
        o += l
        j += 1
      }
      out(t) = UTF8String.fromBytes(buf)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Count of non-whitespace CODE POINTS — fused equivalent of
    * `length(regexp_replace(s, "\\s+", ""))` (which materialized the
    * stripped string just to count it). ASCII bytes classify directly;
    * every non-ASCII code point (one lead byte) is non-whitespace under
    * Java regex `\s` (the six ASCII bytes). */
  def nonWsCharCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 0) { if (!isWs(b)) count += 1 }
      else if ((b & 0xC0) != 0x80) count += 1
      i += 1
    }
    count
  }

  @inline private def isWordAscii(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** BPE-ish lexer token count — fused equivalent of
    * `regexp_count(s, "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]")`: maximal ASCII
    * word runs count once, every other non-whitespace code point counts
    * individually (the alternation's single-code-point class — non-ASCII
    * code points land there and also terminate a word run). */
  def lexTokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0
    var inWord = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 0) {
        if (isWordAscii(b)) { if (!inWord) count += 1; inWord = true }
        else { if (!isWs(b)) count += 1; inWord = false }
      } else {
        if ((b & 0xC0) != 0x80) count += 1 // one per non-ASCII code point
        inWord = false
      }
      i += 1
    }
    count
  }

  /** All adjacent CODE-POINT bigrams in position order — fused equivalent
    * of `transform(sequence(1, numChars-1), i -> substring(s, i, 2))`.
    * The original paid an O(i) code-point seek per substring call (O(len²)
    * per document); this is one boundary scan + zero-copy slices. Strings
    * with fewer than 2 code points yield an empty array (the original's
    * `sequence(1, 0)` case was guarded by an upstream length filter). */
  def charBigrams(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // code-point start offsets (continuation bytes are 10xxxxxx)
    val starts = new java.util.ArrayList[Integer](Math.min(n, 64))
    var i = 0
    while (i < n) {
      if ((bytes(i) & 0xC0) != 0x80) starts.add(i)
      i += 1
    }
    val m = starts.size()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - 1)
    var t = 0
    while (t < m - 1) {
      val a = starts.get(t)
      val b = if (t + 2 < m) starts.get(t + 2).intValue() else n
      out(t) = UTF8String.fromBytes(bytes, a, b - a)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles (single-space joined), first-occurrence
    * order — fused equivalent of
    * `array_distinct(transform(sequence(1, m-n+1), i -> concat_ws(" ", tok_i..tok_{i+n-1})))`
    * over [[tokens]]. Empty array when the doc has fewer than n tokens. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val folded = SimpleCaseFold.lower(s)
    val bytes = folded.getBytes
    val len = bytes.length
    // token spans over the folded buffer
    val starts = new java.util.ArrayList[Integer](16)
    val ends = new java.util.ArrayList[Integer](16)
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) { starts.add(start); ends.add(i) }
    }
    val m = starts.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    var t = 0
    while (t <= m - n) {
      var size = n - 1 // joining spaces
      var j = t
      while (j < t + n) { size += ends.get(j) - starts.get(j); j += 1 }
      val buf = new Array[Byte](size)
      var o = 0
      j = t
      while (j < t + n) {
        if (j > t) { buf(o) = 0x20.toByte; o += 1 }
        val l = ends.get(j) - starts.get(j)
        System.arraycopy(bytes, starts.get(j), buf, o, l)
        o += l
        j += 1
      }
      seen.add(UTF8String.fromBytes(buf))
      t += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

/** simple_tokens(string) -> array<string>: non-empty whitespace tokens of
  * the simple-lowercased input (see [[TokenOps]]). */
case class SimpleTokens(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simple_tokens"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simple_tokens expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenOps.tokens(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenOps.tokens($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simple_token_count(string) -> int: `size(simple_tokens(x))` in one
  * fold-free raw-byte pass (see [[TokenOps.tokenCount]]). */
case class SimpleTokenCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simple_token_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simple_token_count expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenOps.tokenCount(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenOps.tokenCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** word_grams(string, n) -> array<string>: ALL n-grams over
  * [[SimpleTokens]] in position order (see [[TokenOps.grams]]). */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram size must be >= 1, got $n")
  override def prettyName: String = "word_grams"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_grams expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenOps.grams(v.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenOps.grams($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** non_ws_chars(string) -> int (see [[TokenOps.nonWsCharCount]]). */
case class NonWsCharCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "non_ws_chars"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"non_ws_chars expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenOps.nonWsCharCount(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenOps.nonWsCharCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lex_token_count(string) -> int (see [[TokenOps.lexTokenCount]]). */
case class LexTokenCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "lex_token_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lex_token_count expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenOps.lexTokenCount(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenOps.lexTokenCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** char_bigrams(string) -> array<string>: adjacent code-point bigrams in
  * position order (see [[TokenOps.charBigrams]]). */
case class CharBigrams(child: Expression) extends UnaryExpression {
  override def prettyName: String = "char_bigrams"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_bigrams expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenOps.charBigrams(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenOps.charBigrams($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** word_shingles(string, n) -> array<string>: distinct n-gram shingles over
  * [[SimpleTokens]], first-occurrence order (see [[TokenOps.shingles]]). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenOps.shingles(v.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenOps.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
