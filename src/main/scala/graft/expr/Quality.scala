package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused document-quality and language-id kernels — the codegen replacements
 * for the original [[graft.text.TextAnalysis]] expression-tree spellings,
 * with BIT-IDENTICAL output (pinned in QualitySpec against the original
 * Column trees on every fixture + adversarial Unicode strings).
 *
 * Why fused (r21 optimization round, guide §1.2 "per-task work" / §4
 * "prefer codegen expressions"): `qualityScore` expanded to a huge Catalyst
 * tree — four `array_intersect`s against 10-element literal arrays, a
 * regex count, a tokenize, and a token count — inlined at every use site.
 * In `curation_pipeline` the inlining (filter + selection + struct-field
 * re-extraction) blew WholeStageCodegen's 64 KB method limit: janino
 * failed, the whole stage silently fell back to interpreted execution,
 * and the compile was retried (and re-failed) on every run. One
 * `double`-returning kernel call replaces the entire tree.
 *
 * Semantics pinned (all replicated exactly — the DuckDB oracle twins
 * replay the same definitions in independent SQL):
 *
 *  - tokens = non-empty whitespace runs of the simple-case-folded text
 *    ([[TokenOps]] — Java regex `\s` is exactly the six ASCII bytes
 *    {0x09..0x0D, 0x20}).
 *  - `punct` = count of CODE POINTS matching `[^A-Za-z0-9_\s]` over the
 *    RAW text; `total` = code-point count. A byte scan reproduces the
 *    Java-regex code-point count exactly: ASCII bytes classify directly,
 *    every non-ASCII code point (one UTF-8 lead byte) matches the negated
 *    class once (incl. astral code points — Java regex negated classes
 *    are code-point-aware).
 *  - stop hits per language = |distinct tokens ∩ stopword set| (the
 *    `array_intersect` distinctness), summed over the four sets. The
 *    kernel tracks a 40-bit seen-mask (one bit per (set, word)), so
 *    per-set distinctness and cross-set double counting behave exactly
 *    like the four summed `array_intersect` sizes.
 *  - float order: ((min(1, n/100) * (1 - punct_ratio)) * (0.5 + ((0.5 *
 *    min(hits,5)) / 5))) with int→double casts where the original cast —
 *    identical IEEE-754 results, same bits.
 *  - langId: CJK code point present ⇒ "zh"; else argmax of per-set hits
 *    with priority en>es>de>fr on ties, "und" when all zero. CJK =
 *    `[\x{4e00}-\x{9fff}]` over the raw text (3-byte UTF-8 decode).
 */
object QualityOps {
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)
  @inline private def isWordAscii(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  // --- stopword table ----------------------------------------------------
  // One bit per (set, word): en 0-9, es 10-19, de 20-29, fr 30-39. Words are
  // 1-4 ASCII bytes; key = (len << 32) | big-endian packed bytes (length in
  // the key keeps "of" distinct from any 4-byte token whose tail bytes are
  // zero — NUL is a token byte, not whitespace). Open-addressed table,
  // allocation-free probes.
  private val stopwordSets: Array[Array[String]] = Array(
    Array("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    Array("el", "los", "las", "que", "y", "una", "por", "como", "pero", "con"),
    Array("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    Array("le", "les", "et", "est", "une", "des", "du", "dans", "pour", "sur"))

  private final val TableBits = 8
  private final val TableSize = 1 << TableBits // 256 slots for 40 keys
  private val tableKeys = new Array[Long](TableSize)
  private val tableMasks = new Array[Long](TableSize)

  @inline private def slot(key: Long): Int =
    (((key * 0x9e3779b97f4a7c15L) >>> (64 - TableBits)).toInt) & (TableSize - 1)

  // static init: insert the 40 (set, word) bits; a word in several sets
  // accumulates several bits under one key.
  {
    var set = 0
    while (set < 4) {
      var w = 0
      while (w < 10) {
        val word = stopwordSets(set)(w)
        val bytes = word.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        var packed = 0L
        var i = 0
        while (i < bytes.length) { packed = (packed << 8) | (bytes(i) & 0xffL); i += 1 }
        val key = (bytes.length.toLong << 32) | packed
        var s = slot(key)
        while (tableKeys(s) != 0L && tableKeys(s) != key) s = (s + 1) & (TableSize - 1)
        tableKeys(s) = key
        tableMasks(s) |= 1L << (set * 10 + w)
        w += 1
      }
      set += 1
    }
  }

  @inline private def lookupMask(key: Long): Long = {
    var s = slot(key)
    while (true) {
      val k = tableKeys(s)
      if (k == key) return tableMasks(s)
      if (k == 0L) return 0L
      s = (s + 1) & (TableSize - 1)
    }
    0L // unreachable
  }

  /** 40-bit seen-mask of stopword hits over the folded text's tokens. */
  private def stopSeenMask(folded: Array[Byte]): Long = {
    val n = folded.length
    var seen = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(folded(i))) i += 1
      val start = i
      while (i < n && !isWs(folded(i))) i += 1
      val len = i - start
      if (len >= 1 && len <= 4) {
        var packed = 0L
        var j = start
        while (j < i) { packed = (packed << 8) | (folded(j) & 0xffL); j += 1 }
        seen |= lookupMask((len.toLong << 32) | packed)
      }
    }
    seen
  }

  /** (code points total, code points matching `[^A-Za-z0-9_\s]`) of raw
    * bytes — the `length` / `regexp_count` pair of punctRatio. */
  private def punctCounts(raw: Array[Byte]): (Int, Int) = {
    val n = raw.length
    var total = 0
    var punct = 0
    var i = 0
    while (i < n) {
      val b = raw(i)
      if (b >= 0) { // ASCII
        total += 1
        if (!isWordAscii(b) && !isWs(b)) punct += 1
      } else if ((b & 0xC0) != 0x80) { // non-ASCII lead byte = one code point
        total += 1
        punct += 1
      }
      i += 1
    }
    (total, punct)
  }

  /** Fused [[graft.text.TextAnalysis.qualityScore]]:
    * min(1, n_tok/100) · (1 − punct_ratio) · (0.5 + 0.5·min(stop_hits,5)/5),
    * all sub-terms and float op order exactly as the original tree. */
  def score(s: UTF8String): Double = {
    val raw = s.getBytes
    // lengthTerm — token count is fold-invariant, raw-byte scan
    val nTok = TokenOps.tokenCount(s)
    val x = nTok.toDouble / 100.0
    val lengthTerm = if (x < 1.0) x else 1.0
    // clean = 1 − punctRatio (0 when empty)
    val (total, punct) = punctCounts(raw)
    val ratio = if (total == 0) 0.0 else punct.toDouble / total.toDouble
    val clean = 1.0 - ratio
    // stopTerm over folded tokens
    val folded = SimpleCaseFold.lower(s).getBytes
    val hits = java.lang.Long.bitCount(stopSeenMask(folded))
    val h = if (hits < 5) hits else 5
    val stopTerm = 0.5 + ((0.5 * h.toDouble) / 5.0)
    (lengthTerm * clean) * stopTerm
  }

  /** "und" as a shared UTF8String — the codegen null-input branch. */
  def langUnd(): UTF8String = LangUnd

  private val LangZh = UTF8String.fromString("zh")
  private val LangEn = UTF8String.fromString("en")
  private val LangEs = UTF8String.fromString("es")
  private val LangDe = UTF8String.fromString("de")
  private val LangFr = UTF8String.fromString("fr")
  private val LangUnd = UTF8String.fromString("und")

  /** Any code point in [U+4E00, U+9FFF] (3-byte UTF-8: E4B880..E9BFBF)? */
  private def hasCjk(raw: Array[Byte]): Boolean = {
    val n = raw.length
    var i = 0
    while (i < n) {
      val ub = raw(i) & 0xff
      // check every position as a potential 3-byte lead; continuation
      // bytes (0x80-0xBF) can never sit in [0xE0, 0xEF], so a byte-by-byte
      // walk is both malformed-input-safe and false-positive-free.
      if (ub >= 0xE0 && ub <= 0xEF && i + 2 < n &&
          (raw(i + 1) & 0xC0) == 0x80 && (raw(i + 2) & 0xC0) == 0x80) {
        val cp = ((ub & 0x0F) << 12) | ((raw(i + 1) & 0x3F) << 6) | (raw(i + 2) & 0x3F)
        if (cp >= 0x4E00 && cp <= 0x9FFF) return true
      }
      i += 1
    }
    false
  }

  /** Fused [[graft.text.TextAnalysis.langId]]. */
  def langId(s: UTF8String): UTF8String = {
    val raw = s.getBytes
    if (hasCjk(raw)) return LangZh
    val folded = SimpleCaseFold.lower(s).getBytes
    val seen = stopSeenMask(folded)
    val en = java.lang.Long.bitCount(seen & 0x3FFL)
    val es = java.lang.Long.bitCount(seen & (0x3FFL << 10))
    val de = java.lang.Long.bitCount(seen & (0x3FFL << 20))
    val fr = java.lang.Long.bitCount(seen & (0x3FFL << 30))
    if (en >= es && en >= de && en >= fr && en > 0) LangEn
    else if (es >= de && es >= fr && es > 0) LangEs
    else if (de >= fr && de > 0) LangDe
    else if (fr > 0) LangFr
    else LangUnd
  }
}

/** quality_score(string) -> double (see [[QualityOps.score]]). */
case class QualityScore(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quality_score"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_score expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    QualityOps.score(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.QualityOps.score($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lang_id(string) -> string (see [[QualityOps.langId]]). NULL input maps
  * to "und", never NULL — the original CASE tree's `otherwise("und")`
  * caught the all-NULL-predicates case, and the kernel must match it. */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "lang_id"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) QualityOps.langUnd
    else QualityOps.langId(v.asInstanceOf[UTF8String])
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        UTF8String ${ev.value} = ${c.isNull}
          ? graft.expr.QualityOps.langUnd()
          : graft.expr.QualityOps.langId(${c.value});
      """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
