package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation: token counting,
 * language identification, quality scoring, and document fingerprinting.
 * Everything here is pure Spark builtins (codegen'd, no UDFs) and — by
 * design — expressible in ANSI-ish SQL so every operator carries a DuckDB
 * oracle twin. No transcendental functions: libm implementations differ
 * between engines in the last ulp; all scoring is rational arithmetic.
 */
object TextAnalysis {

  /** Lower-cased whitespace tokens, empties dropped — THE canonical
    * tokenizer shared with the dedup pipelines ([[graft.dedup.Dedup.tokens]]
    * delegates here): shingles, simhash, langId and quality scoring must
    * all agree with the DuckDB oracles on one definition. The fold is the
    * Unicode SIMPLE lowercase ([[graft.functions.simple_lower]]) — per
    * code point, context-free, locale-independent — NOT Spark's full-
    * mapping `lower()`, whose Final_Sigma/locale context would make token
    * keys depend on surrounding text and on the executor JVM's locale. */
  def tokens(text: Column): Column = graft.functions.simple_tokens(text)

  /** Whitespace token count (fused fold-free kernel — same value as
    * `size(tokens(text))` without materializing the array). */
  def tokenCount(text: Column): Column = graft.functions.simple_token_count(text)

  /** BPE-ish lexer token count: word runs + each standalone non-word
    * non-space char (the usual pre-tokenizer granularity). */
  def regexTokenCount(text: Column): Column = graft.functions.lex_token_count(text)

  /** The pre-fusion regex spelling of [[regexTokenCount]] — the TokensSpec
    * equivalence reference. */
  private[graft] def regexTokenCountTree(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"))

  /** Mean token length = non-whitespace chars / tokens (0 for empty docs).
    * (r21: the non-ws char count is a fused byte scan — the original
    * regexp_replace materialized the whitespace-stripped string just to
    * length() it.) */
  def avgTokenLen(text: Column): Column = {
    val chars = graft.functions.non_ws_chars(text)
    val n = tokenCount(text)
    when(n === 0, 0.0).otherwise(chars.cast("double") / n)
  }

  /** The pre-fusion spelling of [[avgTokenLen]] — the TokensSpec
    * equivalence reference. */
  private[graft] def avgTokenLenTree(text: Column): Column = {
    val chars = length(regexp_replace(text, "\\s+", ""))
    val n = size(tokens(text))
    when(n === 0, 0.0).otherwise(chars.cast("double") / n)
  }

  /** Punctuation (non-word, non-space) chars / total chars; 0 for empty. */
  def punctRatio(text: Column): Column = {
    val punct = regexp_count(text, lit("[^A-Za-z0-9_\\s]"))
    val total = length(text)
    when(total === 0, 0.0).otherwise(punct.cast("double") / total)
  }

  // Small discriminative stopword sets. Overlapping words (de/la/en...)
  // are fine: identification is argmax with a fixed priority tie-break.
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "los", "las", "que", "y", "una", "por", "como", "pero", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "fr" -> Seq("le", "les", "et", "est", "une", "des", "du", "dans", "pour", "sur"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*)))

  /** Heuristic language id: CJK characters ⇒ zh; otherwise the language
    * with the most (distinct) stopword hits, priority order en>es>de>fr on
    * ties; 'und' when nothing matches. */
  def langId(text: Column): Column = graft.functions.lang_id(text)

  /** Quality score in [0,1]: length criterion × cleanliness × stopword
    * signal — the standard cheap pre-filter shape (rational arithmetic
    * only, so any engine computes it bit-identically):
    * min(1, n_tok/100) · (1 − punct_ratio) · (0.5 + 0.5·min(stop_hits,5)/5).
    */
  def qualityScore(text: Column): Column = graft.functions.quality_score(text)

  /** The pre-fusion expression-tree spelling of [[qualityScore]] — kept
    * (package-visible) as the semantic reference the QualitySpec
    * equivalence pins the fused kernel against. */
  private[graft] def qualityScoreTree(text: Column): Column = {
    val toks = tokens(text)
    val lengthTerm = least(lit(1.0), tokenCount(text).cast("double") / 100.0)
    val clean = lit(1.0) - punctRatio(text)
    val stopHits = stopwords.map { case (_, w) => hits(toks, w) }
      .reduce(_ + _)
    val stopTerm = lit(0.5) + lit(0.5) * least(stopHits, lit(5)).cast("double") / 5.0
    lengthTerm * clean * stopTerm
  }

  /** The pre-fusion expression-tree spelling of [[langId]] — the
    * QualitySpec equivalence reference. */
  private[graft] def langIdTree(text: Column): Column = {
    val toks = tokens(text)
    val h = stopwords.map { case (lang, words) => lang -> hits(toks, words) }.toMap
    val cjk = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))
    when(cjk > 0, "zh")
      .when(h("en") >= h("es") && h("en") >= h("de") && h("en") >= h("fr") && h("en") > 0, "en")
      .when(h("es") >= h("de") && h("es") >= h("fr") && h("es") > 0, "es")
      .when(h("de") >= h("fr") && h("de") > 0, "de")
      .when(h("fr") > 0, "fr")
      .otherwise("und")
  }

  /** 64-bit document fingerprint: first 16 hex chars of md5 over the
    * whitespace-normalized lower-cased text — stable under reflow. */
  def fingerprint(text: Column): Column =
    substring(md5(regexp_replace(graft.functions.simple_lower(text), "\\s+", " ")), 1, 16)

  /** Canonical normal form for normalization-aware dedup: lower-case,
    * drop everything but `[a-z0-9 ]` plus whitespace, collapse whitespace
    * runs, trim. Every class is ASCII-EXPLICIT — `\s` itself is NOT
    * engine-portable (Java's includes vertical tab `\x0B`, RE2's does
    * not), so the whitespace set is spelled out. Casing/punctuation/
    * reflow variants of a document normalize to one string; exact dedup
    * on `md5(normalize(text))` then catches what raw `md5(text)` misses. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      graft.functions.simple_lower(text), "[^a-z0-9 \\t\\n\\r\\f]", ""),
      "[ \\t\\n\\r\\f]+", " "))

  /** Adjacent-token bigrams ("a b") of the canonical tokens — n-gram LM /
    * collocation statistics input. Empty array below 2 tokens.
    * (r21: the zip_with spelling ran as an interpreted higher-order
    * function; adjacent bigrams are exactly the n=2 fused gram kernel.) */
  def bigrams(text: Column): Column = graft.functions.word_grams(text, 2)

  /** The pre-fusion zip_with spelling of [[bigrams]] — the TokensSpec
    * equivalence reference. */
  private[graft] def bigramsTree(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n < 2, array().cast("array<string>"))
      .otherwise(zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
  }

  // --- pattern surface for filtering/PII-screening pipelines ------------
  // Deliberately simple regexes that mean the same thing in Java regex and
  // RE2 (DuckDB) so the oracles stay cross-engine exact.

  /** `http://` / `https://` URL occurrences. */
  def urlCount(text: Column): Column =
    regexp_count(text, lit("https?://[^\\s]+"))

  /** Email-address occurrences (pragmatic pattern, not RFC 5322). */
  def emailCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))

  /** PII/pattern redaction: replace every URL, email address, and long
    * digit run (8+ digits — phone/account/card-number shaped) with sentinel
    * tokens. Counting patterns ([[urlCount]]/[[emailCount]]) screens; this
    * is the removing transform a curation pipeline actually ships. Cascade
    * order is URL → email → digits: a URL containing `user@host` path
    * segments is redacted whole before the email pass can split it, and the
    * digit pass runs last so it can't corrupt either pattern. Pure
    * `regexp_replace` cascade — codegen'd, map-side, no UDF — and each
    * pattern means the same thing in Java regex and RE2, so the DuckDB
    * oracle twin is exact. */
  def redact(text: Column): Column = {
    val noUrl = regexp_replace(text, "https?://[^\\s]+", "<URL>")
    val noEmail = regexp_replace(noUrl,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "[0-9]{8,}", "<NUM>")
  }

  /** Decimal digits / total chars; 0 for empty docs. Numeric-table dumps
    * and log spew score high — a standard quality-filter input. */
  def digitRatio(text: Column): Column = {
    val digits = regexp_count(text, lit("[0-9]"))
    val total = length(text)
    when(total === 0, 0.0).otherwise(digits.cast("double") / total)
  }

  /** Repeated-token fraction: 1 − distinct/total tokens (0 for empty docs).
    * The cheap repetition signal of the Gopher-style quality filters —
    * boilerplate and degenerate generations score high. Rational arithmetic
    * only, like every score here. */
  def repetitionRatio(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n === 0, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / n)
  }

  // --- Gopher document-level quality rules (Rae et al. 2021, App. A1.1) --
  // The published heuristic filter suite re-expressed over the canonical
  // tokenizer. Every term is a single integer-ratio division or an
  // anchored cross-engine regex, so the rule BOOLEANS (not just rounded
  // ratios) compare bit-identically against the DuckDB twin — threshold
  // comparisons happen on exactly-reproducible doubles.

  /** Gopher symbol-to-word ratio: '#' and '...' occurrences per token. */
  def symbolWordRatio(text: Column): Column = {
    val n = tokenCount(text)
    val sym = regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\."))
    when(n === 0, 0.0).otherwise(sym.cast("double") / n)
  }

  /** Fraction of tokens containing at least one letter (tokens are
    * lower-cased, so `[a-z]` covers the alphabet). */
  def alphaWordRatio(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n === 0, 0.0)
      .otherwise(size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / n)
  }

  /** Fraction of lines whose first non-blank char is a bullet (-, *, •). */
  def bulletLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    val n = size(lines)
    when(n === 0, 0.0).otherwise(
      size(filter(lines, l => substring(ltrim(l), 1, 1).isin("-", "*", "•")))
        .cast("double") / n)
  }

  /** Fraction of lines ending (after right-trim) in an ellipsis. */
  def ellipsisLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    val n = size(lines)
    when(n === 0, 0.0).otherwise(
      size(filter(lines, l => rtrim(l).rlike("\\.\\.\\.$"))).cast("double") / n)
  }

  /** Distinct hits of Gopher's required-English-word list. */
  def gopherStopHits(text: Column): Column =
    size(array_intersect(tokens(text),
      array(Seq("the", "be", "to", "of", "and", "that", "have", "with").map(lit): _*)))

  /** The composite Gopher keep decision at the published thresholds:
    * 50 ≤ words ≤ 100 000, mean word length in [3, 10], symbol-to-word
    * ≤ 0.1, bullet-started lines ≤ 90%, ellipsis-ended lines ≤ 30%,
    * ≥ 80% alphabetic words, ≥ 2 of the required stop words. */
  def gopherKeep(text: Column): Column =
    tokenCount(text).between(50, 100000) &&
      avgTokenLen(text).between(3.0, 10.0) &&
      symbolWordRatio(text) <= 0.1 &&
      bulletLineRatio(text) <= 0.9 &&
      ellipsisLineRatio(text) <= 0.3 &&
      alphaWordRatio(text) >= 0.8 &&
      gopherStopHits(text) >= 2
}
