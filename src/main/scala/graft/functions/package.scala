package graft

import org.apache.spark.sql.{Column, GraftInternal, SparkSession}

import graft.expr._

/**
 * Column-level API over graft's custom Catalyst expressions, plus SQL
 * registration so `spark.sql("SELECT cosine_similarity(a,b) ...")` works.
 */
package object functions {
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftInternal.column(e)
  private def ex(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftInternal.expression(c)

  /** Cosine similarity of two array<float> columns, as double. */
  def cosine_similarity(a: Column, b: Column): Column = col(CosineSimilarity(ex(a), ex(b)))

  /** Dot product of two array<float> columns, as double. */
  def dot_product(a: Column, b: Column): Column = col(DotProduct(ex(a), ex(b)))

  /** L2-normalize an array<float> column (zero vectors pass through). */
  def l2_normalize(a: Column): Column = col(L2Normalize(ex(a)))

  /** Euclidean norm of an array<float> column, as double. */
  def l2_norm(a: Column): Column = col(L2Norm(ex(a)))

  /** Euclidean (L2) distance of two array<float> columns, as double.
    * A DISTANCE — rank it ascending (the vector-backend Euclid mode). */
  def euclidean_distance(a: Column, b: Column): Column =
    col(EuclideanDistance(ex(a), ex(b)))

  /** Manhattan (L1) distance of two array<float> columns, as double;
    * rank ascending. */
  def manhattan_distance(a: Column, b: Column): Column =
    col(ManhattanDistance(ex(a), ex(b)))

  /** RFC 4122 UUIDv5 (DNS namespace) of a string column. */
  def uuid5(a: Column): Column = col(Uuid5(ex(a)))

  /** UTF-8-byte Levenshtein distance — the engine-portable edit-distance
    * unit (= DuckDB's `levenshtein`); see [[graft.expr.EditDistanceOps]]. */
  def byte_levenshtein(a: Column, b: Column): Column =
    col(ByteLevenshtein(ex(a), ex(b)))

  /** Unicode SIMPLE lowercase — the engine's canonical case fold:
    * per-code-point, context-free, locale-independent, SQL-replayable
    * (see [[graft.expr.SimpleCaseFold]] for why not `lower()`). */
  def simple_lower(a: Column): Column = col(SimpleLower(ex(a)))

  /** THE engine's cross-engine-stable 6-dp wire rounding:
    * `floor(x·1e6 + 0.5) / 1e6` in plain IEEE double arithmetic —
    * round-half-up, bit-identical in any engine for identical inputs
    * (Spark's `round()` is shortest-string BigDecimal HALF_UP, DuckDB's
    * is exact-binary; the two disagree exactly when a value sits on a
    * decimal half boundary, which happens STRUCTURALLY for means of
    * 6-dp scores). Every operator that emits a rounded score the oracle
    * replays folds through this one definition — changing the wire
    * rounding means changing it here and in the DuckDB twins together,
    * nowhere else. */
  def round6(c: Column): Column = {
    import org.apache.spark.sql.functions.{floor, lit}
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
  }

  /** Fused whitespace tokenizer: non-empty tokens of the simple-lowercased
    * input in one byte pass — byte-identical to (and the codegen
    * replacement for) `filter(split(simple_lower(x), "\\s+"), t ->
    * length(t) > 0)`; see [[graft.expr.TokenOps]]. */
  def simple_tokens(a: Column): Column = col(SimpleTokens(ex(a)))

  /** `size(simple_tokens(x))` without building the array (fold-free
    * raw-byte run count; see [[graft.expr.TokenOps.tokenCount]]). */
  def simple_token_count(a: Column): Column = col(SimpleTokenCount(ex(a)))

  /** Distinct word n-gram shingles (first-occurrence order) over
    * [[simple_tokens]], fused into one pass — the codegen replacement for
    * the array_distinct∘transform∘sequence shingle spelling. */
  def word_shingles(a: Column, n: Int): Column = col(WordShingles(ex(a), n))

  /** ALL word n-grams in position order over [[simple_tokens]] (the
    * span-dedup gram stream), fused into one pass. */
  def word_grams(a: Column, n: Int): Column = col(WordGrams(ex(a), n))

  /** Adjacent code-point bigrams in position order — the one-pass
    * replacement for `transform(sequence(1, len-1), i -> substring(x, i,
    * 2))`, whose per-position substring seek was O(len²). */
  def char_bigrams(a: Column): Column = col(CharBigrams(ex(a)))

  /** Count of non-whitespace code points — the fused replacement for
    * `length(regexp_replace(x, "\\s+", ""))`. */
  def non_ws_chars(a: Column): Column = col(NonWsCharCount(ex(a)))

  /** BPE-ish lexer token count (word runs + standalone non-word chars) —
    * the fused replacement for
    * `regexp_count(x, "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]")`. */
  def lex_token_count(a: Column): Column = col(LexTokenCount(ex(a)))

  /** Distinct-set Jaccard of two array<string> columns in one hash pass —
    * the fused replacement for size(array_intersect)/size(array_union). */
  def jaccard_sim(a: Column, b: Column): Column = col(JaccardSim(ex(a), ex(b)))

  /** Count of equal same-index non-null positions of two array<long>
    * columns — the fused replacement for
    * size(filter(zip_with(a, b, ==), v -> v)). */
  def sig_eq_count(a: Column, b: Column): Column = col(SigEqCount(ex(a), ex(b)))

  /** Fused document-quality heuristic (length × cleanliness × stopword
    * terms) — bit-identical, single-pass replacement for the original
    * Catalyst tree; see [[graft.expr.QualityOps.score]]. */
  def quality_score(a: Column): Column = col(QualityScore(ex(a)))

  /** Fused heuristic language id (CJK scan + stopword argmax) —
    * bit-identical single-pass replacement; see
    * [[graft.expr.QualityOps.langId]]. */
  def lang_id(a: Column): Column = col(LangIdExpr(ex(a)))

  /** 64-bit SimHash fingerprint of an array<string> token column. */
  def simhash64(a: Column): Column = col(SimHash64(ex(a)))

  /** MinHash signature (array<long> of length numHashes) of an
    * array<string> shingle column — fused single-pass kernel. */
  def min_hash_sig(a: Column, numHashes: Int): Column =
    col(MinHashSig(ex(a), numHashes))

  /** Fused LSH band keys (array<long> of length bands) of an array<string>
    * shingle column — see [[graft.expr.MinHashBandKeys]]. */
  def min_hash_band_keys(a: Column, numHashes: Int, bands: Int): Column =
    col(MinHashBandKeys(ex(a), numHashes, bands))

  /** SRP-LSH signature (≤64 bits) of an array<float> column. */
  def hyperplane_sig(a: Column, bits: Int, seed: Long): Column =
    col(HyperplaneSig(ex(a), bits, seed))

  /** MOSS-winnowed rolling-hash fingerprints (array<long>, distinct,
    * ascending) of a string column — see [[graft.expr.WinnowOps]]. */
  def winnow_fingerprints(a: Column, k: Int, w: Int): Column =
    col(WinnowFingerprints(ex(a), k, w))

  /** Hamming distance between two long fingerprints (builtin bit_count of
    * the xor — stays inside whole-stage codegen). */
  def hamming_dist(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")

  /** Indices (array<int>, best first) of the nProbe centroids most
    * cosine-similar to an array<float> column — the IVF cell
    * assignment/probe kernel. Centroids travel as a plan constant. */
  def nearest_centroids(a: Column, centroids: Array[Array[Float]], nProbe: Int): Column =
    col(NearestCentroids(ex(a), centroids, nProbe))

  /** L2-normalized byte-value histogram (array<float> of length buckets)
    * of a binary column — the modality-agnostic multimodal feature
    * kernel (any bytes; see image_grid_features for real image decode). */
  def byte_histogram(a: Column, buckets: Int): Column =
    col(ByteHistogram(ex(a), buckets))

  /** Decoded image metadata (struct(width, height, format)) of a binary
    * column via the JDK's ImageIO; NULL when undecodable. */
  def image_meta(a: Column): Column = col(ImageMeta(ex(a)))

  /** Mean-RGB g×g thumbnail features (array<float> of 3·grid², [0,1]) of
    * an image binary column — REAL decode via ImageIO; NULL when
    * undecodable. See [[graft.expr.ImageOps]]. */
  def image_grid_features(a: Column, grid: Int): Column =
    col(ImageGridFeatures(ex(a), grid))

  /** Decoded audio metadata (struct(sample_rate, channels, bits, n_frames,
    * format)) of a binary column via the JDK's javax.sound (WAV/AIFF/AU);
    * NULL when undecodable. */
  def audio_meta(a: Column): Column = col(AudioMeta(ex(a)))

  /** Per-window |sample| sums (array<long> of length windows) of an audio
    * binary column — the exact-integer energy-envelope core; NULL when
    * undecodable. See [[graft.expr.AudioOps]]. */
  def audio_env_sums(a: Column, windows: Int): Column =
    col(AudioEnvSums(ex(a), windows))

  /** Mean-|amplitude| energy envelope (array<float> of length windows,
    * [0,1]) of an audio binary column — REAL decode via javax.sound; NULL
    * when undecodable. */
  def audio_envelope(a: Column, windows: Int): Column =
    col(AudioEnvelope(ex(a), windows))

  /** Deterministic PCM16 mono WAV bytes from (seed, n_samples,
    * sample_rate) — fixture synthesis / smoke-test utility. */
  def synth_wav(seed: Column, nSamples: Column, sampleRate: Column): Column =
    col(SynthWav(ex(seed), ex(nSamples), ex(sampleRate)))

  /** Complete JPEG frames (array<binary>) of an MJPEG binary column,
    * split on SOI/EOI markers — the REAL video frame path (each frame
    * then decodes through ImageIO, e.g. [[image_grid_features]]). See
    * [[graft.expr.VideoOps]]. */
  def mjpeg_frames(a: Column): Column = col(MjpegFrames(ex(a)))

  /** Deterministic solid-gray MJPEG bytes from (seed, n_frames, size) —
    * fixture synthesis / smoke-test utility. */
  def synth_mjpeg(seed: Column, nFrames: Column, size: Column): Column =
    col(SynthMjpeg(ex(seed), ex(nFrames), ex(size)))

  /** Int8-quantize an array<float> column to binary codes (4x smaller;
    * symmetric per-vector scale, which cancels under cosine). */
  def quantize_int8(a: Column): Column = col(QuantizeInt8(ex(a)))

  /** Per-vector dequantization scale (float): v_i ≈ code_i * scale. */
  def int8_scale(a: Column): Column = col(Int8Scale(ex(a)))

  /** Cosine similarity of two int8 code (binary) columns, as double —
    * integer dot/norms on the codes, no dequantization. */
  def int8_cosine(a: Column, b: Column): Column = col(Int8Cosine(ex(a), ex(b)))

  /** Product-quantize an array<float> column to binary codes (one byte
    * per subspace — 32x smaller at 64-dim/m=8). Codebooks ride the plan
    * as a constant (train with [[graft.search.Pq.trainCodebooks]]). */
  def pq_encode(a: Column, codebooks: Array[Array[Array[Float]]]): Column =
    col(PqEncode(ex(a), codebooks))

  /** Asymmetric cosine of a float query column against a PQ code
    * (binary) column: query vs the codebook reconstruction — only the
    * corpus side pays quantization loss. */
  def pq_cosine(q: Column, codes: Column,
      codebooks: Array[Array[Array[Float]]]): Column =
    col(PqCosine(ex(q), ex(codes), codebooks))

  /** Binary-quantize an array<float> column to packed sign bits (1 bit
    * per component — 32x smaller, no codebooks). The extreme end of the
    * compression ladder; recover recall by rescoring over-fetched
    * candidates at full precision. */
  def binary_quantize(a: Column): Column = col(BitQuantize(ex(a)))

  /** Asymmetric cosine of a float query column against packed sign bits:
    * query vs the ±1 reconstruction — only the corpus side pays the
    * quantization loss. */
  def binary_cosine(q: Column, codes: Column): Column =
    col(BitCosine(ex(q), ex(codes)))

  /** Hamming distance (int) between two packed sign-bit code columns;
    * -1 on length mismatch. */
  def hamming_distance(a: Column, b: Column): Column =
    col(BitHamming(ex(a), ex(b)))

  /** Linear decay boost (the backend formula-query `lin_decay`):
    * `max(0, 1 − (1−midpoint)/scale · |x − target|)` — 1 at the target,
    * `midpoint` at distance `scale`, 0 beyond. Pure IEEE arithmetic
    * (no transcendentals), so the value is bit-identical cross-engine —
    * the decay to use inside oracle-checked formulas. */
  def lin_decay(x: Column, target: Column, scale: Column, midpoint: Column): Column = {
    import org.apache.spark.sql.{functions => F}
    F.greatest(F.lit(0.0),
      F.lit(1.0) - (F.lit(1.0) - midpoint) / scale * F.abs(x - target))
  }

  /** Exponential decay boost: `exp(ln(midpoint)/scale · |x − target|)`. */
  def exp_decay(x: Column, target: Column, scale: Column, midpoint: Column): Column = {
    import org.apache.spark.sql.{functions => F}
    F.exp(F.log(midpoint) / scale * F.abs(x - target))
  }

  /** Gaussian decay boost: `exp(ln(midpoint)/scale² · (x − target)²)`. */
  def gauss_decay(x: Column, target: Column, scale: Column, midpoint: Column): Column = {
    import org.apache.spark.sql.{functions => F}
    F.exp(F.log(midpoint) / (scale * scale) * F.pow(x - target, F.lit(2)))
  }

  /** Late-interaction MaxSim score of two flattened-multivector
    * array<float> columns (tokens × subDim elements each): for every
    * query token, the best 1e-6-quantized cosine against any doc token,
    * summed — the ColBERT / multivector-collection comparator. */
  def max_sim(q: Column, d: Column, subDim: Int): Column =
    col(MaxSim(ex(q), ex(d), subDim))

  /** Bounded-heap per-group top-k aggregate (map-side partials): keeps the
    * k best `payload` struct rows by (score desc, id asc) and returns them
    * best-first as array<struct>. The aggregate requires exact
    * (struct, double, long-or-string) input types and rejects anything
    * else at analysis time ([[graft.plans.TopKRows.checkInputDataTypes]]) —
    * callers own any coercion, deliberately: a blind cast here would turn
    * a string-typed score into a mid-job ANSI cast failure instead of an
    * analysis error. */
  def top_k_rows(payload: Column, score: Column, id: Column, k: Int): Column =
    col(graft.plans.TopKRows(ex(payload), ex(score), ex(id), k).toAggregateExpression())

  /** Register every graft function in the session's FunctionRegistry.
    * Parameterized kernels take their sizes/seeds as literal arguments in
    * SQL (evaluated at registration-expansion time, with named errors for
    * null / non-literal / non-numeric / out-of-range args). `top_k_rows`
    * is an aggregate: the analyzer wraps the registered AggregateFunction
    * when it appears in an aggregation context. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def litNum(fn: String, arg: String,
        e: org.apache.spark.sql.catalyst.expressions.Expression): Number = {
      if (!e.foldable)
        throw new IllegalArgumentException(s"$fn: $arg must be a literal, got ${e.sql}")
      e.eval() match {
        case n: Number => n
        case null => throw new IllegalArgumentException(s"$fn: $arg must not be null")
        case _ => throw new IllegalArgumentException(
          s"$fn: $arg must be a numeric literal, got ${e.sql}")
      }
    }
    def litInt(fn: String, arg: String)(
        e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
      val n = litNum(fn, arg, e)
      if (n.longValue != n.intValue)
        throw new IllegalArgumentException(
          s"$fn: $arg out of int range: ${n.longValue}")
      n.intValue
    }
    def litLong(fn: String, arg: String)(
        e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
      litNum(fn, arg, e).longValue
    // Coerce a RESOLVED numeric input (children are always resolved when
    // the analyzer invokes a function builder); non-numeric types pass
    // through uncast so the aggregate's own analysis-time check rejects
    // them with its message instead of a mid-job ANSI cast failure.
    def castIfNumeric(e: org.apache.spark.sql.catalyst.expressions.Expression,
        to: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.catalyst.expressions.Expression =
      if (e.resolved && e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
          && e.dataType != to)
        org.apache.spark.sql.catalyst.expressions.Cast(e, to)
      else e
    reg.createOrReplaceTempFunction("cosine_similarity", es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_normalize", es => L2Normalize(es.head), "built-in")
    reg.createOrReplaceTempFunction("l2_norm", es => L2Norm(es.head), "built-in")
    reg.createOrReplaceTempFunction("euclidean_distance", es => EuclideanDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("manhattan_distance", es => ManhattanDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("uuid5", es => Uuid5(es.head), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("simple_tokens", es => SimpleTokens(es.head), "built-in")
    reg.createOrReplaceTempFunction("simple_token_count",
      es => SimpleTokenCount(es.head), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es(0), litInt("word_shingles", "n")(es(1))), "built-in")
    reg.createOrReplaceTempFunction("word_grams",
      es => WordGrams(es(0), litInt("word_grams", "n")(es(1))), "built-in")
    reg.createOrReplaceTempFunction("char_bigrams", es => CharBigrams(es.head), "built-in")
    reg.createOrReplaceTempFunction("non_ws_chars", es => NonWsCharCount(es.head), "built-in")
    reg.createOrReplaceTempFunction("lex_token_count", es => LexTokenCount(es.head), "built-in")
    reg.createOrReplaceTempFunction("jaccard_sim", es => JaccardSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("sig_eq_count", es => SigEqCount(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("quality_score", es => QualityScore(es.head), "built-in")
    reg.createOrReplaceTempFunction("lang_id", es => LangIdExpr(es.head), "built-in")
    // the canonical fold + portable edit distance must be reachable from
    // SQL too — a SQL user falling back to lower() would get Spark's
    // full-mapping, default-locale fold, the exact divergence the engine
    // removed from its own path
    reg.createOrReplaceTempFunction("simple_lower", es => SimpleLower(es.head), "built-in")
    reg.createOrReplaceTempFunction("byte_levenshtein",
      es => ByteLevenshtein(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("quantize_int8", es => QuantizeInt8(es.head), "built-in")
    reg.createOrReplaceTempFunction("int8_scale", es => Int8Scale(es.head), "built-in")
    reg.createOrReplaceTempFunction("int8_cosine", es => Int8Cosine(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("binary_quantize", es => BitQuantize(es.head), "built-in")
    reg.createOrReplaceTempFunction("binary_cosine", es => BitCosine(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("hamming_distance", es => BitHamming(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("max_sim",
      es => MaxSim(es(0), es(1), litInt("max_sim", "subDim")(es(2))), "built-in")
    reg.createOrReplaceTempFunction("min_hash_sig",
      es => MinHashSig(es(0), litInt("min_hash_sig", "numHashes")(es(1))), "built-in")
    reg.createOrReplaceTempFunction("min_hash_band_keys",
      es => MinHashBandKeys(es(0), litInt("min_hash_band_keys", "numHashes")(es(1)),
        litInt("min_hash_band_keys", "bands")(es(2))), "built-in")
    reg.createOrReplaceTempFunction("byte_histogram",
      es => ByteHistogram(es(0), litInt("byte_histogram", "buckets")(es(1))), "built-in")
    reg.createOrReplaceTempFunction("image_meta",
      es => ImageMeta(es(0)), "built-in")
    reg.createOrReplaceTempFunction("image_grid_features",
      es => ImageGridFeatures(es(0), litInt("image_grid_features", "grid")(es(1))), "built-in")
    reg.createOrReplaceTempFunction("audio_meta",
      es => AudioMeta(es(0)), "built-in")
    reg.createOrReplaceTempFunction("audio_env_sums",
      es => AudioEnvSums(es(0), litInt("audio_env_sums", "windows")(es(1))), "built-in")
    reg.createOrReplaceTempFunction("audio_envelope",
      es => AudioEnvelope(es(0), litInt("audio_envelope", "windows")(es(1))), "built-in")
    reg.createOrReplaceTempFunction("synth_wav",
      es => SynthWav(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("mjpeg_frames",
      es => MjpegFrames(es(0)), "built-in")
    reg.createOrReplaceTempFunction("synth_mjpeg",
      es => SynthMjpeg(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("hyperplane_sig",
      es => HyperplaneSig(es(0), litInt("hyperplane_sig", "bits")(es(1)),
        litLong("hyperplane_sig", "seed")(es(2))), "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprints",
      es => WinnowFingerprints(es(0), litInt("winnow_fingerprints", "k")(es(1)),
        litInt("winnow_fingerprints", "w")(es(2))), "built-in")
    reg.createOrReplaceTempFunction("top_k_rows",
      es => graft.plans.TopKRows(es(0),
        castIfNumeric(es(1), org.apache.spark.sql.types.DoubleType),
        castIfNumeric(es(2), org.apache.spark.sql.types.LongType),
        litInt("top_k_rows", "k")(es(3))), "built-in")
  }
}
