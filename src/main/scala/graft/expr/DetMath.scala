package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic cross-engine math kernels.
 *
 * Transcendental functions (`ln`, `log2`, `exp`, `pow`) are NOT required
 * to be correctly rounded by IEEE 754, and implementations genuinely
 * differ in the last ulp between engines (JDK `StrictMath`/libm vs
 * DuckDB's `std::log2`). A score defined through libm therefore cannot be
 * bit-identical across engines — quantizing afterwards only shrinks the
 * boundary set, it does not remove it (this flipped `doc_perplexity`'s
 * hash gate in round 9 on a single boundary bigram).
 *
 * What IS bit-identical everywhere: `+ − × ÷` and comparisons on doubles
 * (IEEE 754 requires correct rounding for those). So we compute binary
 * logarithms by the classic shift-and-square bit-extraction algorithm
 * using only those operations: normalize the argument to m ∈ [1,2)
 * counting the exponent, then extract 20 fraction bits by repeated
 * squaring (m ← m², emit 1 and halve when m ≥ 2). Every intermediate is
 * a correctly-rounded double, so every engine takes exactly the same
 * branch at every step and produces exactly the same integer — the
 * result is deterministic BY CONSTRUCTION, even where accumulated
 * rounding (≲2⁻³³, far below the 2⁻²⁰ grid) makes the last bit differ
 * from the infinitely-precise log2.
 *
 * The fold is a builtin higher-order `aggregate` over a 64/20-element
 * `sequence` — no UDF; callers apply it to vocabulary-sized model
 * tables (bigram alphabets, term dictionaries), never per-corpus-row.
 */
object DetMath {

  /** 2²⁰ — the fixed-point scale of [[log2q20]]. */
  val Q: Long = 1L << 20

  /**
   * `floor(log2(num/den) · 2²⁰)` as BIGINT, engine-stable (see object
   * doc). Domain: `num`, `den` positive integers exact in double
   * (< 2⁵³) with ratio in (2⁻⁶⁴, 2⁶⁴).
   */
  def log2q20(num: Column, den: Column): Column = {
    val p = num.cast("double") / den.cast("double")
    // Normalize to m ∈ [1,2): ×2 / ÷2 are exponent shifts — exact.
    val norm = aggregate(
      sequence(lit(1), lit(64)),
      struct(p.as("m"), lit(0).as("e")),
      (s, _) => when(s.getField("m") >= lit(2.0d),
          struct((s.getField("m") * lit(0.5d)).as("m"),
            (s.getField("e") + lit(1)).as("e")))
        .when(s.getField("m") < lit(1.0d),
          struct((s.getField("m") * lit(2.0d)).as("m"),
            (s.getField("e") - lit(1)).as("e")))
        .otherwise(s))
    // Extract 20 fraction bits: m ← m² (correctly rounded, identical
    // everywhere); if m ≥ 2 the next bit is 1 and m halves (exact).
    val frac = aggregate(
      sequence(lit(1), lit(20)),
      struct(norm.getField("m").as("m"), lit(0L).as("acc")),
      (s, _) => {
        val m2 = s.getField("m") * s.getField("m")
        when(m2 >= lit(2.0d),
            struct((m2 * lit(0.5d)).as("m"),
              (s.getField("acc") * lit(2L) + lit(1L)).as("acc")))
          .otherwise(struct(m2.as("m"), (s.getField("acc") * lit(2L)).as("acc")))
      })
    norm.getField("e").cast("bigint") * lit(Q) + frac.getField("acc")
  }

  /** Scalar (driver-side) twin of [[log2q20]] — the identical
    * shift-and-square algorithm as a plain loop, for model-fit code that
    * computes a vocabulary-sized idf table once on the driver. Same
    * correctly-rounded IEEE ops ⇒ same integer as the Column kernel and
    * the DuckDB fragment, bit for bit. */
  def log2q20Long(num: Long, den: Long): Long = {
    require(num > 0 && den > 0, s"log2q20 domain: positive ints, got $num/$den")
    var m = num.toDouble / den.toDouble
    var e = 0L
    var it = 0
    while (it < 64) {
      if (m >= 2.0) { m *= 0.5; e += 1 }
      else if (m < 1.0) { m *= 2.0; e -= 1 }
      it += 1
    }
    var acc = 0L
    it = 0
    while (it < 20) {
      m = m * m
      if (m >= 2.0) { m *= 0.5; acc = acc * 2 + 1 } else acc = acc * 2
      it += 1
    }
    e * Q + acc
  }

  /** The engines' shared ln-2 literal (see bm25 idf); kept in one place so
    * Scala kernels and SQL twins can never drift. */
  val Ln2: Double = 0.6931471805599453

  /** 6-dp natural log from a q20 binary log: the exact arithmetic the
    * bm25/keywords/perplexity SQL twins perform —
    * `floor((q/2²⁰)·ln2·10⁶ + 0.5)/10⁶`, every step correctly rounded. */
  def ln6FromQ20(q: Long): Double =
    math.floor((q / 1048576.0) * Ln2 * 1000000.0 + 0.5) / 1000000.0

  /**
   * The DuckDB twin of [[log2q20]] as a `WITH RECURSIVE` fragment: binds
   * `<out>` = table (`<keyCols>`, `qlog`) given `<src>` = table
   * (`<keyCols>`, `num`, `den`). Splice into an oracle's WITH chain
   * (the query must open with `WITH RECURSIVE`).
   */
  def duckdbLog2q20(src: String, out: String, keyCols: String): String =
    s"""${out}__n AS (
       |  SELECT $keyCols, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS m, 0 AS e, 0 AS it
       |  FROM $src
       |  UNION ALL
       |  SELECT $keyCols,
       |    CASE WHEN m >= 2.0 THEN m * 0.5 WHEN m < 1.0 THEN m * 2.0 ELSE m END,
       |    CASE WHEN m >= 2.0 THEN e + 1 WHEN m < 1.0 THEN e - 1 ELSE e END,
       |    it + 1
       |  FROM ${out}__n WHERE it < 64
       |), ${out}__f AS (
       |  SELECT $keyCols, m, e, CAST(0 AS BIGINT) AS acc, 0 AS it
       |  FROM ${out}__n WHERE it = 64
       |  UNION ALL
       |  SELECT $keyCols,
       |    CASE WHEN m * m >= 2.0 THEN m * m * 0.5 ELSE m * m END,
       |    e,
       |    CASE WHEN m * m >= 2.0 THEN acc * 2 + 1 ELSE acc * 2 END,
       |    it + 1
       |  FROM ${out}__f WHERE it < 20
       |), $out AS (
       |  SELECT $keyCols, CAST(e AS BIGINT) * 1048576 + acc AS qlog
       |  FROM ${out}__f WHERE it = 20
       |)""".stripMargin
}
