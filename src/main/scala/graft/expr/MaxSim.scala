package graft.expr

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData

/**
 * Late-interaction MaxSim scoring (the ColBERT comparator; the
 * vector-backend "multivector" scoring mode): a point stores SEVERAL
 * token-level vectors, flattened into one `array<float>` of
 * `tokens × subDim` elements, and the score of (query, doc) is
 *
 *   Σ_{i ∈ query tokens}  max_{j ∈ doc tokens}  cos(q_i, d_j)
 *
 * — every query token finds its best-matching doc token; totals are NOT
 * normalized by token count (the published formulation; callers wanting a
 * mean divide by the known token count).
 *
 * Flattened-array representation: one contiguous buffer per point keeps
 * the corpus column a plain `array<float>` (same storage/scan shape as
 * single-vector search — no nested arrays in the Parquet schema) and the
 * kernel a two-level index loop over primitive floats.
 *
 * Determinism discipline: each pairwise cosine is floor-quantized to the
 * 1e-6 grid BEFORE the max (`floor(x·1e6 + 0.5)/1e6` — the [[graft.search.Mmr]]
 * convention), so an engine differing in the last ulp of one cosine
 * cannot flip which token wins; the per-token maxima are exact multiples
 * of 1e-6, so their double sum is cross-engine exact at any realistic
 * token count. Trailing elements beyond the last full `subDim` block are
 * ignored on both sides; a side with zero full tokens scores 0.
 */
object MaxSimOps {
  def maxSim(q: ArrayData, d: ArrayData, subDim: Int): Double = {
    val qTok = q.numElements() / subDim
    val dTok = d.numElements() / subDim
    if (qTok == 0 || dTok == 0) return 0.0
    var total = 0.0
    var i = 0
    while (i < qTok) {
      var best = Double.NegativeInfinity
      var j = 0
      while (j < dTok) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var t = 0
        while (t < subDim) {
          val x = q.getFloat(i * subDim + t).toDouble
          val y = d.getFloat(j * subDim + t).toDouble
          dot += x * y; na += x * x; nb += y * y
          t += 1
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        val c = if (den == 0.0) 0.0 else dot / den
        val c6 = math.floor(c * 1e6 + 0.5) / 1e6
        if (c6 > best) best = c6
        j += 1
      }
      total += best
      i += 1
    }
    total
  }
}

/** max_sim(q, d) over flattened multivector array<float> columns; `subDim`
  * is the per-token dimensionality (a plan-time constant, like the
  * quantization expressions' dims). Double result, codegen via the static
  * kernel. */
case class MaxSim(left: Expression, right: Expression, subDim: Int)
    extends VectorBinary {
  require(subDim > 0, s"subDim must be positive, got $subDim")
  override def prettyName: String = "max_sim"
  override def nullSafeEval(a: Any, b: Any): Any =
    MaxSimOps.maxSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], subDim)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.MaxSimOps.maxSim($a, $b, $subDim)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
