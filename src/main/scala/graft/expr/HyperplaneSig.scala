package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Sign-random-projection (SRP) LSH signature for cosine similarity —
 * the scale path for approximate nearest-neighbor / near-dup search over
 * embedding columns: P(bit agrees) = 1 - θ/π, so Hamming distance on
 * signatures estimates angular distance.
 *
 * Hyperplanes are Rademacher (±1 entries) drawn from a deterministic
 * integer mix of (seed, bit, dim) — no RNG state, no driver-side plane
 * matrix to broadcast, identical on every executor and every run. ±1
 * projections are a standard SRP variant (sign of ⟨v, r⟩ with symmetric
 * r); computing them inline is one multiply-free pass per bit.
 */
object HyperplaneOps {
  /** splitmix64 finalizer — full avalanche on the packed (seed,bit,dim) key. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def signature(vec: ArrayData, numBits: Int, seed: Long): Long = {
    val n = vec.numElements()
    var out = 0L
    var b = 0
    while (b < numBits) {
      var s = 0.0
      var d = 0
      while (d < n) {
        val sign = if ((mix(seed * 0x51_7c_c1_b7L + b.toLong * 0x2545F4914F6CDD1DL + d) & 1L) == 0L) 1.0 else -1.0
        s += sign * vec.getFloat(d)
        d += 1
      }
      if (s > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** hyperplane_sig(vec) with fixed numBits/seed → long signature (≤64 bits). */
case class HyperplaneSig(child: Expression, numBits: Int, seed: Long)
    extends UnaryExpression {
  require(numBits >= 1 && numBits <= 64, "numBits must be in [1, 64]")
  override def prettyName: String = "hyperplane_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HyperplaneOps.signature(v.asInstanceOf[ArrayData], numBits, seed)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.HyperplaneOps.signature($c, $numBits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
