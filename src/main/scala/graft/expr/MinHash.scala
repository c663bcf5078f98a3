package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * MinHash signature over a shingle array, fused into one expression: the
 * whole (numHashes × |shingles|) min-plane is computed in a tight loop
 * instead of numHashes interpreted higher-order-function passes — the
 * difference between O(minutes) and O(ms) per million shingles.
 *
 * Hash family: Kirsch-Mitzenmacher double hashing — g_j(s) = h1(s) + j·h2(s)
 * with h1/h2 = xxhash64 of the shingle bytes under seeds 0/1. Two byte
 * passes per shingle regardless of numHashes; standard MinHash quality.
 * Empty/all-null arrays yield Long.MaxValue sentinels (no shingles ⇒
 * matches nothing).
 */
object MinHashOps {
  def signature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val h1 = XxHash64Function.hash(s, StringType, 0L)
        val h2 = XxHash64Function.hash(s, StringType, 1L)
        var j = 0
        var h = h1
        while (j < numHashes) {
          if (h < out(j)) out(j) = h
          h += h2 // g_j = h1 + j*h2, accumulated
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashBandOps {
  /** LSH band keys straight from the shingle array: signature (as in
    * [[MinHashOps.signature]]) banded into `bands` groups of
    * numHashes/bands rows, each group mixed into one 64-bit key that also
    * encodes the band index (so keys from different bands never match).
    * One kernel pass — no per-band slice/hash expression trees. */
  def bandKeys(shingles: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val sig = MinHashOps.signature(shingles, numHashes).asInstanceOf[GenericArrayData]
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // xxhash-style finalization mix over the band's rows, seeded by the
      // band index.
      var h = 0x9e3779b97f4a7c15L * (b + 1)
      var j = b * r
      val end = j + r
      while (j < end) {
        var v = sig.getLong(j)
        v *= 0xc2b2ae3d27d4eb4fL
        v = java.lang.Long.rotateLeft(v, 31)
        v *= 0x9e3779b185ebca87L
        h ^= v
        h = java.lang.Long.rotateLeft(h, 27) * 5 + 0x52dce729L
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** min_hash_sig(array<string>, numHashes) -> array<long> signature. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")
  override def prettyName: String = "min_hash_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_hash_sig expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    MinHashOps.signature(v.asInstanceOf[ArrayData], numHashes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MinHashOps.signature($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** min_hash_band_keys(array<string>, numHashes, bands) -> array<long> of
  * band-index-salted LSH keys (docs sharing ANY key are candidates). */
case class MinHashBandKeys(child: Expression, numHashes: Int, bands: Int)
  extends UnaryExpression {
  require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
    s"numHashes ($numHashes) must divide evenly into bands ($bands)")
  override def prettyName: String = "min_hash_band_keys"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_hash_band_keys expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    MinHashBandOps.bandKeys(v.asInstanceOf[ArrayData], numHashes, bands)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.MinHashBandOps.bandKeys($c, $numHashes, $bands)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
