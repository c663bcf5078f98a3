package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Engine-stable hashed TF-IDF kernels — the fused map-side core of
 * [[graft.embed.TfIdfEmbedder]].
 *
 * Every arithmetic step is chosen to be bit-identical in any IEEE-754
 * engine, so the full embedding pipeline (and everything downstream of
 * it: norms, cosines, top-k ranks) is exactly replayable in DuckDB SQL:
 *  - token bucket = FNV-1a-64 of the UTF-8 bytes ([[SimHashOps.fnv1a64]],
 *    already SQL-replayed for simhash) reduced UNSIGNED mod dim
 *    (`Long.remainderUnsigned` — a signed-fold-then-fix dance would not
 *    replay as a plain `% dim` on the unsigned SQL side);
 *  - idf is 6-dp-quantized at the source through the shift-and-square q20
 *    log kernel ([[DetMath.log2q20Long]]) — no libm anywhere;
 *  - tf·idf products, the sequential sum of squares, `sqrt`, the
 *    normalizing division, and the final float32 cast are all correctly
 *    rounded by IEEE-754 and identical across engines.
 *
 * The per-row cost is one hash pass over the tokens plus O(dim) output —
 * pure map work; nothing here shuffles or references corpus state beyond
 * the plan-constant idf table.
 */
object TfIdfOps {
  def bucket(token: org.apache.spark.unsafe.types.UTF8String, dim: Int): Int =
    java.lang.Long.remainderUnsigned(
      SimHashOps.fnv1a64(token.getBytes), dim.toLong).toInt

  /** Distinct FNV buckets of a token array, ascending — the document-
    * frequency unit for the fit pass. */
  def distinctBuckets(tokens: ArrayData, dim: Int): ArrayData = {
    val seen = new Array[Boolean](dim)
    val n = tokens.numElements()
    var i = 0
    var k = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val b = bucket(tokens.getUTF8String(i), dim)
        if (!seen(b)) { seen(b) = true; k += 1 }
      }
      i += 1
    }
    val out = new Array[Int](k)
    var b = 0
    var j = 0
    while (b < dim) { if (seen(b)) { out(j) = b; j += 1 }; b += 1 }
    new GenericArrayData(out)
  }

  /** tf·idf vector: counts per bucket × the 6-dp idf table, optionally
    * L2-normalized (sequential sum of squares in bucket order, division
    * by the sqrt), cast to float32. All-zero rows stay all-zero. */
  def vector(tokens: ArrayData, idf6: Array[Double],
      normalized: Boolean): ArrayData = {
    val dim = idf6.length
    val counts = new Array[Long](dim)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) counts(bucket(tokens.getUTF8String(i), dim)) += 1L
      i += 1
    }
    val v = new Array[Double](dim)
    var b = 0
    while (b < dim) { v(b) = counts(b).toDouble * idf6(b); b += 1 }
    val out = new Array[Float](dim)
    if (normalized) {
      var ss = 0.0
      b = 0
      while (b < dim) { ss += v(b) * v(b); b += 1 }
      if (ss == 0.0) return new GenericArrayData(out)
      val nm = math.sqrt(ss)
      b = 0
      while (b < dim) { out(b) = (v(b) / nm).toFloat; b += 1 }
    } else {
      b = 0
      while (b < dim) { out(b) = v(b).toFloat; b += 1 }
    }
    new GenericArrayData(out)
  }
}

/** tfidf_buckets(array<string>) -> array<int>: distinct hash buckets
  * (the fit pass's document-frequency unit). */
case class TfIdfBuckets(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1, s"dim must be positive, got $dim")
  override def prettyName: String = "tfidf_buckets"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tfidf_buckets expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TfIdfOps.distinctBuckets(v.asInstanceOf[ArrayData], dim)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TfIdfOps.distinctBuckets($c, $dim)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** tfidf_vector(array<string>) -> array<float>: the fused
  * hash→count→idf-scale→normalize kernel; the idf table rides as a plan
  * constant (like [[NearestCentroids]]' centroid table). */
case class TfIdfVector(
    child: Expression,
    idf6: Array[Double],
    normalized: Boolean) extends UnaryExpression {
  require(idf6.nonEmpty, "idf table must not be empty")
  override def prettyName: String = "tfidf_vector"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tfidf_vector expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TfIdfOps.vector(v.asInstanceOf[ArrayData], idf6, normalized)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idfRef = ctx.addReferenceObj("idf6", idf6, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TfIdfOps.vector($c, $idfRef, $normalized)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  // Array fields compare by reference in case-class equality — compare
  // content so identical transforms canonicalize (same rationale as
  // NearestCentroids).
  override def equals(other: Any): Boolean = other match {
    case that: TfIdfVector =>
      normalized == that.normalized && child == that.child &&
        java.util.Arrays.equals(idf6, that.idf6)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Boolean.valueOf(normalized),
      Integer.valueOf(java.util.Arrays.hashCode(idf6)))
}
