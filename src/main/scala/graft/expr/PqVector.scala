package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Product-quantization kernels (Jégou, Douze, Schmid: "Product
 * Quantization for Nearest Neighbor Search", TPAMI 2011): the vector is
 * split into `m` contiguous subspaces and each subvector is replaced by
 * the index of its nearest codebook centroid — one BYTE per subspace at
 * codebook size ≤ 256. A 64-dim float vector (256 B) becomes 8 bytes at
 * m = 8: 32× compression, vs int8's 4×. Scoring is asymmetric (ADC): the
 * float query is compared against the RECONSTRUCTION Σ_j cb[j][code_j],
 * so only the corpus side pays the quantization loss.
 *
 * cosine(q, x̂) = Σ_j dot(q_j, cb[j][c_j]) / (‖q‖ · sqrt(Σ_j ‖cb[j][c_j]‖²))
 *
 * — the reconstruction's norm is a table lookup (‖·‖² precomputed per
 * codebook entry at plan construction), so scoring costs D multiply-adds
 * on the query side and ZERO decode of the corpus bytes beyond the m
 * index reads. The win at 100 TB is bandwidth, not FLOPs: scans, cache,
 * and shuffle move 1/32 of the vector bytes.
 *
 * Codebooks ride the plan as constants (m × k × dsub floats — ~64 KB at
 * 64-dim/m8/k256), same pattern as [[NearestCentroids]].
 */
object PqVectorOps {
  /** PQ codes: per subspace, the index of the L2-nearest codebook
    * centroid. `cb(j)(c)` is centroid c of subspace j (length dim/m). */
  def encode(v: ArrayData, cb: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = cb.length
    val out = new Array[Byte](m)
    var j = 0
    var off = 0
    while (j < m) {
      val book = cb(j)
      val dsub = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v.getFloat(off + i).toDouble - cent(i)
          d += diff * diff
          i += 1
        }
        // strict <: first-lowest-index wins ties, deterministic
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      off += dsub
      j += 1
    }
    out
  }

  /** Asymmetric cosine: float query vs PQ-reconstructed corpus vector.
    * `normSq(j)(c)` = ‖cb(j)(c)‖², precomputed once. 0.0 on zero norms
    * (zero query or all-zero reconstruction) and on code/codebook arity
    * mismatch — same contract as the other cosine kernels. */
  def cosine(q: ArrayData, codes: Array[Byte],
      cb: Array[Array[Array[Float]]], normSq: Array[Array[Double]]): Double = {
    val m = cb.length
    if (codes.length != m) return 0.0
    var dot = 0.0
    var nx = 0.0
    var j = 0
    var off = 0
    while (j < m) {
      val c = codes(j) & 0xFF
      val cent = cb(j)(c)
      var i = 0
      while (i < cent.length) {
        dot += q.getFloat(off + i).toDouble * cent(i)
        i += 1
      }
      nx += normSq(j)(c)
      off += cent.length
      j += 1
    }
    var nq = 0.0
    val dim = q.numElements()
    var i = 0
    while (i < dim) { val x = q.getFloat(i).toDouble; nq += x * x; i += 1 }
    if (nq == 0.0 || nx == 0.0) 0.0
    else dot / (math.sqrt(nq) * math.sqrt(nx))
  }

  /** ‖centroid‖² tables, computed once driver-side. */
  def normSq(cb: Array[Array[Array[Float]]]): Array[Array[Double]] =
    cb.map(_.map(c => c.map(x => x.toDouble * x).sum))

  private[expr] def dim(cb: Array[Array[Array[Float]]]): Int =
    cb.map(_(0).length).sum
}

/** pq_encode(array<float>) -> binary: m codebook indices, one byte each. */
case class PqEncode(
    child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(b => b.nonEmpty && b.length <= 256),
    "PQ codebooks need 1..256 centroids per subspace")

  override def prettyName: String = "pq_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    PqVectorOps.encode(v.asInstanceOf[ArrayData], codebooks)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.PqVectorOps.encode($c, $cbRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  // content equality over the codebook constant (array identity would
  // defeat canonicalization — same rationale as NearestCentroids)
  override def equals(other: Any): Boolean = other match {
    case that: PqEncode =>
      child == that.child && java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]],
        that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])))
}

/** pq_cosine(array<float> query, binary codes) -> double: asymmetric
  * cosine against the PQ reconstruction. */
case class PqCosine(
    left: Expression,
    right: Expression,
    codebooks: Array[Array[Array[Float]]]) extends BinaryExpression {
  require(codebooks.nonEmpty, "PQ codebooks must not be empty")

  private val normSqTable = PqVectorOps.normSq(codebooks)

  override def prettyName: String = "pq_cosine"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_cosine expects (array<float>, binary), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(q: Any, codes: Any): Any =
    PqVectorOps.cosine(q.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]],
      codebooks, normSqTable)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    val nsRef = ctx.addReferenceObj("pqNormSq", normSqTable, "double[][]")
    defineCodeGen(ctx, ev,
      (q, c) => s"graft.expr.PqVectorOps.cosine($q, $c, $cbRef, $nsRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def equals(other: Any): Boolean = other match {
    case that: PqCosine =>
      left == that.left && right == that.right && java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]],
        that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(left, right,
    Integer.valueOf(java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])))
}
