package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Binary (1-bit) quantization kernels — the extreme end of the
 * compression ladder (float 1× → int8 4× → PQ 32× at m=8 → binary 32×
 * with NO codebooks): each float component collapses to its sign bit,
 * packed 8 per byte. A 64-dim float vector (256 B) becomes 8 bytes.
 *
 * Scoring is asymmetric like [[PqVectorOps]]: the FLOAT query is scored
 * against the ±1 sign reconstruction, so only the corpus side pays the
 * quantization loss:
 *
 *   cosine(q, sign(x)) = Σ_i (±q_i) / (‖q‖ · √dim)
 *
 * — every sign vector has the same norm √dim, so ranking needs only the
 * signed sum; the division just calibrates the value into cosine range.
 * The sign sketch preserves ANGULAR structure (it is SimHash with axis
 * hyperplanes), so it ranks well when components are roughly centered;
 * recall is recovered by over-fetching candidates and rescoring them at
 * full precision ([[graft.index.IvfCollection.query]]'s rescore path).
 *
 * [[BitHamming]] is the symmetric variant for code-vs-code comparison
 * (XOR + popcount — the classic SimHash distance), useful when the query
 * side is itself stored as codes.
 */
object BitVectorOps {
  /** Sign bits, MSB-first within each byte: bit i set iff v_i > 0.
    * ceil(dim/8) bytes; trailing pad bits stay zero. */
  def quantize(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte]((n + 7) >> 3)
    var i = 0
    while (i < n) {
      if (a.getFloat(i) > 0.0f) out(i >> 3) = (out(i >> 3) | (0x80 >> (i & 7))).toByte
      i += 1
    }
    out
  }

  /** Asymmetric cosine: float query vs the ±1 sign reconstruction.
    * 0.0 on zero query norm or byte-length mismatch — same contract as
    * the other cosine kernels. */
  def cosine(q: ArrayData, codes: Array[Byte]): Double = {
    val n = q.numElements()
    if (codes.length != ((n + 7) >> 3)) return 0.0
    var dot = 0.0
    var nq = 0.0
    var i = 0
    while (i < n) {
      val x = q.getFloat(i).toDouble
      val bit = (codes(i >> 3) >> (7 - (i & 7))) & 1
      dot += (if (bit == 1) x else -x)
      nq += x * x
      i += 1
    }
    if (nq == 0.0) 0.0 else dot / (math.sqrt(nq) * math.sqrt(n.toDouble))
  }

  /** Hamming distance between two packed code arrays (XOR + popcount);
    * -1 on length mismatch (0 would claim "identical"). */
  def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    if (a.length != b.length) return -1
    var d = 0
    var i = 0
    while (i < a.length) {
      d += Integer.bitCount((a(i) ^ b(i)) & 0xFF)
      i += 1
    }
    d
  }
}

/** binary_quantize(array<float>) -> binary: packed sign bits, 32x
  * smaller (1 bit per float component). */
case class BitQuantize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "binary_quantize"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, Seq(child.dataType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any =
    BitVectorOps.quantize(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.BitVectorOps.quantize($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** binary_cosine(array<float> query, binary codes) -> double: asymmetric
  * cosine of the float query against the sign reconstruction. */
case class BitCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "binary_cosine"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, binary), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(q: Any, codes: Any): Any =
    BitVectorOps.cosine(q.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, c) => s"graft.expr.BitVectorOps.cosine($q, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** hamming_distance(binary, binary) -> int: XOR + popcount over packed
  * codes; -1 on length mismatch. */
case class BitHamming(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "hamming_distance"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    BitVectorOps.hamming(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.BitVectorOps.hamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
