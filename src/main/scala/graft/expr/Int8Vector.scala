package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Int8 scalar quantization kernels: float vectors compressed 4x into byte
 * codes, with similarity computed directly on the codes in integer
 * arithmetic — the standard memory/bandwidth lever for vector search at
 * 100 TB (a 768-dim float corpus is 3 KB/row; int8 is 768 B/row, and the
 * hot scoring loop reads a quarter of the bytes).
 *
 * Quantization is SYMMETRIC PER VECTOR: scale = max|v|/127, code_i =
 * round(v_i/scale). For COSINE the scale cancels entirely
 * (cos(q(a), q(b)) needs no dequantization), so the codes alone are the
 * search index; the scale is only needed to reconstruct dot products or
 * raw values, exposed separately. Quantizing is a pure map — no fit pass,
 * no global statistics, embarrassingly parallel at any corpus size.
 */
object Int8VectorOps {
  /** Byte codes for a float vector; zero vector maps to all-zero codes. */
  def quantize(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    var mx = 0.0f
    var i = 0
    while (i < n) { val v = math.abs(a.getFloat(i)); if (v > mx) mx = v; i += 1 }
    val out = new Array[Byte](n)
    if (mx > 0.0f) {
      val inv = 127.0 / mx
      i = 0
      while (i < n) { out(i) = math.round(a.getFloat(i) * inv).toByte; i += 1 }
    }
    out
  }

  /** Per-vector scale such that v_i ≈ code_i * scale. 0 for zero vectors. */
  def scale(a: ArrayData): Float = {
    val n = a.numElements()
    var mx = 0.0f
    var i = 0
    while (i < n) { val v = math.abs(a.getFloat(i)); if (v > mx) mx = v; i += 1 }
    if (mx > 0.0f) mx / 127.0f else 0.0f
  }

  /** Cosine over int8 codes: integer dot and integer squared norms (a
    * 64-dim code fits Int accumulators, but Long is used for safety at
    * any dim), one double division at the end. 0.0 on zero norms and on
    * length mismatch (same contract as [[VectorOps.cosine]]). */
  def cosine(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length != b.length) return 0.0
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < a.length) {
      val x = a(i).toLong
      val y = b(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}

/** quantize_int8(v): array<float> -> binary codes. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quantize_int8"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, Seq(child.dataType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any =
    Int8VectorOps.quantize(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.Int8VectorOps.quantize($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** int8_scale(v): the per-vector dequantization scale, float. */
case class Int8Scale(child: Expression) extends UnaryExpression {
  override def prettyName: String = "int8_scale"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, Seq(child.dataType))
  override def dataType: DataType = FloatType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any =
    Int8VectorOps.scale(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.Int8VectorOps.scale($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** int8_cosine(a, b): cosine similarity over two binary int8 code columns. */
case class Int8Cosine(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "int8_cosine"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    Int8VectorOps.cosine(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.Int8VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
