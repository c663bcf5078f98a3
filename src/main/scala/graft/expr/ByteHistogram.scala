package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object ByteHistogramOps {
  /** L2-normalized byte-value histogram of a binary payload — the
    * deterministic codec-less fallback feature for modalities with no
    * JRE decoder (inter-frame video, compressed audio); real decodes
    * live in [[ImageOps]]/[[AudioOps]]/[[VideoOps]]. */
  def histogram(bytes: Array[Byte], buckets: Int): ArrayData = {
    val counts = new Array[Double](buckets)
    var i = 0
    while (i < bytes.length) {
      counts(((bytes(i) & 0xff) * buckets) >>> 8) += 1.0
      i += 1
    }
    var ss = 0.0
    var b = 0
    while (b < buckets) { ss += counts(b) * counts(b); b += 1 }
    val inv = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    val out = new Array[Float](buckets)
    b = 0
    while (b < buckets) { out(b) = (counts(b) * inv).toFloat; b += 1 }
    new GenericArrayData(out)
  }
}

/** byte_histogram(binary, buckets) -> array<float> (L2-normalized). */
case class ByteHistogram(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets > 0 && buckets <= 256, s"buckets must be in [1,256], got $buckets")
  override def prettyName: String = "byte_histogram"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_histogram expects binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ByteHistogramOps.histogram(v.asInstanceOf[Array[Byte]], buckets)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ByteHistogramOps.histogram($c, $buckets)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
