package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

private[expr] object VectorTypeCheck {
  def check(name: String, types: Seq[DataType]): TypeCheckResult = {
    val bad = types.filterNot {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float> arguments, got ${types.map(_.catalogString).mkString(", ")}")
  }
}

/**
 * Static vector kernels shared by interpreted eval and generated code.
 *
 * All arithmetic is double-precision regardless of the input element type so
 * results are stable and oracle-comparable (DuckDB `list_cosine_similarity`
 * over `DOUBLE[]` matches bit-for-bit on the same summation order).
 *
 * Capability modeled: the cosine scoring the reference delegates to its
 * external vector store (consumed at `/root/reference/bcb_utils.py:184`;
 * `--normalized` knob `/root/reference/main.py:19`).
 */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  /** Cosine similarity; 0.0 when either vector has zero norm (reference
    * treats absent similarity as score 0, cf. bcb_utils.py:202-205). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Euclidean (L2) distance over the common prefix — a DISTANCE, so
    * lower is better; ranking code must order ascending. */
  def euclidean(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** Manhattan (L1) distance over the common prefix; lower is better. */
  def manhattan(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble)
      i += 1
    }
    s
  }

  def l2Normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Float](n)
    val nm = norm(a)
    var i = 0
    if (nm == 0.0) {
      while (i < n) { out(i) = a.getFloat(i); i += 1 }
    } else {
      while (i < n) { out(i) = (a.getFloat(i).toDouble / nm).toFloat; i += 1 }
    }
    new GenericArrayData(out)
  }
}

private[expr] trait VectorBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

/** dot(a, b) over array<float>, double result, codegen via static kernel. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "dot_product"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine_similarity(a, b) over array<float>, double result. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "cosine_similarity"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** euclidean_distance(a, b) over array<float>, double result. A distance
  * (lower = more similar) — the Euclid mode of a vector-backend collection;
  * search code ranks it ASCENDING. */
case class EuclideanDistance(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "euclidean_distance"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.euclidean(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorOps.euclidean($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** manhattan_distance(a, b) over array<float>, double result; lower =
  * more similar, ranked ascending. */
case class ManhattanDistance(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "manhattan_distance"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.manhattan(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorOps.manhattan($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2_normalize(a): array<float> -> array<float> with unit L2 norm
  * (zero vector passes through). The reference's `--normalized` ingest option
  * (main.py:19,30-34): normalizing at ingest lets cosine reduce to dot. */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "l2_normalize"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, Seq(child.dataType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any =
    VectorOps.l2Normalize(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VectorOps.l2Normalize($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** l2_norm(a): euclidean length, double. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "l2_norm"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, Seq(child.dataType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = VectorOps.norm(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VectorOps.norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
