package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused pairwise set-similarity kernels for the dedup verify stages — the
 * codegen replacements for the original builtin spellings, with
 * BIT-IDENTICAL output (pinned in SetSimSpec against the originals).
 *
 * Why fused (r21 optimization round): candidate-pair verification is the
 * dominant per-row cost of the whole mining family (jaccard_join_pairs /
 * pair_mining / index and batch paths). The original
 * `size(array_intersect(a,b)) / size(array_union(a,b))` MATERIALIZES both
 * the intersection and the union arrays per pair only to count them, and
 * `size(filter(zip_with(sigA, sigB, ==), b -> b))` runs TWO interpreted
 * higher-order functions per pair, allocating a boolean array and a
 * filtered copy. One hash pass computes the sizes directly.
 */
object SetSimOps {
  /** Jaccard over distinct elements, exactly
    * `when(size(array_union(a,b)) === 0, 0.0)
    *   .otherwise(size(array_intersect(a,b)) / size(array_union(a,b)))`:
    * intersect/union are DISTINCT counts and a null element is an element
    * (matching Spark's array_intersect/array_union null semantics). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val setA = new java.util.HashSet[UTF8String](Math.max(8, na * 2))
    var aHasNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true
      else setA.add(a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String](Math.max(8, nb * 2))
    var bHasNull = false
    var inter = 0L
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else {
        val e = b.getUTF8String(i)
        if (setB.add(e) && setA.contains(e)) inter += 1
      }
      i += 1
    }
    val da = setA.size.toLong + (if (aHasNull) 1 else 0)
    val db = setB.size.toLong + (if (bHasNull) 1 else 0)
    if (aHasNull && bHasNull) inter += 1
    val union = da + db - inter
    if (union == 0L) 0.0 else inter.toDouble / union.toDouble
  }

  /** Count of positions where both signatures are non-null and equal —
    * exactly `size(filter(zip_with(a, b, (x,y) -> x === y), v -> v))`
    * (zip_with pads the shorter side with nulls; null === x is null and
    * filter drops it, so positions past min(len) never count). */
  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = Math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

/** jaccard_sim(array<string>, array<string>) -> double
  * (see [[SetSimOps.jaccard]]). */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "jaccard_sim"
  // array<void> (the empty `array()` literal, all-null elements) is
  // accepted like the builtin spelling accepted it under coercion
  private def isStrArr(dt: DataType) = dt match {
    case ArrayType(StringType, _) | ArrayType(NullType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isStrArr(left.dataType) && isStrArr(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim expects two array<string> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    SetSimOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.SetSimOps.jaccard($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** sig_eq_count(array<long>, array<long>) -> int
  * (see [[SetSimOps.eqCount]]). */
case class SigEqCount(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "sig_eq_count"
  private def isLongArr(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArr(left.dataType) && isLongArr(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sig_eq_count expects two array<long> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    SetSimOps.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.SetSimOps.eqCount($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
