package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/**
 * band_of(id, boundaries): index of `id`'s band under sorted distinct LONG
 * boundaries — the count of boundaries ≤ id (ties go right), exactly the
 * value of [[graft.text.Selection.bandColumn]]'s original balanced
 * when-tree.
 *
 * Why an expression (r21 optimization round): the when-tree executes
 * O(log n) comparisons but GENERATES O(n) code — at the default 1024 id
 * bands that is ~1023 inlined comparisons, which (stacked with the rest of
 * the selection projection) overflowed janino's 64 KB method limit in
 * `curation_pipeline`/`budget_select` and silently dropped the whole stage
 * out of compiled execution. One `Arrays.binarySearch` call against a
 * referenced boundary array is O(log n) execution AND O(1) code.
 *
 * NULL semantics pinned to the original tree: a NULL id made every
 * `v < bound` predicate NULL, so the tree fell through its `otherwise`
 * branches to the RIGHTMOST leaf — band = boundaries.length, never NULL.
 * The expression reproduces that (nullable = false).
 */
case class BandOf(child: Expression, boundaries: Array[Long])
  extends UnaryExpression {
  override def prettyName: String = "band_of"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"band_of expects a long argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) boundaries.length
    else BandOf.band(v.asInstanceOf[Long], boundaries)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bndsRef = ctx.addReferenceObj("boundaries", boundaries, "long[]")
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        int ${ev.value} = ${c.isNull}
          ? $bndsRef.length
          : graft.expr.BandOf.band(${c.value}, $bndsRef);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  // Array fields break case-class equality; compare contents so plan
  // canonicalization (exchange/subexpression reuse) still recognizes
  // identical band expressions.
  override def equals(other: Any): Boolean = other match {
    case that: BandOf =>
      child == that.child && java.util.Arrays.equals(boundaries, that.boundaries)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(java.util.Arrays.hashCode(boundaries)))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BandOf {
  /** Count of boundaries ≤ v (upper bound) over a sorted distinct array. */
  def band(v: Long, bnds: Array[Long]): Int = {
    val idx = java.util.Arrays.binarySearch(bnds, v)
    if (idx >= 0) idx + 1 else -(idx + 1)
  }
}
