package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Levenshtein distance over the UTF-8 BYTE sequence — the engine's pinned
 * edit-distance view, chosen because it is the ENGINE-PORTABLE one: SQL
 * engines disagree on the unit (DuckDB's `levenshtein` edits bytes,
 * Spark's edits code points — measured: `levenshtein('a👍b','ab')` is 4
 * vs 1), and the byte view is the same discipline every round-14 kernel
 * (FNV shingles, byte histograms, winnowing) already pins. On ASCII the
 * two views coincide; beyond it, multi-byte characters weigh their
 * encoded length — acceptable for near-dup verification, where the
 * normalized similarity divides by the byte length of the longer text
 * (`octet_length` / DuckDB `strlen`), keeping the ratio in [0, 1].
 *
 * Classic one-row DP, O(|a|·|b|) time / O(min(|a|,|b|)) space, straight
 * over the UTF8String payload bytes (no decode, no String allocation).
 * Callers bound the quadratic cost by construction: this runs per mined
 * CANDIDATE PAIR ([[graft.dedup.Dedup.editSimilarity]]), never per
 * corpus-pair.
 */
object EditDistanceOps {
  def byteLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val x0 = a.getBytes
    val y0 = b.getBytes
    // iterate over the longer, keep the DP row on the shorter
    val (x, y) = if (x0.length >= y0.length) (x0, y0) else (y0, x0)
    val m = y.length
    if (m == 0) return x.length
    val row = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { row(j) = j; j += 1 }
    var i = 1
    while (i <= x.length) {
      var prevDiag = row(0) // dp[i-1][0]
      row(0) = i
      val xi = x(i - 1)
      j = 1
      while (j <= m) {
        val del = row(j) + 1        // dp[i-1][j] + 1
        val ins = row(j - 1) + 1    // dp[i][j-1] + 1
        val sub = prevDiag + (if (xi == y(j - 1)) 0 else 1)
        prevDiag = row(j)
        var best = if (del < ins) del else ins
        if (sub < best) best = sub
        row(j) = best
        j += 1
      }
      i += 1
    }
    row(m)
  }
}

/** byte_levenshtein(string, string) -> int: UTF-8-byte edit distance
  * (identical to DuckDB `levenshtein`; see [[EditDistanceOps]]). */
case class ByteLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "byte_levenshtein"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_levenshtein expects (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceOps.byteLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.EditDistanceOps.byteLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
