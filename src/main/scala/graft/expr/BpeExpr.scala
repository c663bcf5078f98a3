package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-task kernel state for [[BpeEncode]]: the merge ranks as a hash map
  * (pair -> rank) so each word's merge loop is O(symbols * merges applied)
  * with O(1) rank lookups, plus a per-task word cache — corpora repeat
  * words heavily, and the classic encode loop is worth running once per
  * distinct word per task. */
final class BpeKernel(merges: Array[(String, String)]) extends Serializable {
  // rebuilt per JVM after plan serialization (the codegen reference object
  // ships to executors); only the merge list itself travels
  @transient private lazy val rank = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + " " + b, i)
    }
    m
  }
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[String]]()

  private def encodeWord(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var syms = graft.text.Bpe.splitSymbols(w) // code points, not UTF-16 units
    var done = false
    while (!done && syms.length > 1) {
      // lowest-rank applicable pair, scanning adjacencies
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    if (cache.size < (1 << 16)) cache.put(w, syms)
    syms
  }

  def encode(text: UTF8String): ArrayData = {
    val out = Array.newBuilder[UTF8String]
    graft.text.Bpe.words(text.toString).foreach { w =>
      encodeWord(w).foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.result())
  }
}

/** bpe_encode(text) -> array<string> subwords under a trained merge list
  * (a plan constant). The standard rank-priority merge loop per word
  * (Sennrich et al. 2016); lowercase whitespace words, per-task word
  * cache. Null text -> null. */
case class BpeEncode(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression {
  override def prettyName: String = "bpe_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val kernel = new BpeKernel(merges)

  override def nullSafeEval(v: Any): Any =
    kernel.encode(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ker = ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ker.encode($c);")
  }

  // merges is an Array — default case-class equality would compare by
  // reference and break plan canonicalization; compare contents.
  override def equals(o: Any): Boolean = o match {
    case BpeEncode(c, m) => c == child && java.util.Arrays.equals(
      m.asInstanceOf[Array[AnyRef]], merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    child.hashCode() * 31 + java.util.Arrays.hashCode(
      merges.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
