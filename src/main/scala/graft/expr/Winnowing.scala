package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * MOSS-style winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
 * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003)
 * — the positional rolling-hash fingerprint next to [[MinHashOps]]'s
 * set-based signature. One fused kernel pass per document:
 *
 *  1. Karp-Rabin rolling hash over character k-grams (O(1) per position),
 *  2. a murmur-style finalizer mix on each raw rolling hash (the min
 *     selection needs well-distributed values; the mix preserves the
 *     winnowing guarantee since it is a function of the k-gram alone),
 *  3. winnowing: keep the minimum hash of every window of `w` consecutive
 *     k-gram hashes, rightmost on ties — a monotonic-deque sliding
 *     minimum, O(n) total.
 *
 * Guarantee (the paper's Theorem 1 shape): any substring match of length
 * at least `w + k - 1` between two documents yields at least one SHARED
 * fingerprint; no match shorter than `k` can. Fingerprints are local —
 * an edit perturbs only the windows overlapping it — which is what makes
 * them the right primitive for code-clone / boilerplate detection where
 * MinHash's global bag-of-shingles view dilutes short exact matches.
 *
 * Output: distinct selected hashes, ascending (deterministic set
 * semantics for the overlap join). Documents shorter than k characters
 * have no k-grams ⇒ empty array (matches nothing).
 */
object WinnowOps {
  private final val Base = 257L

  /** murmur3-ish 64-bit finalizer. */
  private def mix(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL
    x ^= (x >>> 33); x *= 0xc4ceb9fe1a85ec53L
    x ^= (x >>> 33)
    x
  }

  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val grams = n - k + 1
    // rolling Karp-Rabin in wraparound 64-bit arithmetic, then mixed
    val hashes = new Array[Long](grams)
    var pow = 1L // Base^(k-1)
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    hashes(0) = mix(h)
    i = 1
    while (i < grams) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = mix(h)
      i += 1
    }
    // winnow: sliding minimum over windows of w (all grams when fewer),
    // rightmost-min ties via >= pops. Deque holds candidate indices.
    val win = math.min(w, grams)
    val deque = new Array[Int](grams)
    var head = 0
    var tail = 0 // exclusive
    val selected = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < grams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1) selected.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}

/** winnow_fingerprints(string, k, w) -> array<long>: distinct winnowed
  * k-gram fingerprints, ascending. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")
  require(w > 0, s"w must be positive, got $w")
  override def prettyName: String = "winnow_fingerprints"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    WinnowOps.fingerprints(v.asInstanceOf[UTF8String], k, w)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WinnowOps.fingerprints($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
