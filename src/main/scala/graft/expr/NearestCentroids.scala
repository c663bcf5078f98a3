package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object NearestCentroidOps {
  /** Indices of the `nProbe` centroids most cosine-similar to `vec`,
    * best first. The per-centroid score is the double-precision dot of the
    * RAW float values divided by the double centroid norm — exactly the
    * ranking a double-cosine oracle (e.g. DuckDB over the same floats)
    * computes, so argmax routing is engine-stable. A float32
    * re-normalization of the centroids would perturb near-tie argmaxes by
    * an ulp and flip the routing discretely cross-engine. */
  def nearest(vec: ArrayData, centroids: Array[Array[Float]],
      norms: Array[Double], nProbe: Int): ArrayData = {
    val dim = vec.numElements()
    // vec norm only scales all scores equally -> ranking unaffected; skip it.
    val n = centroids.length
    val scores = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cent = centroids(c)
      var s = 0.0
      val d = math.min(dim, cent.length)
      var j = 0
      while (j < d) { s += vec.getFloat(j).toDouble * cent(j); j += 1 }
      s = if (norms(c) > 0.0) s / norms(c) else 0.0
      // NaN scores (a NaN vector component) compare false on both > and ==
      // and would leave the selection loop with no pick — map to -inf so
      // bad rows rank last instead of aborting the job.
      scores(c) = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
      c += 1
    }
    val take = math.min(nProbe, n)
    val out = new Array[Int](take)
    val used = new Array[Boolean](n)
    var t = 0
    while (t < take) {
      var best = -1
      var bestS = Double.NegativeInfinity
      c = 0
      while (c < n) {
        if (!used(c) && (scores(c) > bestS || (scores(c) == bestS && (best == -1 || c < best)))) {
          best = c; bestS = scores(c)
        }
        c += 1
      }
      used(best) = true
      out(t) = best
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Double L2 norms of the centroid rows, computed once driver-side. */
  def norms(centroids: Array[Array[Float]]): Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x.toDouble * x).sum))
}

/**
 * nearest_centroids(array<float>) -> array<int>: the nProbe most
 * cosine-similar centroid ids, best first. The centroid table is a plan
 * constant (broadcast with the closure) — IVF cell assignment and probe
 * selection are pure map work.
 */
case class NearestCentroids(
    child: Expression,
    centroids: Array[Array[Float]],
    nProbe: Int) extends UnaryExpression {
  require(nProbe > 0, s"nProbe must be positive, got $nProbe")
  require(centroids.nonEmpty, "centroid table must not be empty")

  private val centNorms = NearestCentroidOps.norms(centroids)

  override def prettyName: String = "nearest_centroids"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    NearestCentroidOps.nearest(v.asInstanceOf[ArrayData], centroids, centNorms, nProbe)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val normsRef = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.NearestCentroidOps.nearest($c, $centRef, $normsRef, $nProbe)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  // Case-class equality over Array[Array[Float]] is reference equality, so
  // two structurally identical probe expressions would never compare equal
  // or canonicalize — defeating subexpression elimination and plan caching.
  // Compare centroid CONTENT instead.
  override def equals(other: Any): Boolean = other match {
    case that: NearestCentroids =>
      nProbe == that.nProbe && child == that.child &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]],
          that.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(nProbe),
      Integer.valueOf(java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])))
}
