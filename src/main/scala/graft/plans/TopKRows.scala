package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded-heap entry: a scored payload row. Ordering contract everywhere:
 * better = higher score, ties broken by LOWER id (matches the rank window
 * `orderBy(score.desc, id.asc)` the aggregate replaces). The id is the
 * boxed tie-break key — `java.lang.Long` for integral ids or `UTF8String`
 * for string ids (uuid-keyed corpora); both implement `Comparable` with
 * exactly the order the equivalent rank window uses (UTF8String compares
 * unsigned UTF-8 bytes = Spark SQL string sort = DuckDB's binary VARCHAR
 * collation, so the tie order is engine-stable for the oracle too).
 */
private[graft] final class TopKEntry(val score: Double, val id: Any, val payload: InternalRow)

/**
 * Per-group bounded top-k buffer: a min-heap of size ≤ k keyed worst-first,
 * so a beaten worst entry is evicted in O(log k).
 */
final class TopKBuffer(val k: Int) {
  import java.util.PriorityQueue

  // Ascending tie-key order; ids within one buffer are homogeneously typed
  // (Long or UTF8String, pinned by the aggregate's analysis-time check).
  @inline private def cmpId(x: Any, y: Any): Int =
    x.asInstanceOf[Comparable[Any]].compareTo(y)

  // worst-first: lowest score at head; among equal scores the HIGHEST id is
  // worst (asc id wins ties).
  private[plans] val heap = new PriorityQueue[TopKEntry](math.max(k, 1),
    (x: TopKEntry, y: TopKEntry) =>
      if (x.score != y.score) java.lang.Double.compare(x.score, y.score)
      else cmpId(y.id, x.id))

  /** Whether (score, id) beats the current worst entry — i.e. would enter a
    * full heap. Callers use this to defer payload/id copies to winners. */
  def beatsWorst(score: Double, id: Any): Boolean = {
    val worst = heap.peek()
    score > worst.score || (score == worst.score && cmpId(id, worst.id) < 0)
  }

  def insert(score: Double, id: Any, payload: InternalRow): Unit = {
    if (heap.size < k) {
      heap.add(new TopKEntry(score, id, payload))
    } else if (beatsWorst(score, id)) {
      heap.poll()
      heap.add(new TopKEntry(score, id, payload))
    }
  }

  /** Entries best-first (score desc, id asc). */
  def sorted: Array[TopKEntry] = {
    val arr = heap.toArray(new Array[TopKEntry](heap.size))
    java.util.Arrays.sort(arr, (x: TopKEntry, y: TopKEntry) =>
      if (x.score != y.score) java.lang.Double.compare(y.score, x.score)
      else cmpId(x.id, y.id))
    arr
  }
}

/**
 * Partial-aggregating per-group top-k — the scale path for the k-NN join's
 * rank step (SURVEY J2/T1/W3). A rank window over scored pairs shuffles all
 * |Q|·|C| rows before discarding everything past rank k; this aggregate
 * keeps a k-size bounded heap per group MAP-SIDE (ObjectHashAggregate
 * partial mode), so the shuffle carries at most |Q|·k rows per map
 * partition no matter how large the corpus is — the difference between a
 * dead plan and a constant-size shuffle at 100 TB.
 *
 * Input: (payload: any struct, score: double, id: long | string). Rows
 * with a null score, id, or payload are ignored (a null score can never be
 * in a top-k by similarity; a null payload has no legal slot in the
 * containsNull=false output array and would NPE mid-shuffle in
 * serialize/deserialize). String tie ids compare as unsigned UTF-8 bytes
 * (UTF8String order = Spark SQL's string sort = DuckDB's binary VARCHAR
 * collation), so uuid-keyed corpora — the reference's POJ id space,
 * `poj_utils.py:62` — take this bounded-heap path instead of a
 * |Q|·|corpus| rank-window shuffle. Fractional ids (double/decimal) stay
 * unsupported by design: truncating casts could collide two distinct ids
 * and make tie order diverge from the window path.
 * Output: array<payloadType> ordered best-first (score desc, id asc) —
 * posexplode to recover ranks.
 */
case class TopKRows(
    payload: Expression,
    score: Expression,
    tieId: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with TernaryLike[Expression] {

  require(k > 0, s"top-k size must be positive, got $k")

  override def first: Expression = payload
  override def second: Expression = score
  override def third: Expression = tieId

  // update() unboxes score as Double and id as Long/UTF8String: reject
  // anything else at ANALYSIS time (a SQL decimal-literal score would
  // otherwise ClassCastException mid-job). Callers cast — the Column
  // wrapper and the SQL registration in graft.functions do it
  // automatically. A non-struct payload has no legal serialization, so it
  // is rejected here too. (Spark's ImplicitCastInputTypes would coerce
  // instead, but AbstractDataType is private[sql] — not implementable from
  // library code.)
  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, score.dataType, tieId.dataType) match {
      case (_: StructType, DoubleType, LongType | StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (p, s, t) => TypeCheckResult.TypeCheckFailure(
        s"top_k_rows expects (struct payload, double score, long or string id), got " +
          s"(${p.catalogString}, ${s.catalogString}, ${t.catalogString})")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def prettyName: String = "top_k_rows"

  // (score, id, payload) rows give one stable wire format for both the
  // shuffle serialization and buffer merging.
  private lazy val entrySchema = new StructType()
    .add("s", DoubleType).add("i", tieId.dataType)
    .add("p", payload.dataType)
  private lazy val entryProj = UnsafeProjection.create(entrySchema)
  private lazy val payloadFields = payload.dataType.asInstanceOf[StructType].length
  private lazy val idIsString = tieId.dataType == StringType

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val id = tieId.eval(input)
    if (s != null && id != null) {
      val sv = s.asInstanceOf[Double]
      // Only materialize (copy) the payload — and, for string ids, the
      // UTF8String (eval may return a view into a reused row buffer) —
      // when the row actually enters the heap: peek-test first so losing
      // rows cost two evals, no copy.
      val heapOk = buffer.heap.size < k || buffer.beatsWorst(sv, id)
      if (heapOk) {
        val p = payload.eval(input).asInstanceOf[InternalRow]
        if (p != null) {
          val idOwned =
            if (idIsString) id.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone()
            else id
          buffer.insert(sv, idOwned, p.copy())
        }
      }
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.insert(e.score, e.id, e.payload)
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map(_.payload.asInstanceOf[Any]))

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val rows = buffer.sorted.map { e =>
      entryProj(InternalRow(e.score, e.id, e.payload)).copy()
    }
    val size = 4 + rows.map(r => 4 + r.getSizeInBytes).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(rows.length)
    rows.foreach { r =>
      bb.putInt(r.getSizeInBytes)
      bb.put(r.getBytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(entrySchema.length)
      row.pointTo(arr, len)
      // The id may point into `arr` (string case); `arr` is a fresh
      // per-entry allocation the entry keeps alive, so no copy is needed.
      val id: Any = if (idIsString) row.getUTF8String(1) else row.getLong(1)
      buf.insert(row.getDouble(0), id,
        row.getStruct(2, payloadFields).copy())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKRows =
    copy(payload = newFirst, score = newSecond, tieId = newThird)
}
