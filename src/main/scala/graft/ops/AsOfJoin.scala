package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Backward as-of join: for each left row, attach the single most recent
 * right row whose time is <= the left row's time, matched within equi-key
 * groups — the standard event-enrichment primitive (trades↔quotes,
 * click↔last-view, label↔latest-feature-snapshot) that Spark has no
 * built-in operator for.
 *
 * Implementation is the union+window form rather than a range join: both
 * sides are tagged and unioned, then ONE window over
 * (keys | time, side, tie) carries the last non-null right payload onto
 * each left row. Physical cost is a single hash exchange per side on the
 * equi-keys plus a per-partition sort — the same class as the sort-merge
 * equi-join a range-join rewrite would still need, with no interval
 * fan-out, no broadcast of either side, and no BNL risk. At 100 TB the
 * shuffle carries only the key/time/tie columns plus the requested payload
 * struct. A pathologically hot key serializes its group through one task —
 * inherent to per-key time ordering (same bound as any windowed operator);
 * salt upstream if a single key exceeds a task.
 *
 * Determinism: ties are broken by (time, side, tieBreak) with right rows
 * sorting BEFORE left rows at equal time — a right row at exactly the left
 * row's time matches (<= semantics); among right rows with equal time the
 * greatest tieBreak wins. Tie columns may be integral (cast to long),
 * timestamp (epoch microseconds via unix_micros — precision-faithful,
 * unlike a seconds cast), date (epoch days via unix_date), or string.
 * String ties order by xxhash64 of the value — "greatest wins" means
 * greatest HASH, not lexicographic order — with the raw string as a
 * secondary sort key so even a 64-bit hash collision between distinct
 * values leaves the winner deterministic (then lexicographic-greatest).
 * Any other type fails fast rather than being coerced through a lossy
 * cast that would destroy the deterministic order.
 *
 * NULL keys follow SQL join semantics: a left row with a NULL equi-key
 * matches nothing (payload NULL), and NULL-keyed right rows match no one.
 */
object AsOfJoin {

  /** Tie-break column as a long sort key; fails fast on unsupported types. */
  private def tieExpr(df: DataFrame, name: String, side: String): Column =
    df.schema(name).dataType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
        col(name).cast("long")
      case _: TimestampType => unix_micros(col(name))
      case _: DateType => unix_date(col(name)).cast("long")
      case _: StringType => xxhash64(col(name))
      case other => throw new IllegalArgumentException(
        s"as-of join $side tie column '$name' has unsupported type $other: " +
          "use an integral, timestamp, date, or string column")
    }

  /** Secondary tie key: the raw string value, consulted only when the
    * primary long keys are EQUAL — it resolves xxhash64 collisions between
    * distinct strings. For integral/timestamp/date ties equal primaries
    * mean equal values, so the secondary is moot and emitted as a constant
    * (constant-folded; no per-row payload rides the shuffle for it). */
  private def tieExpr2(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case _: StringType => col(name)
      case _ => lit("")
    }

  /**
   * @param on            equi-key columns present on both sides
   * @param leftTime      left event-time column (TimestampType or numeric)
   * @param rightTime     right event-time column
   * @param rightPayload  right columns to attach, emitted as
   *                      `prefix + name` (always includes the matched right
   *                      time as `prefix + rightTime`)
   * @param leftTie       left deterministic tie-break column
   * @param rightTie      right deterministic tie-break column
   * @param toleranceSeconds if set, matches older than this many whole
   *                      seconds before the left time are nulled out
   *                      (timestamp columns only)
   */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      leftTie: String,
      rightTie: String,
      prefix: String = "asof_",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "as-of join requires at least one equi-key column")
    val payloadCols = (rightTime +: rightPayload.filterNot(_ == rightTime)).distinct
    val payloadStruct = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payloadStruct.as("__p")).schema("__p").dataType

    val leftCols = left.columns
    // SQL join semantics for NULL keys: drop NULL-keyed right rows up front,
    // so the window (whose partitionBy groups NULLs together) can never hand
    // a NULL-keyed left row a NULL-keyed right payload — it gets NULL.
    val r = right.filter(on.map(col(_).isNotNull).reduce(_ && _)).select(
      on.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        tieExpr(right, rightTie, "right").as("__tie"),
        tieExpr2(right, rightTie).as("__tie2"),
        payloadStruct.as("__p"),
        lit(null).cast(left.select(struct(leftCols.map(col): _*).as("__l"))
          .schema("__l").dataType).as("__l")): _*)
    val l = left.select(
      on.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        tieExpr(left, leftTie, "left").as("__tie"),
        tieExpr2(left, leftTie).as("__tie2"),
        lit(null).cast(payloadType).as("__p"),
        struct(leftCols.map(col): _*).as("__l")): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"), col("__tie2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__p"), ignoreNulls = true).over(w)
    val matched = toleranceSeconds match {
      case Some(tol) => when(
        unix_timestamp(col("__t")) -
          unix_timestamp(matchedRaw.getField(rightTime)) <= tol, matchedRaw)
      case None => matchedRaw
    }

    val joined = r.unionByName(l)
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
    val outLeft = leftCols.map(c => col("__l").getField(c).as(c))
    val outPayload = payloadCols.map(c => col("__m").getField(c).as(prefix + c))
    joined.select(outLeft ++ outPayload: _*)
  }
}
