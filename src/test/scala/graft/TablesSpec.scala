package graft

import org.apache.spark.sql.types._

/**
 * Fixture-schema guard: pins the expected column types of every driver
 * generated parquet table. When the driver regenerates a fixture with a
 * different schema (as happened to `events.ts` in round 10 — int64-nanos
 * became native TIMESTAMP mid-round, failing 12 queries with analysis
 * exceptions), this suite fails ONE focused test naming the drifted
 * column instead of scattering DATATYPE_MISMATCH stack traces across the
 * query suites.
 *
 * `events.ts` is pinned to the set of types [[graft.streaming.Streaming]]
 * normalizes (LONG under nanosAsLong, TIMESTAMP, TIMESTAMP_NTZ) — any
 * other type is drift the code does not handle yet.
 */
class TablesSpec extends SparkSpec {

  private def fields(name: String): Map[String, DataType] =
    Tables(spark, TestSpark.sf0001, name)
      .schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertCols(table: String, expected: (String, DataType)*): Unit = {
    val actual = fields(table)
    expected.foreach { case (colName, tpe) =>
      val got = actual.get(colName)
      assert(got.contains(tpe),
        s"fixture drift: $table.$colName is ${got.getOrElse("MISSING")}, " +
          s"code expects $tpe — update the readers (and this pin) together")
    }
  }

  test("events schema (ts drift broke 12 operators in round 10)") {
    val actual = fields("events")
    val tsOk = Set[DataType](LongType, TimestampType, TimestampNTZType)
    assert(actual.get("ts").exists(tsOk),
      s"fixture drift: events.ts is ${actual.get("ts").getOrElse("MISSING")}, " +
        "Streaming.normalizeTs handles only LONG/TIMESTAMP/TIMESTAMP_NTZ")
    assertCols("events",
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)
  }

  test("documents schema") {
    assertCols("documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType)
  }

  test("embeddings schema") {
    assertCols("embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true))
  }

  test("tpch key tables schema") {
    assertCols("lineitem",
      "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType, "l_shipdate" -> TimestampNTZType)
    assertCols("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderdate" -> TimestampNTZType)
  }
}
