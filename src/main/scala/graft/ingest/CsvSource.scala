package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/**
 * CSV sources with EXPLICIT schemas (SURVEY S1/S2) — the reference reads
 * both BigCloneBench tables with pandas type inference
 * (`/root/reference/main.py:50-55`); a distributed engine pins schemas so
 * a malformed row can't silently flip a column to string mid-ingest.
 *
 * Scale: schema-pinned CSV scans are splittable and push column pruning
 * into the reader (only requested columns are parsed); PERMISSIVE mode
 * quarantines malformed rows into `_corrupt_record` instead of failing
 * the job.
 */
object CsvSource {

  /** CLONES.csv — the clone ground-truth pair table; only the two id
    * columns are semantically used (`bcb_utils.py:26`). */
  val clonesSchema: StructType = new StructType()
    .add("FUNCTION_ID_ONE", LongType)
    .add("FUNCTION_ID_TWO", LongType)

  /** FUNCTIONS_CLEANED.csv — function metadata; the reference consumes
    * ID/NAME/STARTLINE/ENDLINE (`bcb_utils.py:55-59`). */
  val functionsSchema: StructType = new StructType()
    .add("ID", LongType)
    .add("NAME", StringType)
    .add("STARTLINE", IntegerType)
    .add("ENDLINE", IntegerType)

  /** Data schema + the PERMISSIVE quarantine column: Spark only captures a
    * malformed line's raw text if `_corrupt_record` is declared in the
    * schema — without it, bad rows silently become all-null rows. */
  private def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", StringType))
      .csv(path)

  /** S1: clone-pair table scan. */
  def readClones(spark: SparkSession, path: String): DataFrame =
    read(spark, path, clonesSchema)

  /** S2: functions metadata scan. */
  def readFunctions(spark: SparkSession, path: String): DataFrame =
    read(spark, path, functionsSchema)
}
