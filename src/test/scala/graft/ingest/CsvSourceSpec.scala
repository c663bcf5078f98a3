package graft.ingest

import java.nio.file.Files

import graft.SparkSpec

class CsvSourceSpec extends SparkSpec {

  private def writeTemp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_csv")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("readClones: explicit schema, header skipped, long ids (S1)") {
    val p = writeTemp("clones.csv",
      "FUNCTION_ID_ONE,FUNCTION_ID_TWO\n10,20\n20,30\n")
    val df = CsvSource.readClones(spark, p)
    assert(df.schema.fields.take(2).toSeq == CsvSource.clonesSchema.fields.toSeq)
    assert(df.columns.last == "_corrupt_record")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rows.toSeq == Seq((10L, 20L), (20L, 30L)))
  }

  test("readFunctions: ID/NAME/STARTLINE/ENDLINE with pinned types (S2)") {
    val p = writeTemp("functions.csv",
      "ID,NAME,STARTLINE,ENDLINE\n1,foo.java,5,12\n2,bar.java,1,3\n")
    val df = CsvSource.readFunctions(spark, p)
    val r = df.where("ID = 1").head()
    assert(r.getLong(0) == 1L)
    assert(r.getString(1) == "foo.java")
    assert(r.getInt(2) == 5 && r.getInt(3) == 12)
  }

  test("malformed rows are quarantined into _corrupt_record (PERMISSIVE)") {
    val p = writeTemp("bad.csv",
      "FUNCTION_ID_ONE,FUNCTION_ID_TWO\n1,2\nnot_a_number,7\n")
    val df = CsvSource.readClones(spark, p).cache()
    assert(df.count() == 2) // scan survives
    val bad = df.where("_corrupt_record IS NOT NULL").collect()
    assert(bad.length == 1)
    assert(bad(0).getAs[String]("_corrupt_record") == "not_a_number,7")
    assert(bad(0).isNullAt(0)) // quarantined rows don't fabricate ids
    assert(df.where("_corrupt_record IS NULL").count() == 1)
  }
}
