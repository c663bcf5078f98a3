package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{cosine_similarity, int8_cosine, int8_scale, quantize_int8}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantize/scale round-trip: codes*scale approximate the vector") {
    val v = Seq(Tuple1(Array(0.5f, -1.0f, 0.25f, 0.0f))).toDF("v")
    val row = v.select(quantize_int8($"v").as("c"), int8_scale($"v").as("s"))
      .collect()(0)
    val codes = row.getAs[Array[Byte]]("c")
    val s = row.getFloat(1)
    assert(codes.toSeq == Seq(64, -127, 32, 0).map(_.toByte))
    val back = codes.map(_ * s)
    val orig = Array(0.5f, -1.0f, 0.25f, 0.0f)
    back.zip(orig).foreach { case (b, o) => assert(math.abs(b - o) <= s / 2 + 1e-6) }
  }

  test("zero vector quantizes to zero codes, zero scale, cosine 0") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("z", "v")
    val r = df.select(
      int8_cosine(quantize_int8($"z"), quantize_int8($"v")).as("c"),
      int8_scale($"z").as("s")).collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getFloat(1) == 0.0f)
  }

  test("int8 cosine tracks float cosine closely on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("a", "b")
    val errs = rows.select(
      abs(cosine_similarity($"a", $"b") -
        int8_cosine(quantize_int8($"a"), quantize_int8($"b"))).as("e"))
      .agg(max($"e")).collect()(0).getDouble(0)
    assert(errs < 0.02, s"max |cos_float - cos_int8| = $errs")
  }

  test("SQL registration: int8_cosine(quantize_int8(v), ...) resolves") {
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("qv")
    val r = spark.sql(
      "SELECT int8_cosine(quantize_int8(a), quantize_int8(b)) AS c FROM qv")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("quantized exact search holds recall@10 >= 0.9 on the fixture") {
    val recall = graft.SparkEntry.queries("quant_recall")(spark, graft.TestSpark.sf001)
      .collect()(0).getDouble(0)
    assert(recall >= 0.9, s"int8 recall@10 = $recall")
  }
}
