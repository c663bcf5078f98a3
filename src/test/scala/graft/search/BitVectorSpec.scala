package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{binary_cosine, binary_quantize, hamming_distance, l2_norm}

class BitVectorSpec extends SparkSpec {
  import spark.implicits._

  test("binary_quantize packs sign bits MSB-first with zero pad") {
    // 10 components: +,-,+,+,0,-,+,-,-,+  ->  1011 0010 | 01(000000)
    val v = Array(1f, -2f, 0.5f, 3f, 0f, -1f, 2f, -0.1f, -9f, 4f)
    val codes = Seq(Tuple1(v)).toDF("v")
      .select(binary_quantize($"v")).head().getAs[Array[Byte]](0)
    assert(codes.toSeq == Seq(0xB2.toByte, 0x40.toByte))
  }

  test("asymmetric cosine of a vector against its own codes = L1/(L2*sqrt(dim))") {
    // dot(q, sign(q)) = sum |q_i| exactly (zero components contribute -q_i = 0)
    val rnd = new scala.util.Random(11)
    val rows = (1 to 100).map(_ => Tuple1(Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("v")
    val err = rows.select(abs(
        binary_cosine($"v", binary_quantize($"v")) -
          aggregate(transform($"v", x => abs(x)), lit(0.0), (a, x) => a + x) /
            (l2_norm($"v") * math.sqrt(64.0))).as("e"))
      .agg(max($"e")).head().getDouble(0)
    assert(err < 1e-6, s"max deviation $err")
  }

  test("binary cosine contract: zero query -> 0, byte-length mismatch -> 0") {
    val df = Seq((Array(0f, 0f, 0f), Array(1f, 2f, 3f), Array.fill(9)(1f)))
      .toDF("z", "v", "w9")
    val r = df.select(
      binary_cosine($"z", binary_quantize($"z")).as("a"),
      binary_cosine($"v", binary_quantize($"w9")).as("b")).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("hamming_distance: XOR popcount, 0 on identical, -1 on length mismatch") {
    val df = Seq((Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f),
      Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f), Array.fill(16)(1f))).toDF("a", "b", "c")
    val r = df.select(
      hamming_distance(binary_quantize($"a"), binary_quantize($"b")).as("d"),
      hamming_distance(binary_quantize($"a"), binary_quantize($"a")).as("z"),
      hamming_distance(binary_quantize($"a"), binary_quantize($"c")).as("m")).head()
    assert(r.getInt(0) == 4 && r.getInt(1) == 0 && r.getInt(2) == -1)
  }

  test("binary cosine preserves angular order on well-separated vectors") {
    // sign sketch must rank a near-duplicate above an orthogonal vector
    val rnd = new scala.util.Random(5)
    val q = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val near = q.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
    val far = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val scores = Seq(("near", near), ("far", far)).toDF("who", "v")
      .select($"who", binary_cosine(lit(q), binary_quantize($"v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("near") > scores("far"),
      s"near=${scores("near")} far=${scores("far")}")
  }

  test("SQL registration: binary_cosine/hamming_distance resolve") {
    Seq((Array(1.0f, -1.0f), Array(1.0f, -1.0f))).toDF("a", "b")
      .createOrReplaceTempView("bv")
    val r = spark.sql(
      """SELECT binary_cosine(a, binary_quantize(b)) AS c,
        |       hamming_distance(binary_quantize(a), binary_quantize(b)) AS h
        |FROM bv""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && r.getInt(1) == 0)
  }
}
