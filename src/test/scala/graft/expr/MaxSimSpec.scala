package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("hand-computed 2x2-token example") {
    // q tokens: (1,0) and (0,1); d tokens: (1,1)/sqrt2-ish raw (1,1) and (1,0).
    // cos((1,0),(1,1)) = 1/sqrt2 ≈ .707107; cos((1,0),(1,0)) = 1 → max 1.
    // cos((0,1),(1,1)) = .707107;  cos((0,1),(1,0)) = 0      → max .707107.
    val df = Seq((Array(1f, 0f, 0f, 1f), Array(1f, 1f, 1f, 0f))).toDF("q", "d")
    val got = df.select(graft.functions.max_sim($"q", $"d", 2).as("s"))
      .head().getAs[Double]("s")
    val expected = 1.0 + r6(1.0 / math.sqrt(2.0))
    assert(math.abs(got - expected) < 1e-9)
  }

  test("single-token multivector degenerates to the quantized cosine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val pairs = emb.select($"vec_id".as("i"), $"embedding".as("a"))
      .crossJoin(emb.select($"vec_id".as("j"), $"embedding".as("b")))
      .filter($"i" < $"j")
    val diff = pairs.select(
        graft.functions.max_sim($"a", $"b", 64).as("ms"),
        (floor(graft.functions.cosine_similarity($"a", $"b") * lit(1e6) + lit(0.5)) / lit(1e6)).as("c6"))
      .filter($"ms" =!= $"c6")
    assert(diff.isEmpty)
  }

  test("identical multivectors score exactly the token count") {
    val df = Seq((Array(1f, 2f, 3f, 4f, 5f, 6f), Array(1f, 2f, 3f, 4f, 5f, 6f)))
      .toDF("q", "d")
    val got = df.select(graft.functions.max_sim($"q", $"d", 2).as("s"))
      .head().getAs[Double]("s")
    assert(got === 3.0) // each of the 3 tokens matches itself at cos 1
  }

  test("trailing elements beyond the last full token are ignored") {
    // 5 elements at subDim=2 → 2 full tokens; the 5th element must not count.
    val a = Seq((Array(1f, 0f, 0f, 1f, 9f), Array(1f, 0f, 0f, 1f))).toDF("q", "d")
    val b = Seq((Array(1f, 0f, 0f, 1f), Array(1f, 0f, 0f, 1f))).toDF("q", "d")
    val sa = a.select(graft.functions.max_sim($"q", $"d", 2).as("s")).head().getDouble(0)
    val sb = b.select(graft.functions.max_sim($"q", $"d", 2).as("s")).head().getDouble(0)
    assert(sa === sb)
  }

  test("zero-norm tokens contribute cosine 0, empty side scores 0") {
    val df = Seq((Array(0f, 0f, 1f, 0f), Array(1f, 1f, 0f, 0f))).toDF("q", "d")
    // q token 1 is the zero vector: best over d tokens is max(0, 0) = 0;
    // q token 2 = (1,0): cos vs (1,1) = .707107, vs (0,0) = 0 → .707107.
    val got = df.select(graft.functions.max_sim($"q", $"d", 2).as("s")).head().getDouble(0)
    assert(math.abs(got - r6(1.0 / math.sqrt(2.0))) < 1e-9)
    val empty = Seq((Array.empty[Float], Array(1f, 0f))).toDF("q", "d")
    assert(empty.select(graft.functions.max_sim($"q", $"d", 2)).head().getDouble(0) === 0.0)
  }

  test("SQL registration: max_sim(q, d, subDim) with literal subDim") {
    val got = spark.sql(
      "SELECT max_sim(array(1.0f, 0.0f, 0.0f, 1.0f), array(1.0f, 1.0f, 1.0f, 0.0f), 2) AS s")
      .head().getAs[Double]("s")
    assert(math.abs(got - (1.0 + r6(1.0 / math.sqrt(2.0)))) < 1e-9)
    intercept[Exception] {
      spark.sql("SELECT max_sim(array(1.0f), array(1.0f), id) FROM range(1)").collect()
    }
  }

  test("interpreted eval agrees with codegen") {
    val e = MaxSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 0f, 0f, 1f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 1f, 1f, 0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      subDim = 2)
    val interpreted = e.eval(null).asInstanceOf[Double]
    assert(math.abs(interpreted - (1.0 + r6(1.0 / math.sqrt(2.0)))) < 1e-9)
  }
}
