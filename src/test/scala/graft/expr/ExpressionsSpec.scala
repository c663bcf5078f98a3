package graft.expr

import graft.SparkSpec
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

class ExpressionsSpec extends SparkSpec with TableDrivenPropertyChecks {
  import org.apache.spark.sql.Row

  private def one(colExpr: org.apache.spark.sql.Column): Any = {
    spark.range(1).select(colExpr.as("v")).collect()(0).get(0)
  }

  test("uuid5 matches RFC 4122 / python uuid.uuid5 known vectors") {
    // python: uuid.uuid5(uuid.NAMESPACE_DNS, "python.org")
    assert(one(uuid5(lit("python.org"))) === "886313e1-3b8a-5372-9b90-0c9aee199e5d")
    // uuid.uuid5(uuid.NAMESPACE_DNS, "42") — str(func_id) pattern of bcb_utils.py:54
    assert(one(uuid5(lit("42"))) === "7c411b5e-9d3f-50b5-9c28-62096e41c4ed")
    assert(one(uuid5(lit(""))) === "4ebd0208-8328-5d69-8c44-ec50939c0967")
  }

  test("uuid5 is deterministic and distinct per input") {
    val df = spark.range(100).select(uuid5(col("id").cast("string")).as("u"))
    assert(df.distinct().count() === 100)
    assert(df.union(df).distinct().count() === 100)
  }

  test("uuid5 via SQL registration") {
    assert(spark.sql("SELECT uuid5('python.org') AS u").collect()(0).getString(0)
      === "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }

  test("cosine_similarity basics: parallel=1, orthogonal=0, antiparallel=-1, zero=0") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(2f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 3f), 0.0),
      (Array(1f, 0f), Array(-5f, 0f), -1.0),
      (Array(0f, 0f), Array(1f, 1f), 0.0),
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f),
        (4.0 + 10.0 + 18.0) / (math.sqrt(14.0) * math.sqrt(77.0)))
    ).toDF("a", "b", "expect")
    val got = df.select(cosine_similarity(col("a"), col("b")).as("c"), col("expect")).collect()
    got.foreach { case Row(c: Double, e: Double) => assert(math.abs(c - e) < 1e-12) }
  }

  test("dot_product and l2_norm") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(dot_product(col("a"), col("b")), l2_norm(col("a"))).collect()(0)
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("euclidean_distance and manhattan_distance kernels + SQL registration") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 7f))).toDF("a", "b")
    val r = df.select(
      euclidean_distance(col("a"), col("b")).as("e"),
      manhattan_distance(col("a"), col("b")).as("m")).collect()(0)
    assert(math.abs(r.getDouble(0) - math.sqrt(9 + 9 + 16)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 10.0) < 1e-12)
    // identity: d(x, x) = 0 for both
    val self = df.select(
      euclidean_distance(col("a"), col("a")).as("e"),
      manhattan_distance(col("a"), col("a")).as("m")).collect()(0)
    assert(self.getDouble(0) === 0.0 && self.getDouble(1) === 0.0)
    df.createOrReplaceTempView("t_dist")
    val sql = spark.sql(
      "SELECT euclidean_distance(a, b) AS e, manhattan_distance(a, b) AS m FROM t_dist")
      .collect()(0)
    assert(math.abs(sql.getDouble(0) - math.sqrt(34.0)) < 1e-12)
    assert(math.abs(sql.getDouble(1) - 10.0) < 1e-12)
  }

  test("l2_normalize yields unit vectors; zero vector passes through") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(3f, 4f)), Tuple1(Array(0f, 0f))).toDF("a")
    val rows = df.select(l2_norm(l2_normalize(col("a"))).as("n")).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-6)
    assert(rows(1).getDouble(0) === 0.0)
  }

  test("cosine on real embeddings is within [-1, 1] and self-similarity is 1") {
    val emb = spark.read.parquet(s"${graft.TestSpark.sf0001}/embeddings.parquet")
    val self = emb.select(cosine_similarity(col("embedding"), col("embedding")).as("c"))
    val mm = self.agg(min("c"), max("c")).collect()(0)
    assert(mm.getDouble(0) > 1.0 - 1e-9 && mm.getDouble(1) < 1.0 + 1e-9)
  }

  test("parameterized kernels are SQL-callable with literal sizes") {
    val r = spark.sql(
      """SELECT size(min_hash_sig(array('a b c'), 16)) AS s,
        |  size(min_hash_band_keys(array('a b c'), 16, 4)) AS b,
        |  size(byte_histogram(encode('hello', 'UTF-8'), 8)) AS h""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) == 16 && r.getInt(1) == 4 && r.getInt(2) == 8)
  }

  test("hyperplane_sig and top_k_rows are SQL-callable") {
    val sig = spark.sql(
      "SELECT hyperplane_sig(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT)), 12, 42) AS s")
      .collect()(0).getLong(0)
    assert(sig >= 0L && sig < (1L << 12)) // 12-bit signature range
    // aggregate registration: per-group top-2 by score, best first. The
    // registration casts the decimal-literal score arg to double itself;
    // the struct payload keeps whatever type the caller puts in it, so the
    // test casts there for a double read-back.
    val rows = spark.sql(
      """SELECT g, top_k_rows(struct(id, CAST(score AS DOUBLE) AS score), score, id, 2) AS tk
        |FROM VALUES
        |  (1, 10L, 0.5), (1, 11L, 0.9), (1, 12L, 0.7), (2, 20L, 0.1)
        |  AS t(g, id, score)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1).map(r => (r.getLong(0), r.getDouble(1)))
    assert(g1 == Seq((11L, 0.9), (12L, 0.7)))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) == Seq(20L))
  }

  test("null propagation") {
    val r = spark.sql(
      "SELECT cosine_similarity(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))), uuid5(CAST(NULL AS STRING))")
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("simple_lower: Unicode SIMPLE mapping — context-free, locale-free, astral-safe") {
    import spark.implicits._
    import graft.functions.simple_lower
    val in = Seq(
      "ASCII Fast PATH 123",       // full-ASCII branch
      "İstanbul",                  // U+0130 -> plain i (full mapping would add U+0307)
      "ΣΟΦΟΣ Σ ΑΣ",                // Σ -> σ in EVERY position (never final ς)
      "STRASSE weiß",              // no full-casing ß games in either direction
      "𐐀deseret",       // astral U+10400 -> U+10428 via code points
      "ꟇꟉꟵ",        // the three cps DuckDB's tables predate
      null)
    val got = in.toDF("t").select(simple_lower($"t")).as[String].collect()
    assert(got(0) == "ascii fast path 123")
    assert(got(1) == "istanbul", s"İ must simple-fold to i, got ${got(1)}")
    assert(got(2) == "σοφοσ σ ασ")
    assert(got(3) == "strasse weiß")
    assert(got(4) == "𐐨deseret")
    assert(got(5) == "ꟈꟊꟶ")
    assert(got(6) == null)
    // driver-side twin (BPE pre-tokenizer) computes the identical fold
    in.filter(_ != null).zipWithIndex.foreach { case (s, i) =>
      assert(graft.expr.SimpleCaseFold.lower(s) == got(i)) }
  }

  test("byte-level fold == String fold for EVERY code point; 2x buffer bound holds") {
    // The r16 non-ASCII path folds UTF-8 bytes directly (no String
    // round-trip). Exhaustive: each assigned code point folded through
    // both the UTF8String (byte) kernel and the String kernel must agree
    // byte-for-byte — including the buffer-bound claim (a cp's lowercase
    // UTF-8 length never exceeds 2x its own).
    import org.apache.spark.unsafe.types.UTF8String
    def utf8Len(cp: Int): Int =
      if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4
    var cp = 0
    while (cp <= 0x10FFFF) {
      if (cp < 0xD800 || cp > 0xDFFF) {
        val s = new String(Character.toChars(cp))
        val viaBytes = graft.expr.SimpleCaseFold.lower(UTF8String.fromString(s))
        val viaString = graft.expr.SimpleCaseFold.lower(s)
        assert(viaBytes.toString == viaString,
          f"cp U+$cp%04X: byte fold '${viaBytes}' != String fold '$viaString'")
        assert(utf8Len(Character.toLowerCase(cp)) <= 2 * utf8Len(cp),
          f"cp U+$cp%04X violates the 2x output-buffer bound")
      }
      cp += 1
    }
    // multi-cp strings mixing widths fold identically too
    val mixed = "Ⱥ𐐀İΣ à 中ꟇßQ"
    assert(graft.expr.SimpleCaseFold.lower(UTF8String.fromString(mixed)).toString
      == graft.expr.SimpleCaseFold.lower(mixed))
    // malformed bytes (stray continuation, truncated lead, dangling lead
    // before ASCII, overlong) take the String-path fallback, whose Java
    // decode repairs with U+FFFD — byte-for-byte what the r15 String
    // implementation produced, keeping the fold Version honest on EVERY
    // byte sequence (KernelProperties pins this over random bytes)
    for (bad <- Seq(
      Array[Byte](0x41, 0x80.toByte, 0xC3.toByte), // 'A', stray cont, truncated lead
      Array[Byte](0xC3.toByte, 0x41), // dangling lead swallows nothing: 'A' survives
      Array[Byte](0xC1.toByte, 0x81.toByte), // overlong 'A' must NOT decode as 'A'
      Array[Byte](0xED.toByte, 0xA0.toByte, 0x80.toByte))) { // CESU surrogate
      val folded = graft.expr.SimpleCaseFold.lower(UTF8String.fromBytes(bad))
      val r15 = UTF8String.fromString(graft.expr.SimpleCaseFold.lower(
        UTF8String.fromBytes(bad).toString))
      assert(folded.getBytes.toSeq == r15.getBytes.toSeq,
        s"malformed ${bad.toSeq}: byte path != String path")
    }
    // and specifically: the dangling-lead case keeps the following ASCII
    val danglingLead = graft.expr.SimpleCaseFold.lower(
      UTF8String.fromBytes(Array[Byte](0xC3.toByte, 0x41))).toString
    assert(danglingLead == "�a", s"got '$danglingLead'")
  }
}
