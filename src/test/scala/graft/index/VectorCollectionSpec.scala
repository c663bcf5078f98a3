package graft.index

import java.nio.file.Files

import graft.SparkSpec

class VectorCollectionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot = Files.createTempDirectory("graft_coll").toString

  test("create / exists / meta roundtrip (main.py:59-65 capability)") {
    val c = VectorCollection(spark, tmpRoot, "bcb_test")
    assert(!c.exists)
    c.create(CollectionMeta(dim = 64, metric = "cosine", normalized = false))
    assert(c.exists)
    assert(c.meta === CollectionMeta(64, "cosine", false))
  }

  test("upsert is idempotent by id (deterministic-uuid re-ingest safety)") {
    val c = VectorCollection(spark, tmpRoot, "idem")
    c.create(CollectionMeta(2, "cosine", normalized = true))
    val batch = Seq(("u1", Array(1f, 0f)), ("u2", Array(0f, 1f))).toDF("id", "vec")
    c.upsert(batch, "id")
    assert(c.load().count() === 2L)
    c.upsert(batch, "id") // re-upload: no duplicates
    assert(c.load().count() === 2L)
    val more = Seq(("u2", Array(0f, 1f)), ("u3", Array(1f, 1f))).toDF("id", "vec")
    c.upsert(more, "id") // only the new key lands
    assert(c.load().count() === 3L)
    c.drop()
    assert(!c.exists)
  }

  test("delete removes matching points, keeps the rest; re-upsert of a deleted key lands") {
    import org.apache.spark.sql.functions.col
    val c = VectorCollection(spark, tmpRoot, "del")
    c.create(CollectionMeta(2, "cosine", normalized = false))
    c.upsert(Seq(("a", Array(1f, 0f)), ("b", Array(0f, 1f)), ("c", Array(1f, 1f)))
      .toDF("id", "vec"), "id")
    c.delete(col("id") === "b")
    assert(c.load().select("id").as[String].collect().sorted.toSeq == Seq("a", "c"))
    // deleted key is genuinely gone: the idempotent upsert re-admits it
    c.upsert(Seq(("b", Array(0f, 2f))).toDF("id", "vec"), "id")
    assert(c.load().count() === 3L)
    // delete with a predicate matching nothing is a no-op
    c.delete(col("id") === "zzz")
    assert(c.load().count() === 3L)
  }

  test("setPayload updates matching rows only; count honors filters") {
    import org.apache.spark.sql.functions.{col, lit}
    val c = VectorCollection(spark, tmpRoot, "payload")
    c.create(CollectionMeta(2, "cosine", normalized = false))
    c.upsert(Seq(("a", Array(1f, 0f), "raw"), ("b", Array(0f, 1f), "raw"),
      ("c", Array(1f, 1f), "clean")).toDF("id", "vec", "status"), "id")
    c.setPayload(col("id") === "a", Map("status" -> lit("clean")))
    val got = c.load().select("id", "status").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "clean", "b" -> "raw", "c" -> "clean"))
    // vectors untouched by a payload update
    assert(c.load().filter(col("vec").isNull).count() == 0)
    assert(c.count() == 3L)
    assert(c.count(Some(col("status") === "clean")) == 2L)
    // unknown column fails loudly
    val e = intercept[IllegalArgumentException] {
      c.setPayload(col("id") === "a", Map("nope" -> lit(1)))
    }
    assert(e.getMessage.contains("unknown columns"))
  }

  test("scroll: keyset pages cover the filtered set exactly once; predicates pushed") {
    import org.apache.spark.sql.functions.col
    val c = VectorCollection(spark, tmpRoot, "scroll")
    c.create(CollectionMeta(2, "cosine", normalized = false))
    val rows = (1L to 20L).map(i => (i, Array(i.toFloat, 0f), if (i % 2 == 0) "even" else "odd"))
    c.upsert(rows.toDF("id", "vec", "par"), "id")

    // page chaining: last id of each page seeds the next; the filtered set
    // (10 even ids) must arrive in order, exactly once, across pages of 4
    var after: Option[Any] = None
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    var page = c.scroll("id", 4, after, Some(col("par") === "even")).collect()
    while (page.nonEmpty) {
      seen ++= page.map(_.getLong(0))
      after = Some(page.last.getLong(0))
      page = c.scroll("id", 4, after, Some(col("par") === "even")).collect()
    }
    assert(seen.toSeq == (2L to 20L by 2).toSeq)

    // both the keyset predicate and the payload filter reach the scan
    val plan = c.scroll("id", 4, Some(8L), Some(col("par") === "even"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,8)") &&
      plan.contains("EqualTo(par,even)"), s"expected keyset+filter pushdown in:\n$plan")
  }
}
