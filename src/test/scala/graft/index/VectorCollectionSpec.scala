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
}
