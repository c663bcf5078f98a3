package graft.index

import java.nio.file.Files

import graft.SparkSpec

class AliasesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot = Files.createTempDirectory("graft_alias").toString

  private def mkColl(root: String, name: String, dim: Int = 2): VectorCollection = {
    val c = VectorCollection(spark, root, name)
    c.create(CollectionMeta(dim, "cosine", normalized = false))
    c
  }

  test("set / list / resolve / remove roundtrip") {
    val root = tmpRoot
    mkColl(root, "docs_v1")
    Aliases.set(spark, root, "docs", "docs_v1")
    assert(Aliases.list(spark, root) === Map("docs" -> "docs_v1"))
    assert(Aliases.resolve(spark, root, "docs") === "docs_v1")
    Aliases.remove(spark, root, "docs")
    assert(Aliases.list(spark, root) === Map.empty)
    // unresolved names pass through untouched
    assert(Aliases.resolve(spark, root, "docs") === "docs")
  }

  test("writes leave no .crc sidecars or tmp residue; stale sidecars are healed") {
    val root = tmpRoot
    mkColl(root, "docs_v1")
    mkColl(root, "docs_v2")
    Aliases.set(spark, root, "docs", "docs_v1")
    def residue() = new java.io.File(root).listFiles.map(_.getName)
      .filter(n => n.endsWith(".crc") || n.contains(".tmp-")).toSeq
    assert(residue() === Seq.empty)
    // Simulate a registry last written by a checksummed-FS path: a stale
    // sidecar whose checksum no longer matches the bytes the next write
    // lands. The next write must heal it, and list() must keep working.
    val crc = java.nio.file.Paths.get(root, "._aliases.json.crc")
    Files.write(crc, Array[Byte](1, 2, 3, 4))
    Aliases.set(spark, root, "docs2", "docs_v2")
    assert(residue() === Seq.empty)
    assert(Aliases.list(spark, root) ===
      Map("docs" -> "docs_v1", "docs2" -> "docs_v2"))
  }

  test("open() reads through the alias; repoint switches readers atomically") {
    val root = tmpRoot
    val v1 = mkColl(root, "docs_v1")
    v1.upsert(Seq((1L, Array(1f, 0f))).toDF("id", "vec"), "id")
    val v2 = mkColl(root, "docs_v2")
    v2.upsert(Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("id", "vec"), "id")

    Aliases.set(spark, root, "docs", "docs_v1")
    assert(VectorCollection.open(spark, root, "docs").load().count() === 1L)
    // blue/green: repoint the alias, same reader name now sees v2
    Aliases.set(spark, root, "docs", "docs_v2")
    assert(VectorCollection.open(spark, root, "docs").load().count() === 2L)
    // opening by a real collection name ignores the alias registry
    assert(VectorCollection.open(spark, root, "docs_v1").load().count() === 1L)
  }

  test("dangling target and collection-shadowing aliases fail loudly") {
    val root = tmpRoot
    mkColl(root, "real")
    intercept[IllegalArgumentException] {
      Aliases.set(spark, root, "a", "missing")
    }
    intercept[IllegalArgumentException] {
      Aliases.set(spark, root, "real", "real") // alias shadowing a collection
    }
    intercept[IllegalArgumentException] {
      Aliases.set(spark, root, "bad/../path", "real") // non-token name
    }
    intercept[IllegalArgumentException] {
      Aliases.remove(spark, root, "absent")
    }
  }

  test("a collection created after the alias wins resolution (reads stay stable)") {
    val root = tmpRoot
    mkColl(root, "v1")
    Aliases.set(spark, root, "name", "v1")
    // later someone creates a REAL collection named like the alias:
    // resolution must prefer the concrete collection from then on
    mkColl(root, "name")
    assert(Aliases.resolve(spark, root, "name") === "name")
  }
}
