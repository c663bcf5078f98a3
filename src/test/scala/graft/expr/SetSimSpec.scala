package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** The r21 fused pair-verify kernels ([[SetSimOps]]) replaced the builtin
  * array_intersect/array_union Jaccard and the zip_with∘filter signature
  * agreement count. These pins prove BIT-IDENTICAL output against the
  * exact original spellings, on shingle arrays derived from the fixture
  * corpus and on adversarial hand-built arrays (duplicates, nulls, empty,
  * length mismatches). */
class SetSimSpec extends SparkSpec {
  import spark.implicits._

  test("jaccard_sim == size(intersect)/size(union) on fixture shingle pairs") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sf001}/documents.parquet")
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    // all pairs over a bounded slice — covers disjoint, partial, identical
    val a = docs.filter($"doc_id" < 40).select($"doc_id".as("ida"), $"sh".as("sa"))
    val b = docs.filter($"doc_id" < 40).select($"doc_id".as("idb"), $"sh".as("sb"))
    val bad = a.crossJoin(b)
      .select(Dedup.jaccard($"sa", $"sb").as("fused"),
        Dedup.jaccardTree($"sa", $"sb").as("orig"))
      .filter(not($"fused" <=> $"orig"))
    assert(bad.count() === 0)
  }

  test("jaccard_sim adversarial: duplicates, null elements, empties, null arrays") {
    val rows: Seq[(Option[Seq[Option[String]]], Option[Seq[Option[String]]])] = Seq(
      (Some(Seq()), Some(Seq())),                           // 0/0 -> 0.0
      (Some(Seq(Some("a"))), Some(Seq())),                  // empty side
      (Some(Seq(Some("a"), Some("a"), Some("b"))),          // dup elements
        Some(Seq(Some("b"), Some("b"), Some("c")))),
      (Some(Seq(Some("a"), None)), Some(Seq(None, Some("b")))), // null matches null
      (Some(Seq(None)), Some(Seq(Some("x")))),              // null only on one side
      (Some(Seq(Some("a"), Some("b"))), Some(Seq(Some("b"), Some("a")))), // order
      (None, Some(Seq(Some("a")))),                         // null array -> null
      (Some(Seq(Some(""))), Some(Seq(Some("")))),           // empty-string element
      (Some(Seq(Some("x"))), None))
    val df = rows.toDF("sa", "sb")
    val bad = df.select(Dedup.jaccard($"sa", $"sb").as("fused"),
        Dedup.jaccardTree($"sa", $"sb").as("orig"))
      .filter(not($"fused" <=> $"orig"))
    assert(bad.count() === 0)
  }

  test("sig_eq_count estimate == zip_with∘filter spelling (incl. length skew)") {
    val rows: Seq[(Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])] = Seq(
      (Some(Seq(Some(1L), Some(2L), Some(3L))), Some(Seq(Some(1L), Some(9L), Some(3L)))),
      (Some(Seq(Some(1L))), Some(Seq(Some(1L), Some(2L)))), // b longer: pad nulls
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(1L)))), // a longer
      (Some(Seq(Some(5L), None)), Some(Seq(Some(5L), Some(7L)))), // null element
      // no empty-empty row: size(sig)=0 divides by zero in BOTH spellings
      // (signatures are fixed-width by construction, never empty)
      (None, Some(Seq(Some(1L)))),
      (Some(Seq(Some(1L))), None))
    val df = rows.toDF("sa", "sb")
    val bad = df.select(Dedup.minHashEstimate($"sa", $"sb").as("fused"),
        Dedup.minHashEstimateTree($"sa", $"sb").as("orig"))
      .filter(not($"fused" <=> $"orig"))
    assert(bad.count() === 0)
  }

  test("fixture signatures: fused estimate matches the original spelling") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sf001}/documents.parquet")
      .select($"doc_id",
        graft.functions.min_hash_sig(Dedup.shingles($"text", 3), 128).as("sig"))
    val a = docs.filter($"doc_id" < 30).select($"doc_id".as("ida"), $"sig".as("sa"))
    val b = docs.filter($"doc_id" < 30).select($"doc_id".as("idb"), $"sig".as("sb"))
    val bad = a.crossJoin(b)
      .select(Dedup.minHashEstimate($"sa", $"sb").as("fused"),
        Dedup.minHashEstimateTree($"sa", $"sb").as("orig"))
      .filter(not($"fused" <=> $"orig"))
    assert(bad.count() === 0)
  }
}
