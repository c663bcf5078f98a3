package graft.search

import graft.{SparkSpec, Tables, TestSpark}

class LatticeKmeansSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf0001).cache()

  test("quantize: floor(v*2^20 + 0.5) semantics incl. negatives") {
    val q = LatticeKmeans.quantize(Array(1.0f, -1.0f, 0.5f, -0.4999999f, 0f))
    assert(q(0) == 1048576L && q(1) == -1048576L && q(2) == 524288L)
    // -0.4999999*2^20 = -524287.895...; +0.5 then floor -> -524288
    assert(q(3) == -524288L)
    assert(q(4) == 0L)
  }

  test("training is deterministic and independent of partitioning") {
    val a = LatticeKmeans.train(emb, "vec_id", "embedding", k = 4)
    val b = LatticeKmeans.train(emb.repartition(7), "vec_id", "embedding", k = 4)
    assert(a.length == 4 && b.length == 4)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) },
      "identical centroids regardless of physical layout")
  }

  test("centroids are exact dyadic rationals (float == lattice/2^20)") {
    val lat = LatticeKmeans.trainLattice(emb, "vec_id", "embedding",
      k = 4, iters = 8, sampleN = 2048, salt = LatticeKmeans.defaultSalt)
    val fl = LatticeKmeans.train(emb, "vec_id", "embedding", k = 4)
    lat.zip(fl).foreach { case (l, f) =>
      l.zip(f).foreach { case (li, fi) =>
        assert(fi.toDouble == li.toDouble / LatticeKmeans.Scale,
          s"float centroid must be EXACT: $li/2^20 vs $fi")
      }
    }
  }

  test("rounded mean matches DuckDB truncating // via the positive offset") {
    // replicate roundedMean's formula directly and pin the half-up
    // convention on negative sums — the cross-engine contract the oracle
    // replays as (2s + n + 2n*4194304) // (2n) - 4194304
    val off = 1L << 22
    def mean(s: Long, n: Long): Long = (2 * s + n + 2 * n * off) / (2 * n) - off
    assert(mean(7, 2) == 4)    //  3.5 -> 4 (half up)
    assert(mean(-7, 2) == -3)  // -3.5 -> -3 (half UP, not away from zero)
    assert(mean(-8, 2) == -4)
    assert(mean(5, 5) == 1)
    assert(mean(-2097152, 2) == -1048576) // full-magnitude component
  }

  test("k clamps to the distinct lattice points; iters=0 returns Forgy init") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 0f)), (2L, Array(1.0f, 0f)),
      (3L, Array(0f, 1.0f))).toDF("id", "v")
    val cents = LatticeKmeans.train(tiny, "id", "v", k = 4, iters = 0, sampleN = 4)
    assert(cents.length == 2, "only 2 distinct lattice points exist")
    val asSets = cents.map(_.toSeq).toSet
    assert(asSets == Set(Seq(1.0f, 0f), Seq(0f, 1.0f)))
  }

  test("null or ragged vectors in the sample fail loudly, not with an NPE") {
    import spark.implicits._
    val withNull = Seq((1L, Array(1.0f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      LatticeKmeans.train(withNull, "id", "v", k = 1, sampleN = 2)
    }
    assert(e1.getMessage.contains("NULL vector"))
    val ragged = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f)))
      .toDF("id", "v")
    val e2 = intercept[IllegalArgumentException] {
      LatticeKmeans.train(ragged, "id", "v", k = 1, sampleN = 2)
    }
    assert(e2.getMessage.contains("ragged"))
  }

  test("separated clusters recover their true means") {
    import spark.implicits._
    // cluster centers at ±3 — inside the trainer's replayable (-4, 4) domain
    val pts = (0 until 50).map(i => (i.toLong, Array(3.0f + (i % 5) * 0.01f, 0f))) ++
      (50 until 100).map(i => (i.toLong, Array(-3.0f - (i % 5) * 0.01f, 0f)))
    val df = pts.toDF("id", "v")
    val cents = LatticeKmeans.train(df, "id", "v", k = 2, iters = 8, sampleN = 128)
    assert(cents.length == 2)
    val xs = cents.map(_(0)).sorted
    assert(math.abs(xs(0) + 3.02f) < 0.01f && math.abs(xs(1) - 3.02f) < 0.01f,
      s"cluster means recovered, got ${xs.toSeq}")
  }

  test("components outside the replayable (-4, 4) domain fail loudly") {
    import spark.implicits._
    // roundedMean's truncation-equals-floor offset and the float32/Long
    // margins assume |q| < 2^22; beyond it the SQL replay would diverge
    // SILENTLY — the trainer must reject instead.
    val df = Seq((1L, Array(4.5f, 0f)), (2L, Array(0.5f, 0.5f))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      LatticeKmeans.train(df, "id", "v", k = 1, sampleN = 2)
    }
    assert(e.getMessage.contains("replayable domain"))
    // the negative boundary too (the offset trick is the asymmetric risk)
    val dfNeg = Seq((1L, Array(-4.1f, 0f)), (2L, Array(0.5f, 0.5f))).toDF("id", "v")
    val e2 = intercept[IllegalArgumentException] {
      LatticeKmeans.train(dfNeg, "id", "v", k = 1, sampleN = 2)
    }
    assert(e2.getMessage.contains("replayable domain"))
    // in-domain values of full magnitude still train fine
    val ok = Seq((1L, Array(3.9f, -3.9f)), (2L, Array(-3.9f, 3.9f))).toDF("id", "v")
    assert(LatticeKmeans.train(ok, "id", "v", k = 2, sampleN = 2).length == 2)
  }
}
