package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.expr.{ByteHistogramOps, MinHashOps, SimHashOps, Uuid5, VectorOps}
import graft.plans.TopKBuffer

/**
 * Property tests (SURVEY §5 plan) over the driver-side kernels — pure CPU,
 * no SparkSession: cosine bounds/symmetry, uuid5 determinism + RFC 4122
 * bits, minhash estimate bounds, bounded-heap top-k vs brute force, byte
 * histogram normalization.
 */
object KernelProperties extends Properties("graft.kernels") {

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(1, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).map(_.toArray))

  private def arr(a: Array[Float]) = new GenericArrayData(a)

  property("cosine is symmetric and within [-1, 1]") =
    forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      val (x, y) = (a.take(n), b.take(n))
      val c1 = VectorOps.cosine(arr(x), arr(y))
      val c2 = VectorOps.cosine(arr(y), arr(x))
      c1 == c2 && c1 >= -1.0 - 1e-9 && c1 <= 1.0 + 1e-9
    }

  property("Mmr.cosine matches the Catalyst kernel bit-for-bit") =
    // The MMR greedy loop computes pairwise sims on plain float arrays;
    // its oracle equivalence rests on agreeing EXACTLY (same double
    // accumulation order) with the expression kernel the stage-1 scores
    // came from.
    forAll(vecGen, vecGen) { (a, b) =>
      graft.search.Mmr.cosine(a, b) == VectorOps.cosine(arr(a), arr(b))
    }

  property("cosine self-similarity is 1 (or 0 for the zero vector)") =
    forAll(vecGen) { a =>
      val c = VectorOps.cosine(arr(a), arr(a))
      if (VectorOps.norm(arr(a)) == 0.0) c == 0.0
      else math.abs(c - 1.0) < 1e-9
    }

  property("uuid5 is deterministic with version 5 + RFC variant bits") =
    forAll(Gen.alphaNumStr) { s =>
      def u5 = Uuid5(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)).eval(InternalRow.empty).toString
      val u = u5
      u == u5 && u.length == 36 && u.charAt(14) == '5' &&
        "89ab".contains(u.charAt(19))
    }

  private val shinglesGen: Gen[Array[String]] =
    Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.distinct.toArray)

  property("minhash estimate is within [0,1]; identical arrays estimate exactly 1") =
    forAll(shinglesGen, shinglesGen) { (a, b) =>
      def sig(s: Array[String]) = MinHashOps.signature(
        new GenericArrayData(s.map(UTF8String.fromString): Array[AnyRef]), 64)
      val sa = sig(a)
      val sb = sig(b)
      val agree = (0 until 64).count(i => sa.getLong(i) == sb.getLong(i)) / 64.0
      // determinism AND the duplicate-detection core property: a doc
      // compared against itself must agree on EVERY slot
      val selfAgree = {
        val s2 = sig(a)
        (0 until 64).forall(i => sa.getLong(i) == s2.getLong(i))
      }
      // shuffled duplicates (same shingle SET) also estimate exactly 1
      val permuted = sig(new scala.util.Random(42).shuffle(a.toList).toArray)
      val dupAgree = (0 until 64).forall(i => sa.getLong(i) == permuted.getLong(i))
      agree >= 0.0 && agree <= 1.0 && selfAgree && dupAgree
    }

  property("simhash of identical token arrays is identical (hamming 0)") =
    forAll(shinglesGen) { a =>
      val t = new GenericArrayData(a.map(UTF8String.fromString): Array[AnyRef])
      SimHashOps.simhash(t) == SimHashOps.simhash(t)
    }

  private val entriesGen: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(0L, 50L)))
      .map(_.distinctBy(_._2)) // unique tie-break ids, like corpus row ids

  property("TopKBuffer equals brute-force top-k under (score desc, id asc)") =
    forAll(entriesGen, Gen.chooseNum(1, 8)) { (entries, k) =>
      val buf = new TopKBuffer(k)
      entries.foreach { case (s, i) => buf.insert(s, i, InternalRow(i)) }
      val got = buf.sorted.map(e => (e.score, e.id)).toList
      val want = entries.sortBy { case (s, i) => (-s, i) }.take(k)
      got == want
    }

  property("TopKBuffer merge equals top-k of the union") =
    forAll(entriesGen, entriesGen, Gen.chooseNum(1, 8)) { (ea, eb0, k) =>
      val taken = ea.map(_._2).toSet
      val eb = eb0.filterNot(e => taken(e._2))
      val a = new TopKBuffer(k)
      ea.foreach { case (s, i) => a.insert(s, i, InternalRow(i)) }
      val b = new TopKBuffer(k)
      eb.foreach { case (s, i) => b.insert(s, i, InternalRow(i)) }
      b.sorted.foreach(e => a.insert(e.score, e.id, e.payload))
      val got = a.sorted.map(e => (e.score, e.id)).toList
      val want = (ea ++ eb).sortBy { case (s, i) => (-s, i) }.take(k)
      got == want
    }

  property("byte histogram is unit-L2 for nonempty payloads") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val h = ByteHistogramOps.histogram(bytes.toArray, 16)
      val n = math.sqrt((0 until 16).map(i => h.getFloat(i).toDouble)
        .map(x => x * x).sum)
      math.abs(n - 1.0) < 1e-5
    }

  property("int8 cosine is symmetric, within [-1,1]; self ≈ 1 for non-zero codes") =
    forAll(vecGen) { a =>
      val code = graft.expr.Int8VectorOps.quantize(arr(a))
      val self = graft.expr.Int8VectorOps.cosine(code, code)
      val zero = code.forall(_ == 0)
      (if (zero) self == 0.0 else math.abs(self - 1.0) < 1e-9) &&
        self >= -1.0 - 1e-9 && self <= 1.0 + 1e-9
    }

  property("int8 quantization preserves cosine within the quantization error bound") =
    forAll(vecGen, vecGen) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val exact = VectorOps.cosine(arr(a), arr(b))
      val approx = graft.expr.Int8VectorOps.cosine(
        graft.expr.Int8VectorOps.quantize(arr(a)),
        graft.expr.Int8VectorOps.quantize(arr(b)))
      // 1/127 per-component relative error -> cosine moves O(sqrt(dim)/127);
      // 0.2 is a loose safety bound for dim <= 32 (typical error ~0.01)
      exact == 0.0 || approx == 0.0 || math.abs(exact - approx) < 0.2
    }

  property("nearest centroid is the true double-cosine argmax (smallest index on ties)") =
    forAll(vecGen, Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, vecGen))) {
      (v0, cents0) =>
        val dim = (v0.length +: cents0.map(_.length)).min
        val v = v0.take(dim)
        val cents = cents0.map(_.take(dim)).toArray
        val norms = graft.expr.NearestCentroidOps.norms(cents)
        val got = graft.expr.NearestCentroidOps
          .nearest(arr(v), cents, norms, 1).getInt(0)
        val scores = cents.indices.map { i =>
          var s = 0.0
          var j = 0
          while (j < dim) { s += v(j).toDouble * cents(i)(j); j += 1 }
          if (norms(i) > 0.0) s / norms(i) else 0.0
        }
        val best = scores.max
        got == scores.indexWhere(_ == best)
    }

  property("prefix+positional filter never loses a qualifying Jaccard pair") =
    // The completeness theorem Dedup.jaccardJoinPrefix rests on, under an
    // ARBITRARY consistent global token order (the implementation's
    // df-ascending order is just one instance): if J(x,y) >= t then some
    // token common to both ordered prefixes (length L - floor(t*L - eps))
    // passes the positional overlap bound min(|x|-i, |y|-j) >=
    // t/(1+t)*(|x|+|y|) - eps. Exercises the epsilon-relaxed FP bounds at
    // threshold boundaries (small sets make J land exactly on t often).
    forAll(
      Gen.chooseNum(1L, Long.MaxValue),                   // order-permutation seed
      Gen.nonEmptyListOf(Gen.chooseNum(0, 30)).map(_.toSet),
      Gen.nonEmptyListOf(Gen.chooseNum(0, 30)).map(_.toSet),
      Gen.oneOf(0.5, 0.6, 2.0 / 3.0, 0.75, 0.8, 0.9, 1.0)) { (seed, x, y, t) =>
      val eps = 1e-9
      val rnd = new scala.util.Random(seed)
      val order = rnd.shuffle((0 to 30).toVector).zipWithIndex.toMap
      val inter = (x intersect y).size.toDouble
      val j = inter / (x union y).size
      if (j < t) true
      else {
        val (sx, sy) = (x.toSeq.sortBy(order), y.toSeq.sortBy(order))
        val (lx, ly) = (sx.length, sy.length)
        def prefLen(l: Int) = l - math.floor(t * l - eps).toInt
        val px = sx.take(prefLen(lx)).zipWithIndex.toMap
        val py = sy.take(prefLen(ly)).zipWithIndex.toMap
        val req = t / (1.0 + t) * (lx + ly) - eps
        (px.keySet intersect py.keySet).exists { w =>
          math.min(lx - px(w), ly - py(w)) >= req
        }
      }
    }

  // ---- round-15 kernels: the canonical fold and the byte edit distance

  /** Valid-code-point strings (no lone surrogates — UTF-8 cannot carry
    * them, so they are outside every kernel's input domain): ASCII mixed
    * with the fold's hazard characters and whole astral pairs. */
  private val uniGen: Gen[String] = Gen.listOf(Gen.frequency[String](
    (6, Gen.alphaNumChar.map(_.toString)),
    (2, Gen.oneOf("İ", "Σ", "ς", "σ", "ß", "é", "中", "Ꟈ", " ")),
    (1, Gen.oneOf("👍", "𐐀", "𐐨")))).map(_.mkString)

  property("simple fold is CONTEXT-FREE: fold(a+b) == fold(a) + fold(b)") =
    // the design property full casing lacks (Final_Sigma reads neighbors)
    // and the reason dedup keys can be sliced/concatenated safely —
    // stated at code-point granularity (a split never tears a surrogate
    // pair; mid-code-point splits are not valid text boundaries anywhere)
    forAll(uniGen, uniGen) { (a, b) =>
      graft.expr.SimpleCaseFold.lower(a + b) ==
        graft.expr.SimpleCaseFold.lower(a) + graft.expr.SimpleCaseFold.lower(b)
    }

  property("simple fold is idempotent and UTF8String path == String path") =
    forAll(uniGen) { s =>
      val once = graft.expr.SimpleCaseFold.lower(s)
      val viaUtf8 = graft.expr.SimpleCaseFold.lower(UTF8String.fromString(s)).toString
      graft.expr.SimpleCaseFold.lower(once) == once && viaUtf8 == once
    }

  property("fold over ARBITRARY bytes == the String-path (r15) fold — malformed included") =
    // the byte-level decoder validates strictly (continuation bytes,
    // overlong forms, surrogates, > U+10FFFF) and falls back to the
    // String path on any malformed sequence, so the fold's OUTPUT on any
    // byte array — valid UTF-8 or garbage — is exactly what the r15
    // String round-trip produced (Java decode repairs with U+FFFD), and
    // the artifact fold Version honestly stays "simple-1"
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val raw = UTF8String.fromBytes(bs.toArray)
      val viaBytes = graft.expr.SimpleCaseFold.lower(raw)
      val viaString = UTF8String.fromString(
        graft.expr.SimpleCaseFold.lower(raw.toString))
      java.util.Arrays.equals(viaBytes.getBytes, viaString.getBytes)
    }

  property("byteLevenshtein is a metric: symmetry, identity, bounds") =
    forAll(uniGen, uniGen) { (a, b) =>
      import graft.expr.EditDistanceOps.byteLevenshtein
      def u(s: String) = UTF8String.fromString(s)
      val d = byteLevenshtein(u(a), u(b))
      val (la, lb) = (u(a).numBytes, u(b).numBytes)
      byteLevenshtein(u(b), u(a)) == d &&
        byteLevenshtein(u(a), u(a)) == 0 &&
        d >= math.abs(la - lb) && d <= math.max(la, lb) &&
        ((d == 0) == (a == b))
    }

  property("byteLevenshtein triangle inequality") =
    forAll(uniGen, uniGen, uniGen) { (a, b, c) =>
      import graft.expr.EditDistanceOps.byteLevenshtein
      def u(s: String) = UTF8String.fromString(s)
      byteLevenshtein(u(a), u(c)) <=
        byteLevenshtein(u(a), u(b)) + byteLevenshtein(u(b), u(c))
    }
}
