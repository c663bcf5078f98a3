package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("token counts: whitespace vs lexer granularity") {
    val r = one("Hello, world! it's 42.")
      .select(TextAnalysis.tokenCount($"text").as("ws"),
        TextAnalysis.regexTokenCount($"text").as("lex")).head()
    assert(r.getInt(0) == 4)
    // hello , world ! it ' s 42 .  -> 9 lexer tokens
    assert(r.getInt(1) == 9)
    assert(one("").select(TextAnalysis.tokenCount($"text")).head().getInt(0) == 0)
  }

  test("avgTokenLen and punctRatio handle empty and clean docs") {
    val r = one("ab cde").select(
      TextAnalysis.avgTokenLen($"text").as("l"),
      TextAnalysis.punctRatio($"text").as("p")).head()
    assert(r.getDouble(0) == 2.5) // 5 chars / 2 tokens
    assert(r.getDouble(1) == 0.0)
    val e = one("").select(TextAnalysis.avgTokenLen($"text"), TextAnalysis.punctRatio($"text")).head()
    assert(e.getDouble(0) == 0.0 && e.getDouble(1) == 0.0)
  }

  test("langId picks stopword-dominant language, CJK wins outright") {
    val cases = Seq(
      "the cat sat on the mat and it was good" -> "en",
      "el gato que corre y las casas por la calle" -> "es",
      "der hund und die katze ist ein tier zu hause" -> "de",
      "le chien et les chats est une bete dans la rue" -> "fr",
      "你好 world the and of" -> "zh",
      "zzz qqq www" -> "und")
    cases.foreach { case (text, expect) =>
      val got = one(text).select(TextAnalysis.langId($"text")).head().getString(0)
      assert(got == expect, s"'$text' -> $got, expected $expect")
    }
  }

  test("qualityScore rewards long clean stopword-bearing text") {
    def q(t: String): Double =
      one(t).select(TextAnalysis.qualityScore($"text")).head().getDouble(0)
    val good = q(("the quick brown fox and it was here for that " * 10).trim)
    val short = q("the")
    val noisy = q("$$$ ### !!! @@@ %%%")
    assert(good > 0.8)
    assert(short < 0.05)
    assert(noisy < 0.05)
    assert(q("") == 0.0)
  }

  test("fingerprint is reflow-stable and text-sensitive") {
    val df = Seq(
      "Hello   world\n next",
      "hello world next",
      "hello world other").toDF("text")
      .select(TextAnalysis.fingerprint($"text").as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1)) // whitespace + case reflow collapses
    assert(fps(1) != fps(2))
    assert(fps.forall(_.length == 16))
  }

  test("url/email counts and digit ratio flag pattern-heavy docs") {
    val row = Seq(
      "see https://example.com/x and http://a.b/c?d=1 or mail bob@corp.example.org",
      "digits 0123456789",
      "").toDF("text")
      .select(TextAnalysis.urlCount($"text").as("u"),
        TextAnalysis.emailCount($"text").as("e"),
        TextAnalysis.digitRatio($"text").as("d"))
      .collect()
    assert(row(0).getInt(0) == 2)
    assert(row(0).getInt(1) == 1)
    assert(row(1).getInt(0) == 0 && row(1).getInt(1) == 0)
    assert(math.abs(row(1).getDouble(2) - 10.0 / 17.0) < 1e-12)
    assert(row(2).getDouble(2) == 0.0) // empty doc guard
  }

  test("repetitionRatio: 0 for all-distinct and empty, high for degenerate loops") {
    val r = Seq("a b c d", "spam spam spam spam", "", "x x y")
      .toDF("text").select(TextAnalysis.repetitionRatio($"text").as("r"))
      .collect().map(_.getDouble(0))
    assert(r(0) == 0.0)
    assert(r(1) == 0.75) // 1 distinct of 4
    assert(r(2) == 0.0)
    assert(math.abs(r(3) - (1.0 - 2.0 / 3.0)) < 1e-12)
  }

  test("gopher rules: clean prose keeps; short/bullet/symbol/ellipsis docs fail the right rule") {
    def rules(t: String) = one(t).select(
      TextAnalysis.gopherKeep($"text").as("keep"),
      TextAnalysis.symbolWordRatio($"text").as("swr"),
      TextAnalysis.bulletLineRatio($"text").as("blr"),
      TextAnalysis.ellipsisLineRatio($"text").as("elr"),
      TextAnalysis.alphaWordRatio($"text").as("awr"),
      TextAnalysis.gopherStopHits($"text").as("stop")).head()

    // 60 clean words incl. required stopwords -> keep
    val prose = ("the quick brown fox jumps over lazy dogs and cats " * 6).trim
    assert(rules(prose).getAs[Boolean]("keep"))
    // same text but too short (9 words < 50) -> reject
    assert(!rules("the quick brown fox jumps over lazy dogs and")
      .getAs[Boolean]("keep"))
    // hash-spam: symbol-to-word ratio above 0.1 kills it
    val hashy = prose + " " + ("# # # # # # # # " * 2)
    val h = rules(hashy)
    assert(h.getAs[Double]("swr") > 0.1 && !h.getAs[Boolean]("keep"))
    // all-bullet doc: every line bullet-started -> blr = 1.0 > 0.9
    val bullets = (1 to 10).map(i => s"- item $i of the list and that").mkString("\n")
    val b = rules(bullets)
    assert(b.getAs[Double]("blr") == 1.0 && !b.getAs[Boolean]("keep"))
    // ellipsis-trailed lines beyond 30%
    val dots = (1 to 10).map(i => s"the line $i trails off...").mkString("\n")
    assert(rules(dots).getAs[Double]("elr") == 1.0)
    // numeric dump: alpha-word ratio collapses
    val nums = (1 to 60).map(_.toString).mkString(" ")
    val n = rules(nums)
    assert(n.getAs[Double]("awr") == 0.0 && !n.getAs[Boolean]("keep"))
    // stop-hit counting is distinct-word based
    assert(rules(prose).getAs[Int]("stop") == 2) // "the", "and"
  }

  test("normalize: case/punctuation/reflow variants collapse to one form; idempotent") {
    val forms = Seq("Hello,  World!", "hello world", "  HELLO\n\tworld. ")
    val norm = forms.toDF("text").select(TextAnalysis.normalize($"text").as("n"))
      .collect().map(_.getString(0)).toSet
    assert(norm == Set("hello world"))
    val twice = one("A--b  C!").select(
      TextAnalysis.normalize(TextAnalysis.normalize($"text")).as("n2"),
      TextAnalysis.normalize($"text").as("n1")).head()
    assert(twice.getString(0) == twice.getString(1))
    assert(one("?!").select(TextAnalysis.normalize($"text")).head().getString(0) == "")
  }

  test("bigrams: adjacent pairs of canonical tokens; empty below two tokens") {
    val r = one("The  quick brown\nfox").select(TextAnalysis.bigrams($"text").as("b"))
      .head().getSeq[String](0)
    assert(r == Seq("the quick", "quick brown", "brown fox"))
    assert(one("solo").select(TextAnalysis.bigrams($"text")).head().getSeq[String](0).isEmpty)
    assert(one("").select(TextAnalysis.bigrams($"text")).head().getSeq[String](0).isEmpty)
  }

  test("redact replaces URLs, emails, long digit runs; cascade order holds") {
    val r = one("see https://a.io/u@x?q=1 mail bob@ex.com or call 12345678 not 1234567")
      .select(TextAnalysis.redact($"text")).head().getString(0)
    assert(r == "see <URL> mail <EMAIL> or call <NUM> not 1234567")
    // URL pass runs first: an email-shaped URL path segment must redact as
    // one <URL>, not split into a partial URL plus <EMAIL>.
    assert(!r.contains("@"))
    val clean = one("no pii here").select(TextAnalysis.redact($"text")).head().getString(0)
    assert(clean == "no pii here")
    assert(one("").select(TextAnalysis.redact($"text")).head().getString(0) == "")
  }

  test("approx quantiles land within 5% of exact (the 100 TB quantile path)") {
    val n = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select(TextAnalysis.tokenCount($"text").as("n"))
    val row = n.agg(
      expr("percentile(n, array(0.25, 0.5, 0.75))"),
      expr("approx_percentile(n, array(0.25, 0.5, 0.75), 10000)")).head()
    val exact = row.getSeq[Double](0)
    val approx = row.getSeq[Int](1).map(_.toDouble)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e drifted past 5%")
    }
  }

  test("doc_len_quantiles_approx query pinned against the exact query's p25/p50/p75") {
    // The rows-only driver check verifies nothing beyond rows>0; this is the
    // correctness backing for that query — run BOTH actual query entries
    // (not re-derived expressions) and compare.
    val exact = graft.SparkEntry.queries("doc_len_quantiles")(spark, graft.TestSpark.sf001).head()
    val approx = graft.SparkEntry.queries("doc_len_quantiles_approx")(spark, graft.TestSpark.sf001).head()
    Seq("p25", "p50", "p75").foreach { q =>
      val e = exact.getAs[Double](q)
      val a = approx.getAs[Double](q)
      assert(e > 0, s"exact $q is $e — fixture degenerate, pin meaningless")
      assert(math.abs(a - e) / e < 0.05, s"$q: approx $a vs exact $e drifted past 5%")
    }
  }

  test("percentile_approx exact regime (n <= accuracy): element at rank ceil(p*n)") {
    // The round-14 oracle for doc_len_quantiles_approx replays this rank
    // convention in SQL; the sizes here are the awkward ones where
    // ceil(p*n) DIFFERS from other textbook rules (e.g. n=3 p=0.75:
    // ceil = 3rd element where quantile_disc-style floor(p*(n-1))+1
    // picks the 2nd), so convention drift in a Spark upgrade fails here
    // before it fails the driver compare.
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, lit, percentile_approx}
    for (n <- Seq(3, 4, 5, 7, 50)) {
      val got = (1 to n).map(_.toLong).toDF("v")
        .agg(percentile_approx(col("v"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qs"))
        .head().getSeq[Long](0)
      val want = Seq(0.25, 0.5, 0.75).map(p => math.ceil(p * n).toLong)
      assert(got == want, s"n=$n: got $got want $want (rank convention drift)")
    }
  }

  test("HLL distinct-token estimate within 5% of exact (the 100 TB vocab path)") {
    val toks = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select(explode(TextAnalysis.tokens($"text")).as("token"))
    val Array(exact, approx) = toks
      .agg(countDistinct($"token").cast("double"),
        approx_count_distinct($"token", rsd = 0.02).cast("double"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    assert(exact > 0)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL estimate $approx vs exact $exact drifted past 5%")
  }
}
