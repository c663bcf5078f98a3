package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PROBE-ONLY replica of the r15 `simple_lower` non-ASCII path (decode to
  * `String`, fold, re-encode) — kept here, not in graft.expr, purely so
  * [[FoldProbe]] can time the retired implementation against the r16
  * byte-level kernel on the same corpora. Not registered as a function. */
private[bench] case class LegacyStringFold(child: Expression) extends UnaryExpression {
  override def prettyName: String = "legacy_string_fold"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    if (s.isFullAscii) s.toLowerCaseAscii()
    else UTF8String.fromString(graft.expr.SimpleCaseFold.lower(s.toString))
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"($c.isFullAscii() ? $c.toLowerCaseAscii() : " +
        s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expr.SimpleCaseFold.lower($c.toString())))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * TimeOne-style probe for the canonical case fold on NON-ASCII-heavy
 * corpora (VERDICT r15 #6): BASELINE.md claims no movement on the
 * ASCII-dominated fixtures — true, because `simple_lower` shares Spark's
 * ASCII fast path — but a CJK/Cyrillic/Greek-heavy corpus takes the
 * non-ASCII branch per row. The r15 implementation round-tripped through
 * `String` there ([[LegacyStringFold]], timed here as the retired
 * baseline); r16 folds the UTF-8 payload bytes directly. Spark's builtin
 * `lower` rides along as the codegen reference (different semantics —
 * full mapping — same I/O and loop shape). 200k rows/family through the
 * noop sink (full evaluation), warmup + min-of-3. Results land in
 * BENCH_SCALE.md ("fold probe").
 */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-fold-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    import org.apache.spark.sql.GraftInternal.{column, expression}
    import org.apache.spark.sql.functions.{col, length}
    import spark.implicits._

    // deterministic corpora: ~120-char lines, one per script family
    val families: Seq[(String, Int => String)] = Seq(
      "ascii" -> (i => s"The Quick Brown FOX jumps OVER the lazy dog $i " * 2),
      "cyrillic" -> (i => s"СЪЕШЬ ЖЕ ЕЩЁ ЭТИХ МЯГКИХ Французских БУЛОК $i Да Выпей Чаю " * 2),
      "greek" -> (i => s"ΣΟΦΟΣ ΑΝΘΡΩΠΟΣ Ξεσκεπάζω Την Ψυχοφθόρα Βδελυγμία $i " * 2),
      "cjk" -> (i => s"中文文本处理管道第${i}号 日本語のテキスト 한국어 텍스트 " * 3),
      "mixed" -> (i => s"İstanbul CAFÉ naïve ΣΟΦΟΣ 中文 emoji テスト $i Straße " * 2))

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val out = families.map { case (name, gen) =>
      val data = (0 until rows).map(gen).toDF("t").localCheckpoint(true)
      val byteK = data.select(length(graft.functions.simple_lower(col("t"))).as("l"))
      val legacy = data.select(
        length(column(LegacyStringFold(expression(col("t"))))).as("l"))
      val builtin = data.selectExpr("length(lower(t)) AS l")
      Seq(byteK, legacy, builtin).foreach(time) // warmup
      val sB = (0 until 3).map(_ => time(byteK)).min
      val sL = (0 until 3).map(_ => time(legacy)).min
      val b = (0 until 3).map(_ => time(builtin)).min
      System.err.println(f"$name%-9s byte=$sB%.3fs legacy_string=$sL%.3fs " +
        f"builtin_lower=$b%.3fs byte/builtin=${sB / b}%.2f legacy/byte=${sL / sB}%.2f")
      name -> ((sB, sL, b))
    }
    val json = out.map { case (n, (sB, sL, b)) =>
      f""""$n":{"byte_fold_s":$sB%.4f,"legacy_string_fold_s":$sL%.4f,"builtin_lower_s":$b%.4f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"fold_probe","rows":$rows,"families":$json}""")
    spark.stop()
  }
}
