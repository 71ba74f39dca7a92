package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("pair counts are word-frequency weighted, hand-checked") {
    // wc: low=2 lower=1 newest=2
    val docs = Seq("low lower low", "newest newest").toDF("text")
    val out = Bpe.pairStats(docs, "text", k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val m = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m("lo") == ((3L, 2L)) && m("ow") == ((3L, 2L)))
    assert(m("we") == ((3L, 2L))) // lower(1) + newest(2)
    assert(m("ne") == ((2L, 1L)) && m("st") == ((2L, 1L)))
    assert(m("er") == ((1L, 1L)))
    // deterministic ordering: count desc then pair asc
    assert(out.take(3).map(_._1).toSeq == Seq("lo", "ow", "we"))
  }

  test("repeated pair inside one word counts every occurrence once per use") {
    val out = Bpe.pairStats(Seq("aaa aaa b").toDF("text"), "text", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "aaa" (wc 2) has the pair "aa" twice per word -> 2 occurrences x 2 uses
    assert(out.toSeq == Seq(("aa", 4L, 1L)))
  }

  test("single-char-only corpus yields no pairs") {
    assert(Bpe.pairStats(Seq("a b c a").toDF("text"), "text").count() == 0)
  }
}
