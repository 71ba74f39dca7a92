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

  test("train: merges apply greedily and re-pair across rounds") {
    // wc: ab=3, abc=1. Round 1: (a,b)=4 wins; round 2 pairs the MERGED
    // symbol: (ab,c)=1 — only reachable after round 1's rewrite.
    val (merges, vocab) =
      Bpe.train(Seq("ab ab ab abc").toDF("text"), "text", nMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.n)) ==
      Seq(("a", "b", 4L), ("ab", "c", 1L)))
    val syms = vocab.collect().map(r => r.getAs[String]("word") ->
      r.getAs[scala.collection.Seq[String]]("symbols").toSeq).toMap
    assert(syms("ab") == Seq("ab") && syms("abc") == Seq("abc"))
  }

  test("encode: rank order wins over position; unseen words segment") {
    import graft.operators.Bpe.Merge
    // merges learned elsewhere: rank 0 = (b,c), rank 1 = (a,b).
    // "abc": the LOWEST-RANK applicable merge (b,c) fires first even
    // though (a,b) sits further left → [a, bc], then nothing applies.
    val merges = Seq(Merge("b", "c", 9L), Merge("a", "b", 5L))
    val out = Bpe.encode(
        Seq((1L, "abc ab zzz"), (2L, "")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // abc → [a, bc] (2); ab → [ab] (1); zzz unseen → [z,z,z] (3)
    assert(out(1L) == ((3L, 6L)))
    assert(out(2L) == ((0L, 0L)))
  }

  test("train: greedy left-to-right scan on overlapping occurrences") {
    // "aaa": pairs (a,a)x2 → merge (a,a); greedy scan yields [aa, a],
    // NOT [a, aa] — the Sennrich reference behavior.
    val (merges, vocab) =
      Bpe.train(Seq("aaa").toDF("text"), "text", nMerges = 1)
    assert(merges.head.left == "a" && merges.head.right == "a" &&
      merges.head.n == 2L)
    val syms = vocab.collect().head.getAs[scala.collection.Seq[String]]("symbols").toSeq
    assert(syms == Seq("aa", "a"))
  }

  test("train: EVEN-run repeats merge pairwise ([aa, aa] for 'aaaa') — " +
      "the case the tx35 twin's doubled-separator replace must match") {
    // 'aaaa' → greedy (a,a) gives [aa, aa]; a single-space-guarded SQL
    // replace would give [aa, a, a] because it consumes the shared
    // delimiter (PLANS_r12 gate). This pins the Spark-side truth the
    // twin is proven against.
    val (merges, vocab) =
      Bpe.train(Seq("aaaa").toDF("text"), "text", nMerges = 1)
    assert(merges.head == graft.operators.Bpe.Merge("a", "a", 3L))
    val syms = vocab.collect().head
      .getAs[scala.collection.Seq[String]]("symbols").toSeq
    assert(syms == Seq("aa", "aa"))
  }

  test("encode ≡ training-replay segmentation on every fixture vocab " +
      "word (the tx37 gate's empirical equivalence pin)") {
    // tx37 oracles the training-final segmentation (twin-replayable);
    // Bpe.encode is the rank-order serving path. The two are not
    // provably identical in general (PLANS_r12 gate §tx37) — this pins
    // that they coincide on the whole fixture vocabulary, token count
    // for token count, at the tx35/tx37 merge depth.
    val docs = graft.core.Tables.load(
      TestSession.spark, "/root/testdata/sf0.001", "documents")
    val (merges, vocab) = Bpe.train(docs, "text", nMerges = 8)
    val replay = vocab.collect()
      .map(r => r.getAs[String]("word") ->
        r.getAs[scala.collection.Seq[String]]("symbols").length.toLong)
      .toMap
    // one synthetic doc per vocab word → encode's per-doc n_tokens is
    // exactly that word's segment count under the rank-order loop
    val words = replay.keys.toSeq.sorted
    val asDocs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val enc = Bpe.encode(asDocs, "doc_id", "text", merges).collect()
      .map(r => words(r.getLong(0).toInt) -> r.getLong(2)).toMap
    assert(words.nonEmpty && words.forall(w => enc(w) == replay(w)),
      words.filter(w => enc(w) != replay(w)).take(5).toString)
  }
}
