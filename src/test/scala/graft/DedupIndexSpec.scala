package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, DedupIndex}

/** Incremental dedup against the persisted MinHash index: equivalence to
  * from-scratch dedup restricted to new-touching pairs, the index-scan-only
  * plan contract, and the daily-ingest append loop. */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "seven wizards brew strong coffee near the old stone bridge at dawn"
  private def variant(i: Int) = base.replace("coffee", s"tea$i")

  // old corpus: ids 1-20 (two planted near-dups inside it must NOT pair
  // with each other in incremental output — old-old pairs are history's
  // business); new batch: ids 101-103 (101 near-dups base, 103 dups 102).
  private val oldDocs = ((1L to 18L).map(i => (i, s"unique old text $i " +
    s"with words alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i")) ++
    Seq((19L, base), (20L, variant(0)))).toDF("doc_id", "text")
  private val newDocs = Seq(
    (101L, variant(1)),
    (102L, "fresh new document with its own tokens kappa lambda mu nu xi " +
      "omicron pi rho sigma tau upsilon"),
    (103L, "fresh new document with its own tokens kappa lambda mu nu xi " +
      "omicron pi rho sigma tau phi"))
    .toDF("doc_id", "text")

  private def withIndex[T](docs: org.apache.spark.sql.DataFrame)(
      f: String => T): T = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-idx-spec-").resolve("idx").toString
    DedupIndex.buildMinhashIndex(docs, "doc_id", "text", root)
    f(root)
  }

  test("incremental ≡ full recompute restricted to new-touching pairs") {
    withIndex(oldDocs) { root =>
      val inc = DedupIndex.incrementalDedup(spark, root, newDocs,
          "doc_id", "text", 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // full recompute over old ∪ new with the SAME parameterization the
      // index froze (r derived from the OLD corpus count)
      val meta = DedupIndex.readMeta(spark, root)
      val full = Dedup.minhashLsh(oldDocs.union(newDocs), "doc_id", "text",
          meta.shingle_k, meta.num_hashes, meta.bands, 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val newIds = Set(101L, 102L, 103L)
      val expected = full.filter(p => newIds(p._1) || newIds(p._2))
      assert(inc == expected)
      assert(inc.contains((19L, 101L)) || inc.contains((20L, 101L)),
        s"new near-dup of an OLD doc must be caught: $inc")
      assert(inc.contains((102L, 103L)), "new-new pair must be caught")
      assert(!inc.contains((19L, 20L)), "old-old pairs are not re-reported")
    }
  }

  test("plan contract: the old corpus contributes ONLY index scans") {
    withIndex(oldDocs) { root =>
      // newDocs is an in-memory DataFrame, so EVERY file scan in the plan
      // must read from under the index root — any other location would
      // mean history was re-read.
      val plan = DedupIndex.incrementalDedup(spark, root, newDocs,
        "doc_id", "text", 0.3).queryExecution.executedPlan.toString
      val scanned = "file:[^\\s\\],]+".r.findAllIn(plan).toList
      assert(scanned.nonEmpty, "expected index file scans in the plan")
      val rootNorm = root.stripPrefix("file:")
      scanned.foreach(p => assert(p.contains(rootNorm),
        s"non-index file scan in incremental plan: $p"))
      // the regex tokenize pass exists in the plan ONLY over the new
      // batch (an in-memory relation here): with every file scan pinned
      // under the index root above, a history re-shingle is impossible —
      // old text lives nowhere the plan reads.
      Seq("banded", "shingles", "sig").foreach(t =>
        assert(scanned.exists(_.contains(s"$rootNorm/$t")),
          s"expected an index scan of $t"))
    }
  }

  test("append loop: batch2 dedups against batch1 via the extended index") {
    withIndex(oldDocs) { root =>
      DedupIndex.appendBatch(spark, root, newDocs, "doc_id", "text")
      val batch2 = Seq((201L, "fresh new document with its own tokens " +
        "kappa lambda mu nu xi omicron pi rho sigma tau chi"))
        .toDF("doc_id", "text")
      val pairs = DedupIndex.incrementalDedup(spark, root, batch2,
          "doc_id", "text", 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((102L, 201L)) && pairs.contains((103L, 201L)),
        s"batch2 must catch near-dups of appended batch1 docs: $pairs")
    }
  }

  test("multigen loop (dd12's shape): after TWO appended generations, " +
      "the live batch still dedups via index scans only") {
    withIndex(oldDocs) { root =>
      DedupIndex.appendBatch(spark, root, newDocs, "doc_id", "text")
      val batch2 = Seq((201L, "fresh new document with its own tokens " +
        "kappa lambda mu nu xi omicron pi rho sigma tau chi"))
        .toDF("doc_id", "text")
      DedupIndex.appendBatch(spark, root, batch2, "doc_id", "text")
      val batch3 = Seq(
        (301L, variant(9)), // near-dup of g0's planted pair
        (302L, "fresh new document with its own tokens kappa lambda mu " +
          "nu xi omicron pi rho sigma tau psi")) // near-dup of g1's 102/103 + g2's 201
        .toDF("doc_id", "text")
      val df = DedupIndex.incrementalDedup(spark, root, batch3,
        "doc_id", "text", 0.3)
      // history-never-reshingled pin across generations: batch3 is an
      // in-memory frame, so every file scan must point under the index
      // root — g0's build AND both appended generations alike
      val plan = df.queryExecution.executedPlan.toString
      val scanned = "file:[^\\s\\],]+".r.findAllIn(plan).toList
      val rootNorm = root.stripPrefix("file:")
      assert(scanned.nonEmpty)
      scanned.foreach(p => assert(p.contains(rootNorm),
        s"non-index file scan in multigen incremental plan: $p"))
      val pairs = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // 301 must pair with g0 history; 302 with BOTH appended generations
      assert(pairs.contains((19L, 301L)) || pairs.contains((20L, 301L)),
        s"g3 near-dup of a g0 doc must be caught: $pairs")
      assert(pairs.contains((102L, 302L)) && pairs.contains((201L, 302L)),
        s"g3 near-dup must hit docs from both appended generations: $pairs")
    }
  }

  test("deriveMinhashRows grows with the corpus, integer-exact") {
    assert(Dedup.deriveMinhashRows(500) == 2)
    assert(Dedup.deriveMinhashRows(5000) == 3)
    assert(Dedup.deriveMinhashRows(800) == 2)   // boundary: n == 8·10^2
    assert(Dedup.deriveMinhashRows(801) == 3)
    assert(Dedup.deriveMinhashRows(100000000000L) == 8) // capped at maxRows
    assert(Dedup.deriveMinhashRows(0) == 2)
  }
}
