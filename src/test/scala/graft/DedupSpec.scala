package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Dedup operator properties on planted duplicates (the fixture corpus has
  * none, so correctness needs constructed cases). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "seven wizards brew strong coffee near the old stone bridge at dawn"
  private val nearDup = base.replace("coffee", "tea") // 1 token differs
  private val unrelated = "completely different words about spark engines " +
    "catalyst optimizer tungsten codegen shuffle partitions broadcast joins"

  private val docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length == 3)
    val byKeep = out.map(r => r.getAs[Long]("keep_id") ->
      r.getAs[Long]("n_copies")).toMap
    assert(byKeep(1L) == 2L && byKeep(2L) == 1L && byKeep(3L) == 1L)
  }

  test("n-gram jaccard: near-dup pair scores high, unrelated pair absent") {
    val blocked = docs.withColumn("blk", lit("all"))
    val pairs = Dedup.ngramJaccardPairs(blocked, "doc_id", "text", 3, Seq("blk"))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs((1L, 4L)) == 1.0)            // exact dup
    assert(pairs((1L, 2L)) > 0.5)             // near dup
    assert(!pairs.contains((1L, 3L)))         // no shared shingle
  }

  test("minhash LSH recovers planted near-dups with exact-jaccard verification") {
    val out = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleK = 3, numHashes = 16, bands = 8, jaccardThreshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(out.contains((1L, 4L)))
    assert(out.contains((1L, 2L)) || out.contains((2L, 4L)))
    assert(!out.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("nearDupClusters: transitive pairs collapse to min-id components") {
    // edges: 1-2, 2-5 (chain → one component {1,2,5}), 7-9, isolated 100s
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 9L), (100L, 101L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.nearDupClusters(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(5L) == 1L)
    assert(out(7L) == 7L && out(9L) == 7L)
    assert(out(100L) == 100L && out(101L) == 100L)
    assert(out.size == 7)
    // distributed label-propagation regime produces the identical labeling
    val dist = Dedup.nearDupClusters(pairs, "doc_a", "doc_b",
        localEdgeLimit = 0L)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(dist == out)
  }

  test("nearDupClusters: pointer jumping converges a long chain in O(log) rounds") {
    // a 16-node chain has diameter 15: plain 1-hop min propagation needs
    // ~15 rounds, pointer jumping ~4 — maxIter=6 only passes with the jump
    val chain = (1L until 16L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.nearDupClusters(chain, "doc_a", "doc_b",
        localEdgeLimit = 0L, maxIter = 6)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(out.size == 16 && out.values.forall(_ == 1L))
  }

  test("simhashTable is bit-identical to the per-row simhash column") {
    val perRow = docs.select($"doc_id", Dedup.simhash($"text").as("sketch"))
      .as[(Long, Long)].collect().toMap
    val table = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(table == perRow)
    // empty document: HOF fold over empty array gives sketch 0; the
    // exploded agg path must agree (null-vote → bit 0).
    val withEmpty = Seq((9L, "")).toDF("doc_id", "text")
    assert(Dedup.simhashTable(withEmpty, "doc_id", "text")
      .as[(Long, Long)].collect().toMap == Map(9L -> 0L))
  }

  test("simhash: hamming(near-dups) < hamming(unrelated)") {
    val sk = docs.select($"doc_id", Dedup.simhash($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sk(1L) == sk(4L)) // identical text, identical sketch
    val near = java.lang.Long.bitCount(sk(1L) ^ sk(2L))
    val far = java.lang.Long.bitCount(sk(1L) ^ sk(3L))
    assert(near < far)
    assert(near <= 8)
  }

  test("hammingNearDup banded join is EXACT for maxHamming < bands (property)") {
    // 80 two-word sketches: 20 random bases, each with 3 perturbed copies
    // at 1-4 flipped bits — pairs land on both sides of the threshold
    val rnd = new scala.util.Random(3)
    val rows = (0 until 20).flatMap { g =>
      val lo = rnd.nextLong() & 0xffffffffL
      val hi = rnd.nextLong() & 0xffffffffL
      (0 until 4).map { v =>
        var (l, h) = (lo, hi)
        (0 until v).foreach { j =>
          val bit = rnd.nextInt(64)
          if (bit < 32) l ^= 1L << bit else h ^= 1L << (bit - 32)
        }
        ((g * 4 + v).toLong, l, h)
      }
    }
    val out = Dedup.hammingNearDup(
        rows.toDF("doc_id", "ahash_lo", "ahash_hi"), "doc_id",
        Seq("ahash_lo", "ahash_hi"), wordBits = 32, bandBits = 16,
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val brute = (for {
      a <- rows; b <- rows if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3) if d <= 3
    } yield (a._1, b._1) -> d.toLong).toMap
    assert(out == brute,
      s"banded=${out.size} brute=${brute.size}; " +
        s"missed=${(brute.keySet -- out.keySet).take(5)}")
    assert(brute.nonEmpty && brute.values.exists(_ > 0L),
      "fixture must exercise non-identical near pairs")
  }

  test("containment catches a subset doc that symmetric Jaccard misses") {
    // doc 11 is the first half of doc 10: containment(11→10) ≈ 1 while
    // jaccard ≈ 0.5 — the asymmetric quote/subset signal dd6 keys on
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val half = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = Seq((10L, long), (11L, half), (12L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, Seq())
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("common"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Double]("jaccard")))).toMap
    val (common, nA, nB, jac) = pairs((10L, 11L))
    val containmentB = common.toDouble / nB // |A∩B| / |smaller doc|
    assert(containmentB == 1.0,
      s"every shingle of the half-doc is in the long doc: $containmentB")
    assert(jac < 0.5, s"symmetric jaccard must NOT flag the subset: $jac")
    assert(nA == 38L && nB == 18L && common == 18L)
    assert(!pairs.contains((10L, 12L)) && !pairs.contains((11L, 12L)),
      "unrelated doc shares no shingle, no pair emitted")
  }

  test("repeatedSpanProfile: cross-doc and within-doc spans covered, clean doc at zero") {
    // w1..w12 unique filler tokens; docs 1/2 share an exact 8-token run,
    // doc 3 repeats its own 8-token run twice, doc 4 is span-clean, doc
    // 5 is shorter than a span
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val selfRun = (1 to 8).map(i => s"r$i").mkString(" ")
    val d = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5"),
      (2L, s"b1 b2 $shared b3 b4 b5 b6"),
      (3L, s"$selfRun c1 $selfRun"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
      (5L, "v1 v2 v3")).toDF("doc_id", "text")
    val out = Dedup.repeatedSpanProfile(d, "doc_id", "text", spanLen = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_fraction"))))
      .toMap
    assert(out.size == 5, "every doc gets a profile row")
    // docs 1/2: exactly the shared 8-token window duplicates (the
    // flanking tokens differ), covering 8 positions each
    assert(out(1L) == ((13L, 1L, 8L, 8.0 / 13.0)))
    assert(out(2L) == ((14L, 1L, 8L, 8.0 / 14.0)))
    // doc 3: its span repeats within the doc — both occurrences count,
    // 16 of 17 positions covered (the middle c1 breaks the run)
    assert(out(3L) == ((17L, 2L, 16L, 16.0 / 17.0)))
    assert(out(4L) == ((10L, 0L, 0L, 0.0)))
    assert(out(5L) == ((3L, 0L, 0L, 0.0)))
  }

  test("sorted-neighborhood: prefix-sharing near-dups found, " +
      "partition-invariant, front-divergent pair is the documented miss") {
    // 6 docs: 1/2 share a long prefix and differ by one token (adjacent in
    // sort order); 3 is unrelated; 5/6 are near-dups whose FIRST words
    // differ (sort keys diverge -> not neighbors at window 2 with an
    // intervening run of docs); 4 is an exact copy of 1.
    val mid = (1 to 8).map(i => (100L + i,
      s"middle filler document number $i with some words")).toSeq
    val d = (Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "totally unrelated content about something else entirely"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "aaa shared tail words one two three four five six"),
      (6L, "zzz shared tail words one two three four five six")) ++ mid)
      .toDF("doc_id", "text")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.sortedNeighborhoodPairs(df, "doc_id", "text",
          window = 2, keyLen = 24, threshold = 0.5)
        .select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val out = pairsOf(d)
    // exact copy + one-token near-dup, all within the window around the
    // shared prefix:
    assert(out.exists(p => Set((p._1, p._2)) == Set((1L, 4L)) && p._3 == 1.0)
      || out.exists(p => Set(p._1, p._2) == Set(1L, 4L) && p._3 == 1.0))
    assert(out.exists(p => Set(p._1, p._2) == Set(1L, 2L) && p._3 > 0.7))
    assert(out.exists(p => Set(p._1, p._2) == Set(2L, 4L) && p._3 > 0.7))
    // the front-divergent near-dup pair is NOT found (sort keys 'aaa...'
    // vs 'zzz...' are separated by every other doc) - the documented
    // blind spot that shingle blocking (tx6) covers:
    assert(!out.exists(p => Set(p._1, p._2) == Set(5L, 6L)))
    // no unrelated pair sneaks past the threshold
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
    // global sequence is partition-invariant: same pairs from 1 partition
    assert(pairsOf(d.repartition(1)) == out)
    assert(pairsOf(d.repartition(13)) == out)
  }

  test("edit-distance pairs: catches in-token character edits that " +
      "token-set Jaccard is blind to; exact distance; truncation bound") {
    // 1/2: every token carries a one-character edit (OCR-noise shape) —
    // token sets are DISJOINT (Jaccard 0) but the edit distance is tiny;
    // 3 unrelated; 4 exact copy of 1
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha8 bete gamna de1ta epsi1on zeta"),
      (3L, "completely different words nothing shared here at all"),
      (4L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(d, "doc_id", "text", window = 3,
        keyLen = 24, maxLen = 128, maxDist = 10)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("dist"), r.getAs[Double]("sim"))).toSet
    // token-set Jaccard on the SAME corpus misses the 1↔2 pair entirely
    val jac = Dedup.sortedNeighborhoodPairs(d, "doc_id", "text",
        window = 3, keyLen = 24, threshold = 0.3)
      .collect().map(r => Set(r.getAs[Long]("doc_a"),
        r.getAs[Long]("doc_b"))).toSet
    assert(!jac.contains(Set(1L, 2L)),
      s"fixture broken: token Jaccard should be blind to 1-2, got $jac")
    // edit distance catches it, with the EXACT hand-countable distance:
    // normalizeText lowercases; per-token edits vs doc 1 = 1 insert (8)
    // + 4 substitutions = 5
    val p12 = out.find(p => Set(p._1, p._2) == Set(1L, 2L))
    assert(p12.nonEmpty, s"$out")
    assert(p12.get._3 == 5L, s"exact Levenshtein must be 5: $p12")
    // exact copy ties at distance 0, sim 1.0
    val p14 = out.find(p => Set(p._1, p._2) == Set(1L, 4L))
    assert(p14.nonEmpty && p14.get._3 == 0L && p14.get._4 == 1.0, s"$out")
    // unrelated doc never passes maxDist
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L), s"$out")
    // truncation bound: maxLen=8 compares only the first 8 normalized
    // chars ("alpha be" vs "alpha8 b") — distance is computed on the
    // TRUNCATED strings (the documented DP bound), here 2
    val trunc = Dedup.editDistancePairs(d, "doc_id", "text", window = 3,
        keyLen = 24, maxLen = 8, maxDist = 10)
      .collect().map(r => (Set(r.getAs[Long]("doc_a"),
        r.getAs[Long]("doc_b")), r.getAs[Long]("dist"))).toMap
    assert(trunc(Set(1L, 2L)) == 2L, s"$trunc")
  }

  test("crossDocDupSpans: cross-doc runs merge while coverage touches, " +
      "within-doc-only repeats are excluded, far spans stay separate") {
    def toks(pfx: String, n: Int) = (1 to n).map(i => s"$pfx$i").mkString(" ")
    val x8 = toks("x", 8); val c8 = toks("c", 8); val z8 = toks("z", 8)
    val d = Seq(
      // doc 1: x-gram [1,8] and c-gram [9,16] — shared with DIFFERENT
      // partners, starts 1 and 9 (gap = k): windows touch ⇒ ONE span of
      // 16 tokens. z-gram at [27,34] (gap 18 > k) stays its own span.
      (1L, s"$x8 $c8 ${toks("f", 10)} $z8"),
      (2L, s"${toks("p", 3)} $x8 ${toks("q", 3)} $z8"), // shares x, z
      (3L, s"${toks("r", 5)} $c8"),                     // shares c
      // doc 4: an 8-gram repeated twice WITHIN the doc only — the
      // cross-doc criterion (min≠max) must exclude it entirely
      (4L, s"${toks("w", 8)} ${toks("w", 8)}"),
      (5L, "too short to shingle"))
      .toDF("doc_id", "text")
    val out = Dedup.crossDocDupSpans(d, "doc_id", "text", k = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"),
          r.getAs[Long]("max_span")))).toMap
    assert(out(1L) == ((2L, 24L, 16L)), s"$out")  // [1,16] + [27,34]
    assert(out(2L) == ((2L, 16L, 8L)), s"$out")
    assert(out(3L) == ((1L, 8L, 8L)), s"$out")
    assert(out(4L) == ((0L, 0L, 0L)), s"$out")
    assert(out(5L) == ((0L, 0L, 0L)), s"$out")
    // dup_frac: one correctly-rounded division (doc 3: 8 of 13 tokens)
    val f3 = Dedup.crossDocDupSpans(d, "doc_id", "text", k = 8)
      .filter(col("doc_id") === 3L).collect().head.getAs[Double]("dup_frac")
    assert(f3 == 8.0 / 13.0)
  }
}
