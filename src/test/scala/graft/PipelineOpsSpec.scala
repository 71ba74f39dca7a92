package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-5 pipeline operators (tx9 Gopher
  * filter, tx10 contamination, tx11 PII redact, pl9 chunking, pl10 source
  * mixing) — value correctness is the DuckDB oracle's job; these pin the
  * properties a hash compare can't state (coverage, flag consistency,
  * mixing weight semantics).
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("tx9: keep flag is exactly the conjunction of its thresholds, both branches exercised") {
    val rows = SparkEntry.queries("tx9_gopher_filter")(spark, dir).collect()
    assert(rows.nonEmpty)
    var kept = 0
    rows.foreach { r =>
      val ttr = r.getAs[Double]("top_token_ratio")
      val tbr = r.getAs[Double]("top_bigram_ratio")
      val mwl = r.getAs[Double]("mean_word_len")
      val nTok = r.getAs[Long]("n_tok")
      val expect = ttr <= 0.12 && tbr <= 0.08 &&
        mwl >= 3.0 && mwl <= 10.0 && nTok >= 20L
      assert(r.getAs[Boolean]("keep") == expect, s"doc ${r.get(0)}")
      assert(ttr > 0.0 && ttr <= 1.0 && tbr >= 0.0 && tbr <= 1.0)
      if (expect) kept += 1
    }
    assert(kept > 0 && kept < rows.length,
      s"thresholds must split the fixture (kept $kept of ${rows.length})")
  }

  test("tx10: benchmark docs are fully self-contaminated but never flagged; flags imply hits") {
    val rows = SparkEntry.queries("tx10_contamination")(spark, dir).collect()
    var flagged = 0
    rows.foreach { r =>
      val isBench = r.getAs[Boolean]("is_benchmark")
      val nHits = r.getAs[Long]("n_hits")
      val nGrams = r.getAs[Long]("n_grams")
      val cont = r.getAs[Double]("contamination")
      if (isBench) {
        // every gram of a benchmark doc is in the benchmark set by construction
        assert(nGrams == 0 || cont == 1.0, s"bench doc ${r.get(0)}: $cont")
        assert(!r.getAs[Boolean]("flagged"))
      }
      if (r.getAs[Boolean]("flagged")) { flagged += 1; assert(nHits > 0 && !isBench) }
      assert(nHits <= nGrams)
    }
    assert(flagged > 0, "fixture must contain contaminated non-benchmark docs")
  }

  test("tx11: every doc has all three planted PII kinds found; planted prefixes keep hashes distinct") {
    val rows = SparkEntry.queries("tx11_pii_redact")(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") >= 1L, s"doc ${r.get(0)} email missed")
      assert(r.getAs[Long]("n_phones") >= 1L, s"doc ${r.get(0)} phone missed")
      assert(r.getAs[Long]("n_ips") >= 1L, s"doc ${r.get(0)} ip missed")
      assert(r.getAs[Long]("n_chars_redacted") > 0L)
    }
    val hashes = rows.map(_.getAs[String]("redacted_md5")).toSet
    assert(hashes.size == rows.length,
      "doc_id-derived planted PII must keep every redacted doc distinct")
  }

  test("pl9: chunks tile each doc — contiguous ids, full 32-token bodies, exact tail coverage") {
    val byDoc = SparkEntry.queries("pl9_chunk_overlap")(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (doc, chunks) =>
      val ids = chunks.map(_.getAs[Long]("chunk_id")).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1L, s"doc $doc ids gap")
      chunks.foreach { c =>
        val n = c.getAs[Long]("n_chunk_tok")
        val text = c.getAs[String]("chunk_text")
        assert(text.split("\\s+").count(_.nonEmpty) == n,
          s"doc $doc chunk ${c.getAs[Long]("chunk_id")} text/count mismatch")
        if (c.getAs[Long]("chunk_id") < ids.last)
          assert(n == 32L, s"doc $doc: only the tail chunk may be short")
        else assert(n >= 1L && n <= 32L)
      }
      // the tail chunk ends exactly at n_tok: start + len == 24*k + n == n_tok
      val tail = chunks.maxBy(_.getAs[Long]("chunk_id"))
      val covered = tail.getAs[Long]("chunk_id") * 24L + tail.getAs[Long]("n_chunk_tok")
      val overlapOk = chunks.length == 1 ||
        covered > (ids.last - 1) * 24L + 32L - 32L // tail adds new tokens
      assert(overlapOk)
    }
  }

  test("pl10: integer-weight sources emit exactly w copies; fractional sources land between floors") {
    val rows = SparkEntry.queries("pl10_source_mix")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val srcnum = r.getAs[String]("source").drop(3).toInt
      val w2 = srcnum % 4 + 1 // 2× the mixing weight
      val nDocs = r.getAs[Long]("n_docs")
      val nEmitted = r.getAs[Long]("n_emitted")
      val nKept = r.getAs[Long]("n_kept")
      if (w2 % 2 == 0) {
        assert(nEmitted == nDocs * (w2 / 2), s"src$srcnum exact weight")
        assert(nKept == nDocs)
      } else {
        val lo = nDocs * (w2 / 2)
        assert(nEmitted >= lo && nEmitted <= lo + nDocs, s"src$srcnum bounds")
        if (w2 == 1) assert(nKept == nEmitted && nKept < nDocs,
          s"src$srcnum: 0.5-weight source must drop some docs")
        else assert(nKept == nDocs)
      }
    }
  }

  test("dsirSelect ranks target-like docs above off-target, zero-gram docs at weight 0") {
    import graft.operators.ImportanceSampling
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // target bigram distribution = "alpha beta …" runs; doc 20 has the
    // target's bigrams WITHOUT being in the target set — DSIR's whole
    // point is that it must still rank high and be selected
    val tgtText = (1 to 20).map(_ => "alpha beta gamma").mkString(" ")
    val offText = (1 to 20).map(_ => "zeta eta theta").mkString(" ")
    val docs = Seq(
      (10L, "s1", true, tgtText),
      (11L, "s1", true, tgtText),
      (20L, "s1", false, tgtText),
      (30L, "s1", false, offText),
      (31L, "s1", false, offText),
      (32L, "s1", false, offText),
      (40L, "s1", false, ""),     // 0 tokens → truly gramless
      (41L, "s1", false, "solo")) // 1 token → exactly ONE unigram gram
      .toDF("doc_id", "src", "tgt", "text")
    val out = ImportanceSampling.dsirSelect(docs, "doc_id", "text", "src",
        col("tgt"), buckets = 256, keepFraction = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Double]("weight"),
          r.getAs[Boolean]("selected")))).toMap
    assert(out.size == 8)
    // features are unigrams ∪ bigrams (the DSIR paper's space): a
    // single-token doc is scored from its one unigram, not dropped
    assert(out(41L)._1 == 1L, s"unigram feature missing: ${out(41L)}")
    // the off-target raw doc scores strictly below the target-like one
    assert(out(20L)._2 > out(30L)._2,
      s"target-like ${out(20L)._2} must outrank off-target ${out(30L)._2}")
    // top-50% of 8 docs = 4 slots: the three target-like + one more
    assert(out(20L)._3, "target-like raw doc must be selected")
    assert(out(10L)._3 && out(11L)._3, "target docs themselves rank top")
    assert(!out(30L)._3 || !out(31L)._3 || !out(32L)._3,
      "off-target docs fill at most one remaining slot")
    assert(out(40L)._1 == 0L && out(40L)._2 == 0.0,
      "gramless doc carries zero weight, not null")
    // identical texts ⇒ identical weights (decimal-exact per-doc sum)
    assert(out(30L)._2 == out(31L)._2 && out(31L)._2 == out(32L)._2)
  }

  test("pl12: phases are balanced per-lang quartiles ordered by quality") {
    val rows = SparkEntry.queries("pl12_curriculum")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val counts = rs.groupBy(_.getAs[Long]("phase"))
        .view.mapValues(_.length).toMap
      assert(counts.values.max - counts.values.min <= 1,
        s"$lang: ntile sizes must differ by at most 1: $counts")
      val byPhase = rs.groupBy(_.getAs[Long]("phase")).toSeq.sortBy(_._1)
        .map { case (p, prs) => (p, prs.map(_.getAs[Double]("quality"))) }
      byPhase.sliding(2).filter(_.size == 2).foreach {
        case Seq((_, lo), (_, hi)) =>
          assert(lo.max <= hi.min,
            s"$lang: phase qualities must be non-decreasing")
        case _ => ()
      }
    }
  }

  test("bigramPerplexity: predictable transitions score lower ppl than one-off ones") {
    import graft.operators.LanguageModel
    import spark.implicits._
    // docs 1-3 repeat the same transitions (the model learns them);
    // doc 4's transitions occur once each — maximally surprising
    val common = (1 to 10).map(_ => "to be or not").mkString(" ")
    val docs = Seq(
      (1L, common), (2L, common), (3L, common),
      (4L, "one two three four five six seven eight"),
      (5L, "solo")).toDF("doc_id", "text")
    val out = LanguageModel.bigramPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("logprob"),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(out.size == 5)
    assert(out(1L)._3.get < out(4L)._3.get,
      s"repeated transitions must be less perplexing: ${out(1L)} ${out(4L)}")
    assert(out(1L) == out(2L) && out(2L) == out(3L),
      "identical docs score identically (decimal-exact sums)")
    // ppl = exp(-logprob/n) ≥ 1 for any probability model
    Seq(1L, 4L).foreach(id => assert(out(id)._3.get >= 1.0))
    // <2 tokens: no bigrams, logprob 0, ppl null (undefined, not 1)
    assert(out(5L) == ((0L, 0.0, None)))
  }

  test("knBigramPerplexity: hand-computed micro model; KN orders docs " +
      "like Laplace on predictability") {
    import graft.operators.LanguageModel
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // micro corpus: model {(a,b):1, (a,c):1}; prefix a: c1=2, N1+(a·)=2;
    // continuation N1+(·b)=N1+(·c)=1; N1+(··)=2
    //   p(b|a) = (1−0.75)/2 + (0.75·2/2)·(1/2) = 0.125 + 0.375 = 0.5
    // so each doc's logprob = ln(0.5) quantized at 1e-6 = −0.693147
    val micro = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val mbg = micro.select($"doc_id".as("doc"),
        explode(transform(sequence(lit(1),
            size(split($"text", " ")) - 1),
          i => struct(element_at(split($"text", " "), i).as("w1"),
            element_at(split($"text", " "), i + 1).as("w2")))).as("bg"))
      .select($"doc", $"bg.w1", $"bg.w2")
      .groupBy($"doc", $"w1", $"w2").agg(count(lit(1)).as("n_occ"))
    val mout = LanguageModel.knBigramPerplexity(micro, "doc_id", "text",
        mbg).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logprob"))
      .toMap
    assert(mout(1L) == -0.693147 && mout(2L) == -0.693147,
      s"hand-computed KN logprob mismatch: $mout")
    // ordering + degenerate-doc contracts on the Laplace test's corpus
    val common = (1 to 10).map(_ => "to be or not").mkString(" ")
    val docs = Seq(
      (1L, common), (2L, common), (3L, common),
      (4L, "one two three four five six seven eight"),
      (5L, "solo")).toDF("doc_id", "text")
    val dbg = docs.select($"doc_id".as("doc"),
        explode(when(size(split($"text", " ")) >= 2,
          transform(sequence(lit(1), size(split($"text", " ")) - 1),
            i => struct(element_at(split($"text", " "), i).as("w1"),
              element_at(split($"text", " "), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("bg"))
      .select($"doc", $"bg.w1", $"bg.w2")
      .groupBy($"doc", $"w1", $"w2").agg(count(lit(1)).as("n_occ"))
    val out = LanguageModel.knBigramPerplexity(docs, "doc_id", "text", dbg)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("logprob"),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(out.size == 5)
    assert(out(1L)._3.get < out(4L)._3.get,
      s"repeated transitions must be less perplexing: ${out(1L)} ${out(4L)}")
    assert(out(1L) == out(2L) && out(2L) == out(3L),
      "identical docs score identically (decimal-exact sums)")
    // KN probabilities are ≤ 1, so ppl = exp(−logprob/n) ≥ 1
    Seq(1L, 4L).foreach(id => assert(out(id)._3.get >= 1.0))
    assert(out(5L) == ((0L, 0.0, None)))
  }

  test("tx15: entropy bounded by ln(n_distinct), zero iff one distinct bigram") {
    val rows = SparkEntry.queries("tx15_char_entropy")(spark, dir).collect()
    assert(rows.nonEmpty)
    var withEntropy = 0
    rows.foreach { r =>
      val nBg = r.getAs[Long]("n_bigrams")
      val nDi = r.getAs[Long]("n_distinct")
      if (nBg == 0L) {
        assert(nDi == 0L && r.isNullAt(r.fieldIndex("entropy")),
          s"doc ${r.get(0)}: zero bigrams must yield NULL entropy")
      } else {
        withEntropy += 1
        val h = r.getAs[Double]("entropy")
        // 0 ≤ H ≤ ln(n_distinct) up to the fold's quantization: each
        // c·ln c term is quantized at 1e-6 (the ExactNum DECIMAL(28,6)
        // contract), so H can stray by ≤ 1e-6·n_distinct/n_bigrams —
        // e.g. a single-bigram doc can score ~-1e-7, not exactly 0. The
        // smallest true nonzero H is ~(ln n + 1)/n ≫ eps, so the
        // zero-iff-one-distinct check stays sound at eps tolerance.
        val eps = 1e-6 * nDi.toDouble / nBg.toDouble + 1e-12
        assert(h >= -eps && h <= math.log(nDi.toDouble) + eps,
          s"doc ${r.get(0)}: H=$h outside [0, ln($nDi)] ± $eps")
        assert((nDi == 1L) == (math.abs(h) <= eps),
          s"doc ${r.get(0)}: H=0 must coincide with a single distinct bigram")
      }
    }
    assert(withEntropy > 0, "fixture must exercise the entropy branch")
  }

  test("tx16: novelty bounds; the earliest doc owns all its shingles") {
    val rows = SparkEntry.queries("tx16_ngram_novelty")(spark, dir).collect()
    assert(rows.nonEmpty)
    val withSh = rows.filter(_.getAs[Long]("n_shingles") > 0L)
    assert(withSh.nonEmpty)
    withSh.foreach { r =>
      val n = r.getAs[Long]("n_shingles"); val v = r.getAs[Long]("n_novel")
      assert(v >= 0L && v <= n, s"doc ${r.get(0)}: $v of $n novel")
      assert(r.getAs[Double]("novelty") === v.toDouble / n.toDouble)
    }
    // first_doc = min over owners, so the smallest doc_id with shingles
    // is first owner of every shingle it has
    val earliest = withSh.minBy(_.getAs[Long]("doc_id"))
    assert(earliest.getAs[Double]("novelty") === 1.0)
    // docs without shingles: zero counts, NULL novelty
    rows.filter(_.getAs[Long]("n_shingles") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_novel") == 0L &&
        r.isNullAt(r.fieldIndex("novelty")))
    }
  }

  test("pl24 weighted sampling: selection is weight-biased and deterministic") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("pl24_weighted_sample")(spark, dir)
      .collect()
    assert(out.length == 100)
    // exponential-race keys are strictly ascending in rank
    val byRank = out.sortBy(_.getAs[Long]("rank"))
    assert(byRank.map(_.getAs[Double]("k")).sliding(2)
      .forall(p => p(0) <= p(1)))
    // weight-proportional inclusion: the sample's mean weight must
    // exceed the corpus mean (heavier docs race faster); the fixture's
    // length spread makes this a >10% gap, asserted at >2%
    val sampleMean = out.map(_.getAs[Double]("w")).sum / out.length
    val corpus = graft.core.Tables.load(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.avg(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")) + 1))
      .head().getDouble(0)
    assert(sampleMean > corpus * 1.02,
      s"sample mean $sampleMean not above corpus mean $corpus")
    // re-run is bit-identical (retry-safe sampler)
    val again = SparkEntry.queries("pl24_weighted_sample")(spark, dir)
      .collect().map(_.toString).toSet
    assert(again == out.map(_.toString).toSet)
  }

  test("pl31: every period-1 page out-prioritizes every period-4 page, " +
      "and period means order 1 > 2 > 3 > 4 (VERDICT r14 #5)") {
    // PLANS_r15 §pl31 probe: the λ̂ bands are disjoint between the
    // fastest and slowest classes at both probed sfs (min period-1
    // 2.518 > max period-4 0.268), so the pin is page-wise, not just
    // on means — the property the crawl scheduler actually relies on.
    val rows = SparkEntry.queries("pl31_recrawl_schedule")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val byPeriod = rows.groupBy(_.getAs[Long]("period"))
    assert(byPeriod.keySet == Set(1L, 2L, 3L, 4L),
      s"missing period strata: ${byPeriod.keySet}")
    def lams(p: Long) = byPeriod(p).map(_.getAs[Double]("lambda_hat"))
    assert(lams(1L).min > lams(4L).max,
      s"period-1 band overlaps period-4: min1=${lams(1L).min} " +
        s"max4=${lams(4L).max}")
    val means = (1L to 4L).map(p => lams(p).sum / lams(p).size)
    assert(means.sliding(2).forall(w => w(0) > w(1)),
      s"period mean λ̂ not strictly decreasing: $means")
    // next_interval is the inverse schedule: fast pages recrawl sooner
    rows.foreach { r =>
      val l = r.getAs[Double]("lambda_hat")
      val i = r.getAs[Double]("next_interval")
      assert(l > 0.0 && i > 0.0 && math.abs(i * l - 1.0) < 1e-3,
        s"next_interval is not 1/λ̂: λ̂=$l interval=$i")
    }
  }
}
