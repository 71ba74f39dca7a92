package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality lint over every SparkEntry query: the physical plan must
  * not contain an accidental cartesian product or broadcast nested-loop
  * join — at 100 TB those are the difference between a job and an outage.
  * Brute-force similarity scoring is exempt by design: its cross join IS
  * the operator (bounded query side, broadcast), and the scale path for
  * those semantics is the LSH/IVF variants.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains a non-equi/cross join. */
  private val crossJoinByDesign = Set(
    "sim1_cosine_topk",     // brute-force baseline: corpus × broadcast(queries)
    "sim7_topk_agg",        // same scoring as sim1; the agg replaces the SORT, not the scan
    "sim2_cosine_neardup",  // brute-force pair scoring (verification baseline)
    "sim25_retrieval_ndcg", // dense leg + semantic-relevance channel are
                            // sim14's corpus × broadcast(queries) scans;
                            // the gate's scale story is sim22's index
                            // serve path, as for sim14
    "dd8_semantic_contamination", // corpus × broadcast(benchmark): the
                            // benchmark side is small by construction
                            // (an eval suite), so the product is a
                            // linear corpus scan — right plan at 100 TB
    "q18_above_avg_orders", // scalar-subquery comparison: broadcast 1-row side
    "q37_scalar_subquery",  // same shape (global avg broadcast to every row)
    "sim16_kmeans_inertia", // same assignment engine as sim9 (broadcast
                            // k-row centroid arrays)
    "sim9_kmeans_ivf",      // Lloyd's assignment: every vector scores vs the
                            // broadcast k-row centroid table — that product
                            // IS the k-means computation, k rows not N
    "dd5_semdedup",         // same assignment engine as sim9
    "sim11_ivfpq",          // same: coarse-cell assignment vs the
                            // broadcast coarseK-row centroid table
    "sim22_ivfadc_scaled",  // same probe assignment, √N-row broadcast
                            // centroid table (still KB-scale: k·dims
                            // doubles grows as √corpus)
    "sim18_ivfpq_index",    // same probe assignment against the
                            // broadcast centroid arrays read from the
                            // durable index (corpus side is index scans
                            // only — pinned in VectorIndexSpec)
    "sim26_indexed_retrieval_ndcg", // the sim22 probe assignment
                            // (queries × broadcast √N-row centroid
                            // table) inside the index-served dense leg;
                            // NO corpus-sized cross — that absence is
                            // this key's whole point vs sim25
    "sim20_ann_recall",     // sim18's probe product + the sim1-style
                            // bounded-query brute truth (broadcast
                            // 40-row query set; the truth IS a linear
                            // scan by design)
    "sim23_clustered_recall", // sim20's evaluation on the derived
                            // clustered corpus: same probe product +
                            // bounded brute truth
    "sim24_adc_refine",     // the same index probe product; the refine
                            // itself is an equi-join vector fetch
    "sim21_matryoshka",     // the same sim1/sim20 bounded brute shape:
                            // corpus × broadcast(40 queries), scored
                            // once for all four truncation dots
    "pl11_dsir_select",     // broadcast 1-row model totals (nt, nr)
    "tx13_bm25_topk",       // broadcast 1-row corpus stats (N, avgdl)
    "tx22_keywords",        // broadcast 1-row doc count into the idf
    "tx25_url_canon",       // broadcast 1-row corpus count deriving the
                            // synthetic page universe (render side only)
    "pl25_crawl_pipeline",  // same 1-row page-universe broadcast at the
                            // chain's render stage
    "tx29_dedup_funnel",    // same 1-row page-universe broadcast + the
                            // four 1-row stage aggregates unioned
    "tx14_lm_perplexity",   // broadcast 1-row vocab size
    "tx31_kn_perplexity",   // broadcast 1-row N1+(··) bigram-type count
    "gr2_triangles",        // final combine of three 1-row stat frames
    "gr6_triangles_sampled", // same triangleStats 1-row combines over
                            // the hash-sampled edge set
    "sim12_mmr_rerank",     // candidate gen = sim1's brute product
                            // (bounded query side, broadcast)
    "pl14_zorder_stats",    // broadcast 1-row global min/max for the
                            // range normalization (the zorder stats pass)
    "pl15_temperature_mix", // broadcast 1-row corpus totals (w_tot, budget)
    "q62_kmv_set_ops",      // final combine of 1-row sketch-stat frames
    "pl19_epoch_shuffle",   // corpus × broadcast 2-row epoch frame — the
                            // explicit epoch replication
    "q75_assoc_rules",      // broadcast 1-row basket count into the
                            // support/lift ratios
    "q73_benford",          // 9-digit grid completion: broadcast of a
                            // constant 9-row frame against per-group
                            // totals — grid-sized at any corpus
    "q71_quantile_normalize", // two constant-size products: the 1-row
                            // n_tot cross and the 101×nb bucket locate
                            // (driver-built ends table); the histogram
                            // probe itself is an equi-join on the
                            // bucket id and the corpus equi-joins the
                            // broadcast 101-row grid
    "sim14_hybrid_rrf",     // dense candidate list = sim1's brute product
                            // (oracle-checkable baseline; the scale path
                            // swaps in sim11's IVF-PQ ranking — RRF
                            // fusion itself is grid-sized per query)
    "q84_skew_profile",     // broadcast 1-row fact count into the share/
                            // salt arithmetic (top-5-per-column frame)
    "q83_rfm",              // broadcast of two 1-row frames (anchor +
                            // the nine quartile boundaries) onto the
                            // customer aggregate — the scale-honest
                            // alternative to a global ntile sort
    "tx32_domain_mix",      // two broadcast 1-row frames: the derived
                            // npages render parameter (tx25's discipline)
                            // and the corpus total for the share ratio
    "pl28_train_apply",     // broadcast 1-row threshold frame (the
                            // F1-argmax operating point) onto the
                            // scored corpus — the calibrated-score join
                            // itself is an equi-join on the score key
    "pl29_recrawl_delta",   // tx25's 1-row page-universe broadcast at
                            // the render stage + the 4-row period-class
                            // size grid (both constant at any corpus)
    "pl31_recrawl_schedule", // the same RecrawlBase fetch derivation as
                            // pl29 — only the 1-row npages broadcast
    "tx36_bm25_incremental", // tx13's 1-row corpus-stats broadcast
                            // (n_docs, avgdl), served from the
                            // maintained index's stats table
    "pl30_quality_mix_pack", // pl15's 1-row totals broadcast (w_tot,
                            // budget) onto the source-weight frame
    "pl18_source_drift")    // sources×buckets grid completion: both sides
                            // are aggregate frames (distinct sources /
                            // distinct buckets), so the product is
                            // grid-sized at any corpus scale — plus the
                            // 1-row total broadcast

  test("no accidental cartesian / broadcast-nested-loop joins in any plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val bad = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (bad && !crossJoinByDesign(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected cross joins in: ${offenders.mkString(", ")}")
  }

  test("filter pushdown reaches the parquet scan on filtered scans") {
    Seq("q2_filter_project", "q1_pricing_summary", "q36_exists_subquery")
      .foreach { name =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        // check every scan's PushedFilters, not just the last occurrence:
        // a greedy single-match regex would pass when only an unfiltered
        // dimension side carries pushed filters. The closing bracket is
        // optional — plan.toString TRUNCATES long filter lists mid-line.
        val pushed = "PushedFilters: \\[([^\\]\\n]*)".r
          .findAllMatchIn(plan).map(_.group(1).trim).toSeq
        assert(pushed.nonEmpty && pushed.exists(_.nonEmpty),
          s"$name: no non-empty PushedFilters at any scan")
      }
  }

  test("bench short keys are collision-free across all query names") {
    // a duplicate short key emits a duplicate JSON key on the bench line
    // and one query's timing silently vanishes (last-wins parsing) —
    // catch at test time, not at the driver's bench run
    val names = SparkEntry.queries.keys.toSeq
    val dupes = names.groupBy(Bench.shortKey).filter(_._2.size > 1)
    assert(dupes.isEmpty, s"short-key collisions: $dupes")
  }

  test("q26 salted join exercises the shuffled-hash path (not broadcast)") {
    // under auto-broadcast the salt never touches a shuffle and the query
    // pays saltFactor× replication for nothing — the SHUFFLE_HASH hint in
    // SkewJoin must survive plan changes
    val plan = SparkEntry.queries("q26_salted_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "q26: salted join fell off the shuffled-hash path")
  }

  test("q25 exact percentiles stay sort-based (no value-buffering aggregate)") {
    // percentile() is an ObjectHashAggregate buffering every group value
    // per reducer — the memory-unbounded shape q25 was rewritten to avoid
    val plan = SparkEntry.queries("q25_percentiles")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      "q25: value-buffering aggregate reappeared")
    assert(plan.contains("Window"), "q25: expected the sort-based window plan")
  }

  test("exact-quantile keys run no data-sized window: every Window is " +
      "partitioned, and histogram cumulatives carry the bucket key") {
    // q83 r11: quartile bounds were ONE global row_number over the whole
    // customer aggregate. r12 (VERDICT r11 #1): q71's global histogram
    // cumulative, q66/q81/pl17's 3-value-key cumulatives over distinct
    // prices (~60% of rows per task), and q71's 5-task per-group row
    // rank all moved onto BucketedCdf — every surviving Window must be
    // partitioned, and by MORE than the bare low-cardinality group key
    // (group + bucket, or group + value), so no task sees a data-sized
    // frame.
    Seq("q83_rfm", "q71_quantile_normalize", "q66_percentile_interp",
        "q81_mad_robust", "pl17_winsorize").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      // r14 (VERDICT r13 #3): BucketedCdf's offset fold runs IN-PLAN —
      // a window ORDERED by the bucket id over the ≤ groups·nb
      // bucket-count aggregate, constant-size by construction. Ordering
      // by `__b*` identifies it structurally (the data-sized cum window
      // orders by the VALUE column; an accidental data-sized window
      // could not order by the helper-internal bucket id). In the
      // global-CDF case its synthetic constant partition key folds
      // away, so it is also exempt from the un-partitioned check.
      def bucketOrdered(
          w: org.apache.spark.sql.catalyst.plans.logical.Window) =
        w.orderSpec.nonEmpty && w.orderSpec.forall(
          _.child.references.forall(_.name.startsWith("__b")))
      val global = windows.filter(w =>
        w.partitionSpec.isEmpty && !bucketOrdered(w))
      assert(global.isEmpty,
        s"$name: un-partitioned Window nodes in the plan:\n${global.mkString}")
      // the reworked keys' windows partition on ≥2 expressions (group +
      // bucket, or group + value) — EXCEPT the global-CDF case, where
      // the synthetic constant group folds away and the lone bucket key
      // `__b` is exactly the partitioning we want. A single bare GROUP
      // key would mean the bucket key fell off.
      if (name != "q83_rfm") windows.foreach { w =>
        val loneBucket = w.partitionSpec.size == 1 &&
          w.partitionSpec.head.references.forall(_.name.startsWith("__b"))
        assert(w.partitionSpec.size >= 2 || loneBucket || bucketOrdered(w),
          s"$name: Window partitioned on a single low-cardinality key " +
            s"(bucket key lost): ${w.partitionSpec}")
      }
    }
  }

  /** Root paths of every file scan in the analyzed plan. */
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  test("dd13's timed plan reads only FixtureCache artifacts " +
      "(VERDICT r13 #1)") {
    // the r13 key re-derived the twin corpus (tokenize + transform) and
    // re-ran the regex shingle pass over the DOUBLED corpus per run —
    // the slowest, most variance-prone sf0.1 key. r14 materializes both
    // as durable per-generation artifacts; the timed region must scan
    // nothing but the cache (no documents.parquet read — the ground
    // truth denominators come from the artifact's twin slice).
    val df = SparkEntry.queries("dd13_lsh_recall")(spark, dir)
    val paths = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(paths.nonEmpty, "dd13: no file scans found in the analyzed plan")
    val root = graft.core.FixtureCache.cacheRoot.stripPrefix("file:")
    paths.foreach { p =>
      assert(p.replaceFirst("^file:/*", "/").startsWith(root),
        s"dd13 scans a non-artifact path: $p (artifact root $root)")
    }
  }

  test("tx26's timed plan reads only FixtureCache artifacts " +
      "(VERDICT r14 #3)") {
    // r14 rebuilt the unigram/bigram count tables AND the floored
    // candidate pair set per run (tokenize + shingle self-join — the
    // slowest sf0.1 key). r15 serves all three from durable artifacts
    // (termfreq, docbigrams, bleupairs-f20); the timed region must scan
    // nothing but the cache.
    val paths = scanPaths(SparkEntry.queries("tx26_bleu_overlap")(spark,
      dir))
    assert(paths.nonEmpty, "tx26: no file scans found in the plan")
    val root = graft.core.FixtureCache.cacheRoot.stripPrefix("file:")
    paths.foreach { p =>
      assert(p.replaceFirst("^file:/*", "/").startsWith(root),
        s"tx26 scans a non-artifact path: $p (artifact root $root)")
    }
  }

  test("pl11's timed plan serves the DSIR features/models from " +
      "artifacts; the documents scan is 2-column (VERDICT r14 #4)") {
    val df = SparkEntry.queries("pl11_dsir_select")(spark, dir)
    val root = graft.core.FixtureCache.cacheRoot.stripPrefix("file:")
    val paths = scanPaths(df)
    val (artifact, fixture) = paths.partition(
      _.replaceFirst("^file:/*", "/").startsWith(root))
    // three artifact scans (docBuckets + both bucket models) and ONE
    // fixture scan: the (doc_id, source) base off documents
    assert(artifact.size >= 3,
      s"pl11: expected the three DSIR artifacts, scanned only $artifact")
    assert(fixture.forall(_.contains("documents")),
      s"pl11 scans a fixture table beyond documents: $fixture")
    // the base read must be COLUMN-PRUNED to (doc_id, source): a `text`
    // column in the read schema would mean a per-run tokenize survived
    // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
    // node whose children a plain collect doesn't traverse
    val docScans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString
          .contains("documents")) => f.requiredSchema.fieldNames.toSet
    }
    assert(docScans.nonEmpty, "pl11: documents scan not found")
    docScans.foreach(cols => assert(cols == Set("doc_id", "source"),
      s"pl11's documents scan reads $cols — expected (doc_id, source)"))
  }

  test("q71 grid read-off is bucket-bounded (no histogram-wide theta-join)") {
    // r12: each of the 101 grid ranks theta-joined the WHOLE value
    // histogram (cum >= r) — a ~50× expansion and the board's slowest
    // key. r13 (VERDICT r12 #2): the rank first locates its bucket
    // against the nb-row bucket-ends table (the one surviving — tiny —
    // nested-loop join), then probes only that bucket through an
    // equi-join on the bucket id.
    val plan = SparkEntry.queries("q71_quantile_normalize")(spark, dir)
      .queryExecution.executedPlan.toString
    val bnlj = "BroadcastNestedLoopJoin".r.findAllMatchIn(plan).size
    assert(bnlj <= 2,
      s"q71: $bnlj nested-loop joins (expected ≤2: the 1-row n_tot " +
        "cross and the 101×nb bucket locate — both constant-size)")
    // the histogram-side probe must be the HASH join on the bucket id
    // with the rank residual — the shape that touches ~1/nb of the
    // histogram per grid point
    assert("BroadcastHashJoin \\[hb#\\d+\\], \\[hb#\\d+\\], Inner, BuildRight, \\(cum#\\d+L >= r#\\d+L\\)".r
      .findFirstIn(plan).isDefined,
      "q71: bucket probe fell off the hash-join-with-residual path")
  }

  test("packing windows are sharded (VERDICT r13 #5)") {
    // pl7/pl8/pl30's greedy-fill cumsum used to partition on the bare
    // group key (lang / source), putting the largest group through ONE
    // task — pl30's geometric bins make that ~half the corpus by
    // construction. r14 shards the stream before the window; every
    // token-cumsum window must partition on (group, shard). The
    // row_number keep-first window in pl8 partitions on the md5 content
    // hash (corpus-cardinality — parallel by nature) and is exempt:
    // the pin keys on SUM window expressions, which only the packing
    // cumsums carry.
    Seq("pl7_pack_sequences", "pl8_ingest_pipeline",
        "pl30_quality_mix_pack").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan
      val cumWindows = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.windowExpressions.exists(_.collectFirst {
            case s: org.apache.spark.sql.catalyst.expressions.aggregate
              .Sum => s
          }.isDefined) => w
      }
      assert(cumWindows.nonEmpty,
        s"$name: no token-cumsum window found — pin out of date")
      cumWindows.foreach { w =>
        assert(w.partitionSpec.size >= 2,
          s"$name: packing window lost its shard key: ${w.partitionSpec}")
      }
    }
  }

  test("BucketedCdf construction triggers no Spark jobs (VERDICT r13 #3)") {
    // the r13 helper collected the boundary probe and the offset fold
    // at DataFrame-construction time — four sequential driver barriers
    // per q71 build, ~2.2 s of its sf0.1 median, re-paid by every
    // construction (Bench's best-of-2 builds twice). The fold is now
    // in-plan; building the frame must schedule NOTHING.
    val names = Seq("q71_quantile_normalize", "q81_mad_robust",
      "q66_percentile_interp", "pl17_winsorize")
    // warm table/schema caches outside the counted window
    names.foreach(n => SparkEntry.queries(n)(spark, dir))
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      names.foreach(n => SparkEntry.queries(n)(spark, dir))
      Thread.sleep(800) // listener bus is async — give events time to land
      assert(counter.get() == 0,
        s"constructing ${names.size} BucketedCdf queries scheduled " +
          s"${counter.get()} Spark job(s); construction must be lazy")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("BucketedCdf residue is released once its frames are dropped " +
      "(VERDICT r12 #4)") {
    // the r12 helper persisted its input histogram for the session
    // lifetime, relying on Bench/Verify's per-query clearCache; any
    // other consumer accumulated one MEMORY_AND_DISK frame per call.
    // r13: each persist is registered under weak references to the
    // frames the helper handed out, and ManagedPersist.sweep unpersists
    // entries whose frames are unreachable (it also runs on every
    // withCum entry, so a long-lived session's residue is bounded by
    // its LIVE frames, never its call count). GC is advisory — retry a
    // few cycles before judging.
    spark.catalog.clearCache()
    Seq("q71_quantile_normalize", "q81_mad_robust", "pl28_train_apply")
      .foreach { name =>
        SparkEntry.queries(name)(spark, dir).collect()
        ()
      }
    var tries = 0
    while (!spark.sharedState.cacheManager.isEmpty && tries < 20) {
      System.gc()
      Thread.sleep(100)
      graft.core.ManagedPersist.sweep()
      tries += 1
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "BucketedCdf persists not released after their frames were dropped")
  }

  test("dimension joins broadcast (no fact-side shuffle for the join)") {
    Seq("q3_segment_revenue", "q4_supplier_by_region", "q13_distinct_agg")
      .foreach { name =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"),
          s"$name: expected a broadcast hash join")
      }
  }
}
