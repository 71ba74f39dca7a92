package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the FIRST dedup any crawl
  * pipeline runs (before any content hash): the same page is fetched
  * under case variants, explicit default ports, tracking parameters,
  * fragments and sloppy paths, and corpus accounting is wrong until
  * those collapse.
  *
  * Canonicalization steps (all pure string/array ops — a narrow
  * zero-shuffle projection; [[dedupByUrl]] adds the ONE keyed window
  * that makes it a dedup):
  *  1. scheme + host case-fold;
  *  2. default-port strip (`:80` for http, `:443` for https — only for
  *     the matching scheme);
  *  3. fragment strip (never sent to the server);
  *  4. tracking-parameter removal (`utm_*`, `gclid`, `fbclid`, `ref`)
  *     with the surviving params SORTED (param order is
  *     transport-irrelevant) and rejoined;
  *  5. path normalization: slash-run collapse + trailing-slash strip
  *     (empty path → `/`).
  *
  * No regex replacement uses group references ($1 vs \\1 differs across
  * engines) — every pattern is shared verbatim with the DuckDB twins
  * and stays RE2-safe.
  *
  * At 100 TB this is the cheapest dedup family there is: the canonical
  * key is computed in the scan projection and the keep-first decision
  * is one hash-partitioned window — pairs with tx5's content hash for
  * the standard URL+content two-stage.
  */
object UrlCanon {

  val TrackingParamPattern = "^(utm_[^=]*|gclid|fbclid|ref)="

  /** Canonical form of a URL column (steps 1–5 above). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hp = lower(regexp_extract(url, "^[^:]+://([^/?#]*)", 1))
    val hostport = when(scheme === "http", regexp_replace(hp, ":80$", ""))
      .when(scheme === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
    val path0 = regexp_extract(url, "^[^:]+://[^/?#]*([^?#]*)", 1)
    val path1 = rtrim(regexp_replace(path0, "/{2,}", "/"), "/")
    val path = when(path1 === "", "/").otherwise(path1)
    val params = filter(split(regexp_extract(url, "[?]([^#]*)", 1), "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), hostport, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** The DuckDB twin of [[canonicalize]] (same patterns, same steps). */
  def canonicalizeSql(url: String): String = {
    val scheme = s"lower(regexp_extract($url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val hp = s"lower(regexp_extract($url, '^[^:]+://([^/?#]*)', 1))"
    val hostport = s"CASE WHEN $scheme = 'http' " +
      s"THEN regexp_replace($hp, ':80$$', '') " +
      s"WHEN $scheme = 'https' THEN regexp_replace($hp, ':443$$', '') " +
      s"ELSE $hp END"
    val path1 = s"rtrim(regexp_replace(" +
      s"regexp_extract($url, '^[^:]+://[^/?#]*([^?#]*)', 1), " +
      s"'/{2,}', '/', 'g'), '/')"
    val path = s"CASE WHEN $path1 = '' THEN '/' ELSE $path1 END"
    val query = s"array_to_string(list_sort(list_filter(" +
      s"str_split(regexp_extract($url, '[?]([^#]*)', 1), '&'), " +
      s"p -> p <> '' AND NOT regexp_matches(p, '$TrackingParamPattern')" +
      s")), '&')"
    s"$scheme || '://' || $hostport || $path || " +
      s"CASE WHEN $query = '' THEN '' ELSE '?' || $query END"
  }

  /** URL-level keep-first dedup: canonicalize, then ONE keyed window
    * over the canonical key — keeper = min id, every other fetch of the
    * same page is a duplicate. Output: (idCol, urlCol, canonical_url,
    * keeper_doc, is_dup, n_same_url). */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val w = Window.partitionBy(col("canonical_url"))
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .withColumn("keeper_doc", min(col(idCol)).over(w))
      .withColumn("is_dup", col(idCol) =!= col("keeper_doc"))
      .withColumn("n_same_url", count(lit(1)).over(w))
      .select(col(idCol), col(urlCol), col("canonical_url"),
        col("keeper_doc"), col("is_dup"), col("n_same_url"))
  }

  /** Multi-part public suffixes recognized by [[registrableDomain]] — a
    * deliberately SMALL subset of the public-suffix list (the full PSL
    * is a versioned external artifact; a pipeline that needs it loads
    * it as a broadcast lookup table — same plan shape, bigger
    * dictionary). Pattern shared verbatim with the DuckDB twin. */
  val MultiPartSuffixPattern = "\\.(co|com|net|org|ac|gov|edu)\\.[a-z]{2}$"

  /** Host of an already-canonicalized URL (lowercase by construction;
    * port never present for default-port schemes). */
  def host(canonicalUrl: Column): Column =
    regexp_extract(canonicalUrl, "^[^:]+://([^/?#:]*)", 1)

  def hostSql(canonicalUrl: String): String =
    s"regexp_extract($canonicalUrl, '^[^:]+://([^/?#:]*)', 1)"

  /** Registrable domain (eTLD+1): the accounting key every crawl
    * scheduler budgets by — `www.news.example-3.com` and
    * `cdn.example-3.com` are one crawl-policy unit `example-3.com`.
    * Heuristic: last two host labels, or last THREE when the host ends
    * in a recognized multi-part suffix ([[MultiPartSuffixPattern]] —
    * `bbc.co.uk`, not `co.uk`). Pure scan-projection string ops. */
  def registrableDomain(canonicalUrl: Column): Column = {
    val h = host(canonicalUrl)
    val two = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(h.rlike(MultiPartSuffixPattern),
        regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .otherwise(when(two === "", h).otherwise(two)) // single-label host
  }

  /** The DuckDB twin of [[registrableDomain]] (same patterns). */
  def registrableDomainSql(canonicalUrl: String): String = {
    val h = hostSql(canonicalUrl)
    val two = s"regexp_extract($h, '([^.]+\\.[^.]+)$$', 1)"
    s"CASE WHEN regexp_matches($h, '$MultiPartSuffixPattern') " +
      s"THEN regexp_extract($h, '([^.]+\\.[^.]+\\.[^.]+)$$', 1) " +
      s"WHEN $two = '' THEN $h ELSE $two END"
  }

  /** Deterministic synthetic fetch URLs from an id column — the tx24
    * render discipline: page identity is id mod `pages`, and id mod 4
    * picks the messiness variant (0: slash-run + trailing slash;
    * 1: upper-case scheme/host; 2: explicit default port; 3: tracking
    * params + fragment). All variants of one page canonicalize
    * identically, so the dedup groups have closed-form structure.
    *
    * `pages` should be DERIVED from the corpus count (the sim5
    * band-width discipline — tx25 uses greatest(50, n div 10)): a fixed
    * page universe makes dedup groups grow linearly with the corpus, so
    * the canonical-key window degenerates to a handful of giant
    * partitions (measured slope 4.9 at the 10× probe before the
    * derivation); a derived universe holds fetches-per-page ~constant
    * at every scale, which is also what a real crawl looks like. */
  def renderUrl(id: Column, pages: Column = lit(50L)): Column = {
    val p = id % pages
    val schemeBase = when(p % 2 === 0, "https").otherwise("http")
    val host = concat(lit("www.example-"), (p % 5).cast("string"),
      lit(".com"))
    val schemeHost = when(id % 4 === 1,
        upper(concat(schemeBase, lit("://"), host)))
      .otherwise(concat(schemeBase, lit("://"), host))
    val port = when(id % 4 === 2,
        when(p % 2 === 0, ":443").otherwise(":80")).otherwise(lit(""))
    val core = concat(lit("topic-"), (p % 7).cast("string"),
      lit("/page-"), p.cast("string"))
    val path = when(id % 4 === 0,
        concat(lit("/articles//"), core, lit("/")))
      .otherwise(concat(lit("/articles/"), core))
    val qs = when(id % 4 === 3,
        concat(lit("?utm_source=feed&lang=en&gclid=1x"),
          (id % 9).cast("string"), lit("#sec-"), (id % 3).cast("string")))
      .otherwise(lit("?lang=en"))
    concat(schemeHost, port, path, qs)
  }

  /** The DuckDB twin of [[renderUrl]]. */
  def renderUrlSql(id: String, pages: String = "50"): String = {
    val p = s"($id % $pages)"
    val schemeBase = s"CASE WHEN $p % 2 = 0 THEN 'https' ELSE 'http' END"
    val host = s"'www.example-' || CAST($p % 5 AS VARCHAR) || '.com'"
    val schemeHost = s"CASE WHEN $id % 4 = 1 " +
      s"THEN upper($schemeBase || '://' || $host) " +
      s"ELSE $schemeBase || '://' || $host END"
    val port = s"CASE WHEN $id % 4 = 2 THEN " +
      s"(CASE WHEN $p % 2 = 0 THEN ':443' ELSE ':80' END) ELSE '' END"
    val core = s"'topic-' || CAST($p % 7 AS VARCHAR) || '/page-' || " +
      s"CAST($p AS VARCHAR)"
    val path = s"CASE WHEN $id % 4 = 0 THEN '/articles//' || $core || '/' " +
      s"ELSE '/articles/' || $core END"
    val qs = s"CASE WHEN $id % 4 = 3 THEN " +
      s"'?utm_source=feed&lang=en&gclid=1x' || CAST($id % 9 AS VARCHAR) " +
      s"|| '#sec-' || CAST($id % 3 AS VARCHAR) ELSE '?lang=en' END"
    s"$schemeHost || $port || $path || $qs"
  }
}
