package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UrlCanon

/** URL canonicalization rules one by one, the four-render-variant
  * collapse, and keep-first dedup semantics. */
class UrlCanonSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(UrlCanon.canonicalize(col("url")))
      .collect().map(_.getString(0)).toSeq

  test("scheme/host case-fold; path and query case preserved") {
    assert(canon("HTTP://WWW.Example.COM/Path?Q=V") ==
      Seq("http://www.example.com/Path?Q=V"))
  }

  test("default port stripped only for the matching scheme") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:443/x", "https://a.com:80/x",
      "http://a.com:8080/x") ==
      Seq("http://a.com/x", "https://a.com/x",
        "http://a.com:443/x", "https://a.com:80/x",
        "http://a.com:8080/x"))
  }

  test("fragment stripped; tracking params removed; survivors sorted") {
    assert(canon(
      "http://a.com/x?utm_source=f&b=2&a=1&gclid=z#frag",
      "http://a.com/x?a=1&b=2",
      "http://a.com/x?fbclid=q&ref=r") ==
      Seq("http://a.com/x?a=1&b=2", "http://a.com/x?a=1&b=2",
        "http://a.com/x"))
  }

  test("path normalization: slash runs collapse, trailing slash strips, empty path becomes /") {
    assert(canon(
      "http://a.com//x///y/", "http://a.com/x/y",
      "http://a.com", "http://a.com/", "http://a.com///") ==
      Seq("http://a.com/x/y", "http://a.com/x/y",
        "http://a.com/", "http://a.com/", "http://a.com/"))
  }

    test("render variants of one page share a canonical form") {
    // page identity is id mod 50; ids ≡ p (mod 50) reach two distinct
    // messiness variants (lcm(50,4) = 100): even pages {slash-run,
    // explicit-port}, odd pages {upper-case, tracking+fragment}
    val out = Seq(12L, 62L, 13L, 63L)
      .toDF("doc_id")
      .select(col("doc_id"), UrlCanon.renderUrl(col("doc_id")).as("url"))
      .withColumn("c", UrlCanon.canonicalize(col("url")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byPage = out.groupBy(t => t._1 % 50)
    byPage.foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.size == 1,
        s"variants must collapse: ${rows.toSeq}")
      assert(rows.map(_._2).distinct.size == rows.size,
        s"raw fetch URLs must differ across variants: ${rows.toSeq}")
    }
    assert(byPage.size == 2)
  }

  test("keep-first dedup: keeper is the min id, counts are group-sized") {
    val rows = UrlCanon.dedupByUrl(
        Seq(5L, 55L, 105L, 7L).toDF("doc_id")
          .select(col("doc_id"),
            UrlCanon.renderUrl(col("doc_id")).as("url")),
        "doc_id", "url")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("keeper_doc"), r.getAs[Boolean]("is_dup"),
        r.getAs[Long]("n_same_url"))).toSet
    assert(rows == Set((5L, 5L, false, 3L), (55L, 5L, true, 3L),
      (105L, 5L, true, 3L), (7L, 7L, false, 1L)))
  }

  test("registrable domain: eTLD+1 with multi-part suffixes and fallbacks") {
    val out = Seq(
        "http://www.example-3.com/x",      // www stripped by last-2 rule
        "https://cdn.media.example-3.com/y", // deep subdomain -> last 2
        "http://www.bbc.co.uk/news",       // multi-part suffix -> last 3
        "https://a.ac.jp/",                // multi-part, no subdomain
        "http://localhost/x",              // single label -> host itself
        "https://plain.org/p")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(UrlCanon.registrableDomain(
        UrlCanon.canonicalize(col("url"))))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("example-3.com", "example-3.com", "bbc.co.uk",
      "a.ac.jp", "localhost", "plain.org"))
  }
}
