package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction with block-level boilerplate removal — the
  * first operator every crawl-derived corpus runs (jusText / trafilatura
  * lineage: tag strip, block segmentation, link-density and text-length
  * keep rules). Re-expressed relationally: one narrow zero-shuffle
  * projection per document — blocks live in an array column and every
  * per-block decision is an array HOF, so the pass pipelines inside the
  * scan at any corpus scale (no explode/groupBy round trip; HtmlSpec
  * pins the no-Exchange plan).
  *
  * Keep rule (integer arithmetic only, so the decision is engine-exact):
  * a block survives iff its tag-stripped text has ≥ [[MinBlockChars]]
  * chars AND link_chars · 3 ≤ text_chars (link density ≤ ⅓), where
  * link_chars = stripped length minus the length with whole `<a>`
  * elements removed first. Navigation bars (all links), ad blocks
  * (link-dominated), footers and stub blocks fall out; content blocks
  * survive.
  *
  * Every regex is shared VERBATIM with the DuckDB twin ([[extractSql]])
  * and stays in the RE2-safe subset (no backreferences/lookaround; `.`
  * never needs to cross a newline because [[renderHtml]] emits none and
  * real pipelines normalize first).
  *
  * [[renderHtml]] is the fixture side of the mm2 render→decode
  * discipline: deterministic synthetic pages from `documents` (title,
  * nav, main content, per-doc-varying related/stub/ad blocks, footer),
  * so the extraction oracle is pure string arithmetic.
  */
object HtmlExtract {

  val MinBlockChars = 25

  /** Block elements: open tag (attributes allowed), non-greedy body —
    * rendered blocks never nest block elements, links stay inline. */
  val BlockPattern = "<(?:nav|div|footer)[^>]*>(.*?)</(?:nav|div|footer)>"
  /** Any tag (the strip pass). */
  val TagPattern = "<[^>]*>"
  /** A whole anchor ELEMENT (tags + link text) — removed before the
    * strip pass to measure link-text mass. */
  val AnchorPattern = "<a [^>]*>[^<]*</a>"
  val TitlePattern = "<title>([^<]*)</title>"

  /** Minimal entity escaping for text interpolated into markup (order
    * matters: `&` first). */
  private def esc(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  private def escSql(e: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($e, " +
      s"'&', '&amp;', 'g'), '<', '&lt;', 'g'), '>', '&gt;', 'g')"

  /** Deterministic page render: nav (pure links), the document text as
    * the main block, a related-reading block (doc_id ≡ 0 mod 3, mixed
    * text + one link), a short stub block (≡ 0 mod 5), an ad block
    * (≡ 0 mod 2, link-dominated), and a link-heavy footer. */
  def renderHtml(idCol: Column, textCol: Column): Column = {
    val id = idCol.cast("string")
    concat(
      lit("<html><head><title>Doc "), id, lit("</title></head><body>"),
      lit("<nav><a href=\"/\">Home</a><a href=\"/tags\">Tags</a>" +
        "<a href=\"/archive\">Archive</a></nav>"),
      lit("<div class=\"main\">"), esc(textCol), lit("</div>"),
      when(idCol % 3 === 0, concat(
        lit("<div class=\"c2\">Related reading and further notes on topic "),
        (idCol % 7).cast("string"),
        lit(" <a href=\"/t\">read more</a></div>"))).otherwise(lit("")),
      when(idCol % 5 === 0,
        lit("<div class=\"stub\">Tags: alpha beta</div>"))
        .otherwise(lit("")),
      when(idCol % 2 === 0,
        lit("<div class=\"ads\"><a href=\"/buy\">Buy now</a>" +
          "<a href=\"/win\">Win a prize today</a> !!</div>"))
        .otherwise(lit("")),
      lit("<footer>(c) 2024 <a href=\"/privacy\">Privacy policy</a>" +
        "<a href=\"/terms\">Terms of use</a></footer>"),
      lit("</body></html>"))
  }

  /** The DuckDB twin of [[renderHtml]] (same literals, same escaping). */
  def renderHtmlSql(idExpr: String, textExpr: String): String =
    s"'<html><head><title>Doc ' || CAST($idExpr AS VARCHAR) || " +
      s"'</title></head><body>' || " +
      "'<nav><a href=\"/\">Home</a><a href=\"/tags\">Tags</a>" +
      "<a href=\"/archive\">Archive</a></nav>' || " +
      s"'<div class=\"main\">' || ${escSql(textExpr)} || '</div>' || " +
      s"CASE WHEN $idExpr % 3 = 0 THEN " +
      "'<div class=\"c2\">Related reading and further notes on topic ' " +
      s"|| CAST($idExpr % 7 AS VARCHAR) || " +
      "' <a href=\"/t\">read more</a></div>' ELSE '' END || " +
      s"CASE WHEN $idExpr % 5 = 0 THEN " +
      "'<div class=\"stub\">Tags: alpha beta</div>' ELSE '' END || " +
      s"CASE WHEN $idExpr % 2 = 0 THEN " +
      "'<div class=\"ads\"><a href=\"/buy\">Buy now</a>" +
      "<a href=\"/win\">Win a prize today</a> !!</div>' ELSE '' END || " +
      "'<footer>(c) 2024 <a href=\"/privacy\">Privacy policy</a>" +
      "<a href=\"/terms\">Terms of use</a></footer>' || '</body></html>'"

  /** Extract title + boilerplate-filtered text from an HTML column.
    * Output per row: (idCol, carry…, title, n_blocks, n_kept,
    * extracted_text, content_chars, boiler_chars) — one narrow
    * projection, no shuffle. `carry` names input columns passed through
    * unchanged (optimization r15: pl25 carries canonical_url through the
    * extraction instead of re-joining the URL-dedup subtree afterwards —
    * that join recomputed the whole scan+agg+window chain a second
    * time). */
  def extract(df: DataFrame, idCol: String, htmlCol: String,
              carry: Seq[String] = Nil): DataFrame = {
    val h = col(htmlCol)
    val sumLen = (arr: Column) =>
      aggregate(transform(arr, x => length(x)), lit(0), (a, x) => a + x)
        .cast("long")
    df.withColumn("_blocks",
        regexp_extract_all(h, lit(BlockPattern), lit(1)))
      .withColumn("_bt",
        transform(col("_blocks"), b =>
          regexp_replace(b, lit(TagPattern), lit(""))))
      .withColumn("_bnl",
        transform(col("_blocks"), b =>
          regexp_replace(regexp_replace(b, lit(AnchorPattern), lit("")),
            lit(TagPattern), lit(""))))
      .withColumn("_kept",
        filter(
          zip_with(col("_bt"), col("_bnl"), (t, nl) =>
            when(length(t) >= MinBlockChars &&
              (length(t) - length(nl)) * 3 <= length(t), t)),
          x => x.isNotNull))
      .select((col(idCol) +: carry.map(col)) ++ Seq(
        regexp_extract(h, TitlePattern, 1).as("title"),
        size(col("_blocks")).cast("long").as("n_blocks"),
        size(col("_kept")).cast("long").as("n_kept"),
        array_join(transform(col("_kept"), t => trim(t)), " ")
          .as("extracted_text"),
        sumLen(col("_kept")).as("content_chars"),
        (sumLen(col("_bt")) - sumLen(col("_kept"))).as("boiler_chars")): _*)
  }

  /** The DuckDB twin of [[extract]] over a rendered-html relation
    * `(idExpr AS id, html)` — same regexes, same integer keep rule,
    * same fold order. */
  def extractSql(idExpr: String, fromClause: String): String = {
    val sumLen = (arr: String) =>
      s"CAST(list_reduce(list_prepend(0, list_transform($arr, " +
        s"x -> length(x))), (a, x) -> a + x) AS BIGINT)"
    s"""WITH pages AS (
       |  SELECT $idExpr, html,
       |    regexp_extract_all(html, '$BlockPattern', 1) AS blocks
       |  FROM $fromClause
       |), stripped AS (
       |  SELECT *,
       |    list_transform(blocks, b ->
       |      regexp_replace(b, '$TagPattern', '', 'g')) AS bt,
       |    list_transform(blocks, b ->
       |      regexp_replace(regexp_replace(b, '$AnchorPattern', '', 'g'),
       |        '$TagPattern', '', 'g')) AS bnl
       |  FROM pages
       |), kept AS (
       |  SELECT *,
       |    list_filter(
       |      list_transform(generate_series(1, len(bt)), i ->
       |        CASE WHEN length(bt[i]) >= $MinBlockChars
       |          AND (length(bt[i]) - length(bnl[i])) * 3 <= length(bt[i])
       |        THEN bt[i] END),
       |      x -> x IS NOT NULL) AS kt
       |  FROM stripped
       |)
       |SELECT $idExpr,
       |  regexp_extract(html, '$TitlePattern', 1) AS title,
       |  CAST(len(blocks) AS BIGINT) AS n_blocks,
       |  CAST(len(kt) AS BIGINT) AS n_kept,
       |  array_to_string(list_transform(kt, t -> trim(t)), ' ')
       |    AS extracted_text,
       |  ${sumLen("kt")} AS content_chars,
       |  ${sumLen("bt")} - ${sumLen("kt")} AS boiler_chars
       |FROM kept""".stripMargin
  }
}
