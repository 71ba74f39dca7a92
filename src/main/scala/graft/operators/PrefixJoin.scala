package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT all-pairs set-similarity join via prefix filtering (the
  * PPJoin/AllPairs family — Bayardo, Ma & Srikant, WWW 2007; Xiao et al.
  * ICDE 2008). The fourth pillar of the dedup surface next to LSH
  * banding (probabilistic, false negatives possible), sorted
  * neighborhood (windowed, front-divergent misses) and blocked shingle
  * join (recall-exact only above the block floor): prefix filtering
  * returns the EXACT Jaccard-threshold pair set with no verification
  * lottery, at a candidate cost that collapses onto rare set elements.
  *
  * Why it scales: under a global element order by ASCENDING document
  * frequency, a pair with J(A,B) ≥ t must share an element inside each
  * side's first |X| − ⌈t·|X|⌉ + 1 elements. Equi-joining only those
  * prefixes concentrates candidates on the RAREST elements of each
  * document — high-df elements (the quadratic blowup in a naive
  * inverted-index join) are provably skippable. A length filter
  * (t·|A| ≤ |B| ≤ |A|/t, kept in exact integer cross-multiplied form)
  * prunes the rest. Everything is hash-partitioned equi-joins + hash
  * aggregates — no all-pairs stage anywhere.
  *
  * The threshold is a RATIONAL tNum/tDen and every gate is evaluated in
  * exact integer arithmetic (⌈t·n⌉ = (tNum·n + tDen − 1) div tDen;
  * J ≥ t ⟺ (tNum + tDen)·common ≥ tNum·(n_a + n_b)), so the operator —
  * and its DuckDB twin — are bit-exact; the one double in the output
  * (the Jaccard value itself) is a single correctly-rounded division.
  */
object PrefixJoin {

  /** All pairs (a < b) with set Jaccard ≥ tNum/tDen over an element
    * table (one row per DISTINCT set member).
    *
    * @param elems  (idCol, elemCol) element rows, distinct per id
    * @param idCol  unique set id (orderable)
    * @param elemCol set element
    * @return (a, b, n_a, n_b, common, jaccard), exact
    */
  def jaccardJoinSets(elems: DataFrame, idCol: String, elemCol: String,
                      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"bad threshold $tNum/$tDen")
    val tok = elems.select(col(idCol).as("id"), col(elemCol).as("tk"))
    val sz = tok.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val dfreq = tok.groupBy(col("tk")).agg(count(lit(1)).as("df"))
    // global order (df ASC, tk ASC) ranked within each document; the
    // prefix keeps the first n − ⌈t·n⌉ + 1 rarest elements
    val pos = tok.join(dfreq, "tk").join(sz, "id")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("tk"))))
    val prefix = pos
      .filter(col("pos") <=
        col("n") - expr(s"($tNum * n + ${tDen - 1}) div $tDen") + 1)
      .select(col("id"), col("tk"), col("n"), col("pos"))
    // candidates: shared prefix element + exact-integer length filter +
    // PPJoin's POSITION filter — the elements after a match at (px, py)
    // bound the overlap by 1 + min(n_a − px, n_b − py); a pair's FIRST
    // shared element makes that bound tight, so requiring it to reach
    // the needed overlap α = ⌈t·(n_a+n_b)/(1+t)⌉ on at least one
    // generating match never drops a true pair
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.tk") === col("y.tk") && col("x.id") < col("y.id") &&
          col("y.n") * tDen >= col("x.n") * tNum &&
          col("x.n") * tDen >= col("y.n") * tNum &&
          (lit(1) + least(col("x.n") - col("x.pos"),
            col("y.n") - col("y.pos"))) * (tNum + tDen) >=
            expr(s"$tNum * (x.n + y.n)"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
      .distinct()
    // verification: exact intersection counts for the surviving pairs
    val common = cand
      .join(tok.select(col("id").as("a"), col("tk")), Seq("a"))
      .join(tok.select(col("id").as("b"), col("tk")), Seq("b", "tk"))
      .groupBy(col("a"), col("b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("common"))
    common
      .filter(col("common") * (tNum + tDen) >=
        (col("n_a") + col("n_b")) * tNum)
      .select(col("a"), col("b"), col("n_a"), col("n_b"), col("common"),
        (col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")).cast("double"))
          .as("jaccard"))
  }

  /** Convenience: token-set Jaccard join over raw text (whitespace
    * tokens, deduplicated per row). */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
                  tNum: Int, tDen: Int): DataFrame =
    jaccardJoinSets(
      df.select(col(idCol),
        explode(array_distinct(
          graft.functions.TextFunctions.tokens(col(textCol))))
          .as("__tk")),
      idCol, "__tk", tNum, tDen)

  /** DuckDB twin of [[jaccardJoinSets]]: `elemsSql` must be a CTE body
    * yielding (id, tk) distinct element rows; the chain appended here
    * mirrors the Spark stages 1:1. */
  def jaccardJoinSetsSql(elemsSql: String, tNum: Int, tDen: Int): String =
    s"""WITH tok AS (
       |$elemsSql
       |), sz AS (SELECT id, count(*) AS n FROM tok GROUP BY id),
       |dfreq AS (SELECT tk, count(*) AS df FROM tok GROUP BY tk),
       |pos AS (
       |  SELECT t.id, t.tk, s.n,
       |    row_number() OVER (PARTITION BY t.id ORDER BY f.df, t.tk)
       |      AS pos
       |  FROM tok t JOIN dfreq f USING (tk) JOIN sz s USING (id)
       |), pre AS (
       |  SELECT id, tk, n, pos FROM pos
       |  WHERE pos <= n - (($tNum * n + ${tDen - 1}) // $tDen) + 1
       |), cand AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b, x.n AS n_a, y.n AS n_b
       |  FROM pre x JOIN pre y ON x.tk = y.tk AND x.id < y.id
       |   AND y.n * $tDen >= x.n * $tNum AND x.n * $tDen >= y.n * $tNum
       |   AND (1 + least(x.n - x.pos, y.n - y.pos)) * ${tNum + tDen}
       |     >= $tNum * (x.n + y.n)
       |), common AS (
       |  SELECT c.a, c.b, c.n_a, c.n_b, count(*) AS common
       |  FROM cand c
       |  JOIN tok ta ON ta.id = c.a
       |  JOIN tok tb ON tb.id = c.b AND tb.tk = ta.tk
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT a, b, n_a, n_b, common,
       |  CAST(common AS DOUBLE) / CAST(n_a + n_b - common AS DOUBLE)
       |    AS jaccard
       |FROM common
       |WHERE common * ${tNum + tDen} >= (n_a + n_b) * $tNum""".stripMargin
}
