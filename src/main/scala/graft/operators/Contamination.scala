package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark-contamination scoring — the decontamination pass a corpus
  * runs before it ships: every corpus document is scored by how many of
  * its distinct n-gram shingles appear in an EXTERNAL benchmark's shingle
  * set (the eval suites the model must not have memorized).
  *
  * The benchmark side is an arbitrary caller-supplied DataFrame of texts
  * — a real eval set, not a corpus slice — so a user can decontaminate
  * against whatever benchmarks they hold. (The tx10 oracle fixture passes
  * a deterministic corpus slice here, which keeps the DuckDB twin exact;
  * the operator itself never assumes that.)
  *
  * Scale shape: benchmarks are tiny relative to a 100 TB corpus, so the
  * benchmark gram set broadcasts; the corpus-side gram table never
  * shuffles — one broadcast left join + one per-doc hash agg counting
  * (grams, hits) in a single pass over the gram table.
  */
object Contamination {

  /** Distinct word n-grams per row: (idCol, gram). Documents shorter than
    * `n` tokens contribute no rows. */
  private def grams(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame =
    // ONE n-gram definition repo-wide: Dedup.shingleArray (a drifted
    // second copy would silently desync tx10's oracle). array_distinct
    // before the explode keeps per-doc dedup NARROW — the row-level
    // .distinct() it replaces was a full shuffle for the same pairs.
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        explode(array_distinct(Dedup.shingleArray(col("_toks"), n)))
          .as("gram"))

  /** Score `corpus` against `bench`: one output row per corpus doc —
    * (idCol, n_grams, n_hits, contamination, flagged) where contamination
    * is the fraction of the doc's distinct n-grams found in the benchmark
    * and flagged = any hit at all (the conservative ship/no-ship bit). */
  def score(corpus: DataFrame, idCol: String, textCol: String,
            bench: DataFrame, benchTextCol: String, n: Int = 4): DataFrame = {
    val corpusGrams = grams(corpus, idCol, textCol, n)
    val benchGrams = bench
      .withColumn("_bid", monotonically_increasing_id())
      .transform(b => grams(b, "_bid", benchTextCol, n))
      .select(col("gram")).distinct()
      .withColumn("_hit", lit(1))
    val stats = corpusGrams
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("_hit")).as("n_hits"))
    corpus.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_hits").cast("double") / col("n_grams"), lit(0.0))
          .as("contamination"),
        (coalesce(col("n_hits"), lit(0L)) > 0L).as("flagged"))
  }
}
