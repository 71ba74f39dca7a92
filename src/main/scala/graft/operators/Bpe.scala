package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** BPE vocabulary-training statistics (Sennrich et al. 2016): the
  * adjacent-symbol-pair frequency table whose argmax is the next merge.
  *
  * This is the aggregate a tokenizer-training pipeline runs over the raw
  * corpus, and its scale shape is the whole point: the corpus (100 TB of
  * text) first collapses to the VOCABULARY (a word-frequency table — tens
  * of millions of rows at web scale) via one hash aggregation with
  * map-side partial counts; only then are words exploded into character
  * pairs, so the per-character work runs over vocab-sized data weighted
  * by counts, never over the corpus itself. A per-token pair explosion —
  * the naive ordering — would multiply the corpus scan by avg word
  * length; aggregate-then-explode multiplies only the vocabulary.
  *
  * Output: top-k (pair, n_pair, n_vocab) by weighted occurrence count —
  * `n_pair` is Σ word_count · (occurrences of the pair in the word),
  * `n_vocab` the number of distinct vocabulary entries containing it.
  * Tie-break (n_pair desc, pair asc) keeps the table deterministic.
  */
object Bpe {

  def pairStats(docs: DataFrame, textCol: String, k: Int = 30): DataFrame = {
    val wc = graft.core.Tables.spread(docs)
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("wc"))
    // Spark's sequence(1, 0) counts DOWN (yields [1, 0]) — single-char
    // words must short-circuit to an empty pair array explicitly.
    val pairs = wc.select(col("wc"), col("word"),
      explode(expr(
        """CASE WHEN length(word) < 2 THEN array()
          |ELSE transform(sequence(1, length(word) - 1),
          |               i -> substring(word, i, 2)) END""".stripMargin))
        .as("pair"))
    pairs.groupBy(col("pair"))
      .agg(sum(col("wc")).cast("long").as("n_pair"),
        count_distinct(col("word")).as("n_vocab"))
      .orderBy(col("n_pair").desc, col("pair").asc)
      .limit(k)
  }
}
