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

  /** One vocabulary entry mid-training: the word's current symbol
    * segmentation and its corpus frequency. */
  case class VocabEntry(word: String, symbols: Seq[String], wc: Long)

  /** A learned merge: the adjacent pair chosen at one round and its
    * weighted occurrence count when chosen. */
  case class Merge(left: String, right: String, n: Long)

  /** Full BPE merge training (Sennrich et al. 2016 alg. 1): iterate —
    * count adjacent symbol pairs over the vocabulary weighted by word
    * frequency, merge the argmax pair everywhere, repeat `nMerges`
    * times (stopping early when no pair is left).
    *
    * Scale: the corpus collapses to the word-frequency vocabulary ONCE
    * (the one corpus-scale aggregation, same as [[pairStats]]); every
    * training round then runs on the vocabulary alone — a pair-count agg
    * (vocab × word length rows) plus a 1-row argmax collect, and a typed
    * map rewriting each word's symbol array. That is the textbook
    * shape: at web scale the vocab is tens of millions of rows against a
    * 100 TB corpus, so rounds cost vocabulary work, not corpus work.
    * `localCheckpoint` every few rounds keeps the plan from growing
    * linearly with rounds. Deterministic: argmax tie-break is
    * (count desc, left asc, right asc); non-adjacent re-pairing follows
    * the standard left-to-right greedy scan.
    */
  def train(docs: DataFrame, textCol: String,
      nMerges: Int): (Seq[Merge], DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: org.apache.spark.sql.Dataset[VocabEntry] =
      graft.core.Tables.spread(docs)
        .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("wc"))
        .as[(String, Long)]
        .map { case (w, c) => VocabEntry(w, w.map(_.toString), c) }
        .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val best = vocab
        .flatMap(e => e.symbols.zip(e.symbols.drop(1))
          .map(p => (p._1, p._2, e.wc)))
        .groupBy(col("_1").as("l"), col("_2").as("r"))
        .agg(sum(col("_3")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(l, r, n)
        vocab = vocab.map { e =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < e.symbols.length) {
            if (i + 1 < e.symbols.length &&
                e.symbols(i) == l && e.symbols(i + 1) == r) {
              out += l + r; i += 2
            } else { out += e.symbols(i); i += 1 }
          }
          e.copy(symbols = out.toSeq)
        }
        round += 1
        if (round % 4 == 0) vocab = vocab.localCheckpoint()
      }
    }
    (merges.toSeq, vocab.toDF())
  }

  /** Apply learned merges to encode the corpus — the tokenizer's
    * inference path: each word re-runs the merge list in RANK order
    * (lowest-rank applicable merge first, the standard BPE encode), so a
    * word unseen at training time still segments deterministically.
    *
    * Scale: the merge table (vocabulary-training output, ~30k-100k rows
    * for real tokenizers) broadcasts to every task as a plain Map; the
    * corpus pass is one narrow typed map — zero shuffles, zero joins.
    * Output: (doc id, n_words, n_tokens) — the sequence-length table
    * that feeds packing (pl7) and token-budget accounting. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (m, i) => (m.left, m.right) -> i }.toMap
    val bc = spark.sparkContext.broadcast(rank)
    docs.select(col(idCol).cast("long").as("id"),
        TextFunctions.tokens(col(textCol)).as("ws"))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        val r = bc.value
        var nTok = 0L
        ws.foreach { w =>
          var syms = w.map(_.toString)
          var done = false
          while (!done && syms.length > 1) {
            // lowest-rank applicable merge, leftmost occurrence first
            val cand = syms.zip(syms.tail).zipWithIndex
              .flatMap { case (p, i) => r.get(p).map(rk => (rk, i)) }
            if (cand.isEmpty) done = true
            else {
              val (_, i) = cand.min
              syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++
                syms.drop(i + 2)
            }
          }
          nTok += syms.length
        }
        (id, ws.length.toLong, nTok)
      }.toDF("id", "n_words", "n_tokens")
  }
}
