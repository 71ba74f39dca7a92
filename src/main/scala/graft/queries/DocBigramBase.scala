package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared per-document token-bigram base (doc, w1, w2, n_occ) over
  * `documents` — the ONE corpus-scale aggregate every n-gram language
  * model needs (tx14 Laplace LM, tx31 Kneser–Ney LM; any higher-order
  * extension re-aggregates this table, never the corpus). Materialized
  * to the durable [[graft.core.FixtureCache]] under the shingle/
  * termfreq-base policy: built once per fixture GENERATION, prewarmed
  * outside the timed region, fingerprint-invalidated on regeneration.
  * The cluster analog is the n-gram count table an LM-filtering
  * deployment (CCNet-style) builds once per corpus snapshot and trains
  * every model variant from.
  */
object DocBigramBase {

  /** (doc, w1, w2, n_occ) — one row per distinct adjacent token pair
    * per document. Model counts are its vocab-sized re-aggregation. */
  def db(s: SparkSession, dir: String): DataFrame =
    graft.core.FixtureCache.tableFor(s, dir, "docbigrams") {
      val toks = graft.core.Tables.spread(
          graft.core.Tables.load(s, dir, "documents"))
        .select(col("doc_id").as("doc"),
          graft.functions.TextFunctions.tokens(col("text")).as("_toks"))
      toks.select(col("doc"),
          explode(when(size(col("_toks")) >= 2,
            transform(sequence(lit(1), size(col("_toks")) - 1),
              i => struct(element_at(col("_toks"), i).as("w1"),
                element_at(col("_toks"), i + 1).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
            .as("bg"))
        .select(col("doc"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy(col("doc"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("n_occ"))
    }
}
