package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k neighbor selection as a typed `Aggregator` — the
  * SCALE-CORRECT physical shape for brute-force kNN.
  *
  * The window form (`row_number() OVER (ORDER BY cos DESC)` then
  * `rank <= k`) shuffles and SORTS every scored pair: O(N·Q) rows through
  * the exchange. This aggregator is partial-aggregation-friendly: each
  * map task reduces its pairs into a ≤k buffer, so the shuffle carries
  * only `k × queries × partitions` rows and the reducer merges bounded
  * buffers — no global sort, memory O(k) per group. Same result rows
  * (asserted by running it against the window form's own oracle SQL —
  * `sim7_topk_agg` reuses `sim1_cosine_topk`'s DuckDB twin verbatim).
  *
  * Determinism: the buffer keeps the k best by (cos DESC, id ASC) — ties
  * always resolve to the smaller id, independent of partitioning or merge
  * order, matching the window form's explicit tie-break.
  */
case class Neighbor(id: Long, cos: Double)

case class RankedNeighbor(neighbor_id: Long, cos_sim: Double, rank: Long)

case class TopKBuf(items: List[Neighbor])

case class TopKOut(items: Seq[RankedNeighbor])

class TopKNeighbors(k: Int) extends Aggregator[Neighbor, TopKBuf, TopKOut] {

  /** (cos DESC, id ASC) — a beats b when true. `Double.compare`, not raw
    * `>`: IEEE comparisons are never true for NaN, which would break the
    * total order (NaN entries accumulate head-of-buffer in arrival order
    * and a NaN `last` rejects every real neighbor). Double.compare orders
    * NaN greatest — exactly how Spark's ORDER BY cos DESC sorts it, so
    * the aggregator stays row-identical to the window form on degenerate
    * (zero-norm) vectors too. */
  private def beats(a: Neighbor, b: Neighbor): Boolean = {
    val c = java.lang.Double.compare(a.cos, b.cos)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def insert(buf: List[Neighbor], n: Neighbor): List[Neighbor] = {
    val (better, worse) = buf.span(beats(_, n))
    val merged = better ::: n :: worse
    if (merged.length > k) merged.take(k) else merged
  }

  def zero: TopKBuf = TopKBuf(Nil)

  def reduce(b: TopKBuf, a: Neighbor): TopKBuf =
    if (b.items.length == k && !beats(a, b.items.last)) b
    else TopKBuf(insert(b.items, a))

  def merge(a: TopKBuf, b: TopKBuf): TopKBuf = b.items.foldLeft(a)(reduce)

  def finish(b: TopKBuf): TopKOut =
    TopKOut(b.items.zipWithIndex.map { case (n, i) =>
      RankedNeighbor(n.id, n.cos, (i + 1).toLong)
    })

  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[TopKOut] = Encoders.product[TopKOut]
}
