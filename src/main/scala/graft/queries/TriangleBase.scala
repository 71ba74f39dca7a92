package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Durable degree-oriented edge base for the co-purchase graph — the
  * gr2 serve-path artifact (VERDICT r10 #5). The oriented edge table is
  * a corpus-snapshot projection exactly like [[BasketBase]]: the
  * orientation rule depends only on the snapshot's degrees, so it is
  * built ONCE per fixture generation (prewarm; `prewarm_sec` carries
  * the cost) into the durable [[graft.core.FixtureCache]] and served to
  * every triangle run — which then pays only the wedge join itself.
  * The meta row additionally freezes the EXACT oriented wedge work, so
  * the serve path's density guard is a driver compare, not two
  * node-sized aggregates per query.
  *
  * Staleness: fingerprint-keyed like every FixtureCache artifact — a
  * regenerated fixture resolves to a new generation automatically. */
object TriangleBase {

  /** Root of the artifact (`oriented/` + `meta/`) for this fixture
    * generation, building it on first use. */
  def dir(s: SparkSession, fixtureDir: String): String =
    graft.core.FixtureCache.dirFor(s, fixtureDir, "tri-base1") { p =>
      graft.operators.Graph.buildTriangleBase(
        BasketBase.pairCounts(s, fixtureDir)
          .select(col("a").as("s1"), col("b").as("s2")), p)
    }

  /** The frozen exact Σ out·in of the base — gr2's degrade decision. */
  def wedgeWork(s: SparkSession, root: String): Long =
    graft.core.Frames.headRow(s, s"$root/meta").getAs[Long]("wedge_work")
}
