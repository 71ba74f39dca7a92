package graft
import org.apache.spark.sql.functions._

/** Dev harness: print the co-purchase graph's edge count and exact
  * oriented wedge work per fixture dir — the numbers the gr2 wedge
  * budget (absolute floor + per-edge factor) is calibrated against.
  * `runMain graft.GraphProbe <dir> [<dir> ...]` */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions
      .local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.foreach { dir =>
      val e = graft.queries.BasketBase.pairCounts(spark, dir)
        .select(col("a").as("s1"), col("b").as("s2"))
      val n = e.count()
      val w = graft.operators.Graph.orientedWedgeWork(e)
      println(f"GRAPHPROBE $dir edges=$n wedges=$w ratio=${w.toDouble / n}%.1f")
      // GRAFT_TRI_TIME=1: time the served triangle count under both
      // wedge-build regimes (shuffled vs broadcast) — the calibration
      // run behind the wedgeBroadcastLimit default
      if (sys.env.get("GRAFT_TRI_TIME").contains("1")) {
        val root = graft.queries.TriangleBase.dir(spark, dir)
        Seq(2000000L, 40000000L).foreach { lim =>
          (1 to 2).foreach { run =>
            val t0 = System.nanoTime()
            graft.operators.Graph.triangleStatsServed(spark, root,
              wedgeBroadcastLimit = lim).collect()
            println(f"TRIPROBE lim=$lim run=$run " +
              f"${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
        }
      }
    }
    spark.stop()
  }
}
